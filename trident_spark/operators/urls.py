"""URL canonicalization + per-URL capture dedup — the crawl-side identity
operators (a training pipeline keys documents by CANONICAL url: tracking
parameters differ per referral, fragments are client-side, hosts vary in
case, yet all name the same document).

Canonicalization = RFC 3987 normalization (the IRI kernel: case, percent,
dot segments, default ports, IDNA) + web-specific cleanup: fragment
dropped, tracking parameters removed (utm_*, fbclid, gclid, msclkid,
ref/ref_src), remaining query parameters sorted for order-independence.
One Arrow hop per batch with a per-batch cache (crawls repeat hosts and
whole URLs heavily); everything downstream is pure Catalyst.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_TRACKING_PREFIXES = ("utm_",)
_TRACKING_EXACT = {"fbclid", "gclid", "msclkid", "ref", "ref_src", "igshid"}


def canonicalize_url(url: str) -> str | None:
    """One URL → canonical form; None when the IRI kernel rejects it."""
    from trident_spark.kernels import iri as K

    try:
        # absolute-only: a crawl URL must carry a scheme (normalize alone
        # would lax-accept relative refs like "not a url" → "not%20a%20url")
        norm = K.normalize(K.parse_iri(url))
    except K.IRIError:
        return None
    # drop the fragment (client-side only)
    h = norm.find("#")
    if h >= 0:
        norm = norm[:h]
    q = norm.find("?")
    if q < 0:
        return norm
    base, query = norm[:q], norm[q + 1:]
    kept = []
    for part in query.split("&"):
        if not part:
            continue
        name = part.split("=", 1)[0].lower()
        if name in _TRACKING_EXACT or name.startswith(_TRACKING_PREFIXES):
            continue
        kept.append(part)
    if not kept:
        return base
    return base + "?" + "&".join(sorted(kept))


@pandas_udf(StringType())
def _canon_udf(urls: pd.Series) -> pd.Series:
    cache: dict[str, str | None] = {}

    def one(u):
        if u is None:
            return None
        hit = cache.get(u, "")
        if hit != "":
            return hit
        v = canonicalize_url(u)
        cache[u] = v
        return v

    return urls.map(one)


def canonical_urls(df: DataFrame, url_col: str = "url",
                   strict_idna: bool = False) -> DataFrame:
    """Add ``canonical_url`` (NULL for unparseable urls — never dropped;
    route on IS NULL for the quarantine side).

    ``strict_idna``: also add ``host_idna_error`` — NULL, or the strict
    IDNA2008/UTS-46 lookup-profile violation of the canonical host
    (kernel ``validate_host_strict``; normalization itself stays
    lenient like the reference).  Spoofed/unregistrable IDN hosts are a
    common junk signal in crawl data; filter or weight on it."""
    out = df.withColumn("canonical_url", _canon_udf(F.col(url_col)))
    if strict_idna:
        from trident_spark.functions.iri_funcs import host_strict_error

        # NOT parse_url: java.net hands back NULL for exactly the
        # malformed hosts this flag exists to catch (e.g. underscores).
        # The canonical form has a lowercase scheme, so a narrow regex
        # lifts the host (skipping userinfo, keeping IP brackets).
        host = F.nullif(
            F.regexp_extract(
                F.col("canonical_url"),
                r"^[a-z][a-z0-9+.\-]*://(?:[^/?#@]*@)?(\[[^\]]*\]|[^/?#:]*)",
                1),
            F.lit(""))
        out = out.withColumn("host_idna_error", host_strict_error(host))
    return out


def dedup_by_url(df: DataFrame, url_col: str = "url",
                 ts_col: str = "warc_ts") -> DataFrame:
    """Latest capture per CANONICAL url: rank captures within each
    canonical key by (timestamp desc, raw url asc for determinism), keep
    rank 1.  One shuffle on the canonical key; unparseable urls keep all
    their rows (no silent drops)."""
    from pyspark.sql.window import Window

    with_canon = canonical_urls(df, url_col)
    w = Window.partitionBy("canonical_url").orderBy(
        F.desc(ts_col), F.asc(url_col))
    ranked = with_canon.withColumn(
        "_rn",
        F.when(F.col("canonical_url").isNull(), F.lit(1))
        .otherwise(F.row_number().over(w)))
    return ranked.where(F.col("_rn") == 1).drop("_rn")
