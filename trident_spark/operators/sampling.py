"""Deterministic corpus sampling — hash-based, not random.

``df.sample()`` is nondeterministic across retries/partitionings, which is
poison for a 100 TB training-data pipeline (a re-run after a stage failure
must select the SAME subset, and two teams sampling "10%" must agree).
These operators bucket rows by md5 of a stable id, so:

- the decision is a pure function of the row id (re-run/retry stable,
  partitioning-independent, no RNG state on executors)
- complements compose: pct 0-9 and pct 10-99 partition the corpus exactly
- the identical expression runs in any engine (the DuckDB driver oracle
  reproduces it verbatim)

Bucket = first 4 hex digits of md5(id) mod 100 — ~0.8% deviation from
uniform on the 65536→100 fold, irrelevant for sampling and exactly
reproducible everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(id_col: str, buckets: int = 100) -> Column:
    """Stable per-row bucket in [0, buckets): md5-based, engine-portable."""
    hx = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    return (F.conv(hx, 16, 10).cast("bigint") % buckets).alias("bucket")


def deterministic_sample(df: DataFrame, id_col: str, pct: int) -> DataFrame:
    """Keep the stable ~pct% slice of rows (bucket < pct)."""
    if not 0 <= pct <= 100:
        raise ValueError(f"pct must be in [0, 100], got {pct}")
    return df.where(hash_bucket(id_col) < pct)


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      rates: dict[str, int],
                      default_pct: int = 0) -> DataFrame:
    """Per-stratum deterministic rates, e.g. ``{"en": 50, "de": 10}`` —
    the up/down-sampling mix step of corpus curation.  Unlisted strata get
    ``default_pct``.  Same stability guarantees as deterministic_sample."""
    rate = F.lit(default_pct)
    for value, pct in sorted(rates.items()):
        if not 0 <= pct <= 100:
            raise ValueError(f"pct must be in [0, 100], got {pct}")
        rate = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(rate)
    return df.where(hash_bucket(id_col) < rate)
