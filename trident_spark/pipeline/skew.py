"""Hot-key skew handling (C16): salted two-stage aggregation + salted joins.

AQE's skew-join splitting handles skewed *partitions*, but a single hub key
(e.g. ``rdf:type schema:WebPage`` appearing on nearly every page, or one
Wikipedia IRI) still lands on one reducer in a groupBy.  The fix is explicit:
aggregate (key, salt) first — map-side partials spread the hub across N_SALT
reducers — then aggregate the salted partials by key.

``hot_keys`` finds the keys worth salting with a cheap sampled count, so the
two-stage plan is only applied where it pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_count(df: DataFrame, key_cols: list[str], n_salt: int = 64,
                 count_col: str = "n") -> DataFrame:
    """groupBy(key).count() that survives hub keys: two-stage over a salt.

    Stage 1 groups on (key, salt) — the hub key's rows split across n_salt
    reducers; stage 2 sums the ≤ n_salt partials per key (tiny shuffle).
    """
    # salt values need no cross-retry stability: re-aggregation by key makes
    # any row→salt assignment correct, so the cheap row-id works
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return stage1.groupBy(*key_cols).agg(F.sum("_partial").alias(count_col))


def salted_agg(df: DataFrame, key_cols: list[str], aggs: dict[str, str],
               n_salt: int = 64) -> DataFrame:
    """Two-stage aggregation for algebraic functions (sum/count/min/max).

    aggs maps output column → "fn(col)" with fn in {sum,count,min,max}.
    """
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    first, second = [], []
    for out, spec in aggs.items():
        fn, _, col = spec.partition("(")
        col = col.rstrip(")")
        fn = fn.lower()
        if fn == "count":
            first.append(F.count("*" if col in ("", "*") else col).alias(f"_p_{out}"))
            second.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            first.append(F.sum(col).alias(f"_p_{out}"))
            second.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            first.append(F.min(col).alias(f"_p_{out}"))
            second.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            first.append(F.max(col).alias(f"_p_{out}"))
            second.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    stage1 = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(*first)
    return stage1.groupBy(*key_cols).agg(*second)


def hot_keys(df: DataFrame, key_cols: list[str], fraction: float = 0.01,
             threshold: int = 1000, seed: int = 42) -> DataFrame:
    """Sampled pre-pass: keys whose sampled count exceeds threshold×fraction.

    Cheap (one scan of a 1% sample) and good enough to decide which keys get
    the salted path vs the plain groupBy.
    """
    return (
        df.sample(fraction=fraction, seed=seed)
        .groupBy(*key_cols)
        .agg(F.count("*").alias("sampled_n"))
        .where(F.col("sampled_n") >= max(1, int(threshold * fraction)))
    )


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salt: int = 16) -> DataFrame:
    """Skew-resilient equi-join: salt the big side, explode the small side.

    Each small-side row is replicated n_salt times with every salt value, so
    the big side's hub keys spread across n_salt reducers.  Use when the
    small side is too big to broadcast but the big side has hub keys.
    """
    big_salted = big.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    )
    small_exploded = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return big_salted.join(small_exploded, [key, "_salt"]).drop("_salt")
