"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition iff the plan has too few partitions for the cluster.

    Single-file parquet inputs (one row group) scan as ONE task; any
    Python-kernel stage downstream would run single-threaded.  The shuffle
    this inserts is tiny relative to the Arrow-hop work it parallelizes.
    Real multi-file corpora already have enough splits and skip the shuffle.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
