"""Per-partition lineage + idempotent resume (C17).

Work is bucketed by a deterministic hash of the url (stable across runs and
cluster sizes, unlike Spark partition ids).  After a stage finishes a bucket,
one lineage row (stage, bucket, row_count, checksum, completed_at) is
appended; resuming a crashed run anti-joins the input against completed
buckets, so finished work is never redone and re-runs are idempotent
(deterministic term ids make re-emitted rows identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

LINEAGE_SCHEMA = (
    "stage string, bucket int, row_count long, checksum long, completed_at timestamp"
)


def with_bucket(df: DataFrame, n_buckets: int = 256, col: str = "url") -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int"))


def compute_lineage(df: DataFrame, stage: str, n_buckets: int = 256,
                    key_cols: tuple = ("url",)) -> DataFrame:
    """One lineage row per bucket: count + order-insensitive checksum
    (bit_xor of row hashes is associative + commutative + overflow-free)."""
    row_hash = F.xxhash64(*[F.col(c) for c in df.columns if c != "bucket"])
    return (
        with_bucket(df, n_buckets, key_cols[0])
        .groupBy("bucket")
        .agg(
            F.count("*").alias("row_count"),
            F.bit_xor(row_hash).alias("checksum"),
        )
        .select(
            F.lit(stage).alias("stage"),
            "bucket",
            "row_count",
            "checksum",
            F.current_timestamp().alias("completed_at"),
        )
    )


def resume_filter(pages: DataFrame, lineage: DataFrame, stage: str,
                  n_buckets: int = 256) -> DataFrame:
    """Drop pages whose bucket already completed `stage` (left-anti join)."""
    done = lineage.where(F.col("stage") == stage).select("bucket").distinct()
    return (
        with_bucket(pages, n_buckets)
        .join(F.broadcast(done), "bucket", "left_anti")
        .drop("bucket")
    )


def write_partitioned(df: DataFrame, path: str, mode: str = "overwrite",
                      partition_by: tuple = ()) -> None:
    """Parquet sink (sandbox stand-in for Iceberg writeTo/overwritePartitions)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
