"""ensure_parallelism decision table (analysis-only, never .rdd).

The round-3 regression: probing ``df.rdd.getNumPartitions()`` on a
shuffle-bearing frame compiles (and with AQE partly executes) the upstream
stages, double-executing every serialize→parse round-trip, and reads AQE's
post-coalesce count — triggering a pointless repartition on top.  The
rewrite must decide from the analyzed logical plan alone.
"""

import pytest
from pyspark.sql import functions as F

from trident_spark.util import ensure_parallelism


def test_single_file_scan_is_repartitioned(spark, tmp_path):
    p = str(tmp_path / "one.parquet")
    spark.range(1000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    out = ensure_parallelism(df)
    assert out is not df
    assert out.rdd.getNumPartitions() == \
        spark.sparkContext.defaultParallelism


def test_narrow_ops_over_single_file_still_repartition(spark, tmp_path):
    p = str(tmp_path / "one2.parquet")
    spark.range(1000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p).where(F.col("id") > 10) \
        .withColumn("x", F.col("id") * 2)
    assert ensure_parallelism(df) is not df


def test_shuffle_bearing_plan_left_alone(spark, tmp_path):
    p = str(tmp_path / "one3.parquet")
    spark.range(1000).coalesce(1).write.parquet(p)
    base = spark.read.parquet(p)
    for df in (base.groupBy("id").count(),
               base.distinct(),
               base.join(base.withColumnRenamed("id", "id2"),
                         F.col("id") == F.col("id2")),
               base.orderBy("id"),
               base.repartition(4)):
        assert ensure_parallelism(df) is df


def test_driver_local_frames_left_alone(spark):
    df = spark.createDataFrame([("a",)], "doc string")  # LogicalRDD
    assert ensure_parallelism(df) is df
    rng = spark.range(100)  # Range leaf: sliced to defaultParallelism
    assert ensure_parallelism(rng) is rng
    import pandas as pd

    loc = spark.createDataFrame(pd.DataFrame({"doc": ["a", "b"]}))
    assert ensure_parallelism(loc) is loc


def test_plan_word_in_data_does_not_false_positive(spark, tmp_path):
    """Operator detection walks plan node names, not the plan STRING —
    a filter literal containing 'Sort'/'Join' must not suppress the
    repartition (r4 review: the regex version read `Filter (text = 'Sort
    by price')` as a Sort node and left the scan single-task)."""
    p = str(tmp_path / "w.parquet")
    spark.createDataFrame([(i, "Sort by price Join Window")
                           for i in range(50)],
                          "id long, text string").coalesce(1) \
        .write.parquet(p)
    df = spark.read.parquet(p).where(F.col("text") == "Sort by price")
    out = ensure_parallelism(df)
    assert out is not df


def test_many_row_group_single_file_left_alone(spark, tmp_path):
    """A single parquet FILE with ≥ target row groups already scans as
    that many tasks — repartitioning would reduce parallelism."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "rg.parquet")
    pq.write_table(pa.table({"id": list(range(4000))}), p,
                   row_group_size=50)  # 80 row groups
    df = spark.read.parquet(p)
    assert ensure_parallelism(df) is df


def test_min_parts_honored(spark, tmp_path):
    p = str(tmp_path / "one4.parquet")
    spark.range(100).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    assert ensure_parallelism(df, min_parts=7).rdd.getNumPartitions() == 7


def test_no_rdd_probe_on_input(spark, tmp_path, monkeypatch):
    """The decision must not touch df.rdd (rule-10 concrete-class patch)."""
    p = str(tmp_path / "one5.parquet")
    spark.range(100).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p).groupBy("id").count()

    def boom(self):
        raise AssertionError("ensure_parallelism touched .rdd")

    monkeypatch.setattr(type(df), "rdd", property(boom))
    assert ensure_parallelism(df) is df
