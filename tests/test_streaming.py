"""Streaming ingest tests: file-source pages stream → triple stream,
exactly-once sink via checkpoint, parity with the batch pipeline."""

import pytest
from pyspark.sql import functions as F

from trident_spark.pipeline import extract_stage, kg
from trident_spark.pipeline.pages import pages_df
from trident_spark.streaming.ingest import start_parquet_sink, streaming_triples


@pytest.fixture(scope="module")
def staged_pages(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "pages")
    pages_df(spark, 60, partitions=3).write.parquet(path)
    return path


def test_stream_matches_batch(spark, staged_pages, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream") / "triples")
    ckpt = str(tmp_path_factory.mktemp("stream") / "ckpt")

    pages_schema = spark.read.parquet(staged_pages).schema
    stream = (
        spark.readStream.schema(pages_schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(staged_pages)
    )
    q = start_parquet_sink(streaming_triples(stream), out, ckpt)
    q.awaitTermination(timeout=300)

    streamed = spark.read.parquet(out).select(
        "subj", "pred", "obj_lexical", "obj_kind"
    )
    batch = kg.skolemize(
        extract_stage.raw_triples(
            extract_stage.extract_pages(spark.read.parquet(staged_pages))
        )
    ).select("subj", "pred", "obj_lexical", "obj_kind")

    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_stream_restart_is_idempotent(spark, staged_pages, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("restart") / "triples")
    ckpt = str(tmp_path_factory.mktemp("restart") / "ckpt")
    pages_schema = spark.read.parquet(staged_pages).schema

    def run_once():
        stream = spark.readStream.schema(pages_schema).parquet(staged_pages)
        q = start_parquet_sink(streaming_triples(stream), out, ckpt)
        q.awaitTermination(timeout=300)

    run_once()
    n1 = spark.read.parquet(out).count()
    run_once()  # restart with same checkpoint: no new input → no duplicates
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 > 0


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization must reproduce the batch
    window operator for every closed session.  Two microbatches (file order
    pinned via mtime): real events first, then a far-future sentinel per
    user whose arrival closes all real sessions inline."""
    import datetime as dt
    import os
    import shutil

    from trident_spark.streaming.sessionize import sessionize_stream

    schema = "user_id long, ts timestamp, value double"
    base = dt.datetime(2025, 1, 1)
    rows = []
    for u in range(3):
        t = base + dt.timedelta(minutes=u)
        for _s in range(2):
            for _e in range(3):
                rows.append((u, t, 1.5))
                t += dt.timedelta(minutes=5)
            t += dt.timedelta(minutes=45)  # inactivity gap → session closes
    sentinels = [(u, base + dt.timedelta(days=10), 0.0) for u in range(3)]

    stage = tmp_path / "stage"
    src = tmp_path / "src"
    src.mkdir()
    for i, data in enumerate((rows, sentinels)):
        d = stage / str(i)
        spark.createDataFrame(data, schema).coalesce(1).write.mode(
            "overwrite").parquet(str(d))
        part = next(p for p in d.iterdir() if p.name.endswith(".parquet"))
        dst = src / f"{i}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory").queryName("sessions_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = [
        (r["user_id"], r["n_events"], r["session_value"])
        for r in spark.sql(
            "SELECT * FROM sessions_out WHERE session_value > 0").collect()
    ]
    # batch reference: 3 users x 2 sessions of 3 events x 1.5
    assert sorted(got) == sorted([(u, 3, 4.5) for u in range(3)] * 2)


def test_streaming_dedup_within_watermark(spark, tmp_path_factory):
    """Duplicate texts arriving across micro-batches within the watermark
    are dropped; distinct texts all survive; parity with batch exact_dedup
    canonical picks (first occurrence per digest)."""
    import datetime as dt

    from trident_spark.streaming.dedup import dedup_stream

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, "alpha text", base),
        (2, "beta text", base + dt.timedelta(minutes=1)),
        (3, "alpha text", base + dt.timedelta(minutes=2)),   # dup of 1
        (4, "gamma text", base + dt.timedelta(minutes=3)),
        (5, "beta text", base + dt.timedelta(minutes=30)),   # dup of 2
    ]
    src = str(tmp_path_factory.mktemp("sdedup") / "src")
    ckpt = str(tmp_path_factory.mktemp("sdedup") / "ckpt")
    df = spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp")
    df.repartition(2).write.parquet(src)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = "sdedup_out"
    q = (
        dedup_stream(stream, watermark="2 hours")
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table(name).select("text").collect()
    texts = sorted(r["text"] for r in got)
    assert texts == ["alpha text", "beta text", "gamma text"]
