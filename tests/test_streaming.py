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
