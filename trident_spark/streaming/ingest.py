"""Structured Streaming ingestion (C21): incremental crawl → incremental KG.

The batch pipeline is authoritative; streaming reuses the exact same
per-batch transformations (extract_pages → raw_triples → skolemize), so
batch/stream parity is by construction.  Late captures are handled with a
watermark on warc_ts; per-url latest-capture semantics come from the
downstream batch compaction (dedup_triples keeps the graph a set either way).

In production the source is an Iceberg append-snapshot stream; in the
sandbox the tests use a file/parquet source with the same schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from trident_spark.pipeline import extract_stage, kg


def streaming_triples(pages_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """pages stream → skolemized triple stream (append mode, stateless map)."""
    results = extract_stage.extract_pages(pages_stream.withWatermark("warc_ts", watermark))
    return kg.skolemize(extract_stage.raw_triples(results))


def streaming_predicate_counts(pages_stream: DataFrame,
                               window: str = "1 hour",
                               watermark: str = "1 hour") -> DataFrame:
    """Windowed per-predicate triple counts with late-data handling."""
    triples = streaming_triples(pages_stream, watermark)
    return (
        triples.groupBy(F.window("warc_ts", window), F.col("pred"))
        .agg(F.count("*").alias("n"))
    )


def start_parquet_sink(triples_stream: DataFrame, path: str,
                       checkpoint: str, trigger_once: bool = True):
    """Idempotent exactly-once parquet sink via checkpointed streaming query."""
    writer = (
        triples_stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
