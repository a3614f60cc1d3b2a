"""Streaming exact deduplication for a continuously-ingested corpus.

A training-data pipeline ingesting a crawl stream needs online dedup: the
same document (mirror, recrawl, repost) must not enter the corpus twice.
``dropDuplicatesWithinWatermark`` keeps per-key state only for the
watermark horizon, so state is O(documents per horizon) — bounded on an
unbounded stream — while guaranteeing that any duplicate arriving within
the horizon of its first occurrence is dropped.  (Exact global dedup over
all history belongs to the batch compaction — operators/dedup.exact_dedup
— which the snapshot pipeline runs anyway; the stream handles the
hot-window duplicates that would otherwise multiply before compaction.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(docs_stream: DataFrame, text_col: str = "text",
                 ts_col: str = "ts",
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming frame → first-occurrence-only frame, keyed by the md5
    content digest (the same key as the batch ``exact_dedup``, so
    batch/stream parity is by construction)."""
    return (
        docs_stream
        .withColumn("digest", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )
