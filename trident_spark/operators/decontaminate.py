"""Benchmark decontamination: flag training documents that overlap an
evaluation set (the standard n-gram-collision method: a doc is
contaminated when it shares enough distinct word n-grams with any
benchmark item).

Scale shape — this is the part that matters at 100 TB:

- both sides explode to HASHED word n-grams (md5-prefix 64-bit keys, the
  same SQL-reproducible hashing the simhash operator uses), so the join
  moves compact fixed-width keys, never text;
- candidate generation is a single equi-join on the gram hash; the
  benchmark side is tiny (eval sets are thousands of items) so Spark
  broadcasts it — the corpus never shuffles;
- per-(doc, bench) overlap is a count-distinct aggregate on the join
  output, partial-aggregated map-side before the one shuffle.

No quadratic pass anywhere and the corpus text crosses the wire zero
times.  Everything is SQL-expressible, so the operator is end-to-end
oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _gram_hashes(frame: DataFrame, id_out: str, text_col: str,
                 id_col: str, n: int) -> DataFrame:
    """(id, gram_hash) for every DISTINCT lowercase word n-gram.

    Hash = first 16 hex chars of md5 of the space-joined gram —
    reproducible bit-for-bit in any SQL engine (DuckDB mirror:
    ``('0x' || substr(md5(gram), 1, 16))::UBIGINT``); the shared
    ``util.word_ngrams_col`` carries the rule-13 short-doc guard."""
    from trident_spark.util import word_ngrams_col

    return (
        frame.select(F.col(id_col).alias(id_out),
                     F.explode(F.array_distinct(
                         word_ngrams_col(text_col, n))).alias("gram"))
        .select(
            id_out,
            F.conv(F.substring(F.md5("gram"), 1, 16), 16, 10)
            .cast("decimal(20,0)").alias("gram_hash"),
        )
    )


def contamination_scores(docs: DataFrame, benchmark: DataFrame,
                         n: int = 8,
                         text_col: str = "text", id_col: str = "doc_id",
                         bench_text_col: str = "text",
                         bench_id_col: str = "bench_id",
                         broadcast_bench: bool = True) -> DataFrame:
    """Per (doc, benchmark item) n-gram overlap: (id, bench_id,
    n_shared_grams, bench_grams, overlap_frac) for every colliding pair.

    ``overlap_frac`` is shared / benchmark-item grams — the direction
    that matters (a long doc quoting a whole eval item is contaminated
    no matter how big the doc is).

    ``broadcast_bench=True`` (default) force-broadcasts the benchmark
    gram table — right for real eval sets (thousands of items; the
    corpus side then never shuffles).  Pass ``False`` for an unusually
    large benchmark (or tiny ``n`` on long items — gram explosion): the
    join falls back to AQE's choice instead of OOMing executors on an
    oversized broadcast."""
    from trident_spark.util import ensure_parallelism

    # the corpus-side gram explosion (n-gram build + md5 per gram) is the
    # operator's compute bulk and otherwise runs inside the scan stage —
    # one task per row group (rule 3: single-row-group inputs scan as ONE
    # task).  The benchmark side is tiny by contract; leave it alone.
    d = _gram_hashes(ensure_parallelism(docs), "id", text_col, id_col, n)
    b = _gram_hashes(benchmark, "bench_id", bench_text_col,
                     bench_id_col, n)
    bench_sizes = b.groupBy("bench_id").agg(
        F.count("*").alias("bench_grams"))
    if broadcast_bench:
        b, bench_sizes = F.broadcast(b), F.broadcast(bench_sizes)
    hits = (
        d.join(b, "gram_hash")
        .groupBy("id", "bench_id")
        .agg(F.count("*").alias("n_shared_grams"))
        .join(bench_sizes, "bench_id")
    )
    return hits.select(
        "id", "bench_id", "n_shared_grams", "bench_grams",
        F.round(F.col("n_shared_grams") / F.col("bench_grams"), 4)
        .alias("overlap_frac"),
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  threshold: float = 0.5, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str = "text",
                  bench_id_col: str = "bench_id") -> DataFrame:
    """docs + (is_contaminated, worst overlap) — the filter view.

    A doc is contaminated when ANY benchmark item's ``overlap_frac``
    reaches ``threshold``.  Clean docs come back with 0.0/NULL marks
    (never dropped — the caller's policy decides)."""
    scores = contamination_scores(docs, benchmark, n, text_col, id_col,
                                  bench_text_col, bench_id_col)
    worst = (
        scores.groupBy("id")
        .agg(F.max("overlap_frac").alias("max_overlap"),
             F.max_by("bench_id", F.struct("overlap_frac", "bench_id"))
             .alias("worst_bench_id"))
    )
    return (
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
        .join(worst, "id", "left")
        .select(
            "id", "text",
            F.coalesce("max_overlap", F.lit(0.0)).alias("max_overlap"),
            "worst_bench_id",
            (F.coalesce("max_overlap", F.lit(0.0)) >= threshold)
            .alias("is_contaminated"),
        )
    )
