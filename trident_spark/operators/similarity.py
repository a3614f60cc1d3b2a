"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``        — brute-force exact top-k: the dot product is a pure
  Catalyst ``aggregate(zip_with(...))`` expression (whole-stage codegen, no
  Python), followed by TakeOrderedAndProject; the baseline and the verifier.
- ``lsh_bucket_topk``    — scale path: random-hyperplane LSH signatures
  restrict the scan to the query's bucket (+ multiprobe neighbours that flip
  one bit), turning a full scan into a ~(probes/2^bits) partial scan.
- ``embedding_near_dup_pairs`` — cosine ≥ t near-duplicate pairs; LSH-bucket
  join for candidates at scale, exact rescoring always.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "cosine_topk",
    "cosine_similarity_col",
    "lsh_bucket_topk",
    "embedding_near_dup_pairs",
    "hyperplane_signatures",
]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity_col(vec_col, query: list[float]):
    """cosine(vec, constant query) as a JVM-side expression."""
    q = F.array(*[F.lit(float(v)) for v in query])
    return _dot(vec_col, q) / (_norm(vec_col) * _norm(q))


def cosine_topk(embeddings: DataFrame, query: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force top-k by cosine to a constant query vector."""
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine_similarity_col(F.col(vec_col), query), 4).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_bits, dim))


def hyperplane_signatures(embeddings: DataFrame, dim: int, n_bits: int = 8,
                          seed: int = 11, vec_col: str = "embedding") -> DataFrame:
    """Add a ``bucket`` column: sign-pattern of n_bits random hyperplanes.

    Computed as a Catalyst expression per bit (dot with a constant vector),
    so the signature stage is JVM-only and pipelines with the scan.
    """
    planes = _hyperplanes(dim, n_bits, seed)
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        bit = (_dot(F.col(vec_col), F.array(*[F.lit(float(v)) for v in plane])) > 0)
        bucket = bucket + F.when(bit, F.lit(1 << i)).otherwise(F.lit(0))
    return embeddings.withColumn("bucket", bucket)


def _query_buckets(query: list[float], planes: np.ndarray, probes: int) -> list[int]:
    q = np.asarray(query, dtype=np.float64)
    bits = (planes @ q > 0).astype(np.int64)
    base = int((bits << np.arange(len(bits))).sum())
    buckets = [base]
    # multiprobe: flip the bits whose hyperplane margin is smallest
    margins = np.abs(planes @ q)
    for i in np.argsort(margins)[: max(0, probes - 1)]:
        buckets.append(base ^ (1 << int(i)))
    return buckets


def lsh_bucket_topk(embeddings: DataFrame, query: list[float], k: int = 10,
                    n_bits: int = 8, probes: int = 3, seed: int = 11,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: scan only the query's LSH bucket(s), exact rescore.

    At 2^8 buckets with 3 probes this scans ~1.2% of the corpus; recall is
    tested against cosine_topk in tests/test_similarity.py.
    """
    dim = len(query)
    planes = _hyperplanes(dim, n_bits, seed)
    buckets = _query_buckets(query, planes, probes)
    sigs = hyperplane_signatures(embeddings, dim, n_bits, seed, vec_col)
    return (
        sigs.where(F.col("bucket").isin(buckets))
        .select(
            F.col(id_col),
            F.round(cosine_similarity_col(F.col(vec_col), query), 4).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                             use_lsh: bool = True, n_bits: int = 8, seed: int = 11,
                             vec_col: str = "embedding", id_col: str = "vec_id",
                             dim: int | None = None) -> DataFrame:
    """Pairs (a < b) with cosine ≥ threshold.

    use_lsh=True joins on the LSH bucket first (same-bucket candidates only —
    the 100 TB path; slightly lossy for pairs straddling a hyperplane).
    use_lsh=False is the exact quadratic verifier/oracle.
    """
    norm = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / _norm(F.col(vec_col))).alias("v"),
    )
    if use_lsh:
        if dim is None:
            raise ValueError("dim required when use_lsh=True")
        sigs = hyperplane_signatures(
            norm.withColumnRenamed("v", vec_col), dim, n_bits, seed, vec_col
        ).withColumnRenamed(vec_col, "v")
        a = sigs.select(F.col("id").alias("a"), F.col("v").alias("va"), "bucket")
        b = sigs.select(F.col("id").alias("b"), F.col("v").alias("vb"), "bucket")
        cands = a.join(b, "bucket").where(F.col("a") < F.col("b"))
    else:
        a = norm.select(F.col("id").alias("a"), F.col("v").alias("va"))
        b = norm.select(F.col("id").alias("b"), F.col("v").alias("vb"))
        cands = a.join(b, F.col("a") < F.col("b"))
    return (
        cands.withColumn("cosine", F.round(_dot(F.col("va"), F.col("vb")), 4))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
        .dropDuplicates(["a", "b"])
    )
