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
    """Exact brute-force top-k by cosine to a constant query vector.

    Ordering uses the UNROUNDED cosine (id tiebreak) so top-k membership
    matches an exact-arithmetic oracle; only the displayed score is rounded.
    """
    return (
        embeddings.select(
            F.col(id_col),
            cosine_similarity_col(F.col(vec_col), query).alias("_score"),
        )
        .orderBy(F.desc("_score"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("_score", 4).alias("score"))
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
    # stable sort: tie order must match SQL oracles that ORDER BY (margin, i)
    for i in np.argsort(margins, kind="stable")[: max(0, probes - 1)]:
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
            cosine_similarity_col(F.col(vec_col), query).alias("_score"),
        )
        .orderBy(F.desc("_score"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("_score", 4).alias("score"))
    )


def _normalized(embeddings: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, v): unit-normalized double vectors.  The norm is computed once
    into a column — putting the aggregate inside the transform lambda would
    re-evaluate it per element (O(dim²) per row)."""
    from trident_spark.util import ensure_parallelism

    # normalization, hyperplane signatures and the downstream dot rescores
    # all pipeline with this scan — spread single-row-group inputs (rule 3)
    return (
        ensure_parallelism(embeddings).select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("_raw"),
            _norm(F.col(vec_col)).alias("_n"),
        )
        .select(
            "id",
            F.transform(F.col("_raw"), lambda x: x.cast("double") / F.col("_n")).alias("v"),
        )
    )


def _near_dup_blocked(embeddings: DataFrame, threshold: float,
                      vec_col: str, id_col: str, n_blocks: int) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via blocked GEMM.

    Rows are grouped into ~n_blocks dense numpy matrices (one row per block
    after applyInPandas); the (n_blocks²)/2 block pairs each compute one
    matrix product — orders of magnitude cheaper than materializing the
    quadratic pair rows through Catalyst expressions, and block size bounds
    executor memory at any corpus size."""
    import pandas as pd

    norm = _normalized(embeddings, vec_col, id_col).withColumn(
        "blk", F.pmod(F.col("id"), F.lit(n_blocks))
    )

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(pdf["v"].to_numpy())
        return pd.DataFrame(
            {"blk": [int(key[0])], "ids": [pdf["id"].tolist()],
             "mat": [mat.ravel().tolist()], "dim": [mat.shape[1]]}
        )

    packed = norm.groupBy("blk").applyInPandas(
        pack, "blk int, ids array<long>, mat array<double>, dim int"
    )
    a = packed.select(F.col("blk").alias("blk_a"), F.col("ids").alias("ids_a"),
                      F.col("mat").alias("mat_a"), "dim")
    b = packed.select(F.col("blk").alias("blk_b"), F.col("ids").alias("ids_b"),
                      F.col("mat").alias("mat_b"))
    block_pairs = a.join(b, F.col("blk_a") <= F.col("blk_b"))

    def emit(iterator):
        for pdf in iterator:
            rows_a, rows_b, cos = [], [], []
            for ids_a, mat_a, dim, ids_b, mat_b, same in zip(
                pdf["ids_a"], pdf["mat_a"], pdf["dim"], pdf["ids_b"],
                pdf["mat_b"], pdf["blk_a"] == pdf["blk_b"]
            ):
                ma = np.asarray(mat_a).reshape(len(ids_a), dim)
                mb = np.asarray(mat_b).reshape(len(ids_b), dim)
                sims = ma @ mb.T
                ia, ib = np.where(sims >= threshold)
                ids_a_arr = np.asarray(ids_a)
                ids_b_arr = np.asarray(ids_b)
                for x, y in zip(ia, ib):
                    p, q = int(ids_a_arr[x]), int(ids_b_arr[y])
                    if p == q or (same and p > q):
                        # same-block matrices contain both (x,y) and (y,x);
                        # cross-block pairs appear once, in either id order
                        continue
                    rows_a.append(min(p, q))
                    rows_b.append(max(p, q))
                    cos.append(round(float(sims[x, y]), 4))
            yield pd.DataFrame({"a": rows_a, "b": rows_b, "cosine": cos})

    return block_pairs.mapInPandas(emit, "a long, b long, cosine double")


# ---------------------------------------------------------------------------
# IVF (inverted-file) index: coarse k-means cells, probe nearest cells
# ---------------------------------------------------------------------------


def kmeans_codebook(sample: np.ndarray, n_cells: int = 16, iters: int = 10,
                    seed: int = 13) -> np.ndarray:
    """Deterministic spherical k-means over an ordered sample matrix.

    Pure numpy, no Spark: the SQL-mirror oracle for ivf_topk re-trains
    the identical codebook from the same ordered sample (the sample
    ordering is md5(id), expressible in both Spark and DuckDB), so the
    result depends only on (sample rows + order, n_cells, iters, seed).
    """
    sample = np.asarray(sample, dtype=np.float64)
    sample = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), size=n_cells, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / max(np.linalg.norm(v), 1e-12)
    return centroids


def train_ivf_centroids(embeddings: DataFrame, n_cells: int = 16,
                        sample_size: int = 4096, iters: int = 10,
                        seed: int = 13, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> np.ndarray:
    """Deterministic k-means on a driver-side sample (the standard IVF
    recipe: the codebook is tiny and trained once, then broadcast).

    The sample is taken in md5(id) order — a bare ``limit(n)`` reads only
    the first partition(s), which biases the codebook whenever data is
    partition-correlated (e.g. clustered writes); hashing the id both
    de-biases the sample and makes the ordering reproducible in any SQL
    engine, which is what lets the driver oracle mirror the codebook.
    """
    sample = np.array(
        [
            r[0]
            for r in embeddings.select(vec_col)
            .orderBy(F.md5(F.col(id_col).cast("string")))
            .limit(sample_size)
            .collect()
        ],
        dtype=np.float64,
    )
    return kmeans_codebook(sample, n_cells, iters, seed)


def ivf_assign(embeddings: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding") -> DataFrame:
    """Add a ``cell`` column: nearest centroid by cosine (one Arrow hop,
    numpy matmul per batch)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    cent = centroids  # captured in closure, shipped once per worker

    def _cells(vecs):
        # no row normalization: argmax over unit centroids is scale-
        # invariant, and raw dot products keep float behavior closest to
        # the SQL oracle mirror (list_dot_product over the raw vectors)
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(np.argmax(m @ cent.T, axis=1).astype(np.int32))

    cell_udf = pandas_udf(_cells, IntegerType())

    return embeddings.withColumn("cell", cell_udf(F.col(vec_col)))


def ivf_topk(embeddings: DataFrame, query: list[float], k: int = 10,
             n_cells: int = 16, n_probe: int = 3, seed: int = 13,
             vec_col: str = "embedding", id_col: str = "vec_id",
             centroids: np.ndarray | None = None) -> DataFrame:
    """Approximate top-k: scan only the n_probe cells nearest the query,
    exact cosine rescoring inside them (scans ~n_probe/n_cells of the data).

    On a persistent index the assignment is precomputed and partitioned by
    cell → partition pruning makes the probe a metadata operation.
    """
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_cells, seed=seed,
                                        vec_col=vec_col, id_col=id_col)
    q = np.asarray(query, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    # stable sort: ties break on the lower cell index, matching the SQL
    # oracle's ORDER BY dot DESC, i ASC
    probes = np.argsort(-(centroids @ q), kind="stable")[:n_probe].tolist()
    assigned = ivf_assign(embeddings, centroids, vec_col)
    return (
        assigned.where(F.col("cell").isin(probes))
        .select(
            F.col(id_col),
            cosine_similarity_col(F.col(vec_col), query).alias("_score"),
        )
        .orderBy(F.desc("_score"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("_score", 4).alias("score"))
    )


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                             use_lsh: bool = True, n_bits: int = 8, seed: int = 11,
                             vec_col: str = "embedding", id_col: str = "vec_id",
                             dim: int | None = None, n_blocks: int = 32) -> DataFrame:
    """Pairs (a < b) with cosine ≥ threshold.

    use_lsh=True joins on the LSH bucket first (same-bucket candidates only —
    the sub-quadratic 100 TB path; slightly lossy for pairs straddling a
    hyperplane).  use_lsh=False is exact: blocked-GEMM all-pairs.
    """
    if not use_lsh:
        return _near_dup_blocked(embeddings, threshold, vec_col, id_col, n_blocks)

    if dim is None:
        raise ValueError("dim required when use_lsh=True")
    norm = _normalized(embeddings, vec_col, id_col)
    sigs = hyperplane_signatures(
        norm.withColumnRenamed("v", vec_col), dim, n_bits, seed, vec_col
    ).withColumnRenamed(vec_col, "v")
    a = sigs.select(F.col("id").alias("a"), F.col("v").alias("va"), "bucket")
    b = sigs.select(F.col("id").alias("b"), F.col("v").alias("vb"), "bucket")
    cands = a.join(b, "bucket").where(F.col("a") < F.col("b"))
    return (
        cands.withColumn("cosine", F.round(_dot(F.col("va"), F.col("vb")), 4))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
        .dropDuplicates(["a", "b"])
    )


def embedding_centroids(embs: DataFrame, group_col: str = "label",
                        vec_col: str = "embedding",
                        decimals: int = 4) -> DataFrame:
    """Per-group element-wise centroid → long form (group, dim, c).

    posexplode + two-phase hash aggregate: the map-side partial combine on
    (group, dim) reduces the exploded n×dim rows before the shuffle, so
    wide vectors don't multiply shuffle volume by n.  Values are rounded
    (float-sum order drift; CLAUDE.md rule 7) — round on BOTH sides of any
    cross-engine comparison."""
    return (
        embs.select(F.col(group_col).alias("grp"),
                    F.posexplode(F.col(vec_col)).alias("dim", "v"))
        .groupBy("grp", "dim")
        .agg(F.round(F.avg(F.col("v").cast("double")), decimals).alias("c"))
    )


def lsh_bucket_topk_batch(embeddings: DataFrame, queries: DataFrame,
                          k: int = 10, n_bits: int = 8, probes: int = 3,
                          seed: int = 11, vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          query_id_col: str = "query_id",
                          query_vec_col: str = "embedding") -> DataFrame:
    """Batch ANN: top-k neighbors for EVERY query vector in one job — the
    retrieval workload (RAG lookups, near-dup candidate search for a whole
    new shard) rather than one driver-side vector.

    Plan shape: corpus bucketed once (n_bits hyperplane signs, pure
    Catalyst), queries bucketed the same way + multiprobe buckets exploded
    (probes rows per query), a bucket equi-join generates candidates, and
    a per-query window keeps the top k by exact cosine — no crossJoin,
    no driver-side loop over queries, every stage JVM-side.  At 2^n_bits
    buckets the join touches ~probes/2^n_bits of |corpus|x|queries|.
    """
    from pyspark.sql.window import Window

    dim = len(_first_vec(queries, query_vec_col))
    planes = _hyperplanes(dim, n_bits, seed)

    corpus = hyperplane_signatures(embeddings, dim, n_bits, seed, vec_col) \
        .select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cv"),
                "bucket")

    # query-side signature + multiprobe: base bucket plus the (probes-1)
    # lowest-margin bit flips, as arrays of per-bit expressions
    qv = F.col(query_vec_col)
    bits = [
        _dot(qv, F.array(*[F.lit(float(v)) for v in plane]))
        for plane in planes
    ]
    base = sum(
        (F.when(b > 0, F.lit(1 << i)).otherwise(F.lit(0))
         for i, b in enumerate(bits)), F.lit(0))
    margin_idx = F.array_sort(F.array(*[
        F.struct(F.abs(b).alias("m"), F.lit(i).alias("i"))
        for i, b in enumerate(bits)
    ]))
    flips = F.transform(
        F.slice(margin_idx, 1, max(0, probes - 1)),
        # shiftleft needs a literal shift; 2^i via pow is exact for i<2^52
        lambda s: F.pow(F.lit(2.0), s["i"].cast("double")).cast("long"))
    probeset = F.array_union(F.array(base.cast("long")),
                             F.transform(flips, lambda f: f.bitwiseXOR(
                                 base.cast("long"))))
    qb = (
        queries.select(F.col(query_id_col).alias("_qid"),
                       qv.alias("_qv"), F.explode(probeset).alias("bucket"))
    )
    cand = qb.join(corpus, "bucket")
    scored = cand.select(
        "_qid", "_cid",
        _dot(F.col("_qv"), F.col("_cv")).alias("_dot"),
        (_norm(F.col("_qv")) * _norm(F.col("_cv"))).alias("_nn"),
    ).select(
        "_qid", "_cid",
        F.when(F.col("_nn") > 0, F.col("_dot") / F.col("_nn"))
        .otherwise(F.lit(0.0)).alias("_score"),
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("_score"), F.asc("_cid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(F.col("_qid").alias(query_id_col),
                F.col("_cid").alias(id_col),
                F.round("_score", 4).alias("score"),
                F.col("_rn").alias("rank"))
    )


def _first_vec(df: DataFrame, col: str) -> list:
    row = df.select(col).first()
    if row is None:
        raise ValueError("empty query frame")
    return list(row[0])


def embedding_clusters(embeddings: DataFrame, threshold: float = 0.9,
                       n_bits: int = 8, seed: int = 11,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> DataFrame:
    """Cluster near-duplicate embeddings and pick one canonical vector per
    cluster — the embedding twin of operators/dedup.dedup_clusters (pairs
    alone don't dedup: A~B, B~C must collapse to one kept vector even when
    A~C was never a candidate pair).

    Hyperplane-LSH candidate pairs (exact-cosine verified ≥ threshold, see
    :func:`embedding_near_dup_pairs`) become edges; large-star/small-star
    connected components assign the MINIMUM reachable id as cluster id;
    singletons self-label.  Output: (id, cluster_id, is_canonical)."""
    from trident_spark.pipeline.cc import connected_components

    dim = len(_first_vec(embeddings, vec_col))
    pairs = embedding_near_dup_pairs(embeddings, threshold=threshold,
                                     use_lsh=True, n_bits=n_bits, dim=dim,
                                     vec_col=vec_col, id_col=id_col)
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    labels = connected_components(edges)
    return (
        embeddings.select(F.col(id_col))
        .join(labels, embeddings[id_col] == labels["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
    )
