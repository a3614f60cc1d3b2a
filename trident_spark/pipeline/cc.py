"""Connected components on DataFrames (C13): canonicalization of sameAs
clusters via iterative min-label propagation (GraphFrames-style).

Algorithm: every node starts labelled with its own id; each round, a node's
label becomes the min over itself and its neighbours; stop when no label
changes.  Rounds are O(graph diameter) — sameAs clusters from alias linking
are stars, so 2-3 rounds in practice.  Each round is one shuffle
(groupBy node); lineage is truncated with localCheckpoint so the plan does
not grow across iterations (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """edges(src long, dst long) → labels(node long, component long).

    component = min node id of the connected component (deterministic).
    """
    # undirected: symmetrize once, dedupe
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )

    labels = (
        sym.select(F.col("src").alias("node"))
        .union(sym.select(F.col("dst").alias("node")))
        .dropDuplicates(["node"])
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # propagate: each node receives the labels of its neighbours
        nbr_labels = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .select(F.col("src").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(nbr_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "old"), "node")
            .where(F.col("component") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonical_map(labels: DataFrame, terms: DataFrame) -> DataFrame:
    """labels + term table → (term_id, canonical_term_id, canonical_iri).

    The canonical representative of each component is its min term id; the
    lexical form is looked up once per component (tiny join).
    """
    reps = labels.select(
        F.col("node").alias("term_id"), F.col("component").alias("canonical_term_id")
    )
    rep_terms = terms.select(
        F.col("term_id").alias("canonical_term_id"),
        F.col("lexical").alias("canonical_iri"),
    )
    return reps.join(rep_terms, "canonical_term_id", "left")


def rewrite_triples(triples: DataFrame, labels: DataFrame) -> DataFrame:
    """Rewrite subj/obj ids to their canonical component representative.

    Left joins against the (small) label table; unlabeled terms (no sameAs
    evidence) keep their own id.  Broadcast when the cluster map is small —
    Spark's AQE will pick broadcast automatically below the threshold.
    """
    sub_map = labels.select(F.col("node").alias("subj_id"),
                            F.col("component").alias("subj_canon"))
    obj_map = labels.select(F.col("node").alias("obj_id"),
                            F.col("component").alias("obj_canon"))
    return (
        triples.join(sub_map, "subj_id", "left")
        .join(obj_map, "obj_id", "left")
        .select(
            F.coalesce("subj_canon", "subj_id").alias("subj_id"),
            "pred_id",
            F.coalesce("obj_canon", "obj_id").alias("obj_id"),
            *[c for c in triples.columns if c not in ("subj_id", "pred_id", "obj_id")],
        )
    )
