"""Connected components on DataFrames (C13): canonicalization of sameAs
clusters.

Two implementations:

- ``connected_components`` (default) — alternating **large-star/small-star**
  (Kiveris et al., "Connected Components in MapReduce and Beyond"):
  converges in O(log² n) rounds *independent of graph diameter*, the right
  asymptotics for web-scale graphs with long sameAs chains.  Each half-round
  is a groupBy(min) + join — no collect_list, so hub nodes cause no
  single-task blowup.
- ``connected_components_labelprop`` — min-label propagation
  (GraphFrames-style), O(diameter) rounds; simpler, fine for the shallow
  star-shaped clusters alias linking produces, kept as the cross-check.

Both truncate lineage with localCheckpoint per round (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    return (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .where(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _star_round(sym: DataFrame, large: bool) -> DataFrame:
    """One large-star (connect strictly-larger neighbours to the min) or
    small-star (connect smaller-or-equal neighbours and self to the min)."""
    mins = sym.groupBy("u").agg(F.min("v").alias("nmin"))
    m = mins.select("u", F.least(F.col("u"), F.col("nmin")).alias("m"))
    j = sym.join(m, "u")
    if large:
        out = j.where(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        keep = m.select("u", F.col("m").alias("v"))  # (u, m) keeps u attached
        out = out.union(keep)
    else:
        out = j.where(F.col("v") <= F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        out = out.union(m.select("u", F.col("m").alias("v")))
    return out.where(F.col("u") != F.col("v")).dropDuplicates(["u", "v"])


def connected_components_star(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Alternating large-star/small-star → labels(node, component)."""
    cur = _symmetrize(edges).localCheckpoint(eager=True)
    # nodes come from the raw edges so self-loop-only nodes (filtered out of
    # the symmetrized edge set) still receive their own-id label
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    prev_hash = None
    for _ in range(max_iter):
        cur = _star_round(_symmetrize(cur, "u", "v"), large=True)
        cur = _star_round(_symmetrize(cur, "u", "v"),
                          large=False).localCheckpoint(eager=True)
        h = cur.agg(
            F.count("*").alias("n"), F.bit_xor(F.xxhash64("u", "v")).alias("x")
        ).first()
        sig = (h["n"], h["x"])
        if sig == prev_hash:
            break
        prev_hash = sig
    # converged: every non-min node u has edge (u, component_min)
    labels = cur.groupBy(F.col("u").alias("node")).agg(F.min("v").alias("component"))
    # minima label themselves; isolated self-loop nodes keep their own id
    return (
        nodes.join(labels, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """edges(src long, dst long) → labels(node long, component long);
    component = min node id (deterministic).  Uses large-star/small-star."""
    return connected_components_star(edges, max_iter)


def connected_components_labelprop(edges: DataFrame, max_iter: int = 20) -> DataFrame:
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
