"""Snapshot set operations (C19): new-vs-old triple diff across runs, and
top-k hub diagnostics (C18)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TRIPLE_KEY = ["subj", "pred", "obj_lexical", "obj_kind", "obj_datatype", "obj_lang"]


def triple_diff(new: DataFrame, old: DataFrame) -> DataFrame:
    """→ (…triple cols…, change ∈ {added, removed}) between two snapshots."""
    n = new.select(*TRIPLE_KEY).distinct()
    o = old.select(*TRIPLE_KEY).distinct()
    added = n.exceptAll(o).withColumn("change", F.lit("added"))
    removed = o.exceptAll(n).withColumn("change", F.lit("removed"))
    return added.unionByName(removed)


def top_hubs(triples: DataFrame, k: int = 20) -> DataFrame:
    """Most-connected subjects (degree diagnostics; TakeOrderedAndProject)."""
    return (
        triples.groupBy("subj")
        .agg(F.count("*").alias("degree"))
        .orderBy(F.desc("degree"), F.asc("subj"))
        .limit(k)
    )
