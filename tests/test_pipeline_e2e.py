"""End-to-end pipeline tests on the deterministic synthetic corpus:
P/R vs independently-derived golden triples, text invariant, N-Triples
round-trip, skolemization determinism, connected components, resume."""

import pytest
from pyspark.sql import functions as F

from trident_spark.pipeline import build_kg
from trident_spark.pipeline import cc, extract_stage, kg, lineage, sinks
from trident_spark.pipeline.alias_dict import alias_dict_df
from trident_spark.pipeline.pages import expected_triples_df, pages_df

N_PAGES = 300


@pytest.fixture(scope="module")
def corpus(spark):
    pages = pages_df(spark, N_PAGES, partitions=4).cache()
    expected = expected_triples_df(spark, N_PAGES, partitions=4).cache()
    pages.count(), expected.count()
    return pages, expected


@pytest.fixture(scope="module")
def result(spark, corpus):
    pages, _ = corpus
    return build_kg(pages, alias_dict=alias_dict_df(spark))


def test_text_invariant(result):
    assert extract_stage.text_invariant_violations(result.page_results).count() == 0


def test_precision_recall(corpus, result):
    _, expected = corpus
    key = ["subj", "pred", "obj_lexical", "obj_kind"]
    got = (
        result.skolemized
        .where(F.col("source") != "linking")  # golden covers extraction only
        .where(~F.col("subj").startswith(kg.SKOLEM_PREFIX))
        .where(F.col("obj_kind") != "blank")
        .select(*key).distinct()
    )
    exp = expected.select(*key).distinct()
    n_got, n_exp = got.count(), exp.count()
    n_match = got.join(exp, key).count()
    precision = n_match / n_got
    recall = n_match / n_exp
    assert precision >= 0.95, f"precision {precision:.4f}"
    assert recall >= 0.95, f"recall {recall:.4f}"


def test_latest_capture_wins(spark, corpus):
    pages, _ = corpus
    deduped = extract_stage.latest_capture(pages)
    assert deduped.groupBy("url").count().where("count > 1").count() == 0
    assert deduped.count() < pages.count()  # some urls repeat by design


def test_skolemization_deterministic(spark, corpus):
    pages, _ = corpus
    r1 = kg.skolemize(extract_stage.raw_triples(extract_stage.extract_pages(pages)))
    r2 = kg.skolemize(extract_stage.raw_triples(extract_stage.extract_pages(pages)))
    assert r1.exceptAll(r2).count() == 0
    assert r2.exceptAll(r1).count() == 0
    # no unskolemized blank labels survive
    assert r1.where(F.col("subj").startswith("_:")).count() == 0
    assert r1.where(F.col("obj_kind") == "blank").count() == 0


def test_term_ids_no_collisions(result):
    assert kg.assert_no_id_collisions(result.terms) == 0


def test_triples_reference_terms(result):
    # every id in triples resolves in the term table (pre-CC ids rewritten to
    # component minima are also term ids because components are term nodes)
    ids = (
        result.triples.select(F.col("subj_id").alias("id"))
        .union(result.triples.select("pred_id"))
        .union(result.triples.select("obj_id"))
        .distinct()
    )
    missing = ids.join(result.terms, ids.id == result.terms.term_id, "left_anti")
    assert missing.count() == 0


def test_entity_linking_links_orgs(result):
    links = result.same_as.where(F.col("obj_lexical").contains("/org/"))
    assert links.count() > 0
    # ambiguous aliases resolved to exactly one candidate per mention
    dup = result.same_as.groupBy("subj", "obj_lexical").count()
    assert dup.where("count > 1").count() == 0


def test_connected_components_small_graph(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "src long, dst long"
    )
    labels = {r["node"]: r["component"]
              for r in cc.connected_components(edges).collect()}
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[10] == labels[11] == 10


def test_ntriples_roundtrip(result):
    nt = sinks.to_ntriples(result.skolemized)
    back = sinks.from_ntriples(nt)
    cols = ["subj", "pred", "obj_lexical", "obj_kind", "obj_datatype", "obj_lang"]
    orig = result.skolemized.select(*cols).distinct()
    rt = back.select(*cols).distinct()
    assert orig.exceptAll(rt).count() == 0, "triples lost in round-trip"
    assert rt.exceptAll(orig).count() == 0, "triples gained in round-trip"


def test_lineage_resume(spark, corpus):
    pages, _ = corpus
    lin = lineage.compute_lineage(pages.limit(100), "extract", n_buckets=16)
    assert lin.count() <= 16
    remaining = lineage.resume_filter(pages, lin, "extract", n_buckets=16)
    # all buckets appear in the first 100 pages with high probability → most
    # pages filtered; at minimum the filter is a strict subset
    assert remaining.count() < pages.count()
    done_buckets = {r["bucket"] for r in lin.collect()}
    left = lineage.with_bucket(remaining, 16).select("bucket").distinct().collect()
    assert all(r["bucket"] not in done_buckets for r in left)


def test_turtle_serialization(spark):
    rows = [
        ("http://x/alice", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "https://schema.org/Person", "iri", None, None),
        ("http://x/alice", "https://schema.org/name", "Alice", "literal", None, None),
        ("http://x/alice", "https://schema.org/age", "30", "literal",
         "http://www.w3.org/2001/XMLSchema#integer", None),
        ("http://x/alice", "https://schema.org/bio", "hi", "literal", None, "en"),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj_lexical string, obj_kind string, "
              "obj_datatype string, obj_lang string")
    blocks = [r["block"] for r in sinks.to_turtle(df).collect()]
    assert len(blocks) == 1
    b = blocks[0]
    assert b.startswith("<http://x/alice> ")
    assert "rdf:type schema:Person" in b
    assert 'schema:name "Alice"' in b
    assert 'schema:age "30"^^xsd:integer' in b
    assert 'schema:bio "hi"@en' in b
    assert b.rstrip().endswith(".")
    assert "@prefix schema:" in sinks.turtle_header()


def test_literal_lang_normalization(spark):
    rows = [
        ("http://x/a", "https://schema.org/bio", "hallo", "literal", None, "EN-us"),
        ("http://x/a", "https://schema.org/bio", "qapla", "literal", None, "i-klingon"),
        ("http://x/a", "https://schema.org/bio", "x", "literal", None, "not_a_tag"),
        ("http://x/a", "https://schema.org/name", "A", "literal", None, None),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj_lexical string, obj_kind string, "
              "obj_datatype string, obj_lang string")
    out = {r["obj_lexical"]: r["obj_lang"]
           for r in kg.normalize_literal_langs(df).collect()}
    assert out == {"hallo": "en-US", "qapla": "tlh", "x": None, "A": None}


def test_full_pipeline_matches_python_golden(spark):
    """build_kg (extract → link → CC → encode → dedup) must reproduce the
    independent pure-Python golden (pipeline/golden.py) exactly."""
    from trident_spark.pipeline import build_kg
    from trident_spark.pipeline.alias_dict import alias_dict_df
    from trident_spark.pipeline.golden import full_pipeline_golden_ids
    from trident_spark.pipeline.pages import pages_df

    result = build_kg(pages_df(spark, 120), alias_dict=alias_dict_df(spark))
    got = sorted((r[0], r[1], r[2]) for r in
                 result.triples.select("subj_id", "pred_id", "obj_id").collect())
    assert got == full_pipeline_golden_ids(120)


def test_python_xxhash64_matches_spark(spark):
    from pyspark.sql import functions as F

    from trident_spark.util_xxhash import spark_xxhash64

    rows = [("", None), ("a", "b"), ("k" * 31, "v" * 40),
            ("iri", "https://schema.org/name"), ("ünïcødé ✓", "x")]
    df = spark.createDataFrame(rows, "a string, b string")
    got = df.select(F.xxhash64("a", "b").alias("h2"),
                    F.xxhash64("a").alias("h1")).collect()
    for (a, b), r in zip(rows, got):
        assert r["h2"] == spark_xxhash64(a, b)
        assert r["h1"] == spark_xxhash64(a)
    longs = [0, 1, -5, 2**62, -(2**62)]
    dfl = spark.createDataFrame([(x,) for x in longs], "x long")
    for x, r in zip(longs, dfl.select(F.xxhash64("x").alias("h")).collect()):
        assert r["h"] == spark_xxhash64(x)


def test_sink_parquet_roundtrip(spark, tmp_path):
    from trident_spark.pipeline.catalog import Sink

    sink = Sink(spark, str(tmp_path))
    df = spark.range(5).withColumnRenamed("id", "x")
    sink.write(df, "t", mode="overwrite")
    sink.write(df, "t", mode="append")
    assert sink.read("t").count() == 10


def test_sink_iceberg_api_calls(spark, monkeypatch):
    """The Iceberg path can't run in the sandbox (no runtime jar); verify
    the DataFrameWriterV2 call sequence with a recording stub instead."""
    from trident_spark.pipeline.catalog import Sink

    calls = []

    class FakeWriterV2:
        def __init__(self, ident):
            self.ident = ident

        def partitionedBy(self, *cols):
            calls.append(("partitionedBy", self.ident, len(cols)))
            return self

        def create(self):
            calls.append(("create", self.ident))

        def append(self):
            calls.append(("append", self.ident))

        def overwritePartitions(self):
            calls.append(("overwritePartitions", self.ident))

        def createOrReplace(self):
            calls.append(("createOrReplace", self.ident))

    df = spark.range(1)
    # patch the CONCRETE classes (Spark 4 routes through subclasses)
    monkeypatch.setattr(type(df), "writeTo",
                        lambda self, ident: FakeWriterV2(ident))
    exists = {"v": False}
    monkeypatch.setattr(type(spark.catalog), "tableExists",
                        lambda self, ident: exists["v"])

    sink = Sink(spark, "/unused", table_format="iceberg", catalog="kg")
    sink.write(df, "triples", partition_by=["bucket"])      # first: create
    exists["v"] = True
    sink.write(df, "triples")                               # then: append
    sink.write(df, "triples", mode="overwrite_partitions")  # idempotent rerun
    assert calls == [
        ("partitionedBy", "kg.kg.triples", 1),
        ("create", "kg.kg.triples"),
        ("append", "kg.kg.triples"),
        ("overwritePartitions", "kg.kg.triples"),
    ]


def test_sink_iceberg_requires_catalog(spark):
    import pytest as _pytest

    from trident_spark.pipeline.catalog import Sink

    with _pytest.raises(ValueError):
        Sink(spark, "/x", table_format="iceberg")


def test_link_score_col_matches_udf(spark):
    """Rule 8: the Catalyst link score must match the pandas-UDF reference
    bit-for-bit over edge inputs (empty/whitespace mentions, unicode
    spaces, repeated tokens, exact vs partial overlap)."""
    from trident_spark.pipeline.linking import link_score, link_score_col

    rows = [
        ("Acme Corp", "acme corp", 0.9),
        ("Acme  Corp ", "Acme Corp", 0.5),
        ("acme", "acme corp", 0.25),
        ("", "", 0.1),
        ("   ", "acme", 0.7),
        ("a b a b", "b a", 0.33),
        ("Globex Inc", "globex inc", 0.6),
        ("tab\tsep", "tab sep", 0.4),
        ("unrelated words", "acme corp", 1.0),
        ("Acme", "ACME", 0.0),
    ]
    df = spark.createDataFrame(rows, "mention string, alias string, prior double")
    out = df.select(
        link_score(F.col("mention"), F.col("alias"), F.col("prior")).alias("udf"),
        link_score_col(F.col("mention"), F.col("alias"), F.col("prior")).alias("col"),
    ).collect()
    for r in out:
        assert r["udf"] == r["col"], (r["udf"], r["col"])
