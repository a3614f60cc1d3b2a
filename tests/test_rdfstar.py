"""RDF 1.2 triple terms: reify / serialize / parse / unquote.

Reference roadmap: RDF 1.2 + SPARQL 1.2 (/root/reference/README.md:33-34).
"""

from pyspark.sql import functions as F

from trident_spark.pipeline import rdfstar, sinks

COLS = ("subj string, pred string, obj_lexical string, obj_kind string, "
        "obj_datatype string, obj_lang string, src string")

ROWS = [
    ("http://x/d1", "http://p/provider", "http://x/org1", "iri",
     None, None, "src1"),
    ("http://x/d2", "http://p/title", 'He said "hi"\n', "literal",
     None, None, "src2"),
    ("http://x/d3", "http://p/count", "42", "literal",
     "http://www.w3.org/2001/XMLSchema#integer", None, "src3"),
    ("_:b9", "http://p/note", "from a blank", "literal",
     None, None, "src4"),
]


def _graph(spark):
    return spark.createDataFrame(ROWS, COLS)


def test_reify_emits_pair_per_triple(spark):
    out = rdfstar.reify(_graph(spark), "http://p/source", "src")
    rows = out.collect()
    assert len(rows) == 2 * len(ROWS)
    reifies = [r for r in rows if r["pred"] == rdfstar.RDF_REIFIES]
    anns = [r for r in rows if r["pred"] == "http://p/source"]
    assert len(reifies) == len(anns) == len(ROWS)
    assert all(r["obj_kind"] == "triple" for r in reifies)
    assert all(r["obj_lexical"].startswith("<<(") for r in reifies)
    # reifier ids pair up 1:1 between the two statement kinds
    assert {r["subj"] for r in reifies} == {r["subj"] for r in anns}


def test_reifier_is_deterministic_content_hash(spark):
    a = {r["subj"] for r in
         rdfstar.reify(_graph(spark), "http://p/source", "src").collect()}
    b = {r["subj"] for r in
         rdfstar.reify(_graph(spark).repartition(7), "http://p/source",
                       "src").collect()}
    assert a == b  # partitioning-independent (content-hashed)


def test_ntriples_roundtrip_with_triple_terms(spark):
    re1 = rdfstar.reify(_graph(spark), "http://p/source", "src")
    back = sinks.from_ntriples(sinks.to_ntriples(re1))
    assert {tuple(r) for r in re1.collect()} == \
           {tuple(r) for r in back.collect()}


def test_nquads_roundtrip_with_triple_terms(spark):
    re1 = rdfstar.reify(_graph(spark), "http://p/source", "src") \
        .withColumn("g", F.lit("http://g/prov"))
    back = sinks.from_nquads(sinks.to_nquads(re1, "g"))
    orig = {tuple(r) for r in re1.select(
        "subj", "pred", "obj_lexical", "obj_kind", "obj_datatype",
        "obj_lang", "g").collect()}
    assert orig == {tuple(r) for r in back.collect()}


def test_unquote_recovers_components(spark):
    re1 = rdfstar.reify(_graph(spark), "http://p/source", "src")
    uq = {(r["q_subj"], r["q_pred"], r["q_obj_lexical"], r["q_obj_kind"],
           r["q_obj_datatype"]) for r in rdfstar.unquote(re1).collect()}
    assert uq == {
        ("http://x/d1", "http://p/provider", "http://x/org1", "iri", None),
        ("http://x/d2", "http://p/title", 'He said "hi"\n', "literal", None),
        ("http://x/d3", "http://p/count", "42", "literal",
         "http://www.w3.org/2001/XMLSchema#integer"),
        ("_:b9", "http://p/note", "from a blank", "literal", None),
    }


def test_unquote_joins_back_to_annotations(spark):
    """The documented SPARQL-1.2-less query path: unquote + join."""
    re1 = rdfstar.reify(_graph(spark), "http://p/source", "src")
    anns = re1.where(F.col("pred") == "http://p/source").select(
        "subj", F.col("obj_lexical").alias("src"))
    joined = rdfstar.unquote(re1).join(anns, "subj")
    got = {(r["q_subj"], r["src"]) for r in joined.collect()}
    assert got == {("http://x/d1", "src1"), ("http://x/d2", "src2"),
                   ("http://x/d3", "src3"), ("_:b9", "src4")}


def test_nested_reification_roundtrip(spark):
    re1 = rdfstar.reify(_graph(spark), "http://p/source", "src")
    re2 = rdfstar.reify(re1.withColumn("lvl", F.lit("meta")),
                        "http://p/level", "lvl")
    back = sinks.from_ntriples(sinks.to_ntriples(re2))
    assert {tuple(r) for r in re2.collect()} == \
           {tuple(r) for r in back.collect()}
    # the nested inner object parses one level: kind 'triple', verbatim
    inner = {r["q_obj_kind"] for r in rdfstar.unquote(re2).collect()}
    assert inner == {"literal", "triple"}


def test_parse_triple_term_rejects_malformed():
    assert rdfstar.parse_triple_term("<a> <b> <c>") is None
    assert rdfstar.parse_triple_term("<<( <a> <b> )>>") is None
    assert rdfstar.parse_triple_term(
        "<<( <<( <a> <b> <c> )>> <p> <o> )>>") is None  # subject position


def test_turtle_renders_triple_terms(spark):
    re1 = rdfstar.reify(_graph(spark), "http://p/source", "src")
    blocks = "\n".join(r["block"] for r in sinks.to_turtle(re1).collect())
    assert "<<(" in blocks and ")>>" in blocks
    # triple term emitted verbatim, not quoted as a literal
    assert '"<<(' not in blocks
