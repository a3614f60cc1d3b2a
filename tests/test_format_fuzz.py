"""Adversarial round-trip fuzz for every serialization format.

One seeded generator produces rows with hostile term content (quotes,
backslashes, control chars, the formats' own delimiters, astral unicode,
langs/datatypes, grammar-edge blank labels); each format must
serialize → parse back to the identical term set.  The driver oracles
only exercise corpus-shaped data — this guards the escaping/tokenizing
edge cases.
"""

import random

import pytest
from pyspark.sql import functions as F

QCOLS = ("subj string, pred string, obj_lexical string, obj_kind string, "
         "obj_datatype string, obj_lang string, graph string")

_HOSTILE_LITERALS = [
    'quote " inside', "back\\slash", "new\nline", "tab\tand\rcr",
    "pipe |} close", "open {| ann", "triple <<( term )>>", "angle <s>",
    "semi ; dot . comma ,", "braces { }", "brackets [ ] ( )",
    "astral 😀🜁", "combining é é", "ümlauts ß", "'single'",
    "ends with backslash \\", '"', "\\", "a@b", "x^^y", "_:fake",
    "<http://not-an-iri/>", "​ zero width", "   leading spaces",
]


def _gen_rows(n=120, seed=7, with_graph=True):
    rng = random.Random(seed)
    iris = [f"http://fuzz.example/r/{i}" for i in range(12)]
    preds = [f"http://fuzz.example/p/{i}" for i in range(6)]
    blanks = ["_:b1", "_:x_y", "_:gen-2", "_:r4.5a"]
    dts = [None, "http://www.w3.org/2001/XMLSchema#integer",
           "http://fuzz.example/dt"]
    langs = [None, "en", "en-GB", "zh-hant"]
    graphs = [None, "http://g/1", "http://g/2"] if with_graph else [None]
    rows = set()
    for _ in range(n):
        subj = rng.choice(iris + blanks)
        pred = rng.choice(preds)
        kind = rng.choice(["iri", "literal", "literal", "blank"])
        g = rng.choice(graphs)
        if kind == "iri":
            rows.add((subj, pred, rng.choice(iris), "iri", None, None, g))
        elif kind == "blank":
            rows.add((subj, pred, rng.choice(blanks), "blank", None, None, g))
        else:
            lex = rng.choice(_HOSTILE_LITERALS)
            lang = rng.choice(langs)
            dt = None if lang else rng.choice(dts)
            rows.add((subj, pred, lex, "literal", dt, lang, g))
    return sorted(rows)


@pytest.fixture(scope="module")
def hostile_quads(spark):
    return spark.createDataFrame(_gen_rows(), QCOLS).cache()


@pytest.fixture(scope="module")
def hostile_triples(hostile_quads):
    return hostile_quads.drop("graph").distinct().cache()


def _setof(df):
    return {tuple(r) for r in df.collect()}


def test_ntriples_roundtrip_hostile(spark, hostile_triples):
    from trident_spark.pipeline.sinks import from_ntriples, to_ntriples

    back = from_ntriples(to_ntriples(hostile_triples))
    assert _setof(back) == _setof(hostile_triples)


def test_nquads_roundtrip_hostile(spark, hostile_quads):
    from trident_spark.pipeline.sinks import from_nquads, to_nquads

    back = from_nquads(to_nquads(hostile_quads, graph_col="graph"))
    assert _setof(back) == _setof(hostile_quads)


def test_turtle_roundtrip_hostile(spark, hostile_triples):
    from trident_spark.pipeline.sinks import to_turtle, turtle_header
    from trident_spark.pipeline.turtle import from_turtle

    blocks = to_turtle(hostile_triples)
    docs = blocks.select(F.concat(F.lit(turtle_header() + "\n"),
                                  F.col("block")).alias("doc"))
    back = from_turtle(docs)
    assert _setof(back) == _setof(hostile_triples)


def test_trig_roundtrip_hostile(spark, hostile_quads):
    from trident_spark.pipeline.sinks import to_trig, turtle_header
    from trident_spark.pipeline.turtle import from_trig

    chunks = to_trig(hostile_quads)
    docs = chunks.select(F.concat(F.lit(turtle_header() + "\n"),
                                  F.col("chunk")).alias("doc"))
    back = from_trig(docs)
    assert _setof(back) == _setof(hostile_quads)


def test_rdfxml_roundtrip_hostile(spark, hostile_triples):
    """RDF/XML with hostile term content.  The format itself cannot name
    property elements whose IRI lacks an XML-NCName tail (a documented
    RDF/XML limitation — rdflib/Jena raise too), so preds are remapped to
    QName-compatible forms; everything else stays hostile."""
    from trident_spark.pipeline.rdfxml import from_rdfxml, to_rdfxml

    fixed = hostile_triples.withColumn(
        "pred", F.concat(F.col("pred"), F.lit("x")))
    back = from_rdfxml(to_rdfxml(fixed))
    assert _setof(back) == _setof(fixed)


def test_rdfxml_unserializable_pred_is_loud(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from trident_spark.pipeline.rdfxml import to_rdfxml

    df = spark.createDataFrame(
        [("http://x/a", "http://fuzz.example/p/0", "v", "literal",
          None, None)],
        "subj string, pred string, obj_lexical string, obj_kind string, "
        "obj_datatype string, obj_lang string")
    with pytest.raises((PythonException, Py4JJavaError),
                       match="local part"):
        to_rdfxml(df).write.format("noop").mode("overwrite").save()


def test_jsonld_roundtrip_hostile(spark, hostile_triples):
    from trident_spark.pipeline.jsonld import from_jsonld, to_jsonld

    back = from_jsonld(to_jsonld(hostile_triples))
    assert _setof(back) == _setof(hostile_triples)


def test_jsonld_quads_roundtrip_hostile(spark, hostile_quads):
    from trident_spark.pipeline.jsonld import (
        from_jsonld_quads, to_jsonld_quads,
    )

    back = from_jsonld_quads(to_jsonld_quads(hostile_quads))
    assert _setof(back) == _setof(hostile_quads)
