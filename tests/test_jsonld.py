"""Standalone JSON-LD document reader/serializer round-trips."""

import pytest

from trident_spark.pipeline.jsonld import from_jsonld, parse_jsonld, to_jsonld

SCHEMA = "https://schema.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"
COLS = ("subj string, pred string, obj_lexical string, obj_kind string, "
        "obj_datatype string, obj_lang string")


def test_parse_standalone_document():
    doc = """{
      "@context": {"@vocab": "https://schema.org/", "ex": "http://ex.org/"},
      "@id": "http://x/alice", "@type": "Person",
      "name": "Alice", "ex:age": {"@value": "30", "@type": "ex:years"},
      "knows": {"@id": "http://x/bob"},
      "nick": [{"@value": "Al", "@language": "en"}]
    }"""
    got = set(parse_jsonld(doc))
    assert got == {
        ("http://x/alice", RDF_TYPE, SCHEMA + "Person", "iri", None, None),
        ("http://x/alice", SCHEMA + "name", "Alice", "literal", None, None),
        ("http://x/alice", "http://ex.org/age", "30", "literal",
         "http://ex.org/years", None),
        ("http://x/alice", SCHEMA + "knows", "http://x/bob", "iri",
         None, None),
        ("http://x/alice", SCHEMA + "nick", "Al", "literal", None, "en"),
    }


def test_parse_graph_array_and_nested_blank():
    doc = """[{"@context": "https://schema.org",
               "@graph": [{"@id": "http://x/a",
                           "https://schema.org/author":
                             {"https://schema.org/name": "Ada"}}]}]"""
    got = parse_jsonld(doc)
    edge = [t for t in got if t[1] == SCHEMA + "author"][0]
    assert edge[3] == "blank" and edge[2].startswith("_:j")
    assert (edge[2], SCHEMA + "name", "Ada", "literal", None, None) in got


def test_blank_labels_distinct_across_documents(spark):
    d = ('{"@id": "http://x/%s", "https://schema.org/author": '
         '{"https://schema.org/name": "%s"}}')
    docs = spark.createDataFrame([(d % (1, "p"),), (d % (2, "q"),)],
                                 "doc string")
    rows = from_jsonld(docs).collect()
    blanks = {r["obj_lexical"] for r in rows if r["obj_kind"] == "blank"}
    assert len(blanks) == 2


def test_roundtrip(spark):
    rows = [
        ("http://x/a", RDF_TYPE, SCHEMA + "Person", "iri", None, None),
        ("http://x/a", SCHEMA + "name", "Alice", "literal", None, None),
        ("http://x/a", SCHEMA + "name", "Ali", "literal", None, "en"),
        ("http://x/a", SCHEMA + "age", "30", "literal", XSD + "integer",
         None),
        ("http://x/a", SCHEMA + "knows", "_:b1", "blank", None, None),
        ("_:b1", SCHEMA + "name", 'esc"ape\nd', "literal", None, None),
        ("http://x/b", SCHEMA + "knows", "http://x/a", "iri", None, None),
    ]
    df = spark.createDataFrame(rows, COLS)
    back = from_jsonld(to_jsonld(df))
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in rows}


def test_triple_term_rejected(spark):
    df = spark.createDataFrame(
        [("http://x/a", "http://p/r", "<<( <s> <p> <o> )>>", "triple",
          None, None)], COLS)
    with pytest.raises(Exception, match="cannot serialize"):
        to_jsonld(df).collect()


def test_parse_jsonld_quads_dataset():
    """Named-graph nodes carry their @graph contents; bare wrappers and
    plain nodes are the default graph; a named-graph node's own extra
    properties assert in the default graph; wrapper @context folds."""
    from trident_spark.pipeline.jsonld import parse_jsonld_quads

    doc = """[
      {"@context": {"@vocab": "https://schema.org/"},
       "@id": "http://g/1",
       "@graph": [{"@id": "http://x/a", "name": "Alice"}],
       "label": "graph one"},
      {"@graph": [{"@id": "http://x/b",
                   "https://schema.org/name": "Bob"}]},
      {"@id": "http://x/c", "https://schema.org/name": "Cid"}
    ]"""
    got = set(parse_jsonld_quads(doc))
    assert ("http://x/a", SCHEMA + "name", "Alice", "literal", None, None,
            "http://g/1") in got
    assert ("http://x/b", SCHEMA + "name", "Bob", "literal", None, None,
            None) in got
    assert ("http://x/c", SCHEMA + "name", "Cid", "literal", None, None,
            None) in got
    # the named-graph node's own property lands in the DEFAULT graph
    assert ("http://g/1", SCHEMA + "label", "graph one", "literal", None,
            None, None) in got


def test_jsonld_quads_roundtrip(spark):
    """quads → to_jsonld_quads → from_jsonld_quads → identical quad set
    (default + named graphs, typed/lang literals, blank objects)."""
    from trident_spark.pipeline.jsonld import (
        from_jsonld_quads, to_jsonld_quads,
    )

    qcols = COLS + ", graph string"
    rows = [
        ("http://x/a", RDF_TYPE, SCHEMA + "Person", "iri", None, None,
         None),
        ("http://x/a", SCHEMA + "name", "Alice", "literal", None, "en",
         "http://g/1"),
        ("http://x/a", SCHEMA + "age", "30", "literal", XSD + "integer",
         None, "http://g/1"),
        ("http://x/a", SCHEMA + "knows", "_:b1", "blank", None, None,
         "http://g/2"),
        ("_:b1", SCHEMA + "name", "Bob", "literal", None, None,
         "http://g/2"),
    ]
    quads = spark.createDataFrame(rows, qcols)
    docs = to_jsonld_quads(quads)
    back = from_jsonld_quads(docs)
    assert {tuple(r) for r in back.collect()} == set(rows)
