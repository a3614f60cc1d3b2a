"""BGP SPARQL engine tests over a small lexical-triples graph."""

import pytest

from trident_spark.query.sparql import SparqlError, query

COLS = ("subj string, pred string, obj_lexical string, obj_kind string, "
        "obj_datatype string, obj_lang string")

SCHEMA = "https://schema.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


@pytest.fixture(scope="module")
def graph(spark):
    rows = [
        ("http://x/alice", RDF_TYPE, SCHEMA + "Person", "iri", None, None),
        ("http://x/alice", SCHEMA + "name", "Alice", "literal", None, None),
        ("http://x/alice", SCHEMA + "worksFor", "http://x/acme", "iri", None, None),
        ("http://x/bob", RDF_TYPE, SCHEMA + "Person", "iri", None, None),
        ("http://x/bob", SCHEMA + "name", "Bob", "literal", None, None),
        ("http://x/bob", SCHEMA + "worksFor", "http://x/globex", "iri", None, None),
        ("http://x/acme", RDF_TYPE, SCHEMA + "Organization", "iri", None, None),
        ("http://x/acme", SCHEMA + "name", "Acme", "literal", None, None),
        ("http://x/globex", RDF_TYPE, SCHEMA + "Organization", "iri", None, None),
        ("http://x/globex", SCHEMA + "name", "Globex", "literal", None, None),
    ]
    return spark.createDataFrame(rows, COLS).cache()


def test_single_pattern(spark, graph):
    df = query(graph, """
        PREFIX schema: <https://schema.org/>
        SELECT ?p WHERE { ?p a schema:Person . }
    """)
    assert {r["p"] for r in df.collect()} == {"http://x/alice", "http://x/bob"}


def test_two_pattern_join(spark, graph):
    df = query(graph, """
        PREFIX schema: <https://schema.org/>
        SELECT ?person ?orgname WHERE {
            ?person schema:worksFor ?org .
            ?org schema:name ?orgname .
        }
    """)
    got = {(r["person"], r["orgname"]) for r in df.collect()}
    assert got == {("http://x/alice", "Acme"), ("http://x/bob", "Globex")}


def test_literal_object_pattern(spark, graph):
    df = query(graph, """
        PREFIX schema: <https://schema.org/>
        SELECT ?who WHERE { ?who schema:name "Alice" . }
    """)
    assert [r["who"] for r in df.collect()] == ["http://x/alice"]


def test_filter_and_order_and_limit(spark, graph):
    df = query(graph, """
        PREFIX schema: <https://schema.org/>
        SELECT DISTINCT ?n WHERE {
            ?s a schema:Person .
            ?s schema:name ?n .
            FILTER(?n != "Bob")
        } ORDER BY ?n LIMIT 5
    """)
    assert [r["n"] for r in df.collect()] == ["Alice"]


def test_three_pattern_chain(spark, graph):
    df = query(graph, """
        PREFIX schema: <https://schema.org/>
        SELECT ?pn ?on WHERE {
            ?p a schema:Person .
            ?p schema:name ?pn .
            ?p schema:worksFor ?o .
            ?o schema:name ?on .
        } ORDER BY ?pn
    """)
    assert [(r["pn"], r["on"]) for r in df.collect()] == [
        ("Alice", "Acme"), ("Bob", "Globex")]


def test_select_star(spark, graph):
    df = query(graph, """
        PREFIX schema: <https://schema.org/>
        SELECT * WHERE { ?s schema:worksFor ?o . }
    """)
    assert sorted(df.columns) == ["o", "s"]


def test_errors(spark, graph):
    with pytest.raises(SparqlError):
        query(graph, "ASK { ?s ?p ?o }")
    with pytest.raises(SparqlError):
        query(graph, "SELECT ?x WHERE { ?s <http://p> ?o . }")


def test_duplicate_triples_do_not_multiply_solutions(spark, graph):
    doubled = graph.union(graph)
    df = query(doubled, """
        PREFIX schema: <https://schema.org/>
        SELECT ?person ?orgname WHERE {
            ?person schema:worksFor ?org .
            ?org schema:name ?orgname .
        }
    """)
    rows = [(r["person"], r["orgname"]) for r in df.collect()]
    assert sorted(rows) == [("http://x/alice", "Acme"), ("http://x/bob", "Globex")]


def test_ground_pattern_existence_check(spark, graph):
    df = query(graph, """
        PREFIX schema: <https://schema.org/>
        SELECT ?n WHERE {
            <http://x/acme> a schema:Organization .
            <http://x/acme> schema:name ?n .
        }
    """)
    assert [r["n"] for r in df.collect()] == ["Acme"]
