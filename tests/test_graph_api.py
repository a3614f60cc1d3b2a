"""The reference's proposed Graph API (README.md:60-120), Python-native:
NewGraph / term constructors / Add / Serialize / Query with solution
iteration — reproduced over the Spark engine."""

import pytest

from trident_spark.graph import (
    Graph, new_blank, new_iri, new_literal, new_literal_with_datatype,
    new_literal_with_lang, new_triple,
)

FOAF = "http://xmlns.com/foaf/0.1/"


@pytest.fixture(scope="module")
def picasso_graph(spark):
    # the README example verbatim
    g = Graph.empty(spark)
    picasso = new_iri("http://example.org/artists#picasso")
    name = new_iri(FOAF + "name")
    guernica = new_iri("http://example.org/artworks#guernica")
    created = new_iri("http://purl.org/dc/terms/created")
    painter = new_iri("http://example.org/vocabulary#painter")
    g = g.add(new_triple(picasso, name, new_literal("Pablo Picasso")))
    g = g.add(new_triple(
        guernica, created,
        new_literal_with_datatype(
            "1937", "http://www.w3.org/2001/XMLSchema#gYear")))
    g = g.add(new_triple(guernica, painter, picasso))
    return g


def test_add_and_len(picasso_graph):
    assert len(picasso_graph) == 3
    # set semantics: re-adding is a no-op on the term set
    p = new_iri("http://example.org/artists#picasso")
    again = picasso_graph.add(new_triple(
        p, new_iri(FOAF + "name"), new_literal("Pablo Picasso")))
    assert len(again) == 3


def test_query_and_solutions(picasso_graph):
    sols = list(picasso_graph.solutions("""
        PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        SELECT ?artist ?name WHERE { ?artist foaf:name ?name . }
    """))
    assert len(sols) == 1
    assert sols[0]["name"].value() == "Pablo Picasso"
    assert sols[0]["name"].is_literal()
    assert sols[0]["artist"].value() == "http://example.org/artists#picasso"
    assert sols[0]["artist"].is_iri()


def test_serialize_roundtrip(spark, picasso_graph):
    ttl = picasso_graph.serialize("turtle")
    back = Graph.parse(spark, ttl, "turtle")
    assert {t.row() for t in back.triples()} == \
        {t.row() for t in picasso_graph.triples()}
    nt = picasso_graph.serialize("ntriples")
    back2 = Graph.parse(spark, nt, "ntriples")
    assert len(back2) == 3
    jl = picasso_graph.serialize("jsonld")
    back3 = Graph.parse(spark, jl, "jsonld")
    assert {t.row() for t in back3.triples()} == \
        {t.row() for t in picasso_graph.triples()}


def test_ask_update_construct(spark, picasso_graph):
    assert picasso_graph.ask(
        "ASK { ?s <http://example.org/vocabulary#painter> ?o }")
    g2 = picasso_graph.update("""
        PREFIX v: <http://example.org/vocabulary#>
        DELETE { ?w v:painter ?a } INSERT { ?a v:painted ?w }
        WHERE { ?w v:painter ?a }
    """)
    assert g2.ask("ASK { ?a <http://example.org/vocabulary#painted> ?w }")
    assert not g2.ask("ASK { ?w <http://example.org/vocabulary#painter> ?a }")
    sub = picasso_graph.construct("""
        PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        CONSTRUCT { ?a <http://x/label> ?n } WHERE { ?a foaf:name ?n }
    """)
    assert len(sub) == 1


def test_term_constructors_validate():
    with pytest.raises(Exception):
        new_iri("not a valid iri")
    assert new_literal_with_lang("hi", "EN-us").lang == "en-US"
    assert new_blank("b1").lexical == "_:b1"
    with pytest.raises(ValueError):
        new_triple(new_literal("x"), new_iri("http://p/"), new_literal("y"))
