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


def test_solutions_never_collects(spark, monkeypatch):
    """solutions() must not materialize the graph (or the result) on the
    driver: kinds are recovered by a distributed term-dictionary join and
    rows stream via toLocalIterator.  Rule-10: patch the CONCRETE
    DataFrame class so the assertion sees every call."""
    g = Graph.empty(spark)
    rows = []
    for i in range(200):
        s = new_iri(f"http://x/s{i}")
        rows.append(new_triple(s, new_iri("http://p/name"),
                               new_literal(f"n{i}")))
        rows.append(new_triple(s, new_iri("http://p/ref"),
                               new_iri(f"http://x/s{(i + 1) % 200}")))
        rows.append(new_triple(s, new_iri("http://p/tagged"),
                               new_literal_with_lang("hallo", "de")))
    g = g.add_all(rows)

    df_cls = type(g.to_df())
    calls = []

    def counting_collect(self):
        calls.append(1)
        raise AssertionError("solutions() collected a DataFrame")

    monkeypatch.setattr(df_cls, "collect", counting_collect)
    sols = list(g.solutions(
        "SELECT ?s ?n ?t WHERE { ?s <http://p/name> ?n . "
        "?s <http://p/tagged> ?t . }"))
    assert not calls
    assert len(sols) == 200
    by_s = {d["s"].value(): d for d in sols}
    assert by_s["http://x/s7"]["n"].value() == "n7"
    assert by_s["http://x/s7"]["n"].is_literal()
    assert by_s["http://x/s7"]["s"].is_iri()
    assert by_s["http://x/s7"]["t"].lang == "de"


def test_solutions_kind_priority_and_expression_values(spark):
    """A lexical form seen as both IRI and literal resolves to IRI
    (iri > blank > literal); expression-produced values not in the graph
    default to plain literals."""
    g = Graph.empty(spark)
    shared = "http://x/ambiguous"
    g = g.add_all([
        new_triple(new_iri("http://x/a"), new_iri("http://p/lit"),
                   new_literal(shared)),
        new_triple(new_iri(shared), new_iri("http://p/name"),
                   new_literal("A")),
    ])
    sols = list(g.solutions(
        "SELECT ?o ?u WHERE { ?s <http://p/lit> ?o . "
        'BIND(CONCAT(?o, "-new") AS ?u) }'))
    assert len(sols) == 1
    assert sols[0]["o"].is_iri()        # iri beats the literal sighting
    assert sols[0]["u"].is_literal()    # computed value → plain literal
    assert sols[0]["u"].value() == shared + "-new"


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
