"""SPARQL §8.3/§10.2 compatibility-join semantics for OPTIONAL-produced,
UNION-one-branch and subselect-projected unbound variables, plus the
SPARQL 1.2 triple-term builtins and function-library stragglers (round-5
verdict items 2, 3, 5, 7, 10).

Reference semantics: SPARQL 1.1 §8.3 (OPTIONAL), §10.2 (compatibility);
SPARQL 1.2 17.4.2 (TRIPLE/SUBJECT/PREDICATE/OBJECT/isTRIPLE) — the
reference repo targets these standards (/root/reference/README.md:34-38).
"""

import pytest

from trident_spark.query.sparql import SparqlError, query

COLS = ("subj string, pred string, obj_lexical string, obj_kind string, "
        "obj_datatype string, obj_lang string")

X = "http://x/"
RDF_REIFIES = "http://www.w3.org/1999/02/22-rdf-syntax-ns#reifies"


@pytest.fixture(scope="module")
def optgraph(spark):
    rows = [
        (X + "a", X + "p", "1", "literal", None, None),
        (X + "a", X + "q", "10", "literal", None, None),
        (X + "b", X + "p", "2", "literal", None, None),
        # b has no :q — OPTIONAL leaves ?w unbound for it
        (X + "y1", X + "r", "10", "literal", None, None),
        (X + "y2", X + "r", "20", "literal", None, None),
    ]
    return spark.createDataFrame(rows, COLS).cache()


def test_optional_unbound_joins_compatibly(spark, optgraph):
    """The classic §8.3 shape: an OPTIONAL-unbound ?w is compatible with
    ANY later binding of ?w (and re-binds); SQL-null equality would drop
    the row entirely."""
    df = query(optgraph, """
        PREFIX x: <http://x/>
        SELECT ?x ?y ?w WHERE {
            ?x x:p ?v .
            OPTIONAL { ?x x:q ?w }
            ?y x:r ?w .
        }
    """)
    got = {(r["x"], r["y"], r["w"]) for r in df.collect()}
    assert got == {
        (X + "a", X + "y1", "10"),        # bound ?w=10 matches y1 only
        (X + "b", X + "y1", "10"),        # unbound ?w: compatible with all
        (X + "b", X + "y2", "20"),
    }


def test_optional_bound_rows_still_equi_join(spark, optgraph):
    """Queries with no shared nullable key keep plain equi-joins — the
    bound-side behavior must be untouched."""
    df = query(optgraph, """
        PREFIX x: <http://x/>
        SELECT ?x ?w WHERE {
            ?x x:p ?v .
            OPTIONAL { ?x x:q ?w }
        }
    """)
    got = {(r["x"], r["w"]) for r in df.collect()}
    assert got == {(X + "a", "10"), (X + "b", None)}


def test_union_one_branch_var_joins_compatibly(spark):
    rows = [
        (X + "s1", X + "a", "v1", "literal", None, None),
        (X + "s2", X + "b", "v2", "literal", None, None),
        (X + "s2", X + "c", "cc", "literal", None, None),
        (X + "t1", X + "d", "cc", "literal", None, None),
        (X + "t2", X + "d", "dd", "literal", None, None),
    ]
    g = spark.createDataFrame(rows, COLS)
    df = query(g, """
        PREFIX x: <http://x/>
        SELECT ?s ?t ?u WHERE {
            { ?s x:a ?v } UNION { ?s x:b ?v . ?s x:c ?u }
            ?t x:d ?u .
        }
    """)
    got = {(r["s"], r["t"], r["u"]) for r in df.collect()}
    assert got == {
        (X + "s1", X + "t1", "cc"),       # branch-1 rows: ?u unbound →
        (X + "s1", X + "t2", "dd"),       # compatible with every ?t
        (X + "s2", X + "t1", "cc"),       # branch-2: ?u=cc equi-matches
    }


def test_subselect_projects_undef_nullability(spark):
    rows = [
        (X + "s1", X + "k", "2", "literal", None, None),
        (X + "s2", X + "k", "9", "literal", None, None),
    ]
    g = spark.createDataFrame(rows, COLS)
    df = query(g, """
        PREFIX x: <http://x/>
        SELECT ?x ?y ?s WHERE {
            { SELECT ?x ?y WHERE {
                VALUES (?x ?y) { ("a" UNDEF) ("b" "2") } } }
            ?s x:k ?y .
        }
    """)
    got = {(r["x"], r["y"], r["s"]) for r in df.collect()}
    assert got == {
        ("a", "2", X + "s1"),             # UNDEF ?y: compatible with all
        ("a", "9", X + "s2"),
        ("b", "2", X + "s1"),             # bound ?y=2 equi-matches
    }


def test_bind_over_outer_var_in_exists(spark):
    rows = [
        (X + "s1", X + "num", "5", "literal", None, None),
        (X + "s2", X + "num", "7", "literal", None, None),
        (X + "t", X + "num2", "5", "literal", None, None),
    ]
    g = spark.createDataFrame(rows, COLS)
    df = query(g, """
        PREFIX x: <http://x/>
        SELECT ?s WHERE {
            ?s x:num ?n .
            FILTER EXISTS { ?t x:num2 ?m . BIND(?n AS ?c)
                            FILTER(?m = ?c) }
        }
    """)
    assert [r["s"] for r in df.collect()] == [X + "s1"]


def test_bind_arith_over_outer_var_in_not_exists(spark):
    rows = [
        (X + "s1", X + "num", "5", "literal", None, None),
        (X + "s2", X + "num", "7", "literal", None, None),
        (X + "t", X + "num2", "10", "literal", None, None),
    ]
    g = spark.createDataFrame(rows, COLS)
    # inner ?c = outer ?n * 2; only s1 (5*2=10) has a witness
    df = query(g, """
        PREFIX x: <http://x/>
        SELECT ?s WHERE {
            ?s x:num ?n .
            FILTER NOT EXISTS { ?t x:num2 ?m . BIND(?n * 2 AS ?c)
                                FILTER(?m = ?c) }
        }
    """)
    assert [r["s"] for r in df.collect()] == [X + "s2"]


# -- SPARQL 1.2 triple terms ------------------------------------------------

TT = '<<( <http://x/doc> <http://x/provider> "Acme Corp" )>>'


@pytest.fixture(scope="module")
def stargraph(spark):
    rows = [
        ("_:r1", RDF_REIFIES, TT, "triple", None, None),
        ("_:r1", X + "confidence", "0.9", "literal", None, None),
        (X + "doc", X + "provider", "Acme Corp", "literal", None, None),
        (X + "other", X + "p", "plain", "literal", None, None),
    ]
    return spark.createDataFrame(rows, COLS).cache()


def test_is_triple(spark, stargraph):
    df = query(stargraph, """
        PREFIX x: <http://x/>
        SELECT ?r WHERE { ?r ?p ?t . FILTER(isTRIPLE(?t)) }
    """)
    assert [r["r"] for r in df.collect()] == ["_:r1"]


def test_triple_term_accessors(spark, stargraph):
    df = query(stargraph, """
        PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        SELECT (SUBJECT(?t) AS ?s) (PREDICATE(?t) AS ?p)
               (OBJECT(?t) AS ?o)
        WHERE { ?r rdf:reifies ?t . }
    """)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["s"] == X + "doc"
    assert rows[0]["p"] == X + "provider"
    assert rows[0]["o"] == "Acme Corp"


def test_accessor_on_non_triple_is_unbound(spark, stargraph):
    df = query(stargraph, """
        PREFIX x: <http://x/>
        SELECT ?o2 WHERE { x:other x:p ?v . BIND(OBJECT(?v) AS ?o2) }
    """)
    assert [r["o2"] for r in df.collect()] == [None]


def test_object_accessor_unescapes(spark):
    tt = '<<( <http://x/d> <http://x/p> "a\\"b\\nc" )>>'
    rows = [("_:r", RDF_REIFIES, tt, "triple", None, None)]
    g = spark.createDataFrame(rows, COLS)
    df = query(g, """
        PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        SELECT (OBJECT(?t) AS ?o) WHERE { ?r rdf:reifies ?t . }
    """)
    assert [r["o"] for r in df.collect()] == ['a"b\nc']


def test_triple_constructor_matches_stored_term(spark, stargraph):
    """TRIPLE() over pattern-bound vars renders the canonical stored
    lexical — the constructed term must EXISTS-match the reified one."""
    df = query(stargraph, """
        PREFIX x: <http://x/>
        PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        SELECT ?d ?conf WHERE {
            ?d x:provider ?org .
            BIND(TRIPLE(?d, x:provider, ?org) AS ?tt)
            ?r rdf:reifies ?tt .
            ?r x:confidence ?conf .
        }
    """)
    got = [(r["d"], r["conf"]) for r in df.collect()]
    assert got == [(X + "doc", "0.9")]


def test_triple_constructor_lexical_form(spark, stargraph):
    df = query(stargraph, """
        PREFIX x: <http://x/>
        SELECT ?tt WHERE {
            ?d x:provider ?org .
            BIND(TRIPLE(?d, x:provider, ?org) AS ?tt)
        }
    """)
    assert [r["tt"] for r in df.collect()] == [TT]


def test_triple_constructor_is_triple(spark, stargraph):
    df = query(stargraph, """
        PREFIX x: <http://x/>
        SELECT ?d WHERE {
            ?d x:provider ?org .
            BIND(TRIPLE(?d, x:provider, ?org) AS ?tt)
            FILTER(isTRIPLE(?tt))
        }
    """)
    assert [r["d"] for r in df.collect()] == [X + "doc"]


# -- function-library stragglers --------------------------------------------

DT = "http://www.w3.org/2001/XMLSchema#dateTime"


@pytest.fixture(scope="module")
def dtgraph(spark):
    rows = [
        (X + "e1", X + "at", "2011-01-10T14:45:13.815-05:00", "literal",
         DT, None),
        (X + "e2", X + "at", "2011-01-10T14:45:13+05:30", "literal",
         DT, None),
        (X + "e3", X + "at", "2011-01-10T14:45:13Z", "literal", DT, None),
        (X + "e4", X + "at", "2011-01-10T14:45:13", "literal", DT, None),
    ]
    return spark.createDataFrame(rows, COLS).cache()


def test_timezone_builtin(spark, dtgraph):
    df = query(dtgraph, """
        PREFIX x: <http://x/>
        SELECT ?e ?z WHERE { ?e x:at ?d . BIND(TIMEZONE(?d) AS ?z) }
    """)
    got = {r["e"]: r["z"] for r in df.collect()}
    assert got == {
        X + "e1": "-PT5H",
        X + "e2": "PT5H30M",
        X + "e3": "PT0S",
        X + "e4": None,       # no timezone → expression error → unbound
    }


def test_group_by_bare_builtin_call(spark):
    rows = [
        (X + "a", X + "name", "acme", "literal", None, None),
        (X + "b", X + "name", "ACME", "literal", None, None),
        (X + "c", X + "name", "globex", "literal", None, None),
    ]
    g = spark.createDataFrame(rows, COLS)
    df = query(g, """
        PREFIX x: <http://x/>
        SELECT (COUNT(*) AS ?n) WHERE { ?s x:name ?o . }
        GROUP BY UCASE(?o)
    """)
    assert sorted(r["n"] for r in df.collect()) == [1, 2]


def test_group_by_bare_builtin_with_having(spark):
    rows = [
        (X + "a", X + "name", "acme", "literal", None, None),
        (X + "b", X + "name", "ACME", "literal", None, None),
        (X + "c", X + "name", "globex", "literal", None, None),
    ]
    g = spark.createDataFrame(rows, COLS)
    df = query(g, """
        PREFIX x: <http://x/>
        SELECT (COUNT(*) AS ?n) WHERE { ?s x:name ?o . }
        GROUP BY UCASE(?o) HAVING(COUNT(*) > 1)
    """)
    assert [r["n"] for r in df.collect()] == [2]


def test_object_accessor_preserves_literal_term_identity(spark):
    """r5 review fix: OBJECT() of a lang-tagged or datatyped literal
    keeps the full N-Triples form (never compares equal to the plain
    body); plain and xsd:string literals unescape to the bare body."""
    tt_en = '<<( <http://x/s> <http://x/p> "x"@en )>>'
    tt_pl = '<<( <http://x/s> <http://x/p> "x" )>>'
    tt_str = ('<<( <http://x/s> <http://x/p> '
              '"x"^^<http://www.w3.org/2001/XMLSchema#string> )>>')
    tt_int = ('<<( <http://x/s> <http://x/p> '
              '"5"^^<http://www.w3.org/2001/XMLSchema#integer> )>>')
    rows = [("_:r1", RDF_REIFIES, tt_en, "triple", None, None),
            ("_:r2", RDF_REIFIES, tt_pl, "triple", None, None),
            ("_:r3", RDF_REIFIES, tt_str, "triple", None, None),
            ("_:r4", RDF_REIFIES, tt_int, "triple", None, None)]
    g = spark.createDataFrame(rows, COLS)
    df = query(g, """
        SELECT ?r WHERE { ?r ?p ?t . FILTER(OBJECT(?t) = "x") }
        ORDER BY ?r
    """)
    # plain and xsd:string match; "x"@en and "5"^^integer must NOT
    assert [r["r"] for r in df.collect()] == ["_:r2", "_:r3"]
    tagged = query(g, """
        SELECT ?o WHERE { ?r ?p ?t . BIND(OBJECT(?t) AS ?o) }
    """)
    vals = {r["o"] for r in tagged.collect()}
    assert '"x"@en' in vals  # full term form survives


def test_triple_ctor_rejects_blank_predicate(spark):
    rows = [(X + "s", X + "p", "v", "literal", None, None)]
    g = spark.createDataFrame(rows, COLS)
    with pytest.raises(SparqlError, match="predicate"):
        query(g, """
            SELECT ?tt WHERE { ?s ?p ?o .
                BIND(TRIPLE(?s, _:b, ?o) AS ?tt) }
        """).collect()


def test_compat_join_many_nullable_keys(spark):
    """>4 null-signature parts (2 nullable keys each side -> 16 parts):
    the localCheckpoint lineage-truncation path must stay semantically
    identical to the pure-union path."""
    rows = [(X + "y", X + "p", "x", "literal", None, None)]
    g = spark.createDataFrame(rows, COLS)
    df = query(g, """
        PREFIX x: <http://x/>
        SELECT ?a ?b WHERE {
            { VALUES (?a ?b) { (UNDEF "x") ("y" UNDEF) } }
            { VALUES (?a ?b) { ("y" "x") (UNDEF UNDEF) } }
        }
    """)
    from collections import Counter
    got = Counter((r["a"], r["b"]) for r in df.collect())
    # §10.2: every (left, right) pair here is compatible —
    #   {b:x}⋈{a:y,b:x} and {a:y}⋈{a:y,b:x} → (y, x) twice;
    #   {b:x}⋈{} → (unbound, x); {a:y}⋈{} → (y, unbound)
    assert got == Counter({("y", "x"): 2, (None, "x"): 1, ("y", None): 1})
