"""Differential fuzz for the id-join BGP engine: every generated query
must return the identical solution set with BGP id-runs enabled and
disabled (pure single-pattern lexical compilation).

The fuzz graph deliberately contains NO iri/literal lexical collisions:
on collisions the two paths legitimately differ — the id path joins on
term identity (a literal "x" never matches an IRI "x"), which is the
SPARQL-correct semantics, while the lexical single-pattern path joins on
the lexical form alone (a 100-query run on a collision-dense graph shows
the lexical path emitting extra rows in ~10% of shared-subject/object-var
queries, all term confusions).  test_cross_pattern_term_identity below
pins the CORRECT behavior explicitly."""

import random

import pytest

from trident_spark.query import sparql as S

COLS = ("subj string, pred string, obj_lexical string, obj_kind string, "
        "obj_datatype string, obj_lang string")


@pytest.fixture(scope="module")
def fuzz_graph(spark):
    rng = random.Random(17)
    nodes = [f"http://f/n{i}" for i in range(12)]
    preds = [f"http://f/p{i}" for i in range(4)]
    rows = set()
    for _ in range(150):
        s = rng.choice(nodes)
        p = rng.choice(preds)
        r = rng.random()
        if r < 0.6:
            rows.add((s, p, rng.choice(nodes), "iri", None, None))
        elif r < 0.8:
            # control-char literals fuzz the ECHAR decode paths (rule 8)
            rows.add((s, p, rng.choice(["v1", "v2", "v3", "a\nb", "t\tv"]),
                      "literal", None, None))
        elif r < 0.9:
            # lang-tagged literals (distinct lexical space: same-lexical
            # plain/tagged twins would legitimately diverge on VARIABLE
            # joins, where the lexical path joins on the form alone)
            rows.add((s, p, rng.choice(["lv1", "lv2"]), "literal", None,
                      rng.choice(["fr", "en", "en--ltr"])))
        else:
            rows.add((s, p, rng.choice(["dv1", "dv2"]), "literal",
                      "http://www.w3.org/2001/XMLSchema#token", None))
    return spark.createDataFrame(sorted(rows), COLS).cache()


def _gen_query(rng):
    vars_ = ["?a", "?b", "?c", "?d"]
    preds = [f"<http://f/p{i}>" for i in range(4)]
    nodes = [f"<http://f/n{i}>" for i in range(12)]
    n_pats = rng.randint(2, 4)
    pats = []
    for k in range(n_pats):
        s = rng.choice(vars_[: k + 1])
        p = rng.choice(preds + ["?p"])
        o = rng.choice(vars_ + nodes + [
            '"v1"', '"a\\nb"', '"t\\tv"',
            # full-term-identity constants: the plain forms of lv1/dv1
            # exist only tagged, so "lv1" must match NOTHING on both paths
            '"lv1"@fr', '"lv1"@FR', '"lv1"', '"lv2"@en--ltr',
            '"dv1"^^<http://www.w3.org/2001/XMLSchema#token>', '"dv1"'])
        pats.append(f"{s} {p} {o} .")
    used = sorted({t for pat in pats for t in pat.split()
                   if t.startswith("?")})
    proj = rng.sample(used, k=max(1, rng.randint(1, len(used))))
    filt = ""
    if rng.random() < 0.4 and proj:
        filt = f'FILTER(STR({proj[0]}) != "nope")'
    return (f"SELECT DISTINCT {' '.join(proj)} WHERE {{ "
            f"{' '.join(pats)} {filt} }}")


def test_id_runs_match_single_pattern_compilation(spark, fuzz_graph):
    rng = random.Random(99)
    for i in range(25):
        q = _gen_query(rng)
        try:
            S._ID_RUNS_ENABLED = False
            want = {tuple(r) for r in S.query(fuzz_graph, q).collect()}
        finally:
            S._ID_RUNS_ENABLED = True
        got = {tuple(r) for r in S.query(fuzz_graph, q).collect()}
        assert got == want, (q, len(got), len(want))


def test_cross_pattern_term_identity(spark):
    """A variable bound by a LITERAL object in one pattern must not join
    an IRI subject with the same lexical form — id-runs enforce term
    identity (SPARQL 18.1.8: solutions map variables to RDF terms)."""
    rows = [
        ("http://x/a", "http://p/ref", "http://x/b", "literal", None, None),
        ("http://x/b", "http://p/name", "B", "literal", None, None),
        ("http://x/a", "http://p/link", "http://x/b", "iri", None, None),
    ]
    g = spark.createDataFrame(rows, COLS)
    # literal binding: ?o = literal "http://x/b" → must NOT reach b's name
    lit = S.query(g, """
        SELECT ?n WHERE {
            ?s <http://p/ref> ?o . ?o <http://p/name> ?n .
        }
    """)
    assert lit.collect() == []
    # iri binding: joins fine
    iri = S.query(g, """
        SELECT ?n WHERE {
            ?s <http://p/link> ?o . ?o <http://p/name> ?n .
        }
    """)
    assert [r["n"] for r in iri.collect()] == ["B"]


def test_run_literal_constant_full_term_identity(spark):
    """r5 regression: a literal CONSTANT inside a >=2-pattern id-run must
    match by full (lexical, lang, datatype) identity exactly like the
    single-pattern path — a plain "hello" never matches "hello"@fr."""
    rows = [
        ("http://x/s1", "http://p/n", "hello", "literal", None, "fr"),
        ("http://x/s1", "http://p/q", "y1", "literal", None, None),
        ("http://x/s2", "http://p/n", "hello", "literal", None, None),
        ("http://x/s2", "http://p/q", "y2", "literal", None, None),
    ]
    g = spark.createDataFrame(rows, COLS)
    # single pattern (slow path) and two-pattern run (id path) must agree
    for extra in ("", "?s <http://p/q> ?o ."):
        plain = S.query(g, f"""
            SELECT ?s WHERE {{ ?s <http://p/n> "hello" . {extra} }}
        """)
        assert [r["s"] for r in plain.collect()] == ["http://x/s2"], extra
        tagged = S.query(g, f"""
            SELECT ?s WHERE {{ ?s <http://p/n> "hello"@FR . {extra} }}
        """)
        assert [r["s"] for r in tagged.collect()] == ["http://x/s1"], extra
