"""Differential fuzz for the id-join BGP engine: every generated query
must return the identical solution set with BGP id-runs enabled and
disabled (pure single-pattern lexical compilation).  The generator plants
lexical collisions (a literal equal to an IRI) and shared join variables
to stress exactly what id-encoding changes."""

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
        if rng.random() < 0.6:
            rows.add((s, p, rng.choice(nodes), "iri", None, None))
        else:
            # literals, some colliding lexically with node IRIs
            lex = rng.choice(nodes + ["v1", "v2", "v3"])
            rows.add((s, p, lex, "literal", None, None))
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
        o = rng.choice(vars_ + nodes + ['"v1"'])
        pats.append(f"{s} {p} {o} .")
    used = sorted({t for pat in pats for t in pat.split()
                   if t.startswith("?")})
    proj = rng.sample(used, k=max(1, rng.randint(1, len(used))))
    filt = ""
    if rng.random() < 0.4 and proj:
        filt = f'FILTER(STR({proj[0]}) != "nope")'
    return (f"SELECT DISTINCT {' '.join(proj)} WHERE {{ "
            f"{' '.join(pats)} {filt} }}")


# NB: on a lexical IRI/literal collision across join positions the id path
# is the CORRECT one (term-identity joins); if a future seed surfaces a
# divergence here, fix the single-pattern path, not the id path.
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
