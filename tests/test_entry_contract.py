"""Replicates the driver's correctness gate locally: run every queries()
entry at sf0.001/sf0.01 and compare row counts + sorted values against the
DuckDB oracle_sql() equivalents."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:19]
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(_normalize(r[c]) for c in cols) for r in df.collect()
    )


def _duck_rows(con, sql):
    rel = con.sql(sql)
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_normalize(row[i]) for i in order) for row in rel.fetchall()
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_vs_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    oracle = entry_mod.oracle_sql()[name]
    got = _spark_rows(q(spark, SF_DIR))
    want = _duck_rows(duck, oracle)
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    assert got == want, (
        f"{name}: value mismatch; first diff: "
        f"{next(((g, w) for g, w in zip(got, want) if g != w), None)}"
    )


@pytest.mark.parametrize(
    "name",
    [n for n in entry_mod.queries() if n not in entry_mod.oracle_sql()],
)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
