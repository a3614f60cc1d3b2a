"""SPARQL Basic-Graph-Pattern engine on DataFrames.

Implements the query surface the reference proposes (``g.Query(sparql)`` →
iterable solutions, README.md:94-120) for the SELECT/BGP fragment:

    PREFIX schema: <https://schema.org/>
    SELECT ?person ?org WHERE {
        ?person schema:worksFor ?org .
        ?org schema:name ?name .
        FILTER(?name != "Acme")
    } LIMIT 10

Compilation is the classic BGP→relational mapping: every triple pattern is a
filtered scan of the lexical triples DataFrame; shared variables become
equi-join keys (Catalyst picks broadcast/sort-merge and reorders); FILTER
becomes a Spark SQL expression; SELECT is a projection.  DISTINCT / LIMIT /
ORDER BY supported.  No OPTIONAL/UNION/property paths (v1 scope).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

_PREFIX_RE = re.compile(r"PREFIX\s+(\w*):\s*<([^>]*)>", re.IGNORECASE)
_SELECT_RE = re.compile(
    r"SELECT\s+(?P<distinct>DISTINCT\s+)?(?P<vars>[?\w\s*]+?)\s*WHERE\s*\{(?P<body>.*)\}"
    r"(?P<tail>[^}]*)$",
    re.IGNORECASE | re.DOTALL,
)
_FILTER_RE = re.compile(r"FILTER\s*\((?P<expr>[^)]*)\)", re.IGNORECASE)
_ORDER_RE = re.compile(r"ORDER\s+BY\s+(?P<dir>ASC|DESC)?\s*\(?\s*\?(?P<var>\w+)\s*\)?",
                       re.IGNORECASE)
_LIMIT_RE = re.compile(r"LIMIT\s+(\d+)", re.IGNORECASE)


@dataclass
class _Pattern:
    subj: str  # '?var' or IRI string
    pred: str
    obj: str
    obj_is_literal: bool = False


class SparqlError(ValueError):
    pass


def _tokenize_patterns(body: str) -> tuple[list[_Pattern], list[str]]:
    filters = [m.group("expr").strip() for m in _FILTER_RE.finditer(body)]
    body = _FILTER_RE.sub("", body)
    patterns = []
    for stmt in body.split("."):
        stmt = stmt.strip()
        if not stmt:
            continue
        toks = _split_terms(stmt)
        if len(toks) != 3:
            raise SparqlError(f"malformed triple pattern: {stmt!r}")
        s, p, o = toks
        patterns.append(
            _Pattern(s, p, o, obj_is_literal=o.startswith('"'))
        )
    return patterns, filters


def _split_terms(stmt: str) -> list[str]:
    toks, cur, in_str = [], [], False
    for ch in stmt:
        if ch == '"':
            in_str = not in_str
            cur.append(ch)
        elif ch.isspace() and not in_str:
            if cur:
                toks.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        toks.append("".join(cur))
    return toks


def _expand(term: str, prefixes: dict[str, str]) -> str:
    if term.startswith("<") and term.endswith(">"):
        return term[1:-1]
    if term == "a":
        return "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    if ":" in term and not term.startswith("?") and not term.startswith('"'):
        pfx, _, local = term.partition(":")
        if pfx in prefixes:
            return prefixes[pfx] + local
    return term


def query(triples: DataFrame, sparql: str) -> DataFrame:
    """Run a SELECT/BGP query against lexical triples
    (subj, pred, obj_lexical, obj_kind, ...) → one column per variable."""
    prefixes = {m.group(1): m.group(2) for m in _PREFIX_RE.finditer(sparql)}
    stripped = _PREFIX_RE.sub("", sparql).strip()
    m = _SELECT_RE.search(stripped)
    if not m:
        raise SparqlError("only SELECT ... WHERE { ... } is supported")
    body = m.group("body")
    tail = stripped[m.end("body") + 1:]

    patterns, filters = _tokenize_patterns(body)
    if not patterns:
        raise SparqlError("empty basic graph pattern")

    select_vars = m.group("vars").split()
    if select_vars == ["*"]:
        select_vars = None  # all variables
    else:
        select_vars = [v.lstrip("?") for v in select_vars]

    plan: DataFrame | None = None
    bound: set[str] = set()
    for i, pat in enumerate(patterns):
        # RDF graphs are sets: duplicate captures of the same triple must
        # not multiply solutions, so every pattern scan is set-projected
        scan = triples
        rename: dict[str, str] = {}
        for col, term in (("subj", pat.subj), ("pred", pat.pred),
                          ("obj_lexical", pat.obj)):
            if term.startswith("?"):
                rename[col] = term[1:]
            else:
                value = _expand(term, prefixes)
                if col == "obj_lexical" and term.startswith('"'):
                    value = term.strip('"')
                    scan = scan.where(F.col("obj_kind") == "literal")
                elif col == "obj_lexical":
                    scan = scan.where(F.col("obj_kind") == "iri")
                scan = scan.where(F.col(col) == value)
        proj = [F.col(c).alias(v) for c, v in rename.items()]
        if proj:
            scan = scan.select(*proj).distinct()
        else:
            # fully-ground pattern: pure existence check → at most one row
            scan = scan.select(F.lit(1).alias(f"_m{i}")).limit(1)

        if plan is None:
            plan = scan
            bound = set(rename.values())
        else:
            join_keys = sorted(bound & set(rename.values()))
            if join_keys:
                plan = plan.join(scan, join_keys)
            else:
                plan = plan.crossJoin(scan)
            bound |= set(rename.values())

    for expr in filters:
        plan = plan.where(_filter_to_sql(expr))

    if select_vars is None:
        select_vars = sorted(bound)
    missing = [v for v in select_vars if v not in bound]
    if missing:
        raise SparqlError(f"unbound variables in SELECT: {missing}")
    plan = plan.select(*select_vars)

    if m.group("distinct"):
        plan = plan.distinct()
    om = _ORDER_RE.search(tail)
    if om:
        col = F.col(om.group("var"))
        plan = plan.orderBy(col.desc() if (om.group("dir") or "").upper() == "DESC"
                            else col.asc())
    lm = _LIMIT_RE.search(tail)
    if lm:
        plan = plan.limit(int(lm.group(1)))
    return plan


def _filter_to_sql(expr: str) -> str:
    """?var → column refs; SPARQL != / && / || → SQL equivalents."""
    sql = re.sub(r"\?(\w+)", r"`\1`", expr)
    sql = sql.replace("&&", " AND ").replace("||", " OR ")
    sql = re.sub(r"(?<![<>!=])=(?!=)", "==", sql)
    return sql
