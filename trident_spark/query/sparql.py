"""SPARQL SELECT engine on DataFrames.

Implements the query surface the reference proposes (``g.Query(sparql)`` →
iterable solutions, README.md:94-120) for the SELECT fragment:

    PREFIX schema: <https://schema.org/>
    SELECT ?person ?org (COUNT(?award) AS ?n) WHERE {
        ?person schema:worksFor ?org ;
                schema:name ?name .
        OPTIONAL { ?person schema:award ?award }
        { ?org a schema:Organization } UNION { ?org a schema:NGO }
        FILTER(STRLEN(?name) > 3 && ?name != "Acme (inc)")
    } GROUP BY ?person ?org ORDER BY DESC(?n) LIMIT 10

Supported: basic graph patterns with ``;``/``,`` predicate-object lists,
FILTER (nested parens, quoted strings, BOUND/STRLEN/REGEX/STRSTARTS/
STRENDS/CONTAINS/UCASE/LCASE), OPTIONAL (left join on shared variables),
UNION (column-aligned union), nested groups, aggregates COUNT/SUM/AVG/
MIN/MAX with GROUP BY, DISTINCT, ORDER BY (incl. aggregate aliases), LIMIT.

Compilation is the classic mapping: every triple pattern is a filtered scan
of the lexical triples DataFrame; shared variables become equi-join keys
(Catalyst picks broadcast/sort-merge); OPTIONAL becomes a left outer join;
UNION a ``unionByName(allowMissingColumns=True)``; FILTER a Spark SQL
expression; aggregates a ``groupBy().agg()``.

Simplifications vs full SPARQL 1.1 (documented, not silent): unbound (null)
variables never join-match later patterns (SQL null semantics, not SPARQL
compatibility); SUM/AVG cast the lexical form to double; no property paths,
subqueries, VALUES, MINUS, or HAVING.

The WHERE block is tokenized by a scanner that respects ``<>``-delimited
IRIs and quoted literals, so statement splitting and filter rewriting can
never corrupt IRIs or strings containing ``.``/``=``/``&&``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_PREFIX_RE = re.compile(r"PREFIX\s+(\w*):\s*<([^>\s]*)>", re.IGNORECASE)

# scanner: IRIs and quoted literals are atomic tokens, so nothing downstream
# can mistake a '.' inside an IRI for a statement terminator or rewrite an
# '=' inside a string
_TOKEN_RE = re.compile(
    r"""
      <[^\s<>]*>                                        # IRI
    | "(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9\-]+|\^\^\S+)?     # literal (+lang/dt)
    | \?\w+                                             # variable
    | [A-Za-z_][A-Za-z0-9_\-]*(?::[A-Za-z0-9_\-.]*)?    # keyword / pname / a
    | [0-9]+(?:\.[0-9]+)?                               # number
    | && | \|\| | != | <= | >=                          # 2-char operators
    | [{}().,;=<>!*/+\-^|]                              # 1-char punctuation
    """,
    re.VERBOSE,
)


class SparqlError(ValueError):
    pass


def _tokenize(s: str) -> list[str]:
    toks, pos = [], 0
    for m in _TOKEN_RE.finditer(s):
        if s[pos : m.start()].strip():
            raise SparqlError(f"cannot tokenize: {s[pos:m.start()]!r}")
        toks.append(m.group(0))
        pos = m.end()
    if s[pos:].strip():
        raise SparqlError(f"cannot tokenize: {s[pos:]!r}")
    return toks


@dataclass
class _Pattern:
    subj: str
    pred: "str | tuple"  # IRI/var token, or a property-path AST tuple
    obj: str


# property-path AST: ("iri", token) | ("inv", p) | ("seq", p, q)
#                  | ("alt", p, q) | ("plus", p) | ("star", p)
_PATH_OPS = {"/", "|", "^", "+", "*", "("}


def _parse_path(toks: list[str], i: int) -> tuple:
    """Recursive-descent SPARQL property path: alt < seq < postfix < inverse."""

    def primary(i):
        if toks[i] == "(":
            node, i = alt(i + 1)
            if i >= len(toks) or toks[i] != ")":
                raise SparqlError("unbalanced parens in property path")
            return node, i + 1
        t = toks[i]
        if not _is_term(t) or t.startswith("?"):
            raise SparqlError(f"invalid property-path element {t!r}")
        return ("iri", t), i + 1

    def step(i):
        inv = False
        if toks[i] == "^":
            inv, i = True, i + 1
        node, i = primary(i)
        while i < len(toks) and toks[i] in ("+", "*"):
            node = ("plus" if toks[i] == "+" else "star", node)
            i += 1
        return (("inv", node) if inv else node), i

    def seq(i):
        node, i = step(i)
        while i < len(toks) and toks[i] == "/":
            right, i = step(i + 1)
            node = ("seq", node, right)
        return node, i

    def alt(i):
        node, i = seq(i)
        while i < len(toks) and toks[i] == "|":
            right, i = seq(i + 1)
            node = ("alt", node, right)
        return node, i

    return alt(i)


@dataclass
class _Group:
    # elements: _Pattern | ("filter", [tokens]) | ("optional", _Group)
    #         | ("union", _Group, _Group) | ("group", _Group)
    elements: list = field(default_factory=list)


def _is_term(tok: str) -> bool:
    return bool(tok) and tok not in "{}.;,()" and tok.upper() not in (
        "FILTER", "OPTIONAL", "UNION",
    )


def _parse_group(toks: list[str], i: int) -> tuple[_Group, int]:
    """Parse tokens after an opening '{' until its matching '}'."""
    g = _Group()
    while i < len(toks):
        t = toks[i]
        up = t.upper()
        if t == "}":
            return g, i + 1
        if up == "FILTER":
            if i + 1 >= len(toks) or toks[i + 1] != "(":
                raise SparqlError("FILTER requires parenthesized expression")
            depth, j = 1, i + 2
            while j < len(toks) and depth:
                depth += {"(": 1, ")": -1}.get(toks[j], 0)
                j += 1
            if depth:
                raise SparqlError("unbalanced parens in FILTER")
            g.elements.append(("filter", toks[i + 2 : j - 1]))
            i = j
        elif up == "OPTIONAL":
            if i + 1 >= len(toks) or toks[i + 1] != "{":
                raise SparqlError("OPTIONAL requires a group")
            sub, i = _parse_group(toks, i + 2)
            g.elements.append(("optional", sub))
        elif t == "{":
            sub, i = _parse_group(toks, i + 1)
            if i < len(toks) and toks[i].upper() == "UNION":
                if i + 1 >= len(toks) or toks[i + 1] != "{":
                    raise SparqlError("UNION requires a group")
                right, i = _parse_group(toks, i + 2)
                g.elements.append(("union", sub, right))
            else:
                g.elements.append(("group", sub))
        elif t == ".":
            i += 1  # statement separator
        else:
            # triple: subject, then ';'-separated predicate-object lists
            # with ','-separated objects
            subj = t
            i += 1
            while True:
                if i + 1 >= len(toks) or not (
                    _is_term(toks[i]) or toks[i] in _PATH_OPS
                ):
                    raise SparqlError(f"malformed triple after {subj!r}")
                if toks[i].startswith("?"):
                    pred = toks[i]
                    i += 1
                else:
                    node, i = _parse_path(toks, i)
                    # atomic paths stay plain strings (the fast common case)
                    pred = node[1] if node[0] == "iri" else node
                while True:
                    if not _is_term(toks[i]):
                        raise SparqlError(f"malformed object after {pred!r}")
                    g.elements.append(_Pattern(subj, pred, toks[i]))
                    i += 1
                    if i < len(toks) and toks[i] == ",":
                        i += 1
                        continue
                    break
                if i < len(toks) and toks[i] == ";":
                    i += 1
                    if i < len(toks) and toks[i] in (".", "}"):  # dangling ;
                        break
                    continue
                break
    raise SparqlError("unbalanced braces in WHERE")


def _expand(term: str, prefixes: dict[str, str]) -> str:
    if term.startswith("<") and term.endswith(">"):
        return term[1:-1]
    if term == "a":
        return RDF_TYPE
    if ":" in term and not term.startswith("?") and not term.startswith('"'):
        pfx, _, local = term.partition(":")
        if pfx in prefixes:
            return prefixes[pfx] + local
    return term


def _sql_str(tok: str) -> str:
    """SPARQL double-quoted literal token → SQL single-quoted string."""
    body = re.match(r'"((?:[^"\\]|\\.)*)"', tok).group(1)
    body = body.replace("\\\"", '"').replace("\\\\", "\\")
    return "'" + body.replace("'", "''") + "'"


_FILTER_FUNCS = {
    "STRLEN": "length",
    "REGEX": "regexp_like",
    "STRSTARTS": "startswith",
    "STRENDS": "endswith",
    "CONTAINS": "contains",
    "UCASE": "upper",
    "LCASE": "lower",
    "ABS": "abs",
    "STR": "string",
}


def _filter_sql(toks: list[str]) -> str:
    """FILTER token list → Spark SQL expression (token-level, so quoted
    strings and nested parens are structurally safe)."""
    out = []
    i = 0
    while i < len(toks):
        t = toks[i]
        up = t.upper()
        if t.startswith("?"):
            out.append(f"`{t[1:]}`")
        elif t.startswith('"'):
            out.append(_sql_str(t))
        elif up == "BOUND":
            if i + 3 >= len(toks) or toks[i + 1] != "(" or toks[i + 3] != ")":
                raise SparqlError("BOUND takes one variable")
            var = toks[i + 2]
            if not var.startswith("?"):
                raise SparqlError("BOUND takes one variable")
            out.append(f"(`{var[1:]}` IS NOT NULL)")
            i += 4
            continue
        elif up in _FILTER_FUNCS:
            out.append(_FILTER_FUNCS[up])
        elif t == "&&":
            out.append("AND")
        elif t == "||":
            out.append("OR")
        elif t == "=":
            out.append("==")
        elif t == "!":
            out.append("NOT " if toks[i + 1 : i + 2] != ["="] else t)
        else:
            out.append(t)
        i += 1
    return " ".join(out)


def _compile_path(triples: DataFrame, node: tuple,
                  prefixes: dict[str, str]) -> DataFrame:
    """Property path → distinct (_ps, _po) endpoint pairs.

    Closures (`+`/`*`) run an iterative driver-side fixpoint (join new
    frontier against the base relation, union, until no new pairs) — the
    standard DataFrame transitive closure; each round localCheckpoints to
    bound lineage.  `*` adds the identity pair for every graph term, per
    SPARQL's zero-length-path semantics."""
    kind = node[0]
    if kind == "iri":
        value = _expand(node[1], prefixes)
        return (
            triples.where(F.col("pred") == value)
            .select(F.col("subj").alias("_ps"),
                    F.col("obj_lexical").alias("_po"))
            .distinct()
        )
    if kind == "inv":
        p = _compile_path(triples, node[1], prefixes)
        return p.select(F.col("_po").alias("_ps"), F.col("_ps").alias("_po"))
    if kind == "seq":
        left = _compile_path(triples, node[1], prefixes)
        right = (
            _compile_path(triples, node[2], prefixes)
            .withColumnRenamed("_ps", "_ms").withColumnRenamed("_po", "_mo")
        )
        return (
            left.join(right, F.col("_po") == F.col("_ms"))
            .select("_ps", F.col("_mo").alias("_po"))
            .distinct()
        )
    if kind == "alt":
        return (
            _compile_path(triples, node[1], prefixes)
            .union(_compile_path(triples, node[2], prefixes))
            .distinct()
        )
    if kind in ("plus", "star"):
        base = _compile_path(triples, node[1], prefixes).localCheckpoint(
            eager=True)
        paths, frontier = base, base
        for _ in range(25):  # fixpoint: bounded by graph diameter
            step = (
                frontier.withColumnRenamed("_po", "_mid")
                .join(base.withColumnRenamed("_ps", "_mid"), "_mid")
                .select("_ps", "_po")
            )
            new = step.subtract(paths)
            if not new.take(1):
                break
            paths = paths.union(new).distinct().localCheckpoint(eager=True)
            frontier = new
        if kind == "star":
            nodes = (
                triples.select(F.col("subj").alias("_ps"))
                .union(triples.select(F.col("obj_lexical")))
                .distinct()
            )
            paths = paths.union(
                nodes.select("_ps", F.col("_ps").alias("_po"))).distinct()
        return paths
    raise SparqlError(f"unknown path node {node!r}")  # pragma: no cover


def _compile_pattern(triples: DataFrame, pat: _Pattern,
                     prefixes: dict[str, str], idx: int) -> tuple[DataFrame, set[str]]:
    if isinstance(pat.pred, tuple):
        pairs = _compile_path(triples, pat.pred, prefixes)
        rename: dict[str, str] = {}
        scan = pairs
        for col, term in (("_ps", pat.subj), ("_po", pat.obj)):
            if term.startswith("?"):
                rename[col] = term[1:]
            elif term.startswith('"'):
                value = re.match(r'"((?:[^"\\]|\\.)*)"', term).group(1)
                value = value.replace("\\\"", '"').replace("\\\\", "\\")
                scan = scan.where(F.col(col) == value)
            else:
                scan = scan.where(F.col(col) == _expand(term, prefixes))
        proj = [F.col(c).alias(v) for c, v in rename.items()]
        if proj:
            scan = scan.select(*proj).distinct()
        else:
            scan = scan.select(F.lit(1).alias(f"_m{idx}")).limit(1)
        return scan, set(rename.values())

    scan = triples
    rename: dict[str, str] = {}
    for col, term in (("subj", pat.subj), ("pred", pat.pred),
                      ("obj_lexical", pat.obj)):
        if term.startswith("?"):
            rename[col] = term[1:]
        else:
            if col == "obj_lexical" and term.startswith('"'):
                value = re.match(r'"((?:[^"\\]|\\.)*)"', term).group(1)
                value = value.replace("\\\"", '"').replace("\\\\", "\\")
                scan = scan.where(
                    (F.col("obj_kind") == "literal") & (F.col(col) == value)
                )
                continue
            value = _expand(term, prefixes)
            if col == "obj_lexical":
                scan = scan.where(F.col("obj_kind") == "iri")
            scan = scan.where(F.col(col) == value)
    proj = [F.col(c).alias(v) for c, v in rename.items()]
    if proj:
        # RDF graphs are sets: duplicate captures of the same triple must
        # not multiply solutions, so every pattern scan is set-projected
        scan = scan.select(*proj).distinct()
    else:
        scan = scan.select(F.lit(1).alias(f"_m{idx}")).limit(1)
    return scan, set(rename.values())


def _join(plan: DataFrame, bound: set[str], scan: DataFrame,
          vars_: set[str], how: str) -> tuple[DataFrame, set[str]]:
    keys = sorted(bound & vars_)
    if keys:
        plan = plan.join(scan, keys, how)
    elif how == "left":
        raise SparqlError("OPTIONAL group shares no variables with the "
                          "preceding patterns")
    else:
        plan = plan.crossJoin(scan)  # genuinely disconnected patterns
    return plan, bound | vars_


def _compile_group(triples: DataFrame, group: _Group,
                   prefixes: dict[str, str]) -> tuple[DataFrame, set[str]]:
    plan: DataFrame | None = None
    bound: set[str] = set()
    filters: list[list[str]] = []
    for idx, el in enumerate(group.elements):
        if isinstance(el, _Pattern):
            scan, vars_ = _compile_pattern(triples, el, prefixes, idx)
            how = "inner"
        elif el[0] == "filter":
            filters.append(el[1])
            continue
        elif el[0] == "optional":
            scan, vars_ = _compile_group(triples, el[1], prefixes)
            how = "left"
        elif el[0] == "group":
            scan, vars_ = _compile_group(triples, el[1], prefixes)
            how = "inner"
        elif el[0] == "union":
            left, lv = _compile_group(triples, el[1], prefixes)
            right, rv = _compile_group(triples, el[2], prefixes)
            scan = left.unionByName(right, allowMissingColumns=True)
            vars_, how = lv | rv, "inner"
        else:  # pragma: no cover
            raise SparqlError(f"unknown group element {el!r}")
        if plan is None:
            if how == "left":
                raise SparqlError("OPTIONAL cannot be the first pattern")
            plan, bound = scan, vars_
        else:
            plan, bound = _join(plan, bound, scan, vars_, how)
    if plan is None:
        raise SparqlError("empty group pattern")
    # SPARQL filter scope: the enclosing group, after all elements joined
    for ftoks in filters:
        plan = plan.where(_filter_sql(ftoks))
    return plan, bound


# SELECT items: plain var or (AGG(?v) AS ?alias)
_AGG_FUNCS = {"COUNT": F.count, "SUM": F.sum, "AVG": F.avg,
              "MIN": F.min, "MAX": F.max}


@dataclass
class _SelectItem:
    var: str | None = None          # plain projection
    agg: str | None = None          # aggregate function name
    agg_arg: str | None = None      # argument variable ('*' for COUNT(*))
    distinct: bool = False
    alias: str | None = None

    @property
    def out_name(self) -> str:
        return self.alias or self.var


def _parse_select_items(toks: list[str]) -> tuple[bool, list[_SelectItem] | None]:
    """tokens between SELECT and WHERE → (distinct, items|None for '*')."""
    i, distinct = 0, False
    if i < len(toks) and toks[i].upper() == "DISTINCT":
        distinct, i = True, i + 1
    if toks[i:] == ["*"]:
        return distinct, None
    items: list[_SelectItem] = []
    while i < len(toks):
        t = toks[i]
        if t.startswith("?"):
            items.append(_SelectItem(var=t[1:]))
            i += 1
        elif t == "(":
            # ( AGG ( [DISTINCT] ?v|* ) AS ?alias )
            try:
                agg = toks[i + 1].upper()
                if agg not in _AGG_FUNCS or toks[i + 2] != "(":
                    raise SparqlError(f"unsupported aggregate {toks[i+1]!r}")
                j = i + 3
                adist = False
                if toks[j].upper() == "DISTINCT":
                    adist, j = True, j + 1
                arg = toks[j]
                if toks[j + 1] != ")" or toks[j + 2].upper() != "AS":
                    raise SparqlError("aggregate must be (AGG(?v) AS ?alias)")
                alias = toks[j + 3]
                if not alias.startswith("?") or toks[j + 4] != ")":
                    raise SparqlError("aggregate must be (AGG(?v) AS ?alias)")
            except IndexError:
                raise SparqlError("malformed aggregate in SELECT") from None
            items.append(_SelectItem(
                agg=agg, agg_arg=arg, distinct=adist, alias=alias[1:]))
            i = j + 5
        else:
            raise SparqlError(f"unexpected token in SELECT: {t!r}")
    return distinct, items


def _agg_col(it: _SelectItem):
    if it.agg == "COUNT":
        if it.agg_arg == "*":
            c = F.count(F.lit(1))
        elif it.distinct:
            c = F.countDistinct(F.col(it.agg_arg.lstrip("?")))
        else:
            c = F.count(F.col(it.agg_arg.lstrip("?")))
    else:
        col = F.col(it.agg_arg.lstrip("?"))
        if it.agg in ("SUM", "AVG"):
            col = col.cast("double")  # lexical forms are strings
        if it.distinct:
            raise SparqlError("DISTINCT is only supported inside COUNT")
        c = _AGG_FUNCS[it.agg](col)
    return c.alias(it.alias)


def query(triples: DataFrame, sparql: str) -> DataFrame:
    """Run a SELECT query against lexical triples
    (subj, pred, obj_lexical, obj_kind, ...) → one column per variable."""
    prefixes = {m.group(1): m.group(2) for m in _PREFIX_RE.finditer(sparql)}
    stripped = _PREFIX_RE.sub(" ", sparql).strip()
    toks = _tokenize(stripped)
    if not toks or toks[0].upper() != "SELECT":
        raise SparqlError("only SELECT queries are supported")

    # split SELECT items / WHERE group / tail modifiers
    try:
        w = next(i for i, t in enumerate(toks) if t.upper() == "WHERE")
    except StopIteration:
        raise SparqlError("missing WHERE") from None
    if w + 1 >= len(toks) or toks[w + 1] != "{":
        raise SparqlError("WHERE must be followed by a group")
    distinct, items = _parse_select_items(toks[1:w])
    group, i = _parse_group(toks, w + 2)
    tail = toks[i:]

    plan, bound = _compile_group(triples, group, prefixes)

    # tail: GROUP BY ?v... | ORDER BY [ASC|DESC] (?v) | LIMIT n
    group_by: list[str] = []
    order: list[tuple[str, bool]] = []  # (var, desc)
    limit: int | None = None
    j = 0
    while j < len(tail):
        up = tail[j].upper()
        if up == "GROUP" and j + 1 < len(tail) and tail[j + 1].upper() == "BY":
            j += 2
            while j < len(tail) and tail[j].startswith("?"):
                group_by.append(tail[j][1:])
                j += 1
        elif up == "ORDER" and j + 1 < len(tail) and tail[j + 1].upper() == "BY":
            j += 2
            while j < len(tail):
                desc = False
                if tail[j].upper() in ("ASC", "DESC"):
                    desc = tail[j].upper() == "DESC"
                    j += 1
                parens = tail[j : j + 1] == ["("]
                if parens:
                    j += 1
                if j >= len(tail) or not tail[j].startswith("?"):
                    break
                order.append((tail[j][1:], desc))
                j += 1
                if parens:
                    if tail[j : j + 1] != [")"]:
                        raise SparqlError("unbalanced parens in ORDER BY")
                    j += 1
        elif up == "LIMIT":
            limit = int(tail[j + 1])
            j += 2
        else:
            raise SparqlError(f"unexpected token after WHERE: {tail[j]!r}")

    has_agg = items is not None and any(it.agg for it in items)
    if has_agg:
        keys = group_by or [it.var for it in items if it.var]
        missing = [k for k in keys if k not in bound]
        if missing:
            raise SparqlError(f"unbound GROUP BY variables: {missing}")
        aggs = [_agg_col(it) for it in items if it.agg]
        plan = plan.groupBy(*keys).agg(*aggs) if keys else plan.agg(*aggs)
        out_cols = [it.out_name for it in items]
        plan = plan.select(*out_cols)
        bound = set(out_cols) | set(keys)
    else:
        if items is None:
            out_cols = sorted(bound)
        else:
            out_cols = [it.var for it in items]
            missing = [v for v in out_cols if v not in bound]
            if missing:
                raise SparqlError(f"unbound variables in SELECT: {missing}")
        plan = plan.select(*out_cols)

    if distinct:
        plan = plan.distinct()
    if order:
        missing = [v for v, _ in order if v not in set(out_cols)]
        if missing:
            raise SparqlError(f"ORDER BY on unprojected variables: {missing}")
        plan = plan.orderBy(*[
            F.col(v).desc() if d else F.col(v).asc() for v, d in order
        ])
    if limit is not None:
        plan = plan.limit(limit)
    return plan
