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
STRENDS/CONTAINS/UCASE/LCASE), FILTER [NOT] EXISTS, OPTIONAL (left join on
shared variables), UNION (column-aligned union), MINUS (anti join), VALUES
(inline data), BIND, nested groups and subqueries (``{ SELECT ... }``),
property paths, aggregates COUNT/SUM/AVG/MIN/MAX with GROUP BY + HAVING,
DISTINCT, ORDER BY (incl. aggregate aliases), LIMIT/OFFSET, and the ASK
and CONSTRUCT query forms (``ask()`` / ``construct()``).

Compilation is the classic mapping: every triple pattern is a filtered scan
of the lexical triples DataFrame; shared variables become equi-join keys
(Catalyst picks broadcast/sort-merge); OPTIONAL becomes a left outer join;
UNION a ``unionByName(allowMissingColumns=True)``; MINUS / NOT EXISTS a
``left_anti`` join; EXISTS a ``left_semi``; VALUES a join against a literal
local relation; FILTER a Spark SQL expression; aggregates a
``groupBy().agg()``; CONSTRUCT a per-template-triple projection union with
term kinds recovered by joining the graph's term dictionary.

Unbound-variable semantics (full §8.3/§10.2 compatibility): a variable
that may be NULL = unbound — VALUES UNDEF cells, OPTIONAL-introduced
variables on non-matching rows, variables bound in only one UNION
branch — is threaded as *nullable* across nested groups, UNION
branches, GRAPH scopes, subselect projections and the right side of
MINUS/EXISTS; any later join sharing a nullable key compiles to a
SPARQL §10.2 compatibility join (NULL matches anything, COALESCE
re-binds).  On the scale path that is a UNION of plain equi-joins
partitioned by null signature (hash-joinable — never a quadratic theta
join); plans with no nullable shared key keep the plain equi-join.
Filter scoping is strict bottom-up (§18.2): a filter in a plain nested
{}, a GRAPH group or a UNION branch that references a variable bound
only in the enclosing group evaluates it as UNBOUND (NULL → expression
error → false) exactly like reference engines; outer bindings are
substituted only where the spec says so — the OPTIONAL left-join
condition and EXISTS/NOT EXISTS.
Remaining simplifications (documented, not silent): SUM/AVG cast the
lexical form to double;
HAVING aggregates not named in SELECT are computed as hidden columns
and dropped after filtering; GRAPH patterns need a quads frame (a
``graph`` column —
top-level patterns then match the default graph per SPARQL dataset
semantics); property paths inside ``GRAPH ?var`` compute per-graph
closures; nested GRAPH re-scopes the active graph per §13.3 (the outer
graph var crosses the named-graph list when its subgroup leaves it
unbound); no federation —
``SERVICE`` is deliberately out of scope for a single-warehouse engine
and rejected loudly (a distributed engine calling per-row remote SPARQL
endpoints is an anti-pattern at any scale; materialize the remote graph
into the warehouse instead).

Join semantics: runs of plain patterns join on 64-bit TERM-IDENTITY ids
(a literal never matches an IRI with the same lexical form — the SPARQL
semantics); patterns compiled on the single-pattern path (repeated vars
aside, which add a same-term constraint: metadata-attachment patterns,
GRAPH-var scopes, property-path endpoints) join on the lexical form
alone, a documented approximation that diverges only when a literal and
an IRI share their lexical form across join positions.

The WHERE block is tokenized by a scanner that respects ``<>``-delimited
IRIs and quoted literals (PREFIX declarations are lifted from the TOKEN
stream), so statement splitting and filter rewriting can never corrupt
IRIs or strings containing ``.``/``=``/``&&``/``PREFIX``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

_PREFIX_RE = re.compile(r"PREFIX\s+(\w*):\s*<([^>\s]*)>", re.IGNORECASE)

# bare numeric / boolean object shorthand (the tokenizer's unsigned number
# class plus true/false) — matched as typed literals on their lexical form
_PLAIN_SCALAR = re.compile(r"^(?:[0-9]+(?:\.[0-9]+)?|true|false)$")

# scanner: IRIs and quoted literals are atomic tokens, so nothing downstream
# can mistake a '.' inside an IRI for a statement terminator or rewrite an
# '=' inside a string
_TOKEN_RE = re.compile(
    r"""
      <<\( | \)>>                                       # RDF 1.2 triple term
    | <[^\s<>]*>                                        # IRI
    | "(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9\-]+|\^\^\S+)?     # literal (+lang/dt)
    | \?\w+                                             # variable
    | [A-Za-z_][A-Za-z0-9_\-]*(?::[A-Za-z0-9_\-.]*)?    # keyword / pname / a
    | [0-9]+(?:\.[0-9]+)?                               # number
    | && | \|\| | != | <= | >=                          # 2-char operators
    | [{}().,;=<>!*/+\-^|?]                             # 1-char punctuation
                                                        # (? = path 0-or-1)
    """,
    re.VERBOSE,
)


class SparqlError(ValueError):
    pass


def _public(fn):
    """Public-entry guard: malformed/truncated queries surface as
    SparqlError (the module's documented error type) instead of bare
    IndexError/ValueError from token lookahead or int() parses."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except SparqlError:
            raise
        except (IndexError, ValueError) as e:
            raise SparqlError(
                f"malformed query ({type(e).__name__}: {e})") from e
    return wrapped


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
class _Quoted:
    """RDF 1.2 quoted-triple object pattern: ``<<( s p o )>>`` with each
    slot a variable or constant token.  Only the object position — triple
    terms cannot be subjects in RDF 1.2."""
    subj: str
    pred: str
    obj: str


@dataclass
class _Pattern:
    subj: str
    pred: "str | tuple"  # IRI/var token, or a property-path AST tuple
    obj: "str | _Quoted"


# property-path AST: ("iri", token) | ("inv", p) | ("seq", p, q)
#                  | ("alt", p, q) | ("plus", p) | ("star", p)
_PATH_OPS = {"/", "|", "^", "+", "*", "("}


def _parse_path(toks: list[str], i: int) -> tuple:
    """Recursive-descent SPARQL property path: alt < seq < postfix < inverse."""

    def primary(i):
        if toks[i] == "!":
            # negated property set: !iri, !^iri, !(iri|^iri|...) — §18.4
            # splits members into a forward set and an inverse set
            i += 1
            fwd: list[str] = []
            invm: list[str] = []

            def member(i: int) -> int:
                into = fwd
                if i < len(toks) and toks[i] == "^":
                    into, i = invm, i + 1
                if i >= len(toks) or not _is_term(toks[i]) \
                        or toks[i].startswith("?"):
                    raise SparqlError("invalid negated property set")
                into.append(toks[i])
                return i + 1

            if i < len(toks) and toks[i] == "(":
                i += 1
                while True:
                    i = member(i)
                    if i < len(toks) and toks[i] == "|":
                        i += 1
                        continue
                    break
                if i >= len(toks) or toks[i] != ")":
                    raise SparqlError("unbalanced negated property set")
                i += 1
            else:
                i = member(i)
            return ("neg", fwd, invm), i
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
        while i < len(toks) and toks[i] in ("+", "*", "?"):
            node = ({"+": "plus", "*": "star", "?": "opt"}[toks[i]], node)
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
    #         | ("minus", _Group) | ("exists", bool, _Group)
    #         | ("values", [vars], [rows]) | ("bind", [tokens], alias)
    #         | ("subselect", [tokens])
    elements: list = field(default_factory=list)


def _is_term(tok: str) -> bool:
    return bool(tok) and tok not in "{}.;,()" and tok.upper() not in (
        "FILTER", "OPTIONAL", "UNION", "MINUS", "VALUES", "BIND", "GRAPH",
    )


def _match_brace(toks: list[str], i: int) -> int:
    """index just past the '}' matching the '{' at ``toks[i]``."""
    depth, j = 1, i + 1
    while j < len(toks) and depth:
        depth += {"{": 1, "}": -1}.get(toks[j], 0)
        j += 1
    if depth:
        raise SparqlError("unbalanced braces")
    return j


def _parse_values(toks: list[str], i: int) -> tuple[tuple, int]:
    """VALUES ?v { t... } | VALUES (?v ?w) { (t t) ... } → ("values", ...)."""
    vars_: list[str] = []
    if toks[i].startswith("?"):
        vars_, i, rowform = [toks[i][1:]], i + 1, False
    elif toks[i] == "(":
        i, rowform = i + 1, True
        while i < len(toks) and toks[i].startswith("?"):
            vars_.append(toks[i][1:])
            i += 1
        if not vars_ or i >= len(toks) or toks[i] != ")":
            raise SparqlError("malformed VALUES variable list")
        i += 1
    else:
        raise SparqlError("VALUES requires ?var or (?var ...)")
    if i >= len(toks) or toks[i] != "{":
        raise SparqlError("VALUES requires a data block")
    i += 1
    rows: list[tuple] = []
    while i < len(toks) and toks[i] != "}":
        if rowform:
            if toks[i] != "(":
                raise SparqlError("VALUES rows must be parenthesized")
            i += 1
            row = []
            while i < len(toks) and toks[i] != ")":
                row.append(_values_term(toks[i]))
                i += 1
            if i >= len(toks) or len(row) != len(vars_):
                raise SparqlError("VALUES row arity mismatch")
            i += 1
        else:
            row = [_values_term(toks[i])]
            i += 1
        rows.append(tuple(row))
    if i >= len(toks):
        raise SparqlError("unterminated VALUES block")
    if not rows:
        raise SparqlError("empty VALUES block")
    return ("values", vars_, rows), i + 1


def _values_term(tok: str) -> str | None:
    if tok.upper() == "UNDEF":
        return None  # unbound cell → NULL; compat-joined per SPARQL §10.2
    return tok  # raw token; unquoted/expanded at compile time (needs prefixes)


# SPARQL ECHAR set (grammar [160]): \t \b \n \r \f \" \' \\ .  Unknown
# escapes (e.g. the technically-illegal-but-common "\d" in REGEX patterns)
# are kept verbatim as backslash+char — lenient, matches round-trip tests.
_ECHAR_MAP = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
              '"': '"', "'": "'", "\\": "\\"}


def _decode_echars(body: str) -> str:
    return re.sub(r"\\(.)",
                  lambda m: _ECHAR_MAP.get(m.group(1), "\\" + m.group(1)),
                  body)


def _term_value(tok: str, prefixes: dict[str, str]) -> str:
    """IRI/literal/pname token → its lexical value."""
    if tok.startswith('"'):
        m = re.match(r'"((?:[^"\\]|\\.)*)"', tok)
        return _decode_echars(m.group(1))
    return _expand(tok, prefixes)


_LIT_TOK_RE = re.compile(
    r'^"(?:[^"\\]|\\.)*"(?:@(?P<lang>[A-Za-z0-9\-]+)|\^\^(?P<dt>\S+))?$')


def _literal_parts(tok: str, prefixes: dict[str, str]
                   ) -> tuple[str, str | None, str | None]:
    """Literal token → (lexical value, language tag | None,
    expanded datatype IRI | None).  The full RDF term identity of the
    constant — pattern matching, DATA blocks and the encoded engine all
    decompose through here so ``"x"@en`` / ``"x"^^xsd:token`` constants
    match on lang/datatype too, not the lexical form alone."""
    m = _LIT_TOK_RE.match(tok)
    if not m:
        raise SparqlError(f"malformed literal token {tok!r}")
    dt = m.group("dt")
    return (_term_value(tok, prefixes), m.group("lang"),
            _expand(dt, prefixes) if dt else None)


def _literal_match_cond(lex_col, value: str, lang: str | None,
                        dt: str | None, cols,
                        kind_col="obj_kind",
                        lang_col="obj_lang", dt_col="obj_datatype"):
    """Spark condition matching a literal CONSTANT against a lexical frame
    by full RDF 1.1 term identity: language tags compare case-insensitively
    (BCP 47); a plain ``"x"`` is a simple literal ≡ ``xsd:string``.

    ``cols`` is the frame's column set — a frame that records no
    lang/datatype metadata (both columns optional in the ``query()``
    contract) keeps the historical lexical-form match for the missing
    dimension rather than matching nothing."""
    cond = (F.col(kind_col) == "literal") & (lex_col == value)
    has_lang, has_dt = lang_col in cols, dt_col in cols
    if lang is not None:
        return (cond & (F.lower(F.col(lang_col)) == lang.lower())
                if has_lang else cond)
    if has_lang:
        cond &= F.col(lang_col).isNull()
    if not has_dt:
        return cond
    simple = F.col(dt_col).isNull() | (F.col(dt_col) == XSD_STRING)
    if dt is not None and dt != XSD_STRING:
        return cond & (F.col(dt_col) == dt)
    return cond & simple


def _parse_group(toks: list[str], i: int) -> tuple[_Group, int]:
    """Parse tokens after an opening '{' until its matching '}'."""
    g = _Group()
    while i < len(toks):
        t = toks[i]
        up = t.upper()
        if t == "}":
            return g, i + 1
        if up == "SERVICE":
            raise SparqlError(
                "SERVICE (federation) is out of scope for this "
                "single-warehouse engine — materialize the remote graph "
                "into the warehouse instead")
        if up == "FILTER":
            nxt = toks[i + 1].upper() if i + 1 < len(toks) else ""
            if nxt in ("EXISTS", "NOT"):
                positive = nxt == "EXISTS"
                j = i + 2
                if not positive:
                    if j >= len(toks) or toks[j].upper() != "EXISTS":
                        raise SparqlError("FILTER NOT requires EXISTS")
                    j += 1
                if j >= len(toks) or toks[j] != "{":
                    raise SparqlError("FILTER [NOT] EXISTS requires a group")
                sub, i = _parse_group(toks, j + 1)
                g.elements.append(("exists", positive, sub))
                continue
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
        elif up == "MINUS":
            if i + 1 >= len(toks) or toks[i + 1] != "{":
                raise SparqlError("MINUS requires a group")
            sub, i = _parse_group(toks, i + 2)
            g.elements.append(("minus", sub))
        elif up == "VALUES":
            el, i = _parse_values(toks, i + 1)
            g.elements.append(el)
        elif up == "GRAPH":
            if i + 2 >= len(toks) or toks[i + 2] != "{":
                raise SparqlError("GRAPH requires a term and a group")
            term = toks[i + 1]
            if not (term.startswith("?") or _is_term(term)) \
                    or term.startswith('"'):
                raise SparqlError(f"invalid GRAPH term {term!r}")
            sub, i = _parse_group(toks, i + 3)
            g.elements.append(("graph", term, sub))
        elif up == "BIND":
            # BIND ( expr AS ?v )
            if i + 1 >= len(toks) or toks[i + 1] != "(":
                raise SparqlError("BIND requires (expr AS ?var)")
            depth, j = 1, i + 2
            while j < len(toks) and depth:
                depth += {"(": 1, ")": -1}.get(toks[j], 0)
                j += 1
            if depth:
                raise SparqlError("unbalanced parens in BIND")
            body = toks[i + 2 : j - 1]
            if len(body) < 3 or body[-2].upper() != "AS" \
                    or not body[-1].startswith("?"):
                raise SparqlError("BIND requires (expr AS ?var)")
            g.elements.append(("bind", body[:-2], body[-1][1:]))
            i = j
        elif t == "{":
            if i + 1 < len(toks) and toks[i + 1].upper() == "SELECT":
                j = _match_brace(toks, i)
                g.elements.append(("subselect", toks[i + 1 : j - 1]))
                i = j
                continue
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
        elif t in ("<<(", ")>>"):
            raise SparqlError(
                "quoted triples are object terms only (RDF 1.2)")
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
                    if toks[i] == "<<(":
                        # RDF 1.2 quoted-triple object pattern
                        if i + 4 >= len(toks) or toks[i + 4] != ")>>":
                            raise SparqlError(
                                "quoted-triple pattern must be "
                                "<<( subj pred obj )>>")
                        inner = toks[i + 1 : i + 4]
                        if any(not _is_term(x) or x in ("<<(", ")>>")
                               for x in inner):
                            raise SparqlError(
                                "malformed quoted-triple pattern")
                        obj: "str | _Quoted" = _Quoted(*inner)
                        i += 5
                    elif _is_term(toks[i]):
                        obj = toks[i]
                        i += 1
                    else:
                        raise SparqlError(f"malformed object after {pred!r}")
                    g.elements.append(_Pattern(subj, pred, obj))
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
    """SPARQL double-quoted literal token → SQL single-quoted string.

    Spark's SQL parser C-unescapes single-quoted literals (default
    ``escapedStringLiterals=false``), so after decoding the SPARQL-level
    escapes every remaining backslash must be RE-escaped — otherwise
    REGEX(?x, "\\\\d+") reaches Spark as the regex "d+" and literal
    comparisons against backslash-bearing strings silently miss."""
    body = re.match(r'"((?:[^"\\]|\\.)*)"', tok).group(1)
    body = _decode_echars(body)          # SPARQL-level ECHAR decode
    body = body.replace("\\", "\\\\")    # re-escape for Spark's C-unescaping
    # Control chars go back out as Spark escape sequences so the generated
    # SQL text stays single-line and survives any downstream reparse.
    # NB Spark's unescaper has NO \f (it would decode to the letter 'f',
    # r4 review finding) — \f and \b use \uXXXX, which Spark does decode.
    for ch, esc in (("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t"),
                    ("\b", "\\u0008"), ("\f", "\\u000C")):
        body = body.replace(ch, esc)
    return "'" + body.replace("'", "''") + "'"


_FILTER_FUNCS = {
    "STRLEN": "length",
    "STRSTARTS": "startswith",
    "STRENDS": "endswith",
    "CONTAINS": "contains",
    "UCASE": "upper",
    "LCASE": "lower",
    "STR": "string",
    "CONCAT": "concat",
    "SUBSTR": "substr",
    "REPLACE": "regexp_replace",  # SPARQL REPLACE is regex-based
    "COALESCE": "coalesce",
    "IF": "if",
    "MD5": "md5",
    "SHA1": "sha1",
}


# SPARQL functions with no 1:1 Spark SQL builtin — expanded as SQL macros
# over their compiled argument expressions
_MACRO_FUNCS = ("STRBEFORE", "STRAFTER", "SAMETERM", "LANGMATCHES",
                "ENCODE_FOR_URI", "REGEX", "SHA256", "SHA384", "SHA512",
                "ISNUMERIC", "YEAR", "MONTH", "DAY", "HOURS", "MINUTES",
                "SECONDS", "TZ", "TIMEZONE", "IRI", "URI", "STRLANG",
                "STRLANGDIR", "STRDT", "ROUND", "CEIL", "FLOOR", "ABS",
                # SPARQL 1.2 triple-term accessors (the TRIPLE constructor
                # and isTRIPLE predicate are handled structurally)
                "SUBJECT", "PREDICATE", "OBJECT")


def _sql_rx(py_regex: str) -> str:
    """Java-regex string (as used with F.regexp_extract) → Spark SQL
    string literal carrying the same regex (backslashes re-escaped)."""
    return "'" + py_regex.replace("\\", "\\\\").replace("'", "\\'") + "'"


# N-Triples literal body (the quoted, still-escaped form)
_NT_LIT_BODY = r'^"((?:[^"\\]|\\.)*)"'
# … and its @lang / ^^<datatype> suffix, when present
_NT_LIT_SUFFIX = r'^"(?:[^"\\]|\\.)*"((?:@|\^\^).+)$'

# non-deterministic SPARQL builtins: a distributed engine re-evaluating
# them per partition/retry cannot give the single-evaluation semantics
# the spec implies — reject loudly rather than answer wrong
_NONDET_FUNCS = ("NOW", "RAND", "UUID", "STRUUID", "BNODE")

# xsd:dateTime lexical form: the accessor macros read components straight
# off the canonical lexical representation (engine-portable, no timestamp
# parser divergence); group k = YEAR..SECONDS below
_XSD_DT_RE = ("'^(-?\\\\d{4,})-(\\\\d{2})-(\\\\d{2})T"
              "(\\\\d{2}):(\\\\d{2}):(\\\\d{2}(?:\\\\.\\\\d+)?)'")


def _term_constructor_bind(toks: list[str], prefixes: dict[str, str]
                           ) -> tuple[list[str], str, str | None,
                                      str | None] | None:
    """A BIND expression that IS a typed-term constructor —
    ``STRLANG(e, "tag")`` / ``STRLANGDIR(e, "tag", "dir")`` /
    ``STRDT(e, <dt>)`` / ``IRI(e)`` / ``URI(e)``
    at top level — returns (value_tokens, kind, lang, datatype) so the
    bind attaches hidden metadata columns; None for ordinary expressions
    (which stay plain literals, the SPARQL default)."""
    if not toks or toks[0].upper() not in ("STRLANG", "STRLANGDIR",
                                           "STRDT", "IRI", "URI"):
        return None
    name = toks[0].upper()
    args, j = _parse_call_args(toks, 1)
    if j != len(toks):
        return None  # constructor nested inside a larger expression
    if name in ("IRI", "URI"):
        if len(args) != 1 or not args[0]:
            raise SparqlError(f"{name} takes one argument")
        return args[0], "iri", None, None
    if name == "STRLANGDIR":
        # SPARQL 1.2 §17.4.2: rdf:dirLangString constructor — the base
        # direction rides on the stored tag as `tag--ltr|rtl` (the
        # N-Triples 1.2 LANG_DIR surface form used engine-wide)
        if len(args) != 3 or not args[0] or len(args[1]) != 1 \
                or len(args[2]) != 1 or not args[1][0].startswith('"') \
                or not args[2][0].startswith('"'):
            raise SparqlError(
                "STRLANGDIR takes (expression, \"tag\", \"dir\")")
        direction = _term_value(args[2][0], prefixes)
        if direction not in ("ltr", "rtl"):
            raise SparqlError("STRLANGDIR direction must be 'ltr' or 'rtl'")
        tag_v = _term_value(args[1][0], prefixes)
        return args[0], "literal", f"{tag_v}--{direction}", None
    if len(args) != 2 or not args[0] or len(args[1]) != 1:
        raise SparqlError(f"{name} takes (expression, constant)")
    tag = args[1][0]
    if name == "STRLANG":
        if not tag.startswith('"'):
            raise SparqlError("STRLANG language tag must be a string "
                              "literal")
        return args[0], "literal", _term_value(tag, prefixes), None
    if tag.startswith('"') or tag.startswith("?"):
        raise SparqlError("STRDT datatype must be an IRI")
    return args[0], "literal", None, _expand(tag, prefixes)


def _esc_lit_col(col):
    """N-Triples literal escape, JVM-side.  Delegates to the writer's
    helper so TRIPLE()-built lexical forms stay byte-identical to the
    forms pipeline/sinks serializes (any escape added there is picked up
    here automatically; a drifted duplicate would silently stop matching
    stored rdf:reifies rows)."""
    from trident_spark.pipeline.sinks import _escape_literal
    return _escape_literal(col)


def _outer_bind_vars(group: "_Group", outer: set[str]) -> set[str]:
    """Outer-scope variables a BIND expression inside ``group`` (or a
    nested subgroup) references without the group binding them itself —
    the EXISTS substitution semantics needs those outer bindings SEEDED
    into the subgroup compile (filters alone can defer into the join
    condition; a BIND computes new columns and cannot)."""
    binds: set[str] = set()
    local: set[str] = set()

    def walk(g: "_Group") -> None:
        for el in g.elements:
            if isinstance(el, _Pattern):
                local.update(_pattern_vars(el))
            elif isinstance(el, tuple) and el:
                if el[0] == "bind":
                    binds.update(t[1:] for t in el[1] if t.startswith("?"))
                    local.add(el[2])
                elif el[0] == "values":
                    local.update(el[1])
                elif el[0] in ("optional", "group", "minus"):
                    walk(el[1])
                elif el[0] == "graph":
                    if el[1].startswith("?"):
                        local.add(el[1][1:])
                    walk(el[2])
                elif el[0] == "union":
                    walk(el[1])
                    walk(el[2])

    walk(group)
    return (binds - local) & outer


def _triple_bind_vars(elements: list) -> set[str]:
    """Variables used as TRIPLE(...) constructor arguments in BINDs — their
    pattern scans should carry term metadata so the constructor renders the
    object with its true kind/lang/datatype (heuristic fallback otherwise)."""
    need: set[str] = set()
    for el in elements:
        if isinstance(el, tuple) and el and el[0] == "bind":
            toks = el[1]
            if toks and toks[0].upper() == "TRIPLE":
                need |= {t[1:] for t in toks if t.startswith("?")}
    return need


def _triple_ctor_col(args: list[list[str]], prefixes: dict[str, str],
                     plan: DataFrame):
    """``TRIPLE(s, p, o)`` (SPARQL 1.2 17.4.2.8) → a Column rendering the
    canonical stored triple-term lexical ``<<( s p o )>>``
    (pipeline/rdfstar.py triple_term writer parity), so the constructed
    term joins/compares against pattern-bound triple terms.  NULL (= the
    variable stays unbound) when any argument is unbound.  Non-ASCII IRI
    args skip the writer's IRI→URI conversion (documented divergence)."""
    if len(args) != 3 or any(len(a) != 1 for a in args):
        raise SparqlError(
            "TRIPLE takes (subject, predicate, object) single terms")
    cols = set(plan.columns)

    def const_obj(t: str):
        if t.startswith('"'):
            m = re.match(r'^("(?:[^"\\]|\\.)*")(.*)$', t)
            if not m:
                raise SparqlError(f"malformed literal {t!r}")
            val = _term_value(m.group(1), prefixes)
            return F.lit('"' + _escape_nt(val) + '"' + m.group(2))
        if t.startswith("_:"):
            return F.lit(t)
        return F.lit("<" + _expand(t, prefixes) + ">")

    def render(a: list[str], pos: str):
        t = a[0]
        if not t.startswith("?"):
            if pos == "obj":
                return const_obj(t)
            if t.startswith('"'):
                raise SparqlError(f"TRIPLE {pos} cannot be a literal")
            if pos == "pred" and t.startswith("_:"):
                # a blank-node predicate is not legal RDF — constructing
                # it would emit a triple term the writer never produces
                # (joins silently empty); reject loudly like literals
                raise SparqlError("TRIPLE predicate cannot be a blank node")
            return (F.lit(t) if t.startswith("_:")
                    else F.lit("<" + _expand(t, prefixes) + ">"))
        v = t[1:]
        if v not in cols:
            return F.lit(None).cast("string")  # unbound arg → unbound
        val = F.col(v)
        iri = F.concat(F.lit("<"), val, F.lit(">"))
        if pos == "subj":
            return F.when(val.startswith("_:"), val).otherwise(iri)
        if pos == "pred":
            return iri
        quoted = F.concat(F.lit('"'), _esc_lit_col(val), F.lit('"'))
        if f"_kind_{v}" in cols:
            kind = F.col(f"_kind_{v}")
            lang = (F.col(f"_lang_{v}") if f"_lang_{v}" in cols
                    else F.lit(None).cast("string"))
            dt = (F.col(f"_dt_{v}") if f"_dt_{v}" in cols
                  else F.lit(None).cast("string"))
            return (F.when(kind == "iri", iri)
                    .when(kind == "blank", val)
                    .when(kind == "triple", val)
                    .when(lang.isNotNull(),
                          F.concat(quoted, F.lit("@"), lang))
                    .when(dt.isNotNull(),
                          F.concat(quoted, F.lit("^^<"), dt, F.lit(">")))
                    .otherwise(quoted))
        # no metadata: kind by lexical shape (blank label / nested term /
        # absolute-IRI scheme shape; else literal) — documented heuristic
        return (F.when(val.startswith("_:"), val)
                .when(val.startswith("<<("), val)
                .when(val.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:\S"), iri)
                .otherwise(quoted))

    return F.concat(F.lit("<<( "), render(args[0], "subj"), F.lit(" "),
                    render(args[1], "pred"), F.lit(" "),
                    render(args[2], "obj"), F.lit(" )>>"))


def _parse_call_args(toks: list[str], i: int) -> tuple[list[list[str]], int]:
    """toks[i] must be '(' — split the balanced argument list on top-level
    commas; returns (args, index after the closing paren)."""
    if toks[i : i + 1] != ["("]:
        raise SparqlError("expected '(' after function name")
    depth, args, cur = 1, [], []
    i += 1
    while i < len(toks):
        t = toks[i]
        if t == "(":
            depth += 1
            cur.append(t)
        elif t == ")":
            depth -= 1
            if depth == 0:
                args.append(cur)
                return args, i + 1
            cur.append(t)
        elif t == "," and depth == 1:
            args.append(cur)
            cur = []
        else:
            cur.append(t)
        i += 1
    raise SparqlError("unbalanced parentheses in expression")


def _expand_macro(name: str, args: list[list[str]],
                  cols: set[str] | None) -> str:
    if any(not a for a in args):
        # IRI() / SHA256(,) etc.: an empty argument token list would
        # compile to an empty SQL fragment and surface as a Spark
        # ParseException instead of this module's loud contract
        raise SparqlError(f"{name} called with an empty argument")
    sql = [_filter_sql(a, cols) for a in args]
    if name in ("STRBEFORE", "STRAFTER") and len(sql) == 2:
        a, b = sql
        if name == "STRBEFORE":  # "" when the needle is absent (SPARQL 17.4.3.10)
            return (f"(CASE WHEN instr({a}, {b}) > 0 THEN "
                    f"substring({a}, 1, instr({a}, {b}) - 1) ELSE '' END)")
        return (f"(CASE WHEN instr({a}, {b}) > 0 THEN "
                f"substring({a}, instr({a}, {b}) + length({b})) "
                f"ELSE '' END)")
    if name == "REGEX" and len(sql) in (2, 3):
        if len(sql) == 2:
            return f"regexp_like({sql[0]}, {sql[1]})"
        # SPARQL flags (i/s/m/x subset) → inline (?flags) prefix
        ftoks = args[2]
        m = (re.match(r'"([imsx]*)"$', ftoks[0])
             if len(ftoks) == 1 else None)
        if m is None:
            raise SparqlError(
                "REGEX flags must be a plain 'imsx' string literal")
        if not m.group(1):
            return f"regexp_like({sql[0]}, {sql[1]})"
        return f"regexp_like({sql[0]}, '(?{m.group(1)})' || {sql[1]})"
    if name == "ENCODE_FOR_URI" and len(sql) == 1:
        # url_encode is Java form-encoding: space→'+', '~'→%7E, '*' kept.
        # SPARQL 17.4.3.15 wants RFC 3986 unreserved (ALPHA/DIGIT/-._~)
        # kept and everything else — including '*' — percent-encoded.
        return (f"replace(replace(replace(url_encode({sql[0]}), "
                f"'+', '%20'), '%7E', '~'), '*', '%2A')")
    if name == "LANGMATCHES" and len(sql) == 2:
        tag, rng = sql
        return (f"(CASE WHEN {rng} = '*' THEN {tag} <> '' "
                f"ELSE lower({tag}) = lower({rng}) "
                f"OR startswith(lower({tag}), lower({rng}) || '-') END)")
    if name in ("IRI", "URI") and len(sql) == 1:
        # nested in a larger expression: the VALUE is the string itself
        # (kind metadata only attaches for top-level BIND constructors)
        return sql[0]
    if name in ("STRLANG", "STRDT") and len(sql) == 2 \
            or name == "STRLANGDIR" and len(sql) == 3:
        return sql[0]
    if name in ("ROUND", "CEIL", "FLOOR", "ABS") and len(sql) == 1:
        # numeric builtins over LEXICAL values: try_cast keeps the SPARQL
        # per-row expression-error semantics (NULL = unbound) where an
        # ANSI implicit cast of a non-numeric literal aborts the query.
        # ROUND is XPath fn:round — ties go toward +inf (round(-2.5) =
        # -2), not Spark's HALF_UP — so compile it as floor(x + 0.5).
        arg = f"try_cast({sql[0]} AS DOUBLE)"
        if name == "ROUND":
            return f"floor({arg} + 0.5d)"
        return f"{name.lower()}({arg})"
    if name in ("SHA256", "SHA384", "SHA512") and len(sql) == 1:
        return f"sha2({sql[0]}, {name[3:]})"
    if name == "ISNUMERIC" and len(sql) == 1:
        # numeric-literal lexical forms (xsd integer/decimal/double);
        # this engine types by lexical shape — documented approximation
        return (f"({sql[0]} rlike "
                "'^[+-]?(\\\\d+(\\\\.\\\\d*)?|\\\\.\\\\d+)"
                "([eE][+-]?\\\\d+)?$')")
    if name in ("YEAR", "MONTH", "DAY", "HOURS", "MINUTES",
                "SECONDS") and len(sql) == 1:
        g = {"YEAR": 1, "MONTH": 2, "DAY": 3, "HOURS": 4, "MINUTES": 5,
             "SECONDS": 6}[name]
        # non-dateTime lexicals: regexp_extract yields '' — NULLIF keeps
        # the SPARQL per-row expression-error semantics (unbound), where
        # an ANSI CAST('') would abort the whole query
        expr = f"nullif(regexp_extract({sql[0]}, {_XSD_DT_RE}, {g}), '')"
        if name == "SECONDS":  # xsd:decimal incl. the fraction
            return f"CAST({expr} AS DOUBLE)"
        return f"CAST({expr} AS INT)"
    if name == "TZ" and len(sql) == 1:
        return (f"regexp_extract({sql[0]}, "
                "'(Z|[+-]\\\\d{2}:\\\\d{2})$', 1)")
    if name == "TIMEZONE" and len(sql) == 1:
        # xsd:dayTimeDuration lexical of the timezone offset (SPARQL
        # 17.4.5.7): "-05:00" → -PT5H, "+05:30" → PT5H30M, Z → PT0S; a
        # value with no timezone is an expression error (NULL = unbound)
        tz = (f"regexp_extract({sql[0]}, "
              "'(Z|[+-]\\\\d{2}:\\\\d{2})$', 1)")
        hh = f"try_cast(substring({tz}, 2, 2) AS INT)"
        mm = f"try_cast(substring({tz}, 5, 2) AS INT)"
        return (
            f"(CASE WHEN {tz} = '' THEN NULL "
            f"WHEN {tz} = 'Z' OR ({hh} = 0 AND {mm} = 0) THEN 'PT0S' "
            f"ELSE concat("
            f"CASE WHEN startswith({tz}, '-') THEN '-' ELSE '' END, 'PT', "
            f"CASE WHEN {hh} > 0 THEN concat(CAST({hh} AS STRING), 'H') "
            f"ELSE '' END, "
            f"CASE WHEN {mm} > 0 THEN concat(CAST({mm} AS STRING), 'M') "
            f"ELSE '' END) END)")
    if name in ("SUBJECT", "PREDICATE", "OBJECT") and len(sql) == 1:
        # SPARQL 1.2 triple-term accessors over the stored lexical form
        # <<( s p o )>> (pipeline/rdfstar.py); a non-triple argument is an
        # expression error (NULL = unbound).  Same component regexes as
        # the quoted-triple PATTERN compiler (_compile_quoted).
        x = sql[0]
        if name == "SUBJECT":
            iri = f"regexp_extract({x}, {_sql_rx(_Q_SUBJ_IRI)}, 1)"
            blank = f"regexp_extract({x}, {_sql_rx(_Q_SUBJ_BLANK)}, 1)"
            return (f"(CASE WHEN {iri} <> '' THEN {iri} "
                    f"ELSE nullif({blank}, '') END)")
        if name == "PREDICATE":
            return f"nullif(regexp_extract({x}, {_sql_rx(_Q_PRED)}, 1), '')"
        raw = f"regexp_extract({x}, {_sql_rx(_Q_OBJ)}, 1)"
        lit = f"regexp_extract({raw}, {_sql_rx(_NT_LIT_BODY)}, 1)"
        # N-Triples literal unescape, sentinel-guarded exactly like
        # _unescape_nt_col (backslash first, through char(0))
        un = f"replace({lit}, '\\\\\\\\', char(0))"
        un = f"replace({un}, '\\\\\"', '\"')"
        un = f"replace({un}, '\\\\n', '\\n')"
        un = f"replace({un}, '\\\\r', '\\r')"
        un = f"replace({un}, '\\\\t', '\\t')"
        un = f"replace({un}, char(0), '\\\\')"
        # term identity: only a PLAIN (or xsd:string — RDF 1.1 identifies
        # the two) literal unescapes to its bare body; a lang-tagged or
        # otherwise-datatyped literal keeps its full N-Triples form so
        # OBJECT(<<( s p "x"@en )>>) never compares equal to plain "x"
        sfx = f"regexp_extract({raw}, {_sql_rx(_NT_LIT_SUFFIX)}, 1)"
        return (f"(CASE WHEN {raw} = '' THEN NULL "
                f"WHEN startswith({raw}, '<<(') THEN {raw} "
                f"WHEN startswith({raw}, '<') THEN "
                f"regexp_extract({raw}, '^<(.*)>$', 1) "
                f"WHEN startswith({raw}, '_:') THEN {raw} "
                f"WHEN {sfx} NOT IN ('', '^^<{XSD_STRING}>') "
                f"THEN {raw} "
                f"ELSE {un} END)")
    if name == "SAMETERM" and len(sql) == 2:
        # term identity: lexical form plus kind/lang/datatype whenever the
        # hidden metadata columns are present for both variable args
        parts = [f"({sql[0]} <=> {sql[1]})"]
        vars_ = [a[0][1:] if len(a) == 1 and a[0].startswith("?") else None
                 for a in args]
        if None not in vars_ and cols is not None:
            va, vb = vars_
            for pfx in ("_kind_", "_lang_", "_dt_"):
                if pfx + va in cols and pfx + vb in cols:
                    parts.append(f"(`{pfx + va}` <=> `{pfx + vb}`)")
        return "(" + " AND ".join(parts) + ")"
    raise SparqlError(f"{name} takes {len(args)} arguments?")


def _filter_sql(toks: list[str], cols: set[str] | None = None) -> str:
    """FILTER token list → Spark SQL expression (token-level, so quoted
    strings and nested parens are structurally safe).  ``cols`` is the
    compiling plan's column set — used by macros that consult hidden
    metadata columns (sameTerm)."""
    out = []
    i = 0
    while i < len(toks):
        t = toks[i]
        up = t.upper()
        if t.startswith("?"):
            # a variable the group never binds is UNBOUND: references
            # evaluate to NULL (expression error), not an analysis crash
            # — COALESCE(?never, ?x) must fall through to ?x
            if cols is not None and t[1:] not in cols:
                out.append("CAST(NULL AS STRING)")
            else:
                out.append(f"`{t[1:]}`")
        elif t.startswith('"'):
            out.append(_sql_str(t))
        elif up in _MACRO_FUNCS:
            args, i = _parse_call_args(toks, i + 1)
            out.append(_expand_macro(up, args, cols))
            continue
        elif up in _NONDET_FUNCS and toks[i + 1 : i + 2] == ["("]:
            raise SparqlError(
                f"{up}() is non-deterministic — a distributed engine "
                "re-evaluates expressions per partition and retry, which "
                "cannot honor its single-evaluation semantics")
        elif up == "BOUND":
            if i + 3 >= len(toks) or toks[i + 1] != "(" or toks[i + 3] != ")":
                raise SparqlError("BOUND takes one variable")
            var = toks[i + 2]
            if not var.startswith("?"):
                raise SparqlError("BOUND takes one variable")
            if cols is not None and var[1:] not in cols:
                out.append("false")  # never-bound variable
            else:
                out.append(f"(`{var[1:]}` IS NOT NULL)")
            i += 4
            continue
        elif up in ("LANG", "DATATYPE", "LANGDIR", "HASLANG", "HASLANGDIR"):
            if i + 3 >= len(toks) or toks[i + 1] != "(" \
                    or not toks[i + 2].startswith("?") or toks[i + 3] != ")":
                raise SparqlError(f"{up} takes one variable")
            v = toks[i + 2][1:]
            # RDF 1.2 base direction rides on the stored tag as
            # `tag--ltr|rtl`: LANG() returns the tag alone, LANGDIR() the
            # direction ('' when none), per SPARQL 1.2 §17.4.2
            base = f"regexp_replace(`_lang_{v}`, '--(ltr|rtl)$', '')"
            direction = f"regexp_extract(`_lang_{v}`, '--(ltr|rtl)$', 1)"
            if up == "LANG":
                # SPARQL LANG() returns "" for plain literals
                out.append(f"coalesce({base}, '')")
            elif up == "LANGDIR":
                out.append(f"coalesce({direction}, '')")
            elif up == "HASLANG":
                out.append(f"(coalesce({base}, '') != '')")
            elif up == "HASLANGDIR":
                out.append(f"(coalesce({direction}, '') != '')")
            else:
                # dir-lang → rdf:dirLangString; lang → rdf:langString;
                # plain → its datatype, default xsd:string
                rdf_ns = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                out.append(
                    f"(CASE WHEN {direction} != '' THEN "
                    f"'{rdf_ns}dirLangString' "
                    f"WHEN `_lang_{v}` IS NOT NULL THEN "
                    f"'{rdf_ns}langString'"
                    f" ELSE coalesce(`_dt_{v}`, "
                    f"'http://www.w3.org/2001/XMLSchema#string') END)")
            i += 4
            continue
        elif up in ("ISIRI", "ISURI", "ISLITERAL", "ISBLANK", "ISTRIPLE"):
            if i + 3 >= len(toks) or toks[i + 1] != "(" \
                    or not toks[i + 2].startswith("?") or toks[i + 3] != ")":
                raise SparqlError(f"{up} takes one variable")
            v = toks[i + 2][1:]
            kind = {"ISIRI": "iri", "ISURI": "iri",
                    "ISLITERAL": "literal", "ISBLANK": "blank",
                    "ISTRIPLE": "triple"}[up]
            out.append(f"(`_kind_{v}` = '{kind}')")
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


def _graph_nodes(triples: DataFrame, per_graph: bool = False) -> DataFrame:
    """identity pairs (n, n) over every graph term — the zero-length path
    of the `*` and `?` operators.  ``per_graph``: pairs scoped to the
    named graph each node occurs in (carrying ``_pg``)."""
    if per_graph:
        nodes = (
            triples.select(F.col("graph").alias("_pg"),
                           F.col("subj").alias("_ps"))
            .union(triples.select("graph", "obj_lexical"))
            .distinct()
        )
        return nodes.select("_pg", "_ps", F.col("_ps").alias("_po"))
    nodes = (
        triples.select(F.col("subj").alias("_ps"))
        .union(triples.select(F.col("obj_lexical")))
        .distinct()
    )
    return nodes.select("_ps", F.col("_ps").alias("_po"))


def _compile_path(triples: DataFrame, node: tuple,
                  prefixes: dict[str, str],
                  per_graph: bool = False) -> DataFrame:
    """Property path → distinct (_ps, _po) endpoint pairs (plus ``_pg``,
    the containing named graph, when ``per_graph`` — the GRAPH ?var case:
    each graph's closure is computed independently by keying every join on
    the graph column too).

    Closures (`+`/`*`) run an iterative driver-side fixpoint (join new
    frontier against the base relation, union, until no new pairs) — the
    standard DataFrame transitive closure; each round localCheckpoints to
    bound lineage.  `*` adds the identity pair for every graph term, per
    SPARQL's zero-length-path semantics."""
    kind = node[0]
    g_sel = [F.col("graph").alias("_pg")] if per_graph else []
    g_cols = ["_pg"] if per_graph else []
    if kind == "iri":
        value = _expand(node[1], prefixes)
        return (
            triples.where(F.col("pred") == value)
            .select(*g_sel, F.col("subj").alias("_ps"),
                    F.col("obj_lexical").alias("_po"))
            .distinct()
        )
    if kind == "inv":
        p = _compile_path(triples, node[1], prefixes, per_graph)
        return p.select(*g_cols, F.col("_po").alias("_ps"),
                        F.col("_ps").alias("_po"))
    if kind == "seq":
        left = _compile_path(triples, node[1], prefixes, per_graph)
        right = (
            _compile_path(triples, node[2], prefixes, per_graph)
            .withColumnRenamed("_ps", "_ms").withColumnRenamed("_po", "_mo")
        )
        return (
            left.withColumnRenamed("_po", "_ms")
            .join(right, g_cols + ["_ms"])
            .select(*g_cols, "_ps", F.col("_mo").alias("_po"))
            .distinct()
        )
    if kind == "alt":
        return (
            _compile_path(triples, node[1], prefixes, per_graph)
            .unionByName(_compile_path(triples, node[2], prefixes,
                                       per_graph))
            .distinct()
        )
    if kind == "neg":
        # §18.4: !(P|^Q) = NPS over the forward set UNION the inverse of
        # the NPS over the inverse set; a part exists only when its set
        # does (plus the forward part for plain !p)
        parts = []
        if node[1] or not node[2]:
            fwd = [_expand(t, prefixes) for t in node[1]]
            parts.append(
                triples.where(~F.col("pred").isin(fwd))
                .select(*g_sel, F.col("subj").alias("_ps"),
                        F.col("obj_lexical").alias("_po")))
        if node[2]:
            inv = [_expand(t, prefixes) for t in node[2]]
            parts.append(
                triples.where(~F.col("pred").isin(inv))
                .select(*g_sel, F.col("obj_lexical").alias("_ps"),
                        F.col("subj").alias("_po")))
        out = parts[0]
        if len(parts) == 2:
            out = out.unionByName(parts[1])
        return out.distinct()
    if kind == "opt":
        # zero-or-one: the base pairs plus the identity pair on every node
        base = _compile_path(triples, node[1], prefixes, per_graph)
        return base.unionByName(
            _graph_nodes(triples, per_graph)).distinct()
    if kind in ("plus", "star"):
        # Transitive closure by recursive doubling: composing the closure-
        # so-far with itself doubles the maximum covered path length each
        # round, so a diameter-D graph converges in ceil(log2(D)) joins —
        # and the loop runs to a true fixpoint with NO round cap (a capped
        # loop silently truncates long chains).  The closure rounds run
        # over 64-bit endpoint hashes (16-byte rows through every shuffle
        # instead of two lexical strings); endpoints decode once at the
        # end against the base relation's node dictionary.
        base = _compile_path(triples, node[1], prefixes, per_graph) \
            .distinct().localCheckpoint(eager=True)
        enc = ([F.xxhash64("_pg").alias("_pg")] if per_graph else []) + [
            F.xxhash64("_ps").alias("_ps"),
            F.xxhash64("_po").alias("_po")]
        paths = base.select(*enc).distinct().localCheckpoint(eager=True)
        while True:
            step = (
                paths.withColumnRenamed("_po", "_mid")
                .join(paths.withColumnRenamed("_ps", "_mid"),
                      g_cols + ["_mid"])
                .select(*g_cols, "_ps", "_po")
            )
            new = step.subtract(paths)
            if not new.take(1):
                break
            paths = paths.union(new).distinct().localCheckpoint(eager=True)
        nodes = (
            base.select(F.col("_ps").alias("_lex"))
            .union(base.select("_po")).distinct()
        )
        dec = nodes.select(F.xxhash64("_lex").alias("_k"), "_lex")
        paths = (
            paths.join(dec.withColumnRenamed("_k", "_ps")
                       .withColumnRenamed("_lex", "_ps_lex"), "_ps")
            .join(dec.withColumnRenamed("_k", "_po")
                  .withColumnRenamed("_lex", "_po_lex"), "_po")
        )
        if per_graph:
            gdec = (base.select(F.col("_pg").alias("_glex")).distinct()
                    .select(F.xxhash64("_glex").alias("_pg"), "_glex"))
            paths = paths.join(gdec, "_pg").select(
                F.col("_glex").alias("_pg"),
                F.col("_ps_lex").alias("_ps"),
                F.col("_po_lex").alias("_po"))
        else:
            paths = paths.select(F.col("_ps_lex").alias("_ps"),
                                 F.col("_po_lex").alias("_po"))
        if kind == "star":
            paths = paths.unionByName(
                _graph_nodes(triples, per_graph)).distinct()
        return paths
    raise SparqlError(f"unknown path node {node!r}")  # pragma: no cover


# quoted-triple component extraction (pure Catalyst regexp over the stored
# canonical <<( s p o )>> form — see pipeline/rdfstar.py for the writer)
_Q_SUBJ_IRI = r"^<<\( <([^>]*)> "
# blank-node labels may contain '_' '-' '.' (N-Triples grammar; keep in
# sync with pipeline/sinks.py:_BLANK_LABEL)
_Q_SUBJ_BLANK = r"^<<\( (_:[A-Za-z0-9_.\-]+) "
_Q_PRED = r"^<<\( (?:<[^>]*>|_:[A-Za-z0-9_.\-]+) <([^>]*)> "
_Q_OBJ = r"^<<\( (?:<[^>]*>|_:[A-Za-z0-9_.\-]+) <[^>]*> (.*) \)>>$"


def _unescape_nt_col(col):
    """N-Triples literal unescape, JVM-side: \\\\ \\" \\n \\r \\t.
    The backslash pass goes through a sentinel so later passes cannot
    double-decode (e.g. the '\\\\n' in 'a\\\\nb' must yield backslash+n)."""
    c = F.replace(col, F.lit("\\\\"), F.lit("\x00"))
    c = F.replace(c, F.lit('\\"'), F.lit('"'))
    c = F.replace(c, F.lit("\\n"), F.lit("\n"))
    c = F.replace(c, F.lit("\\r"), F.lit("\r"))
    c = F.replace(c, F.lit("\\t"), F.lit("\t"))
    return F.replace(c, F.lit("\x00"), F.lit("\\"))


def _escape_nt(s: str) -> str:
    for a, b in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                 ("\r", "\\r"), ("\t", "\\t")):
        s = s.replace(a, b)
    return s


def _dedupe_repeated_vars(scan: DataFrame, rename: dict[str, str],
                          exprs: dict | None = None
                          ) -> tuple[DataFrame, dict[str, str]]:
    """A legal pattern may repeat a variable ('?x <p> ?x', or a quoted-
    triple slot sharing an outer var): keep ONE source column per variable
    and compile the repeats into equality constraints — two identically-
    aliased projections would be an AMBIGUOUS_REFERENCE at join time."""
    first: dict[str, str] = {}
    out: dict[str, str] = {}
    for col, var in rename.items():
        if var in first:
            a = exprs[first[var]] if exprs else F.col(first[var])
            b = exprs[col] if exprs else F.col(col)
            scan = scan.where(a == b)
        else:
            first[var] = col
            out[col] = var
    return scan, out


def _compile_quoted(triples: DataFrame, pat: _Pattern,
                    prefixes: dict[str, str], idx: int,
                    extra: dict[str, str] | None = None
                    ) -> tuple[DataFrame, set[str]]:
    """Pattern with a quoted-triple object: filter obj_kind='triple' rows
    and match/bind the embedded components (SPARQL 1.2 triple-term
    patterns), all in whole-stage codegen."""
    q: _Quoted = pat.obj
    scan = triples.where(F.col("obj_kind") == "triple")
    rename: dict[str, str] = {}
    for col, term in (("subj", pat.subj), ("pred", pat.pred)):
        if isinstance(term, tuple):
            raise SparqlError(
                "property paths cannot carry quoted-triple objects")
        if term.startswith("?"):
            rename[col] = term[1:]
        else:
            scan = scan.where(F.col(col) == _expand(term, prefixes))

    lex = F.col("obj_lexical")
    q_subj = F.when(F.regexp_extract(lex, _Q_SUBJ_IRI, 1) != "",
                    F.regexp_extract(lex, _Q_SUBJ_IRI, 1)) \
        .otherwise(F.regexp_extract(lex, _Q_SUBJ_BLANK, 1))
    q_pred = F.regexp_extract(lex, _Q_PRED, 1)
    raw_obj = F.regexp_extract(lex, _Q_OBJ, 1)
    # raw object → lexical value matching what plain patterns bind
    q_obj = (
        F.when(raw_obj.startswith("<<("), raw_obj)          # nested term
        .when(raw_obj.startswith("<"),
              F.regexp_extract(raw_obj, r"^<(.*)>$", 1))    # IRI
        .when(raw_obj.startswith("_:"), raw_obj)            # blank
        .otherwise(_unescape_nt_col(
            F.regexp_extract(raw_obj, r'^"((?:[^"\\]|\\.)*)"', 1)))
    )

    proj_cols = {"q_subj": q_subj, "q_pred": q_pred, "q_obj": q_obj}
    for name, term in (("q_subj", q.subj), ("q_pred", q.pred),
                       ("q_obj", q.obj)):
        expr = proj_cols[name]
        if term.startswith("?"):
            rename[name] = term[1:]
        elif term.startswith('"') and name == "q_obj":
            # constants compare on the RENDERED form — escaping parity
            # with the writer, no decode needed.  Full term identity: the
            # rendered suffix carries @lang / ^^<dt>, so split it off and
            # compare each dimension (lang case-insensitively per BCP 47)
            value, c_lang, c_dt = _literal_parts(term, prefixes)
            quoted_part = '"' + _escape_nt(value) + '"'
            r_lit = F.regexp_extract(raw_obj, r'^("(?:[^"\\]|\\.)*")', 1)
            r_lang = F.regexp_extract(
                raw_obj, r'^"(?:[^"\\]|\\.)*"@([A-Za-z0-9\-]+)$', 1)
            r_dt = F.regexp_extract(
                raw_obj, r'^"(?:[^"\\]|\\.)*"\^\^<([^>]*)>$', 1)
            cond = r_lit == quoted_part
            if c_lang is not None:
                cond &= F.lower(r_lang) == c_lang.lower()
            elif c_dt is not None and c_dt != XSD_STRING:
                cond &= r_dt == c_dt
            else:
                cond &= ((r_lang == "")
                         & ((r_dt == "") | (r_dt == XSD_STRING)))
            scan = scan.where(cond)
        else:
            scan = scan.where(expr == _expand(term, prefixes))

    if extra:
        rename.update(extra)
    cols = dict(subj=F.col("subj"), pred=F.col("pred"),
                graph=F.col("graph") if extra else F.lit(None), **proj_cols)
    scan, rename = _dedupe_repeated_vars(scan, rename, exprs=cols)
    proj = [cols[c].alias(v) for c, v in rename.items()]
    if proj:
        scan = scan.select(*proj).distinct()
    else:
        scan = scan.select(F.lit(1).alias(f"_m{idx}")).limit(1)
    return scan, set(rename.values())


def _compile_pattern(triples: DataFrame, pat: _Pattern,
                     prefixes: dict[str, str], idx: int,
                     extra: dict[str, str] | None = None,
                     meta: set[str] | None = None
                     ) -> tuple[DataFrame, set[str]]:
    if isinstance(pat.obj, _Quoted):
        return _compile_quoted(triples, pat, prefixes, idx, extra)
    if isinstance(pat.pred, tuple):
        per_graph = False
        rename: dict[str, str] = {}
        if extra:
            if set(extra) != {"graph"}:
                raise SparqlError("property paths inside nested GRAPH "
                                  "scopes are not supported")
            # GRAPH ?var: each named graph's path relation (and closure)
            # is computed independently, keyed on the graph column
            per_graph = True
            rename["_pg"] = extra["graph"]
        pairs = _compile_path(triples, pat.pred, prefixes, per_graph)
        scan = pairs
        for col, term in (("_ps", pat.subj), ("_po", pat.obj)):
            if term.startswith("?"):
                rename[col] = term[1:]
            elif term.startswith('"'):
                scan = scan.where(
                    F.col(col) == _term_value(term, prefixes))
            else:
                scan = scan.where(F.col(col) == _expand(term, prefixes))
        out_vars = set(rename.values())
        scan, rename = _dedupe_repeated_vars(scan, rename)
        proj = [F.col(c).alias(v) for c, v in rename.items()]
        if proj:
            scan = scan.select(*proj).distinct()
        else:
            scan = scan.select(F.lit(1).alias(f"_m{idx}")).limit(1)
        return scan, out_vars

    scan = triples
    rename: dict[str, str] = {}
    for col, term in (("subj", pat.subj), ("pred", pat.pred),
                      ("obj_lexical", pat.obj)):
        if term.startswith("?"):
            rename[col] = term[1:]
        else:
            if col == "obj_lexical" and term.startswith('"'):
                value, c_lang, c_dt = _literal_parts(term, prefixes)
                scan = scan.where(_literal_match_cond(
                    F.col(col), value, c_lang, c_dt, set(triples.columns)))
                continue
            if col == "obj_lexical" and _PLAIN_SCALAR.match(term):
                # numeric/boolean shorthand → typed-literal match (lexical
                # + kind, per the engine's documented literal matching)
                scan = scan.where((F.col("obj_kind") == "literal")
                                  & (F.col(col) == term))
                continue
            value = _expand(term, prefixes)
            if col == "obj_lexical":
                scan = scan.where(F.col("obj_kind") == "iri")
            scan = scan.where(F.col(col) == value)
    if extra:
        rename.update(extra)  # GRAPH ?var: carry the graph term binding
    out_vars = set(rename.values())
    # a repeated var must match the same RDF TERM: a literal object never
    # equals an IRI/blank subject even when the lexical forms coincide
    scan, rename = _dedupe_repeated_vars(scan, rename, exprs={
        "subj": F.col("subj"), "pred": F.col("pred"),
        "obj_lexical": F.when(F.col("obj_kind") != "literal",
                              F.col("obj_lexical")),
        "graph": F.col("graph"),
    })
    if meta and pat.obj in {f"?{v}" for v in meta}:
        # LANG()/DATATYPE()/isIRI()-family filters need the term's metadata
        # alongside the lexical binding — hidden _lang_/_dt_/_kind_ columns
        v = pat.obj[1:]
        rename["obj_lang"] = f"_lang_{v}"
        rename["obj_datatype"] = f"_dt_{v}"
        rename["obj_kind"] = f"_kind_{v}"
    proj = [F.col(c).alias(v) for c, v in rename.items()]
    if proj:
        # RDF graphs are sets: duplicate captures of the same triple must
        # not multiply solutions, so every pattern scan is set-projected
        scan = scan.select(*proj).distinct()
    else:
        scan = scan.select(F.lit(1).alias(f"_m{idx}")).limit(1)
    return scan, out_vars


def _values_compat_join(plan: DataFrame, bound: set[str], scan: DataFrame,
                        vars_: set[str]) -> tuple[DataFrame, set[str]]:
    """Join a VALUES block containing UNDEF cells per SPARQL 1.1 §10.2
    solution compatibility: an UNDEF (NULL) cell is compatible with any
    binding; a bound cell must equal the other side's binding unless that
    side is itself unbound.  Shared columns merge via COALESCE.

    The condition is a theta join, but the VALUES side is an inline
    literal list (driver-local, tiny) — Spark broadcasts it, so this is
    scale-safe by construction."""
    ren = {v: f"_val_{v}" for v in sorted(vars_)}
    scan2 = scan.select([F.col(v).alias(a) for v, a in ren.items()])
    shared = sorted(bound & vars_)
    if shared:
        cond = None
        for v in shared:
            c = (F.col(ren[v]).isNull() | F.col(v).isNull()
                 | (F.col(v) == F.col(ren[v])))
            cond = c if cond is None else cond & c
        plan = plan.join(F.broadcast(scan2), cond, "inner")
    else:
        plan = plan.crossJoin(F.broadcast(scan2))
    for v in sorted(vars_):
        plan = plan.withColumn(
            v, F.coalesce(F.col(v), F.col(ren[v])) if v in bound
            else F.col(ren[v]))
    return plan.drop(*ren.values()), bound | set(vars_)


def _compat_parts_join(plan: DataFrame, scan: DataFrame, keys: list[str],
                       left_null: set[str], right_null: set[str]
                       ) -> DataFrame:
    """SPARQL §10.2 compatibility join as a UNION of plain equi-joins —
    the scale path (a theta join with ``IS NULL OR =`` disjuncts forces a
    broadcast-nested-loop, quadratic on large inputs).

    Textbook rewrite: partition each side by its null signature over the
    nullable shared keys; a (left-part, right-part) pair joins on exactly
    the keys bound on BOTH sides — hash-joinable equality — and the parts
    union back, COALESCE re-binding each key from whichever side bound it.
    2^|left_null| · 2^|right_null| parts; callers cap the nullable-key
    count (more than 2-3 compat keys in one join is not a real query).
    The all-null × all-null pairing is a genuine product per the spec
    (every solution pair is compatible); its inputs are only the rows
    unbound on EVERY shared key (UNDEF cells / OPTIONAL misses)."""
    ren = {v: f"_cj_{v}" for v in keys}
    scan2 = scan
    for v in keys:
        scan2 = scan2.withColumnRenamed(v, ren[v])
    # each input subtree appears once PER PART in the unioned plan; past
    # a handful of parts (>2 nullable keys on a side, or a chain of
    # compat joins whose left input is already a part-union) that means
    # re-executing the same upstream work 2^k times — truncate lineage
    # with a lazy localCheckpoint so the parts share one materialized
    # input instead (the common 1-key cases stay pure Catalyst).  NB:
    # localCheckpoint stores partitions unreplicated on executors — fine
    # in local mode (this repo's deployment); on a cluster with executor
    # loss or dynamic allocation prefer reliable checkpointing here
    n_parts = (1 << len(left_null)) * (1 << len(right_null))
    if n_parts > 4:
        plan = plan.localCheckpoint(eager=False)
        scan2 = scan2.localCheckpoint(eager=False)

    def _parts(df, null_vars, col_of):
        out = []
        for bits in range(1 << len(null_vars)):
            sig = {v for i, v in enumerate(null_vars) if bits >> i & 1}
            part = df
            for v in null_vars:
                c = col_of(v)
                part = part.where(c.isNull() if v in sig else c.isNotNull())
            out.append((sig, part))
        return out

    joined = []
    for s_sig, lp in _parts(plan, sorted(left_null), F.col):
        for t_sig, rp in _parts(scan2, sorted(right_null),
                                lambda v: F.col(ren[v])):
            jk = [k for k in keys if k not in s_sig and k not in t_sig]
            if jk:
                cond = None
                for v in jk:
                    c = F.col(v) == F.col(ren[v])
                    cond = c if cond is None else cond & c
                joined.append(lp.join(rp, cond, "inner"))
            else:
                joined.append(lp.crossJoin(rp))
    out = joined[0]
    for p in joined[1:]:
        out = out.unionByName(p)
    for v in keys:
        out = out.withColumn(v, F.coalesce(F.col(v), F.col(ren[v])))
    return out.drop(*ren.values())


def _join(plan: DataFrame, bound: set[str], scan: DataFrame,
          vars_: set[str], how: str,
          nullable: set[str] | None = None,
          scan_nullable: set[str] | None = None,
          deferred: list[list[str]] | None = None
          ) -> tuple[DataFrame, set[str]]:
    """Join the next group element.  ``nullable`` names plan columns that
    may hold NULL = unbound (VALUES UNDEF cells), ``scan_nullable`` the
    same for the incoming element (a subgroup carrying UNDEF): shared
    keys among them use SPARQL §10.2 compatibility (NULL on the nullable
    side matches anything, then COALESCE re-binds) instead of an
    equi-join that would silently drop the unbound rows.  Inner
    compatibility joins re-bind a key unless BOTH sides can be unbound;
    left joins keep plan-side nullability; non-key scan vars that may be
    UNDEF propagate into ``nullable``."""
    keys = sorted(bound & vars_)
    left_null = {k for k in keys if nullable and k in nullable}
    right_null = {k for k in keys if scan_nullable and k in scan_nullable}
    null_keys = sorted(left_null | right_null)
    if (null_keys and not deferred and how == "inner"
            and len(null_keys) <= 3):
        # inner compatibility join without extra ON conditions: take the
        # union-of-equi-joins scale path instead of a theta join
        plan = _compat_parts_join(plan, scan, keys, left_null, right_null)
        if nullable is not None:
            # a key re-binds (stops being nullable) unless BOTH sides
            # could be unbound for it
            nullable -= {k for k in null_keys
                         if not (k in left_null and k in right_null)}
            nullable |= {v for v in (scan_nullable or ())
                         if v not in keys}
        return plan, bound | vars_
    if null_keys or deferred:
        ren = {v: f"_cj_{v}" for v in keys}
        scan2 = scan
        for v in keys:
            scan2 = scan2.withColumnRenamed(v, ren[v])
        cond = None
        for v in keys:
            c = F.col(v) == F.col(ren[v])
            if v in left_null:
                c = F.col(v).isNull() | c
            if v in right_null:
                c = F.col(ren[v]).isNull() | c
            cond = c if cond is None else cond & c
        # deferred OPTIONAL filters referencing enclosing-scope vars join
        # the ON condition (SPARQL left-join semantics: condition false /
        # error keeps the left row unextended).  Scan-side keys were
        # renamed, so each var resolves unambiguously: keys + outer vars
        # to the plan side, non-key subgroup vars to the scan side.
        cols_all = set(plan.columns) | set(scan2.columns)
        for ftoks in deferred or []:
            fc = F.expr(_filter_sql(ftoks, cols_all))
            cond = fc if cond is None else cond & fc
        plan = plan.join(scan2, cond if cond is not None else F.lit(True),
                         how)
        for v in keys:
            plan = plan.withColumn(v, F.coalesce(F.col(v), F.col(ren[v])))
        plan = plan.drop(*ren.values())
        if how == "inner" and nullable is not None:
            nullable -= {k for k in null_keys
                         if not (k in left_null and k in right_null)}
    elif keys:
        plan = plan.join(scan, keys, how)
    elif how == "left":
        raise SparqlError("OPTIONAL group shares no variables with the "
                          "preceding patterns")
    else:
        plan = plan.crossJoin(scan)  # genuinely disconnected patterns
    if nullable is not None and scan_nullable:
        nullable |= {v for v in scan_nullable if v not in keys}
    return plan, bound | vars_


def _pattern_vars(p: _Pattern) -> set[str]:
    out = set()
    terms = [p.subj]
    if isinstance(p.pred, str):
        terms.append(p.pred)
    if isinstance(p.obj, _Quoted):
        terms += [p.obj.subj, p.obj.pred, p.obj.obj]
    else:
        terms.append(p.obj)
    for t in terms:
        if t.startswith("?"):
            out.add(t[1:])
    return out


def _selectivity(p: _Pattern) -> int:
    """Classic bound-term heuristic: constants in subject > predicate >
    object position; property paths are the least selective."""
    score = 0
    if not p.subj.startswith("?"):
        score += 4
    if isinstance(p.pred, tuple):
        score -= 2  # path closure: potentially large endpoint relation
    elif not p.pred.startswith("?"):
        score += 2
    obj_terms = ([p.obj.subj, p.obj.pred, p.obj.obj]
                 if isinstance(p.obj, _Quoted) else [p.obj])
    score += sum(1 for t in obj_terms if not t.startswith("?"))
    return score


def _reorder_patterns(patterns: list[_Pattern]) -> list[_Pattern]:
    """Greedy join ordering for a run of inner-joined triple patterns:
    start from the most selective, always prefer a pattern connected to the
    already-bound variables (avoiding cross joins unless the BGP is
    genuinely disconnected).  Inner joins commute and filters apply at
    group scope, so this is semantics-preserving."""
    remaining = list(patterns)
    out: list[_Pattern] = []
    bound: set[str] = set()
    while remaining:
        connected = [p for p in remaining
                     if not bound or (_pattern_vars(p) & bound)]
        pool = connected or remaining
        best = max(pool, key=_selectivity)
        remaining.remove(best)
        out.append(best)
        bound |= _pattern_vars(best)
    return out


def _reorder_group(elements: list) -> list:
    """Reorder each maximal run of consecutive triple patterns; order
    across OPTIONAL/MINUS/BIND/... boundaries is preserved (those are
    sequence-sensitive in the SPARQL algebra)."""
    out: list = []
    run: list[_Pattern] = []
    for el in elements:
        if isinstance(el, _Pattern):
            run.append(el)
        else:
            out += _reorder_patterns(run)
            run = []
            out.append(el)
    out += _reorder_patterns(run)
    return out


def _meta_vars(elements: list) -> set[str]:
    """Variables whose literal metadata the group's filters inspect via
    LANG(?v) / DATATYPE(?v) — their pattern scans must carry it along."""
    need: set[str] = set()
    for el in elements:
        if isinstance(el, tuple) and el and el[0] == "filter":
            toks = el[1]
            for i, t in enumerate(toks):
                if t.upper() in ("LANG", "DATATYPE", "LANGDIR", "HASLANG",
                                 "HASLANGDIR", "ISIRI", "ISURI",
                                 "ISLITERAL", "ISBLANK", "ISTRIPLE") \
                        and toks[i + 1 : i + 2] == ["("] \
                        and i + 2 < len(toks) and toks[i + 2].startswith("?"):
                    need.add(toks[i + 2][1:])
                elif t.upper() == "SAMETERM" and toks[i + 1 : i + 2] == ["("]:
                    # both (all) variable args want their term metadata
                    args, _ = _parse_call_args(toks, i + 1)
                    for a in args:
                        if len(a) == 1 and a[0].startswith("?"):
                            need.add(a[0][1:])
    return need


def _all_vars(obj) -> set[str]:
    """Every ?var mentioned anywhere inside a parsed element (patterns,
    filter token lists, subgroups, VALUES, BIND, subselect tokens...)."""
    if isinstance(obj, _Pattern):
        return _pattern_vars(obj)
    if isinstance(obj, _Group):
        out: set[str] = set()
        for el in obj.elements:
            out |= _all_vars(el)
        return out
    if isinstance(obj, str):
        return {obj[1:]} if obj.startswith("?") else set()
    if isinstance(obj, tuple) and obj:
        # element shapes that store var names WITHOUT the '?' prefix
        if obj[0] == "values":
            return set(obj[1])
        if obj[0] == "bind":
            return _all_vars(obj[1]) | {obj[2]}
    if isinstance(obj, (list, tuple)):
        out = set()
        for item in obj:
            out |= _all_vars(item)
        return out
    return set()


# --- dictionary-encoded BGP runs -------------------------------------------
# Consecutive plain triple patterns compile to equi-joins on 64-bit term
# ids (xxhash64 over the term's kind/lexical/lang/datatype identity) instead
# of lexical strings: intermediate joins shuffle longs, and variables used
# only as join keys are never materialized at all.  Lexical values come
# back via one small decode join per *referenced* variable against the
# (already pred-filtered) scan that bound it.  This also makes joins
# term-correct: a literal "x" never joins an IRI "x".

_ID_EXPRS = None


def _id_exprs():
    global _ID_EXPRS
    if _ID_EXPRS is None:
        subj_kind = F.when(F.col("subj").startswith("_:"),
                           F.lit("blank")).otherwise(F.lit("iri"))
        _ID_EXPRS = {
            "subj": F.xxhash64(subj_kind, F.col("subj"), F.lit(""),
                               F.lit("")),
            "pred": F.xxhash64(F.lit("iri"), F.col("pred"), F.lit(""),
                               F.lit("")),
            "obj": F.xxhash64(F.col("obj_kind"), F.col("obj_lexical"),
                              F.coalesce(F.col("obj_lang"), F.lit("")),
                              F.coalesce(F.col("obj_datatype"),
                                         F.lit(""))),
        }
    return _ID_EXPRS


_LEX_COLS = {"subj": "subj", "pred": "pred", "obj": "obj_lexical"}


def _run_pattern_scan(triples: DataFrame, pat: _Pattern,
                      prefixes: dict[str, str]
                      ) -> tuple[DataFrame, dict[str, str]]:
    """Constant-filtered scan + {slot: var} map for one run pattern."""
    scan = triples
    rename: dict[str, str] = {}
    for slot, term in (("subj", pat.subj), ("pred", pat.pred),
                       ("obj", pat.obj)):
        if term.startswith("?"):
            rename[slot] = term[1:]
            continue
        col = _LEX_COLS[slot]
        if slot == "obj" and term.startswith('"'):
            # full RDF term identity, byte-identical to the slow path in
            # _compile_pattern (lang tags case-insensitive, plain ≡
            # xsd:string) — CLAUDE.md rule 8
            value, c_lang, c_dt = _literal_parts(term, prefixes)
            scan = scan.where(_literal_match_cond(
                F.col(col), value, c_lang, c_dt, set(triples.columns)))
        elif slot == "obj" and _PLAIN_SCALAR.match(term):
            scan = scan.where((F.col("obj_kind") == "literal")
                              & (F.col(col) == term))
        else:
            if slot == "obj":
                scan = scan.where(F.col("obj_kind") == "iri")
            scan = scan.where(F.col(col) == _expand(term, prefixes))
    return scan, rename


# test hook: the differential fuzz gate (tests/test_sparql_fuzz.py) flips
# this off to compare id-run plans against pure single-pattern compilation
_ID_RUNS_ENABLED = True


def _run_eligible(pat, meta: set[str], extra) -> bool:
    if not _ID_RUNS_ENABLED:
        return False
    if extra is not None or isinstance(pat.pred, tuple) \
            or isinstance(pat.obj, _Quoted):
        return False
    vars_ = [t[1:] for t in (pat.subj, pat.pred, pat.obj)
             if isinstance(t, str) and t.startswith("?")]
    if len(vars_) != len(set(vars_)):
        return False  # repeated-var patterns use the single-pattern path
    if meta and pat.obj.startswith("?") and pat.obj[1:] in meta:
        return False  # metadata attachment stays on the single path
    return True


def _compile_run_ids(triples: DataFrame, run: list[_Pattern],
                     prefixes: dict[str, str],
                     needed: set[str] | None
                     ) -> tuple[DataFrame, set[str]]:
    """A run of ≥2 plain patterns → id-joined solutions with lexical
    columns for the ``needed`` variables (all of them when None)."""
    ids = _id_exprs()
    scans: list[tuple[DataFrame, dict[str, str]]] = []
    first_binder: dict[str, tuple[DataFrame, str]] = {}
    for pat in run:
        scan, rename = _run_pattern_scan(triples, pat, prefixes)
        scans.append((scan, rename))
        for slot, v in rename.items():
            first_binder.setdefault(v, (scan, slot))

    plan: DataFrame | None = None
    bound: set[str] = set()
    for k, (scan, rename) in enumerate(scans):
        proj = [ids[slot].alias(f"_tid_{v}") for slot, v in rename.items()]
        idscan = (scan.select(*proj).distinct() if proj
                  else scan.select(F.lit(1).alias(f"_tid1_{k}")).limit(1))
        vars_ = set(rename.values())
        if plan is None:
            plan = idscan
        else:
            keys = [f"_tid_{v}" for v in sorted(bound & vars_)]
            plan = plan.join(idscan, keys) if keys \
                else plan.crossJoin(idscan)
        bound |= vars_

    decode = bound if needed is None else (bound & needed)
    for v in sorted(decode):
        scan, slot = first_binder[v]
        dec = scan.select(ids[slot].alias(f"_tid_{v}"),
                          F.col(_LEX_COLS[slot]).alias(v)).distinct()
        plan = plan.join(dec, f"_tid_{v}")
    drop = [c for c in plan.columns
            if c.startswith("_tid_") or c.startswith("_tid1_")]
    return plan.drop(*drop), decode


def _compile_group(triples: DataFrame, group: _Group,
                   prefixes: dict[str, str],
                   quads: DataFrame | None = None,
                   extra: dict[str, str] | None = None,
                   want_meta: set[str] | None = None,
                   needed: set[str] | None = None,
                   out_nullable: set[str] | None = None,
                   outer_bound: set[str] | None = None,
                   out_deferred: list[list[str]] | None = None,
                   seed: tuple[DataFrame, set[str]] | None = None
                   ) -> tuple[DataFrame, set[str]]:
    """``out_nullable``: mutable set the caller passes to learn which of
    the returned variables may be NULL = UNDEF-unbound (VALUES UNDEF
    cells surviving this group) — nullability must cross subgroup
    boundaries or the caller's joins silently use SQL equality on them.

    ``outer_bound``: variables bound in the ENCLOSING scope.  A filter
    referencing them but not bound here is DEFERRED via ``out_deferred``
    (mutable list of token lists) so the caller can evaluate it where
    those bindings are visible — the substitution semantics EXISTS and
    OPTIONAL need; ONLY those two callers pass it (strict bottom-up
    scoping everywhere else: plain {} / GRAPH / UNION / MINUS /
    subselect compiles leave it None, so their filters read enclosing
    variables as unbound NULLs).

    ``seed``: optional (DataFrame, vars) the group compiles AGAINST as
    its initial solution multiset — the EXISTS substitution path seeds
    the distinct outer bindings a subgroup BIND references so the BIND
    evaluates with them visible."""
    plan: DataFrame | None
    bound: set[str]
    plan, bound = (seed[0], set(seed[1])) if seed is not None \
        else (None, set())
    filters: list[list[str]] = []
    exists: list[tuple[bool, _Group]] = []
    # filter-driven metadata vars (LANG/DATATYPE — ambiguity is an error)
    # plus soft requests from CONSTRUCT/UPDATE templates (the solution's
    # own term kind; on multiple object-position bindings the first wins)
    meta_filter = _meta_vars(group.elements)
    meta = meta_filter | (want_meta or set()) \
        | _triple_bind_vars(group.elements)
    meta_provided: set[str] = set()
    # batch consecutive id-join-eligible patterns into BGP runs
    elements: list = []
    buf: list[_Pattern] = []

    def _flush():
        if len(buf) >= 2:
            elements.append(("bgp_run", list(buf)))
        elif buf:
            elements.append(buf[0])
        buf.clear()

    for el in _reorder_group(group.elements):
        if isinstance(el, _Pattern) and _run_eligible(el, meta, extra):
            buf.append(el)
        else:
            _flush()
            elements.append(el)
    _flush()

    # variables that may be NULL = unbound in `plan` (VALUES UNDEF
    # cells): subsequent joins on them use §10.2 compatibility (_join)
    nullable: set[str] = set()

    # the scope visible to subgroups: everything bound here so far plus
    # whatever our own enclosing scope bound
    def _sub_outer() -> set[str]:
        return bound | (outer_bound or set())

    for idx, el in enumerate(elements):
        scan_null: set[str] = set()  # UNDEF-nullable vars of THIS element
        scan_defer: list[list[str]] = []  # outer-referencing sub filters
        if isinstance(el, tuple) and el and el[0] == "bgp_run":
            if needed is None:
                run_needed = None
            else:
                run_needed = set(needed) | (want_meta or set())
                for other in elements:
                    if other is not el:
                        run_needed |= _all_vars(other)
            scan, vars_ = _compile_run_ids(triples, el[1], prefixes,
                                           run_needed)
            how = "inner"
        elif isinstance(el, _Pattern):
            pat_meta = meta
            if meta and not isinstance(el.obj, _Quoted) \
                    and el.obj.startswith("?") and el.obj[1:] in meta:
                v = el.obj[1:]
                if v in meta_provided:
                    if v in meta_filter:
                        raise SparqlError(
                            f"LANG/DATATYPE(?{v}) is ambiguous: ?{v} is "
                            "bound in object position by more than one "
                            "pattern")
                    pat_meta = meta - {v}
                else:
                    meta_provided.add(v)
            scan, vars_ = _compile_pattern(triples, el, prefixes, idx, extra,
                                           pat_meta)
            how = "inner"
        elif el[0] == "filter":
            filters.append(el[1])
            continue
        elif el[0] == "exists":
            exists.append((el[1], el[2]))
            continue
        elif el[0] == "graph":
            # GRAPH term { sub }: scope the subgroup's pattern scans to the
            # named graphs — constant: one equi-filter; variable: bind the
            # graph column alongside each pattern's variables
            if quads is None:
                raise SparqlError(
                    "GRAPH requires a quads input (a 'graph' column)")
            term, sub = el[1], el[2]
            # a nested GRAPH RE-SCOPES the active graph (SPARQL §13.3):
            # an enclosing GRAPH ?var is never bound by this subgroup, so
            # its binding is dropped from the inner scope here; when the
            # enclosing subgroup ends up not binding its var at all, the
            # var-branch below crosses with the named-graph list
            inner_extra = {k: v for k, v in (extra or {}).items()
                           if k != "graph"}
            if term.startswith("?"):
                gv = term[1:]
                frame = quads.where(F.col("graph").isNotNull())
                sub_extra = {**inner_extra, "graph": gv}
                # strict bottom-up scoping (§18.2): filters inside the
                # GRAPH group never see enclosing bindings
                scan, vars_ = _compile_group(frame, sub, prefixes, quads,
                                             sub_extra,
                                             out_nullable=scan_null)
                if gv not in vars_:
                    # subgroup held only nested GRAPH scopes: ?gv still
                    # ranges over every named graph (a genuine cross —
                    # the name list is small by construction)
                    names = (quads.where(F.col("graph").isNotNull())
                             .select(F.col("graph").alias(gv)).distinct())
                    scan = scan.crossJoin(names)
                    vars_ = vars_ | {gv}
            else:
                frame = quads.where(
                    F.col("graph") == _expand(term, prefixes))
                scan, vars_ = _compile_group(frame, sub, prefixes, quads,
                                             inner_extra,
                                             out_nullable=scan_null)
            how = "inner"
        elif el[0] == "bind":
            # BIND applies to the solutions built so far, in sequence
            if plan is None:
                raise SparqlError("BIND cannot be the first group element")
            expr_toks, alias = el[1], el[2]
            if alias in bound:
                raise SparqlError(f"BIND reassigns bound variable ?{alias}")
            if expr_toks and expr_toks[0].upper() == "TRIPLE":
                t_args, t_end = _parse_call_args(expr_toks, 1)
                if t_end != len(expr_toks):
                    raise SparqlError(
                        "TRIPLE(...) nested inside a larger BIND "
                        "expression is not supported")
                plan = plan.withColumn(
                    alias, _triple_ctor_col(t_args, prefixes, plan))
                t_guard = F.col(alias).isNotNull()
                plan = (plan.withColumn(
                    f"_kind_{alias}", F.when(t_guard, F.lit("triple")))
                    .withColumn(f"_lang_{alias}",
                                F.lit(None).cast("string"))
                    .withColumn(f"_dt_{alias}",
                                F.lit(None).cast("string")))
                bound = bound | {alias}
                continue
            ctor = _term_constructor_bind(expr_toks, prefixes)
            if ctor is not None:
                # STRLANG/STRDT/IRI build a TYPED term: the value column
                # plus hidden _kind_/_lang_/_dt_ metadata, so LANG()/
                # DATATYPE()/isIRI and CONSTRUCT kinds see the real type.
                # A NULL value = constructor over an unbound arg = SPARQL
                # expression error → the variable stays UNBOUND, so the
                # metadata must be NULL too (isIRI of unbound is not true)
                value_toks, kind, lang, dt = ctor
                cols = set(plan.columns)
                plan = plan.withColumn(
                    alias, F.expr(_filter_sql(value_toks, cols)))
                bound_guard = F.col(alias).isNotNull()
                plan = (
                    plan.withColumn(
                        f"_kind_{alias}",
                        F.when(bound_guard, F.lit(kind)))
                    .withColumn(
                        f"_lang_{alias}",
                        F.when(bound_guard,
                               F.lit(lang).cast("string")))
                    .withColumn(
                        f"_dt_{alias}",
                        F.when(bound_guard, F.lit(dt).cast("string")))
                )
            else:
                plan = plan.withColumn(
                    alias, F.expr(_filter_sql(expr_toks, set(plan.columns))))
            bound = bound | {alias}
            continue
        elif el[0] == "minus":
            # SPARQL MINUS: drop solutions compatible with the right side.
            # Exact under SQL semantics when the shared variables are bound;
            # with NO shared variables the spec keeps everything (domains
            # are disjoint, every pair is trivially compatible but removal
            # requires a shared binding) → no-op.
            if plan is None:
                raise SparqlError("MINUS cannot be the first group element")
            # only variables SHARED with the left side ever matter on the
            # right (they become the anti-join keys) — id-runs inside the
            # subgroup skip decoding everything else
            # NO outer_bound here: per §8.3 the MINUS right side does NOT
            # see left bindings, so a filter on an outer var evaluates
            # with it unbound (NULL) — exactly the famous MINUS vs
            # NOT-EXISTS divergence
            r_null: set[str] = set()
            right, rv = _compile_group(triples, el[1], prefixes, quads,
                                       extra, needed=set(bound),
                                       out_nullable=r_null)
            keys = sorted(bound & rv)
            null_keys = {k for k in keys if k in nullable or k in r_null}
            if keys and null_keys:
                # UNDEF-nullable keys on the left: exact §8.3 MINUS —
                # remove rows with a COMPATIBLE right row (NULL on either
                # side matches) whose domains overlap (≥1 var bound on
                # both sides).  Theta join over the distinct key tuples:
                # only UNDEF-carrying queries (small VALUES-driven key
                # sets) take this path, equi-anti-join otherwise.
                ren = {k: f"_mn_{k}" for k in keys}
                right2 = right.select(
                    [F.col(k).alias(ren[k]) for k in keys]).distinct()
                compat, overlap = None, None
                for k in keys:
                    c = F.col(k) == F.col(ren[k])
                    c = F.col(k).isNull() | F.col(ren[k]).isNull() | c
                    compat = c if compat is None else compat & c
                    o = F.col(k).isNotNull() & F.col(ren[k]).isNotNull()
                    overlap = o if overlap is None else overlap | o
                plan = plan.join(right2, compat & overlap, "left_anti")
            elif keys:
                plan = plan.join(right.select(*keys).distinct(),
                                 keys, "left_anti")
            continue
        elif el[0] == "values":
            vars_, rows = el[1], el[2]
            data = [tuple(None if t is None else _term_value(t, prefixes)
                          for t in row)
                    for row in rows]
            scan = triples.sparkSession.createDataFrame(
                data, ", ".join(f"`{v}` string" for v in vars_))
            undef_vars = {v for v in vars_
                          if any(row[vars_.index(v)] is None
                                 for row in data)}
            if undef_vars:
                if plan is None:
                    # the VALUES rows ARE the group so far; NULL cells
                    # stay unbound and compat-join with what follows
                    plan, bound = scan, set(vars_)
                else:
                    plan, bound = _values_compat_join(
                        plan, bound, scan, set(vars_))
                nullable |= undef_vars
                continue
            vars_, how = set(vars_), "inner"
        elif el[0] == "subselect":
            scan, out_cols = _compile_select(triples, el[1], prefixes,
                                             quads, out_nullable=scan_null)
            vars_, how = set(out_cols), "inner"
        elif el[0] in ("optional", "group", "union"):
            # a subgroup's id-joined runs must decode anything the OUTER
            # query can see: the projection surface plus every variable any
            # sibling element (or the plan built so far) mentions
            if needed is None:
                sub_needed = None
            else:
                sub_needed = set(needed) | bound | (want_meta or set())
                for other in elements:
                    if other is not el:
                        sub_needed |= _all_vars(other)
            if el[0] == "union":
                # strict §18.2 bottom-up scoping: a UNION branch never
                # sees enclosing-group bindings — a filter referencing
                # one evaluates it as unbound (NULL → error → false),
                # exactly like reference engines (no outer_bound here)
                left, lv = _compile_group(triples, el[1], prefixes, quads,
                                          extra, want_meta=meta,
                                          needed=sub_needed,
                                          out_nullable=scan_null)
                right, rv = _compile_group(triples, el[2], prefixes, quads,
                                           extra, want_meta=meta,
                                           needed=sub_needed,
                                           out_nullable=scan_null)
                scan = left.unionByName(right, allowMissingColumns=True)
                # a variable bound in only ONE branch is NULL = unbound on
                # the other branch's rows: thread it as nullable so later
                # joins on it use §10.2 compatibility, not SQL equality
                scan_null |= (lv - rv) | (rv - lv)
                vars_, how = lv | rv, "inner"
            else:
                # OPTIONAL filters may reference left-side vars (the
                # LeftJoin expression, §18.2.2.7) — defer them into the
                # join condition.  A plain nested {} gets strict
                # bottom-up scoping: no outer_bound, so filters over
                # enclosing vars evaluate them as unbound (NULL)
                if el[0] == "optional":
                    scan, vars_ = _compile_group(
                        triples, el[1], prefixes, quads, extra,
                        want_meta=meta, needed=sub_needed,
                        out_nullable=scan_null,
                        outer_bound=_sub_outer(),
                        out_deferred=scan_defer)
                else:
                    scan, vars_ = _compile_group(
                        triples, el[1], prefixes, quads, extra,
                        want_meta=meta, needed=sub_needed,
                        out_nullable=scan_null)
                how = "left" if el[0] == "optional" else "inner"
        else:  # pragma: no cover
            raise SparqlError(f"unknown group element {el!r}")
        if plan is None:
            if how == "left":
                raise SparqlError("OPTIONAL cannot be the first pattern")
            plan, bound = scan, vars_
            nullable |= scan_null
        else:
            prev_bound = set(bound)
            plan, bound = _join(plan, bound, scan, vars_, how, nullable,
                                scan_null,
                                deferred=scan_defer if how == "left"
                                else None)
            if how == "left":
                # §8.3: variables an OPTIONAL introduces are NULL =
                # unbound on non-matching rows — later elements sharing
                # them join via §10.2 compatibility exactly like VALUES
                # UNDEF cells (the r4 machinery; shared keys keep their
                # left-side binding and stay non-null)
                nullable |= vars_ - prev_bound
    if plan is None:
        raise SparqlError("empty group pattern")
    # metadata filters on vars bound in SUBJECT/PREDICATE position: kind
    # is derivable there (a subject is blank iff its label starts '_:';
    # subjects/predicates are never literals), so derive the hidden
    # columns instead of crashing with an unresolved-column error; any
    # other un-attached metadata var is a loud SparqlError
    if meta_filter:
        subjpred = set()
        def _collect_sp(els):
            for e0 in els:
                if isinstance(e0, _Pattern):
                    if e0.subj.startswith("?"):
                        subjpred.add(e0.subj[1:])
                    if isinstance(e0.pred, str) and e0.pred.startswith("?"):
                        subjpred.add(e0.pred[1:])
                elif isinstance(e0, tuple) and e0 and e0[0] in (
                        "optional", "group", "graph"):
                    sub = e0[2] if e0[0] == "graph" else e0[1]
                    _collect_sp(sub.elements)
                elif isinstance(e0, tuple) and e0 and e0[0] == "union":
                    _collect_sp(e0[1].elements)
                    _collect_sp(e0[2].elements)
        _collect_sp(group.elements)
        for v in sorted(meta_filter):
            if f"_kind_{v}" in plan.columns or v not in bound:
                continue
            if v in subjpred:
                plan = (plan.withColumn(
                    f"_kind_{v}",
                    F.when(F.col(v).startswith("_:"), F.lit("blank"))
                    .otherwise(F.lit("iri")))
                    .withColumn(f"_lang_{v}",
                                F.lit(None).cast("string"))
                    .withColumn(f"_dt_{v}", F.lit(None).cast("string")))
            else:
                raise SparqlError(
                    f"isIRI/LANG/DATATYPE(?{v}) requires ?{v} bound by a "
                    "triple pattern in this group")
    # SPARQL filter scope: this group, after all its elements joined.
    # Filters referencing variables bound only in the ENCLOSING scope
    # defer to the caller ONLY where the spec substitutes outer bindings
    # (OPTIONAL → left-join ON condition §18.2.2.7, EXISTS → semi/anti
    # condition §18.6); every other position — plain nested {}, GRAPH,
    # UNION branches, MINUS right side, subselects — never sets
    # outer_bound, so such filters evaluate the variable as unbound
    # (NULL → expression error → false), the strict bottom-up scoping
    # reference engines implement.
    for ftoks in filters:
        fvars = {t[1:] for t in ftoks if t.startswith("?")}
        missing = fvars - set(plan.columns)
        if missing and outer_bound and missing & outer_bound:
            if out_deferred is None:
                raise SparqlError(
                    "FILTER references enclosing-group variables ("
                    + ", ".join("?" + v
                                for v in sorted(missing & outer_bound))
                    + ") where outer bindings cannot be seen (e.g. a "
                    "UNION branch)")
            out_deferred.append(ftoks)
            continue
        plan = plan.where(_filter_sql(ftoks, set(plan.columns)))
    # EXISTS/NOT EXISTS: correlated on the shared variables → semi/anti join
    # (the standard decorrelation; exact for the supported fragment, where
    # the inner group references the outer row only through shared vars)
    for positive, sub in exists:
        e_null: set[str] = set()
        e_def: list[list[str]] = []
        # substitution semantics for BINDs over outer variables: a BIND
        # computes columns and cannot defer like a filter — seed the
        # subgroup with the DISTINCT outer bindings it references, so the
        # expression evaluates against real values (spec: substitute the
        # outer solution into the EXISTS pattern).  Seeded vars join the
        # semi/anti keys through the normal shared-variable machinery.
        e_seed_vars = _outer_bind_vars(sub, bound)
        e_seed = ((plan.select(*sorted(e_seed_vars)).distinct(),
                   e_seed_vars) if e_seed_vars else None)
        sub_plan, sub_vars = _compile_group(triples, sub, prefixes, quads,
                                            extra, needed=set(bound),
                                            out_nullable=e_null,
                                            outer_bound=bound
                                            | (outer_bound or set()),
                                            out_deferred=e_def,
                                            seed=e_seed)
        keys = sorted(bound & sub_vars)
        how = "left_semi" if positive else "left_anti"
        null_keys = {k for k in keys if k in nullable or k in e_null}
        if e_def:
            # substitution semantics: the subgroup's filters on OUTER
            # variables correlate the semi/anti join.  Scan side fully
            # renamed (_ex_*), filter tokens rewritten to the renamed
            # columns for subgroup-bound vars — outer vars resolve
            # against the plan side.
            fvars: set[str] = set()
            for ftoks in e_def:
                fvars |= {t[1:] for t in ftoks if t.startswith("?")}
            need_cols = set(keys) | (fvars & sub_vars)
            sub2 = sub_plan.select(*sorted(need_cols)).distinct() \
                if need_cols else sub_plan.limit(1)
            for c in (need_cols or set(sub2.columns)):
                sub2 = sub2.withColumnRenamed(c, f"_ex_{c}")
            cond = None
            for k in keys:
                c = F.col(k) == F.col(f"_ex_{k}")
                if k in null_keys:
                    c = F.col(k).isNull() | F.col(f"_ex_{k}").isNull() | c
                cond = c if cond is None else cond & c
            cols_all = set(plan.columns) | set(sub2.columns)
            for ftoks in e_def:
                rtoks = ["?_ex_" + t[1:]
                         if t.startswith("?") and t[1:] in sub_vars else t
                         for t in ftoks]
                fc = F.expr(_filter_sql(rtoks, cols_all))
                cond = fc if cond is None else cond & fc
            plan = plan.join(sub2,
                             cond if cond is not None else F.lit(True),
                             how)
        elif keys and null_keys:
            # UNDEF-nullable keys: substitute-then-evaluate semantics —
            # an unbound outer var constrains nothing, so compatibility
            # (NULL on either side matches) replaces equality.  Same
            # theta-join scale note as the MINUS branch above.
            ren = {k: f"_ex_{k}" for k in keys}
            sub2 = sub_plan.select(
                [F.col(k).alias(ren[k]) for k in keys]).distinct()
            compat = None
            for k in keys:
                c = F.col(k) == F.col(ren[k])
                c = F.col(k).isNull() | F.col(ren[k]).isNull() | c
                compat = c if compat is None else compat & c
            plan = plan.join(sub2, compat, how)
        elif keys:
            plan = plan.join(sub_plan.select(*keys).distinct(), keys, how)
        else:
            # uncorrelated: gate on whether the inner group has any row
            marker = sub_plan.limit(1).select(F.lit(1).alias("_e"))
            plan = plan.join(marker, F.lit(True), how)
    if out_nullable is not None:
        out_nullable |= nullable
    return plan, bound


# SELECT items: plain var or (AGG(?v) AS ?alias)
_AGG_FUNCS = {
    "COUNT": F.count, "SUM": F.sum, "AVG": F.avg, "MIN": F.min,
    "MAX": F.max,
    # SAMPLE may return any value — min is the deterministic choice
    "SAMPLE": F.min,
    # GROUP_CONCAT with the spec's default " " separator; values sorted so
    # the result is deterministic (SPARQL leaves the order undefined)
    "GROUP_CONCAT": lambda c: F.concat_ws(" ", F.array_sort(F.collect_list(c))),
}


@dataclass
class _SelectItem:
    var: str | None = None          # plain projection
    agg: str | None = None          # aggregate function name
    agg_arg: "str | list | None" = None  # arg tokens ('*' for COUNT(*))
    distinct: bool = False
    alias: str | None = None
    expr: list | None = None        # (expr AS ?alias) projection tokens
    sep: str | None = None          # GROUP_CONCAT SEPARATOR (default " ")

    @property
    def out_name(self) -> str:
        return self.alias or self.var


def _parse_select_items(toks: list[str]) -> tuple[bool, list[_SelectItem] | None]:
    """tokens between SELECT and WHERE → (distinct, items|None for '*')."""
    i, distinct = 0, False
    if i < len(toks) and toks[i].upper() in ("DISTINCT", "REDUCED"):
        # REDUCED permits (but does not require) duplicate elimination —
        # eliminating is the deterministic choice
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
            # ( AGG ( [DISTINCT] expr|* ) AS ?alias ) — expr is any
            # balanced token expression (SUM(?price * ?qty) etc.) —
            # or a plain projected expression ( expr AS ?alias )
            try:
                agg = toks[i + 1].upper()
                # strict form only when "AS" directly follows the call —
                # (COUNT(?o) * 2 AS ?c) is a plain expression item whose
                # aggregates rewrite later
                strict = agg in _AGG_FUNCS and toks[i + 2 : i + 3] == ["("]
                if strict:
                    _, j_peek = _parse_call_args(toks, i + 2)
                    strict = bool(toks[j_peek : j_peek + 1]) and \
                        toks[j_peek].upper() == "AS"
                if not strict:
                    body, j = _parse_call_args(toks, i)
                    etoks = body[0] if len(body) == 1 else None
                    if (not etoks or len(etoks) < 3
                            or etoks[-2].upper() != "AS"
                            or not etoks[-1].startswith("?")):
                        raise SparqlError(
                            f"unsupported SELECT item at {toks[i+1]!r} "
                            "(expected (AGG(expr) AS ?a) or (expr AS ?a))")
                    items.append(_SelectItem(expr=etoks[:-2],
                                             alias=etoks[-1][1:]))
                    i = j
                    continue
                args, j = _parse_call_args(toks, i + 2)
                if len(args) != 1 or not args[0]:
                    raise SparqlError("aggregates take one argument")
                atoks = args[0]
                adist = False
                if atoks[0].upper() == "DISTINCT":
                    adist, atoks = True, atoks[1:]
                sep = None
                if (agg == "GROUP_CONCAT" and len(atoks) >= 4
                        and atoks[-4] == ";"
                        and atoks[-3].upper() == "SEPARATOR"
                        and atoks[-2] == "="
                        and atoks[-1].startswith('"')):
                    sep = _decode_echars(atoks[-1][1:-1])
                    atoks = atoks[:-4]
                if not atoks:
                    raise SparqlError("aggregates take one argument")
                if not atoks or toks[j : j + 1] == [] \
                        or toks[j].upper() != "AS":
                    raise SparqlError(
                        "aggregate must be (AGG(expr) AS ?alias)")
                alias = toks[j + 1]
                if not alias.startswith("?") or toks[j + 2] != ")":
                    raise SparqlError(
                        "aggregate must be (AGG(expr) AS ?alias)")
            except IndexError:
                raise SparqlError("malformed aggregate in SELECT") from None
            items.append(_SelectItem(
                agg=agg, agg_arg="*" if atoks == ["*"] else atoks,
                distinct=adist, alias=alias[1:], sep=sep))
            i = j + 3
        else:
            raise SparqlError(f"unexpected token in SELECT: {t!r}")
    return distinct, items


def _agg_col(it: _SelectItem):
    if it.agg == "COUNT" and it.agg_arg == "*":
        c = F.count(F.lit(1))
    else:
        atoks = (it.agg_arg if isinstance(it.agg_arg, list)
                 else [it.agg_arg])
        if any(t in ("+", "-", "*", "/") for t in atoks):
            # arithmetic aggregate arg: variable bindings are lexical
            # strings — treat them as numbers (SPARQL numeric context;
            # mix string functions with arithmetic via BIND instead)
            atoks = [f"CAST(`{t[1:]}` AS DOUBLE)" if t.startswith("?")
                     else t for t in atoks]
        col = F.expr(_filter_sql(atoks))
        if it.agg == "COUNT":
            c = F.countDistinct(col) if it.distinct else F.count(col)
        elif it.agg == "GROUP_CONCAT":
            arr = F.collect_list(col)
            if it.distinct:
                arr = F.array_distinct(arr)
            # values sorted so the result is deterministic (the spec
            # leaves concatenation order undefined)
            c = F.concat_ws(it.sep if it.sep is not None else " ",
                            F.array_sort(arr))
        else:
            if it.agg in ("SUM", "AVG"):
                # lexical forms are strings; try_cast keeps per-value
                # error semantics (non-numeric → ignored as NULL) where
                # an ANSI cast would abort the whole query
                col = col.try_cast("double")
            if it.distinct and it.agg == "SUM":
                c = F.sum_distinct(col)
            elif it.distinct and it.agg == "AVG":
                c = F.try_divide(F.sum_distinct(col),
                                 F.count_distinct(col))
            else:
                # MIN/MAX/SAMPLE: DISTINCT cannot change the result
                c = _AGG_FUNCS[it.agg](col)
    return c.alias(it.alias)


def _rewrite_having(toks: list[str], items: list[_SelectItem]
                    ) -> tuple[list[str], list[_SelectItem]]:
    """HAVING tokens with AGG(?v) calls → alias ?var tokens.  A call
    matching a SELECT aggregate reuses its alias; one that does NOT
    appear in SELECT gets a synthesized HIDDEN aggregate item (second
    return value) — the caller computes it alongside the projected
    aggregates and the final projection drops it."""
    out: list[str] = []
    hidden: list[_SelectItem] = []
    i = 0
    while i < len(toks):
        up = toks[i].upper()
        if up in _AGG_FUNCS and i + 1 < len(toks) and toks[i + 1] == "(":
            depth, j = 1, i + 2
            while j < len(toks) and depth:
                depth += {"(": 1, ")": -1}.get(toks[j], 0)
                j += 1
            inner = toks[i + 2 : j - 1]
            adist = bool(inner) and inner[0].upper() == "DISTINCT"
            atoks = inner[1:] if adist else inner
            sep = None
            if (up == "GROUP_CONCAT" and len(atoks) >= 4
                    and atoks[-4] == ";"
                    and atoks[-3].upper() == "SEPARATOR"
                    and atoks[-2] == "=" and atoks[-1].startswith('"')):
                sep = _decode_echars(atoks[-1][1:-1])
                atoks = atoks[:-4]
            arg = "*" if atoks == ["*"] else atoks
            match = next(
                (it for it in items + hidden
                 if it.agg == up and it.agg_arg == arg
                 and it.distinct == adist and it.sep == sep),
                None)
            if match is None:
                match = _SelectItem(agg=up, agg_arg=arg, distinct=adist,
                                    alias=f"_hv{len(hidden)}", sep=sep)
                hidden.append(match)
            out.append("?" + match.alias)
            i = j
        else:
            out.append(toks[i])
            i += 1
    return out, hidden


def _compile_select(triples: DataFrame, toks: list[str],
                    prefixes: dict[str, str],
                    quads: DataFrame | None = None,
                    out_nullable: set[str] | None = None
                    ) -> tuple[DataFrame, list[str]]:
    """SELECT token list (``SELECT`` through trailing modifiers) →
    (projected plan, output column names).  Shared by ``query()`` and
    ``{ SELECT ... }`` subqueries.  ``out_nullable``: mutable set the
    subselect caller passes to learn which PROJECTED columns may be NULL
    = unbound (UNDEF cells / OPTIONAL misses surviving the projection) —
    without it the enclosing group would silently join them with SQL
    equality."""
    if not toks or toks[0].upper() != "SELECT":
        raise SparqlError("expected SELECT")
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

    # trailing VALUES clause (§10.2.2): joins the WHERE solutions — the
    # same algebra as a VALUES block closing the group, so append it as
    # the group's final element (UNDEF compatibility comes along free)
    for j0, t0 in enumerate(tail):
        if t0.upper() == "VALUES":
            el, j1 = _parse_values(tail, j0 + 1)
            if tail[j1:]:
                raise SparqlError(
                    "the VALUES clause must end the query")
            group.elements.append(el)
            tail = tail[:j0]
            break

    # projection surface: only these variables ever need lexical values —
    # id-joined BGP runs skip decoding everything else (SELECT * → all)
    needed = (None if items is None
              else _all_vars(toks[1:w]) | _all_vars(tail))
    g_null: set[str] = set()
    plan, bound = _compile_group(triples, group, prefixes, quads,
                                 needed=needed, out_nullable=g_null)
    plan, out_cols = _select_tail(plan, bound, distinct, items, tail)
    if out_nullable is not None:
        # nullability survives projection for plain (non-aggregated,
        # non-expression) variables only: aggregates and computed
        # expressions bind fresh values (NULL there = expression error,
        # which also reads as unbound — keeping them out is the
        # conservative choice that never turns an equi-join into a
        # wrong-answer)
        plain = (set(out_cols) if items is None else
                 {it.out_name for it in items
                  if it.agg is None and it.expr is None})
        out_nullable |= g_null & plain
    return plan, out_cols


def _select_tail(plan: DataFrame, bound: set[str], distinct: bool,
                 items: list[_SelectItem] | None, tail: list[str]
                 ) -> tuple[DataFrame, list[str]]:
    """Solution-modifier compiler shared by the lexical engine
    (:func:`_compile_select`) and the warehouse id-run engine
    (:func:`query_encoded`) — ONE implementation of GROUP BY (plain /
    (expr AS ?k) / bare builtin-call keys), HAVING and ORDER BY hidden
    aggregates, (expr-over-aggregate AS ?v) projections, GROUP BY-only ≡
    distinct keys, DISTINCT, ORDER/LIMIT/OFFSET.  ``bound`` is the set of
    variables the incoming plan binds as decoded lexical columns.

    (r5: query_encoded previously carried a reduced private copy of this
    logic that silently SKIPPED grouping for GROUP BY-only and
    hidden-HAVING queries — a wrong answer, not a loud reject.)"""
    # tail: GROUP BY ?v... | HAVING(expr) | ORDER BY [ASC|DESC] (?v)
    #     | LIMIT n | OFFSET n
    group_by: list[str] = []
    group_exprs: list[tuple[str, list[str]]] = []
    having: list[str] | None = None
    order: list[tuple[str, bool]] = []  # (var, desc)
    limit: int | None = None
    offset: int | None = None
    j = 0
    while j < len(tail):
        up = tail[j].upper()
        if up == "GROUP" and j + 1 < len(tail) and tail[j + 1].upper() == "BY":
            j += 2
            while j < len(tail):
                if tail[j].startswith("?"):
                    group_by.append(tail[j][1:])
                    j += 1
                elif tail[j] == "(":
                    # GROUP BY (expr [AS ?alias]): computed key — without
                    # an alias it groups but is not projectable
                    body, j = _parse_call_args(tail, j)
                    etoks = body[0] if len(body) == 1 else None
                    if not etoks:
                        raise SparqlError("malformed GROUP BY expression")
                    if (len(etoks) >= 3 and etoks[-2].upper() == "AS"
                            and etoks[-1].startswith("?")):
                        alias, expr_toks = etoks[-1][1:], etoks[:-2]
                    else:
                        alias, expr_toks = f"_gk{len(group_exprs)}", etoks
                    group_exprs.append((alias, expr_toks))
                    group_by.append(alias)
                elif (j + 1 < len(tail) and tail[j + 1] == "("
                      and tail[j].upper() != "HAVING"
                      and re.fullmatch(r"[A-Za-z][A-Za-z0-9_]*", tail[j])):
                    # GROUP BY STR(?x) — bare builtin-call key (the
                    # unparenthesized form; groups but is not projectable,
                    # same as an alias-less (expr) key)
                    depth, k = 1, j + 2
                    while k < len(tail) and depth:
                        depth += {"(": 1, ")": -1}.get(tail[k], 0)
                        k += 1
                    if depth:
                        raise SparqlError(
                            "unbalanced parens in GROUP BY expression")
                    alias = f"_gk{len(group_exprs)}"
                    group_exprs.append((alias, tail[j:k]))
                    group_by.append(alias)
                    j = k
                else:
                    break
        elif up == "HAVING":
            if j + 1 >= len(tail) or tail[j + 1] != "(":
                raise SparqlError("HAVING requires parenthesized expression")
            depth, k = 1, j + 2
            while k < len(tail) and depth:
                depth += {"(": 1, ")": -1}.get(tail[k], 0)
                k += 1
            if depth:
                raise SparqlError("unbalanced parens in HAVING")
            having = tail[j + 2 : k - 1]
            j = k
        elif up == "ORDER" and j + 1 < len(tail) and tail[j + 1].upper() == "BY":
            j += 2
            while j < len(tail):
                desc = False
                if tail[j].upper() in ("ASC", "DESC"):
                    desc = tail[j].upper() == "DESC"
                    j += 1
                if tail[j : j + 1] == ["("]:
                    # (expr) sort key — any balanced expression over the
                    # projected variables
                    body, j = _parse_call_args(tail, j)
                    if len(body) != 1 or not body[0]:
                        raise SparqlError("malformed ORDER BY expression")
                    order.append((body[0], desc))
                    continue
                if j >= len(tail) or not tail[j].startswith("?"):
                    break
                order.append(([tail[j]], desc))
                j += 1
        elif up == "LIMIT":
            limit = int(tail[j + 1])
            j += 2
        elif up == "OFFSET":
            offset = int(tail[j + 1])
            j += 2
        else:
            raise SparqlError(f"unexpected token after WHERE: {tail[j]!r}")

    # an explicit GROUP BY makes this an aggregate query even when the
    # projection holds only group keys (HAVING / ORDER BY may still
    # reference aggregates via hidden columns), and an (expr AS ?v)
    # projection CONTAINING an aggregate call makes it one too
    def _toks_have_agg(ts: list[str]) -> bool:
        return any(t.upper() in _AGG_FUNCS and ts[i + 1 : i + 2] == ["("]
                   for i, t in enumerate(ts))

    has_agg = items is not None and (
        any(it.agg for it in items) or bool(group_by)
        or any(it.expr is not None and _toks_have_agg(it.expr)
               for it in items))
    if has_agg:
        keys = group_by or [it.var for it in items if it.var]
        expr_keys = {a for a, _ in group_exprs}
        missing = [k for k in keys if k not in bound and k not in expr_keys]
        if missing:
            raise SparqlError(f"unbound GROUP BY variables: {missing}")
        for alias, etoks in group_exprs:
            plan = plan.withColumn(
                alias, F.expr(_filter_sql(etoks, set(plan.columns))))
        aggs = [_agg_col(it) for it in items if it.agg]
        hidden_all: list[_SelectItem] = []
        # (expr AS ?v) over aggregates: the aggregate calls inside the
        # expression rewrite to (hidden) aggregate aliases; the
        # expression itself computes post-aggregation
        expr_rewritten: dict[str, list[str]] = {}
        for it in items:
            if it.expr is not None:
                rtoks, more = _rewrite_having(it.expr, items + hidden_all)
                hidden_all += more
                expr_rewritten[it.alias] = rtoks
        if having is not None:
            htoks, hidden = _rewrite_having(having, items + hidden_all)
            hidden_all += hidden
        if order:
            # ORDER BY DESC(COUNT(?x)) etc.: aggregate calls in sort
            # keys rewrite to (possibly hidden) aggregate aliases too
            new_order = []
            for etoks, d in order:
                rtoks, more = _rewrite_having(etoks, items + hidden_all)
                hidden_all += more
                new_order.append((rtoks, d))
            order = new_order
        aggs += [_agg_col(it) for it in hidden_all]
        if aggs:
            plan = (plan.groupBy(*keys).agg(*aggs) if keys
                    else plan.agg(*aggs))
        else:
            # GROUP BY with no aggregate anywhere ≡ distinct group keys
            plan = plan.select(*keys).distinct()
        if having is not None:
            plan = plan.where(_filter_sql(htoks))
        for alias, rtoks in expr_rewritten.items():
            plan = plan.withColumn(
                alias, F.expr(_filter_sql(rtoks, set(plan.columns))))
        out_cols = [it.out_name for it in items]
        order_vars = {t[1:] for etoks, _ in order for t in etoks
                      if t.startswith("?")}
        drop_after_order = [it.alias for it in hidden_all
                            if it.alias in order_vars]
        plan = plan.select(*out_cols, *drop_after_order)
    else:
        drop_after_order = []
        if having is not None:
            raise SparqlError("HAVING requires aggregates in SELECT")
        if items is None:
            out_cols = sorted(bound)
        else:
            for it in items:
                if it.expr is not None:
                    plan = plan.withColumn(
                        it.alias,
                        F.expr(_filter_sql(it.expr, set(plan.columns))))
            exprs = {it.alias for it in items if it.expr is not None}
            out_cols = [it.out_name for it in items]
            missing = [v for v in out_cols
                       if v not in bound and v not in exprs]
            if missing:
                raise SparqlError(f"unbound variables in SELECT: {missing}")
        plan = plan.select(*out_cols)

    if distinct:
        # NB: with SELECT DISTINCT + ORDER BY on a hidden aggregate the
        # distinct runs over the hidden column too — two groups equal in
        # every projected column but differing in the sort aggregate
        # both survive (the sort key is genuinely ambiguous there; the
        # spec leaves that interaction undefined)
        plan = plan.distinct()
    if order:
        avail = set(out_cols) | set(drop_after_order)
        for etoks, _ in order:
            missing = [t[1:] for t in etoks
                       if t.startswith("?") and t[1:] not in avail]
            if missing:
                raise SparqlError(
                    f"ORDER BY on unprojected variables: {missing}")
        keys = []
        for etoks, d in order:
            col = (F.col(etoks[0][1:]) if len(etoks) == 1
                   and etoks[0].startswith("?")
                   else F.expr(_filter_sql(etoks, avail)))
            keys.append(col.desc() if d else col.asc())
        plan = plan.orderBy(*keys)
        if drop_after_order:
            plan = plan.drop(*drop_after_order)
    if offset is not None:
        plan = plan.offset(offset)
    if limit is not None:
        plan = plan.limit(limit)
    return plan, out_cols


_PNAME_DECL = re.compile(r"^(?:[A-Za-z_][A-Za-z0-9_\-]*)?:$")


def _prep(sparql: str) -> tuple[list[str], dict[str, str]]:
    """Tokenize, then lift PREFIX declarations out of the TOKEN stream —
    regexing the raw text would rewrite PREFIX-shaped content inside
    quoted string literals (which are atomic tokens to the scanner)."""
    toks = _tokenize(sparql)
    prefixes: dict[str, str] = {}
    out: list[str] = []
    i = 0
    while i < len(toks):
        if (toks[i].upper() == "PREFIX" and i + 2 < len(toks)
                and _PNAME_DECL.match(toks[i + 1])
                and toks[i + 2].startswith("<")):
            prefixes[toks[i + 1][:-1]] = toks[i + 2][1:-1]
            i += 3
            continue
        out.append(toks[i])
        i += 1
    return out, prefixes


@_public
def query(triples: DataFrame, sparql: str) -> DataFrame:
    """Run a SELECT or ASK query against lexical triples
    (subj, pred, obj_lexical, obj_kind, ...).  SELECT → one column per
    variable; ASK → a single-row DataFrame with one boolean ``ask`` column
    (false via the empty-input aggregate when no solution exists).

    If the frame carries a ``graph`` column (quads, e.g. from
    ``sinks.from_nquads``), SPARQL dataset semantics apply: top-level
    patterns match the default graph (``graph IS NULL``) and ``GRAPH``
    patterns match the named graphs."""
    if "graph" in triples.columns:
        quads: DataFrame | None = triples
        triples = triples.where(F.col("graph").isNull())
    else:
        quads = None
    toks, prefixes = _prep(sparql)
    if toks and toks[0].upper() == "ASK":
        if len(toks) < 2:
            raise SparqlError("ASK requires a group")
        i = 1
        if toks[1].upper() == "WHERE":
            i = 2
        if i >= len(toks) or toks[i] != "{":
            raise SparqlError("ASK requires a group")
        group, j = _parse_group(toks, i + 1)
        if toks[j:]:
            raise SparqlError(f"unexpected token after ASK group: {toks[j]!r}")
        plan, _ = _compile_group(triples, group, prefixes, quads)
        return plan.limit(1).agg(
            (F.count(F.lit(1)) > F.lit(0)).alias("ask"))
    if not toks or toks[0].upper() != "SELECT":
        raise SparqlError("only SELECT / ASK queries are supported here "
                          "(use construct() for CONSTRUCT)")
    plan, _ = _compile_select(triples, toks, prefixes, quads)
    return plan


@_public
def ask(triples: DataFrame, sparql: str) -> bool:
    """ASK convenience wrapper: compile + execute, return the boolean."""
    return bool(query(triples, sparql).head()["ask"])


@_public
def describe(triples: DataFrame, sparql: str) -> DataFrame:
    """DESCRIBE query form → the subgraph about the named resources
    (subj, pred, obj_lexical, obj_kind).

    Per SPARQL 1.1 §16.4 the result shape is implementation-defined; this
    engine returns the Concise Bounded Description: every triple whose
    SUBJECT is a described resource, plus — recursively — the triples of
    blank-node objects reached from it (the de-facto standard CBD; IRIs
    are never chased, so the closure is bounded by blank-node nesting
    depth).  Forms: ``DESCRIBE <iri> [<iri> ...]`` and ``DESCRIBE ?v
    WHERE { ... }`` (resources = the distinct bindings of each described
    variable)."""
    if "graph" in triples.columns:
        quads: DataFrame | None = triples
        triples = triples.where(F.col("graph").isNull())
    else:
        quads = None
    toks, prefixes = _prep(sparql)
    if not toks or toks[0].upper() != "DESCRIBE":
        raise SparqlError("expected DESCRIBE")
    i = 1
    terms: list[str] = []
    while i < len(toks) and (toks[i].startswith("?") or _is_term(toks[i])) \
            and toks[i].upper() != "WHERE":
        terms.append(toks[i])
        i += 1
    if not terms:
        raise SparqlError("DESCRIBE requires at least one resource or "
                          "variable")
    vars_ = [t[1:] for t in terms if t.startswith("?")]
    iris = [_expand(t, prefixes) for t in terms if not t.startswith("?")]

    resources: DataFrame | None = None
    if iris:
        resources = triples.sparkSession.createDataFrame(
            [(x,) for x in iris], "`_res` string")
    if toks[i:]:
        if toks[i].upper() != "WHERE" or i + 1 >= len(toks) \
                or toks[i + 1] != "{":
            raise SparqlError("DESCRIBE tail must be WHERE { ... }")
        group, j = _parse_group(toks, i + 2)
        if toks[j:]:
            raise SparqlError(
                f"unexpected token after DESCRIBE group: {toks[j]!r}")
        plan, bound = _compile_group(triples, group, prefixes, quads)
        missing = [v for v in vars_ if v not in bound]
        if missing:
            raise SparqlError(f"unbound DESCRIBE variables: {missing}")
        for v in vars_:
            res = plan.select(F.col(v).alias("_res")).distinct()
            resources = res if resources is None else resources.union(res)
    elif vars_:
        raise SparqlError("DESCRIBE ?var requires a WHERE group")

    # CBD fixpoint: chase BLANK objects only (depth = document nesting,
    # small by construction; localCheckpoint truncates lineage per round
    # like the connected-components loop)
    seen = resources.select("_res").distinct().localCheckpoint(eager=True)
    frontier = seen
    while True:
        blanks = (
            triples.join(frontier, triples["subj"] == F.col("_res"),
                         "left_semi")
            .where(F.col("obj_kind") == "blank")
            .select(F.col("obj_lexical").alias("_res")).distinct()
            .join(seen, "_res", "left_anti")
            .localCheckpoint(eager=True)
        )
        if not blanks.take(1):
            break
        seen = seen.union(blanks).localCheckpoint(eager=True)
        frontier = blanks

    return (
        triples.join(seen, triples["subj"] == F.col("_res"), "left_semi")
        .select("subj", "pred", "obj_lexical", "obj_kind")
        .distinct()
    )


@_public
def construct(triples: DataFrame, sparql: str) -> DataFrame:
    """CONSTRUCT { template } WHERE { ... } → a lexical-triples DataFrame
    (subj, pred, obj_lexical, obj_kind, obj_datatype, obj_lang).

    Term kinds for variable objects are recovered from the solution's own
    hidden _kind_ metadata when the WHERE group binds the variable in
    object position (want_meta), else by joining the source graph's term
    dictionary (a term seen anywhere as IRI counts as IRI).  Literal term
    identity flows through: constant objects carry their ``@lang`` /
    ``^^dt``, object-position variables the matched term's own
    datatype/lang; variables bound only in subject position or behind
    UNION/OPTIONAL yield NULL datatype/lang (documented residual)."""
    # quads input: SPARQL dataset semantics, same as query()/describe() —
    # top-level WHERE patterns see the default graph, GRAPH the named ones
    if "graph" in triples.columns:
        quads: DataFrame | None = triples
        triples = triples.where(F.col("graph").isNull())
    else:
        quads = None
    toks, prefixes = _prep(sparql)
    if not toks or toks[0].upper() != "CONSTRUCT":
        raise SparqlError("expected CONSTRUCT")
    if len(toks) < 2 or toks[1] != "{":
        raise SparqlError("CONSTRUCT requires a template group")
    tmpl_group, i = _parse_group(toks, 2)
    template = [el for el in tmpl_group.elements if isinstance(el, _Pattern)]
    if len(template) != len(tmpl_group.elements) or not template:
        raise SparqlError("CONSTRUCT template must be plain triple patterns")
    if i >= len(toks) or toks[i].upper() != "WHERE" or toks[i + 1] != "{":
        raise SparqlError("CONSTRUCT requires WHERE { ... }")
    group, j = _parse_group(toks, i + 2)
    if toks[j:]:
        raise SparqlError(
            f"unexpected token after CONSTRUCT WHERE: {toks[j]!r}")
    plan, bound = _compile_group(triples, group, prefixes, quads=quads,
                                 want_meta=_template_obj_vars(template))
    return _instantiate(quads if quads is not None else triples,
                        template, plan, bound, prefixes)


def _template_obj_vars(template: list | None) -> set[str]:
    """Variables in template OBJECT position: their solutions must carry
    the matched term's own kind (hidden _kind_ column) so instantiation
    does not mis-kind a literal whose lexical form also occurs as an IRI
    elsewhere in the graph."""
    if not template:
        return set()
    return {p.obj[1:] for p in template
            if isinstance(p.obj, str) and p.obj.startswith("?")}


def _instantiate(triples: DataFrame, template: list, plan: DataFrame,
                 bound: set[str], prefixes: dict[str, str]) -> DataFrame:
    """Template triple patterns × solution multiset → lexical triples
    (subj, pred, obj_lexical, obj_kind).  Shared by CONSTRUCT and the
    UPDATE forms.

    Object-variable kinds come from the matched solution's own hidden
    _kind_ column whenever the WHERE group provided one; the graph-wide
    term→kind dictionary is only the fallback (vars bound in subject
    position or inside UNION/OPTIONAL sub-groups)."""
    # term → kind dictionary (iri beats literal when a lexical form is both)
    kind_rank = F.when(F.col("obj_kind") == "iri", 0) \
                 .when(F.col("obj_kind") == "blank", 1).otherwise(2)
    kinds = (
        triples.select(F.col("obj_lexical").alias("_term"),
                       kind_rank.alias("_rank"))
        .union(triples.select(F.col("subj"), F.lit(0)))
        .groupBy("_term").agg(F.min("_rank").alias("_rank"))
        .select("_term",
                F.element_at(F.array(F.lit("iri"), F.lit("blank"),
                                     F.lit("literal")),
                             F.col("_rank") + 1).alias("_kind"))
    )

    def term_col(term: str):
        """template term → (value column, kind column|None for lookup)"""
        if term.startswith("?"):
            v = term[1:]
            if v not in bound:
                raise SparqlError(f"unbound variable in template: ?{v}")
            return F.col(v), None  # kind via dictionary join (objects only)
        if term.startswith('"'):
            return F.lit(_term_value(term, prefixes)), F.lit("literal")
        if term.startswith("_:"):
            # a template blank label means a FRESH blank node per solution
            # (SPARQL 1.1 §16.2.1) — derived from the solution's bindings
            # + the label, so identical solutions collapse (the output is
            # a set) and distinct solutions never share a node
            key = F.concat_ws(
                "\x1f", F.lit(term),
                *[F.coalesce(F.col(v).cast("string"), F.lit(""))
                  for v in sorted(bound)])
            return F.concat(F.lit("_:c"), F.md5(key)), F.lit("blank")
        return F.lit(_expand(term, prefixes)), F.lit("iri")

    null_s = F.lit(None).cast("string")

    outs = []
    for pat in template:
        if isinstance(pat.pred, tuple):
            raise SparqlError("property paths are not allowed in templates")
        s_col, _ = term_col(pat.subj)
        p_col, _ = term_col(pat.pred)
        o_col, o_kind = term_col(pat.obj)
        # literal term identity: datatype/lang flow through the template —
        # a constant carries its own @lang/^^dt; a variable carries the
        # matched term's hidden _dt_/_lang_ metadata when the WHERE group
        # provided it (want_meta), NULL otherwise
        o_dt = o_lang = null_s
        if pat.obj.startswith('"'):
            _, c_lang, c_dt = _literal_parts(pat.obj, prefixes)
            o_dt = F.lit(c_dt).cast("string")
            o_lang = F.lit(c_lang).cast("string")
        elif pat.obj.startswith("?"):
            v = pat.obj[1:]
            if f"_dt_{v}" in plan.columns:
                o_dt = F.col(f"_dt_{v}")
            if f"_lang_{v}" in plan.columns:
                o_lang = F.col(f"_lang_{v}")
        if o_kind is None and pat.obj.startswith("?") \
                and f"_kind_{pat.obj[1:]}" in plan.columns:
            o_kind = F.col(f"_kind_{pat.obj[1:]}")
        if o_kind is not None:
            row = plan.select(s_col.alias("subj"), p_col.alias("pred"),
                              o_col.alias("obj_lexical"),
                              o_kind.alias("obj_kind"),
                              o_dt.alias("obj_datatype"),
                              o_lang.alias("obj_lang"))
        else:
            row = plan.select(s_col.alias("subj"), p_col.alias("pred"),
                              o_col.alias("obj_lexical"),
                              o_dt.alias("obj_datatype"),
                              o_lang.alias("obj_lang"))
            # NOT broadcast: the term dictionary is O(graph); equi-join and
            # let AQE choose (it broadcasts automatically on small graphs)
            row = (
                row.join(kinds,
                         row["obj_lexical"] == kinds["_term"], "left")
                .select("subj", "pred", "obj_lexical",
                        F.coalesce("_kind", F.lit("literal"))
                        .alias("obj_kind"), "obj_datatype", "obj_lang")
            )
        outs.append(row)
    result = outs[0]
    for o in outs[1:]:
        result = result.union(o)
    # an RDF graph is a set of triples
    return result.distinct()


# ---------------------------------------------------------------------------
# SPARQL 1.1 Update — immutable-DataFrame form: returns the NEW graph
# ---------------------------------------------------------------------------


def _ground_rows(group: _Group, prefixes: dict[str, str]) -> list[tuple]:
    rows = []
    for el in group.elements:
        if not isinstance(el, _Pattern) or isinstance(el.pred, tuple) \
                or isinstance(el.obj, _Quoted):
            raise SparqlError("DATA blocks must be plain ground triples")
        for t in (el.subj, el.pred, el.obj):
            if t.startswith("?"):
                raise SparqlError("DATA blocks cannot contain variables")
        if el.obj.startswith('"'):
            value, lang, dt = _literal_parts(el.obj, prefixes)
            okind = "literal"
        else:
            value = _term_value(el.obj, prefixes)
            lang = dt = None
            okind = "blank" if el.obj.startswith("_:") else "iri"
        rows.append((
            el.subj if el.subj.startswith("_:")
            else _expand(el.subj, prefixes),
            _expand(el.pred, prefixes),
            value,
            okind,
            dt,
            lang,
        ))
    return rows


_CORE = ["subj", "pred", "obj_lexical", "obj_kind"]
_LIT_META = ["obj_datatype", "obj_lang"]


def _anti_by_term(out: DataFrame, delete_df: DataFrame,
                  extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """``out`` minus ``delete_df``, matched by full RDF term identity:
    the _CORE key plus — when the base frame records them — obj_datatype
    and obj_lang, compared null-safely with ``"x"^^xsd:string`` ≡ plain
    ``"x"`` (RDF 1.1 identifies the two).  Null-safe equality keys stay
    hash-joinable (Spark plans EqualNullSafe as a shuffled/broadcast hash
    join — never a theta join)."""
    meta = [c for c in _LIT_META
            if c in out.columns and c in delete_df.columns]
    keys = _CORE + list(extra_keys)
    d = delete_df.select(*(keys + meta)).distinct()
    d = d.select(*[F.col(c).alias(f"_del_{c}") for c in keys + meta])
    cond = None
    for c in keys + meta:
        left, right = F.col(c), F.col(f"_del_{c}")
        if c == "obj_datatype":
            left = F.nullif(left, F.lit(XSD_STRING))
            right = F.nullif(right, F.lit(XSD_STRING))
        elif c == "obj_lang":
            # BCP 47 tags compare case-insensitively (and --ltr/--rtl
            # rides along) — the stored side is canonicalized
            # ('en-US') while a DELETE constant arrives raw ('en-us');
            # every match path lowercases both sides, so must we, or
            # the delete silently removes nothing
            left, right = F.lower(left), F.lower(right)
        e = (left.eqNullSafe(right) if c in _LIT_META + ["graph"]
             else left == right)
        cond = e if cond is None else cond & e
    return out.join(d, cond, "left_anti")


@_public
def update(triples: DataFrame, sparql: str) -> DataFrame:
    """SPARQL 1.1 Update over an immutable graph: returns the NEW lexical
    triples frame (never mutates the input — the natural Update semantics
    on top of snapshot tables like Iceberg: write the result as the next
    snapshot).

    Supported: ``INSERT DATA { ground }``, ``DELETE DATA { ground }``,
    ``DELETE WHERE { patterns }``, and the template form
    ``[DELETE { t }] [INSERT { t }] WHERE { group }``.

    Deletion matches on full RDF term identity: (subj, pred, obj_lexical,
    obj_kind) plus — whenever the input frame records them — obj_datatype
    and obj_lang (null-safe; ``"x"^^xsd:string`` ≡ plain ``"x"`` per
    RDF 1.1).  Inserted literal rows carry their @lang / ^^datatype;
    extra columns of the input frame stay NULL on inserted rows."""
    if "graph" in triples.columns:
        raise SparqlError(
            "update() on a quads frame would delete across every graph — "
            "use update_quads() for graph-aware Update semantics")
    toks, prefixes = _prep(sparql)
    if not toks:
        raise SparqlError("empty update")
    spark = triples.sparkSession

    def insert_frame(rows: list[tuple]) -> DataFrame:
        return spark.createDataFrame(
            rows, "subj string, pred string, obj_lexical string, "
                  "obj_kind string, obj_datatype string, obj_lang string")

    def apply(delete_df: DataFrame | None,
              insert_df: DataFrame | None) -> DataFrame:
        out = triples
        if delete_df is not None:
            out = _anti_by_term(out, delete_df)
        if insert_df is not None:
            keep = _CORE + [c for c in _LIT_META if c in triples.columns]
            out = out.unionByName(insert_df.select(*keep).distinct(),
                                  allowMissingColumns=True)
        return out

    head = toks[0].upper()
    if head in ("INSERT", "DELETE") and len(toks) > 1 \
            and toks[1].upper() == "DATA":
        if len(toks) < 3 or toks[2] != "{":
            raise SparqlError(f"{head} DATA requires a group")
        group, i = _parse_group(toks, 3)
        if toks[i:]:
            raise SparqlError(f"unexpected token after DATA: {toks[i]!r}")
        df = insert_frame(_ground_rows(group, prefixes))
        return apply(df, None) if head == "DELETE" else apply(None, df)

    if head == "DELETE" and len(toks) > 1 and toks[1].upper() == "WHERE":
        # DELETE WHERE { patterns }: the pattern group is its own template
        if len(toks) < 3 or toks[2] != "{":
            raise SparqlError("DELETE WHERE requires a group")
        group, i = _parse_group(toks, 3)
        if toks[i:]:
            raise SparqlError(
                f"unexpected token after DELETE WHERE: {toks[i]!r}")
        template = [el for el in group.elements if isinstance(el, _Pattern)]
        if len(template) != len(group.elements) or not template:
            raise SparqlError(
                "DELETE WHERE group must be plain triple patterns")
        plan, bound = _compile_group(triples, group, prefixes,
                                     want_meta=_template_obj_vars(template))
        matched = _instantiate(triples, template, plan, bound, prefixes)
        return apply(matched, None)

    # template form: [DELETE { t }] [INSERT { t }] WHERE { group }
    i = 0
    del_tmpl: list | None = None
    ins_tmpl: list | None = None
    while i < len(toks) and toks[i].upper() in ("DELETE", "INSERT"):
        kw = toks[i].upper()
        if i + 1 >= len(toks) or toks[i + 1] != "{":
            raise SparqlError(f"{kw} requires a template group")
        tg, i = _parse_group(toks, i + 2)
        tmpl = [el for el in tg.elements if isinstance(el, _Pattern)]
        if len(tmpl) != len(tg.elements) or not tmpl:
            raise SparqlError(f"{kw} template must be plain triple patterns")
        if kw == "DELETE":
            if del_tmpl is not None:
                raise SparqlError("duplicate DELETE template")
            del_tmpl = tmpl
        else:
            if ins_tmpl is not None:
                raise SparqlError("duplicate INSERT template")
            ins_tmpl = tmpl
    if del_tmpl is None and ins_tmpl is None:
        raise SparqlError(
            "expected INSERT DATA / DELETE DATA / DELETE WHERE / "
            "DELETE-INSERT-WHERE")
    if i >= len(toks) or toks[i].upper() != "WHERE" \
            or i + 1 >= len(toks) or toks[i + 1] != "{":
        raise SparqlError("update template form requires WHERE { ... }")
    group, j = _parse_group(toks, i + 2)
    if toks[j:]:
        raise SparqlError(f"unexpected token after WHERE: {toks[j]!r}")
    plan, bound = _compile_group(
        triples, group, prefixes,
        want_meta=_template_obj_vars(del_tmpl) | _template_obj_vars(ins_tmpl))
    delete_df = (_instantiate(triples, del_tmpl, plan, bound, prefixes)
                 if del_tmpl else None)
    insert_df = (_instantiate(triples, ins_tmpl, plan, bound, prefixes)
                 if ins_tmpl else None)
    return apply(delete_df, insert_df)


# ---------------------------------------------------------------------------
# SPARQL 1.1 Update with graph scope — immutable quads frame
# ---------------------------------------------------------------------------

_QCORE = _CORE + ["graph"]


def _graph_ref(toks: list[str], i: int,
               prefixes: dict[str, str]) -> tuple[str, str | None, int]:
    """DEFAULT | NAMED | ALL | [GRAPH] <iri> → (kind, iri|None, next_i)."""
    if i >= len(toks):
        raise SparqlError("expected a graph reference")
    t = toks[i].upper()
    if t in ("DEFAULT", "NAMED", "ALL"):
        return t.lower(), None, i + 1
    if t == "GRAPH":
        i += 1
        if i >= len(toks):
            raise SparqlError("GRAPH requires an IRI")
    return "iri", _expand(toks[i], prefixes), i + 1


def _flatten_template(group: _Group, with_graph: str | None,
                      prefixes: dict[str, str]
                      ) -> list[tuple[list[_Pattern], str | None]]:
    """Template group → [(patterns, target_graph)] — plain patterns target
    the WITH graph (or the default graph), GRAPH <iri> blocks their own."""
    plain: list[_Pattern] = []
    out: list[tuple[list[_Pattern], str | None]] = []
    for el in group.elements:
        if isinstance(el, _Pattern):
            plain.append(el)
        elif isinstance(el, tuple) and el and el[0] == "graph":
            term, sub = el[1], el[2]
            if term.startswith("?"):
                raise SparqlError(
                    "GRAPH in update templates must be a constant IRI")
            pats = [e for e in sub.elements if isinstance(e, _Pattern)]
            if len(pats) != len(sub.elements):
                raise SparqlError(
                    "GRAPH template blocks must be plain triple patterns")
            out.append((pats, _expand(term, prefixes)))
        else:
            raise SparqlError("update templates must be triple patterns "
                              "or GRAPH blocks")
    if plain:
        out.insert(0, (plain, with_graph))
    return out


@_public
def update_quads(quads: DataFrame, sparql: str) -> DataFrame:
    """SPARQL 1.1 Update with graph scope over an immutable quads frame
    (``graph`` column, NULL = default graph): returns the NEW quads frame
    — snapshot-table semantics, like :func:`update`.

    Supported: ``CLEAR``/``DROP`` ``[SILENT] (GRAPH <g> | DEFAULT | NAMED
    | ALL)``; ``CREATE [SILENT] GRAPH <g>`` (a no-op — graphs exist
    implicitly in the quads model, so CREATE cannot fail and CLEAR ≡ DROP);
    ``MOVE/COPY/ADD [SILENT] (DEFAULT|[GRAPH] <g>) TO (DEFAULT|[GRAPH]
    <g>)``; ``INSERT DATA``/``DELETE DATA`` with ``GRAPH { }`` blocks;
    and the template form with ``WITH <g>``, ``USING <g>`` dataset
    clauses, and ``GRAPH { }`` template blocks.

    Deletion matches on full term identity — (subj, pred, obj_lexical,
    obj_kind, graph) plus obj_datatype/obj_lang when the frame records
    them; null-safe on graph, so default-graph rows delete correctly."""
    toks, prefixes = _prep(sparql)
    if not toks:
        raise SparqlError("empty update")
    if "graph" not in quads.columns:
        raise SparqlError("update_quads requires a quads frame "
                          "(a 'graph' column); use update() for triples")
    spark = quads.sparkSession
    gnull = F.col("graph").isNull()

    def gmatch(kind: str, iri: str | None):
        if kind == "default":
            return gnull
        if kind == "named":
            return ~gnull
        if kind == "all":
            return F.lit(True)
        # null-safe: ~(NULL == iri) is NULL and would silently drop the
        # default graph's rows from every negated filter
        return F.col("graph").eqNullSafe(F.lit(iri))

    head = toks[0].upper()
    i = 1
    if head in ("CREATE", "DROP", "CLEAR"):
        if i < len(toks) and toks[i].upper() == "SILENT":
            i += 1
        kind, iri, i = _graph_ref(toks, i, prefixes)
        if toks[i:]:
            raise SparqlError(f"unexpected token after {head}: {toks[i]!r}")
        if head == "CREATE":
            if kind != "iri":
                raise SparqlError("CREATE takes GRAPH <iri>")
            return quads
        return quads.where(~gmatch(kind, iri))

    if head in ("MOVE", "COPY", "ADD"):
        if i < len(toks) and toks[i].upper() == "SILENT":
            i += 1
        skind, siri, i = _graph_ref(toks, i, prefixes)
        if i >= len(toks) or toks[i].upper() != "TO":
            raise SparqlError(f"{head} requires TO")
        dkind, diri, i = _graph_ref(toks, i + 1, prefixes)
        if toks[i:]:
            raise SparqlError(f"unexpected token after {head}: {toks[i]!r}")
        for k in (skind, dkind):
            if k not in ("default", "iri"):
                raise SparqlError(f"{head} takes DEFAULT or GRAPH <iri>")
        if (skind, siri) == (dkind, diri):
            return quads
        moved = quads.where(gmatch(skind, siri)).withColumn(
            "graph",
            F.lit(diri) if dkind == "iri" else F.lit(None).cast("string"))
        if head == "ADD":
            return quads.unionByName(moved).distinct()
        out = quads.where(~gmatch(dkind, diri))
        if head == "MOVE":
            out = out.where(~gmatch(skind, siri))
        return out.unionByName(moved).distinct()

    def apply_q(delete_df: DataFrame | None,
                insert_df: DataFrame | None) -> DataFrame:
        out = quads
        if delete_df is not None:
            out = _anti_by_term(out, delete_df, extra_keys=["graph"])
        if insert_df is not None:
            keep = _QCORE + [c for c in _LIT_META if c in quads.columns]
            out = out.unionByName(
                insert_df.select(*keep).distinct(),
                allowMissingColumns=True)
        return out

    def ground_quads(group: _Group) -> DataFrame:
        rows: list[tuple] = []
        for el in group.elements:
            if isinstance(el, tuple) and el and el[0] == "graph":
                term, sub = el[1], el[2]
                if term.startswith("?"):
                    raise SparqlError("GRAPH in DATA blocks must be an IRI")
                g = _expand(term, prefixes)
                rows += [r + (g,) for r in _ground_rows(sub, prefixes)]
            else:
                one = _Group(elements=[el])
                rows += [r + (None,) for r in _ground_rows(one, prefixes)]
        return spark.createDataFrame(
            rows, "subj string, pred string, obj_lexical string, "
                  "obj_kind string, obj_datatype string, obj_lang string, "
                  "graph string")

    if head in ("INSERT", "DELETE") and len(toks) > 1 \
            and toks[1].upper() == "DATA":
        if len(toks) < 3 or toks[2] != "{":
            raise SparqlError(f"{head} DATA requires a group")
        group, j = _parse_group(toks, 3)
        if toks[j:]:
            raise SparqlError(f"unexpected token after DATA: {toks[j]!r}")
        df = ground_quads(group)
        return apply_q(df, None) if head == "DELETE" else apply_q(None, df)

    with_graph: str | None = None
    if head == "WITH":
        if len(toks) < 2:
            raise SparqlError("WITH requires a graph IRI")
        with_graph = _expand(toks[1], prefixes)
        toks = toks[2:]
        head = toks[0].upper() if toks else ""

    # [DELETE {t}] [INSERT {t}] (USING [NAMED] <g>)* WHERE { group }
    i = 0
    del_tg: _Group | None = None
    ins_tg: _Group | None = None
    while i < len(toks) and toks[i].upper() in ("DELETE", "INSERT"):
        kw = toks[i].upper()
        if kw == "DELETE" and toks[i + 1 : i + 2] \
                and toks[i + 1].upper() == "WHERE":
            # DELETE WHERE { patterns }: the group is its own template
            if toks[i + 2 : i + 3] != ["{"]:
                raise SparqlError("DELETE WHERE requires a group")
            group, j = _parse_group(toks, i + 3)
            if toks[j:]:
                raise SparqlError(
                    f"unexpected token after DELETE WHERE: {toks[j]!r}")
            del_tg, ins_tg = group, None
            return _apply_templates(quads, spark, prefixes, with_graph,
                                    [], group, del_tg, ins_tg, apply_q)
        if toks[i + 1 : i + 2] != ["{"]:
            raise SparqlError(f"{kw} requires a template group")
        tg, i = _parse_group(toks, i + 2)
        if kw == "DELETE":
            if del_tg is not None:
                raise SparqlError("duplicate DELETE template")
            del_tg = tg
        else:
            if ins_tg is not None:
                raise SparqlError("duplicate INSERT template")
            ins_tg = tg
    if del_tg is None and ins_tg is None:
        raise SparqlError("expected an update operation")
    using: list[str] = []
    using_named: list[str] = []
    while i < len(toks) and toks[i].upper() == "USING":
        i += 1
        if i < len(toks) and toks[i].upper() == "NAMED":
            i += 1
            using_named.append(_expand(toks[i], prefixes))
        else:
            using.append(_expand(toks[i], prefixes))
        i += 1
    if toks[i : i + 2] != ["WHERE", "{"] and not (
            i < len(toks) and toks[i].upper() == "WHERE"
            and toks[i + 1 : i + 2] == ["{"]):
        raise SparqlError("update template form requires WHERE { ... }")
    group, j = _parse_group(toks, i + 2)
    if toks[j:]:
        raise SparqlError(f"unexpected token after WHERE: {toks[j]!r}")
    return _apply_templates(quads, spark, prefixes, with_graph, using,
                            group, del_tg, ins_tg, apply_q, using_named)


def _apply_templates(quads, spark, prefixes, with_graph, using, group,
                     del_tg, ins_tg, apply_q,
                     using_named: list[str] | None = None):
    """Compile the WHERE group against the scoped dataset and instantiate
    the (possibly GRAPH-scoped) templates."""
    if using:
        scope = quads.where(F.col("graph").isin(using))
    elif with_graph is not None:
        scope = quads.where(F.col("graph") == with_graph)
    else:
        scope = quads.where(F.col("graph").isNull())
    # top-level patterns see the scoped "default" graph; GRAPH patterns in
    # WHERE see the full dataset — unless USING/USING NAMED clauses define
    # one, in which case the named-graph set is exactly the USING NAMED
    # list (empty when only plain USING is given, per SPARQL 1.1 Update)
    graph_quads = quads
    if using or using_named:
        graph_quads = quads.where(
            F.col("graph").isin(using_named or []))
    want = set()
    for tg in (del_tg, ins_tg):
        if tg is not None:
            for pats, _ in _flatten_template(tg, with_graph, prefixes):
                want |= _template_obj_vars(pats)
    plan, bound = _compile_group(scope.drop("graph"), group, prefixes,
                                 quads=graph_quads, want_meta=want)

    def inst(tg: _Group | None) -> DataFrame | None:
        if tg is None:
            return None
        parts = []
        for pats, g in _flatten_template(tg, with_graph, prefixes):
            part = _instantiate(quads, pats, plan, bound, prefixes)
            parts.append(part.withColumn("graph", F.lit(g)))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    return apply_q(inst(del_tg), inst(ins_tg))


# ---------------------------------------------------------------------------
# Warehouse path: SELECT over the pipeline's PERSISTED dictionary-encoded
# tables (pipeline/kg.py: triples(subj_id, pred_id, obj_id) + terms)
# ---------------------------------------------------------------------------


@_public
def query_encoded(edges: DataFrame, terms: DataFrame,
                  sparql: str) -> DataFrame:
    """SELECT over dictionary-encoded edges — the pipeline-warehouse path.

    Pattern scans read ONLY the 8-byte id columns (parquet prunes the rest
    at the source), constant terms hash driver-side with the bit-parity
    pure-Python xxhash64 (util_xxhash.spark_xxhash64 — no terms lookup to
    plan a query), joins move longs, and projected variables decode with
    one terms join each at the end.  Supported fragment: plain-pattern
    BGPs + FILTER + trailing OPTIONAL (plain patterns, left-joined on id
    keys; shapes needing §10.2 compatibility joins reject loudly) +
    DISTINCT + GROUP BY/aggregates + ORDER/LIMIT/OFFSET — the
    warehouse-analytics subset; use :func:`query` on a lexical view
    for the full 1.1 surface.
    """
    from trident_spark.util_xxhash import spark_xxhash64

    toks, prefixes = _prep(sparql)
    if not toks or toks[0].upper() != "SELECT":
        raise SparqlError("query_encoded supports SELECT queries")
    try:
        w = next(i for i, t in enumerate(toks) if t.upper() == "WHERE")
    except StopIteration:
        raise SparqlError("missing WHERE") from None
    if toks[w + 1 : w + 2] != ["{"]:
        raise SparqlError("WHERE must be followed by a group")
    distinct, items = _parse_select_items(toks[1:w])
    group, i = _parse_group(toks, w + 2)
    tail = toks[i:]

    pats = [el for el in group.elements if isinstance(el, _Pattern)]
    filters = [el[1] for el in group.elements
               if isinstance(el, tuple) and el and el[0] == "filter"]
    optionals = [el[1] for el in group.elements
                 if isinstance(el, tuple) and el and el[0] == "optional"]
    # §18.2 translation is left-to-right — two ORDER-sensitive guards
    # (compile_bgp below hoists every required pattern ahead of the left
    # joins, which is exact only under these):
    # (a) an OPTIONAL before the first required pattern raises, matching
    #     the lexical engine (even when FILTERs precede the OPTIONAL);
    # (b) a required pattern that FOLLOWS an OPTIONAL and shares a
    #     variable that OPTIONAL introduces breaks the hoist —
    #     Join(LeftJoin(P1,P2),P3) = LeftJoin(Join(P1,P3),P2) only when
    #     (vars(P2)∖vars(P1)) ∩ vars(P3) = ∅ — reject loudly, never a
    #     silent wrong answer.
    walk_bound: set[str] = set()
    walk_intro: set[str] = set()
    walk_pat_seen = False
    for el in group.elements:
        if isinstance(el, _Pattern):
            pv = _pattern_vars(el)
            if pv & walk_intro:
                raise SparqlError(
                    "query_encoded: a required pattern after an OPTIONAL "
                    "shares a variable the OPTIONAL introduces — needs "
                    "the lexical engine's compatibility joins (use "
                    "query())")
            walk_bound |= pv
            walk_pat_seen = True
        elif isinstance(el, tuple) and el and el[0] == "optional":
            if not walk_pat_seen:
                raise SparqlError("OPTIONAL cannot be the first pattern")
            ov: set[str] = set()
            for sp in el[1].elements:
                if isinstance(sp, _Pattern):
                    ov |= _pattern_vars(sp)
            walk_intro |= ov - walk_bound
            walk_bound |= ov
    if (len(pats) + len(filters) + len(optionals) != len(group.elements)
            or not pats):
        raise SparqlError(
            "query_encoded supports plain triple patterns + FILTER + "
            "OPTIONAL only")

    def _plain_pats(elements, where: str) -> list[_Pattern]:
        ps = [el for el in elements if isinstance(el, _Pattern)]
        if len(ps) != len(elements) or not ps:
            raise SparqlError(
                f"query_encoded {where} supports plain triple patterns "
                "only")
        for p in ps:
            if isinstance(p.pred, tuple) or isinstance(p.obj, _Quoted):
                raise SparqlError(
                    f"query_encoded {where} supports plain triple "
                    "patterns only")
        return ps

    _plain_pats(pats, "WHERE")
    opt_pats = [_plain_pats(sub.elements, "OPTIONAL") for sub in optionals]

    def const_id(term: str, pos: str) -> int:
        if pos == "obj" and term.startswith('"'):
            value, lang, dt = _literal_parts(term, prefixes)
            if lang is not None:
                # stored tags are canonicalized (normalize_literal_langs,
                # RFC 5646 §4.5) — canonicalize the constant's tag the
                # same way so `"x"@EN-us` hashes to the stored `en-US` id.
                # RDF 1.2 base direction rides as a `--ltr/--rtl` suffix:
                # split it off (case-insensitively, like the lexical
                # engine's lower() comparison), canonicalize the tag part,
                # re-attach the lowercased direction — mirroring the
                # lexical engine's lower() comparison (the pipeline's
                # ingest regex is case-sensitive, so stored tags are
                # canonical lowercase-direction forms either way)
                from trident_spark.kernels import langtag as L
                m_dir = re.search(r"--(ltr|rtl)$", lang, re.IGNORECASE)
                base = lang[: m_dir.start()] if m_dir else lang
                try:
                    base = L.normalize(base, L.load_registry()).tag
                    lang = (base + "--" + m_dir.group(1).lower()
                            if m_dir else base)
                except L.LangTagError:
                    pass  # invalid tag: hash as-is (matches nothing,
                    # like the lexical engine, where the pipeline nulls it)
            return spark_xxhash64("literal", value, dt or "", lang or "")
        if pos == "obj" and _PLAIN_SCALAR.match(term):
            # NB: ids include the datatype, so this matches PLAIN literals
            # with this lexical form (a stored "42"^^xsd:integer has a
            # different id) — consistent with the plain-literal-only rule
            return spark_xxhash64("literal", term, "", "")
        return spark_xxhash64("iri", _expand(term, prefixes), "", "")

    id_col = {"subj": "subj_id", "pred": "pred_id", "obj": "obj_id"}

    def compile_bgp(pat_list: list[_Pattern],
                    plan: DataFrame | None,
                    bound: set[str]) -> tuple[DataFrame, set[str]]:
        for pat in _reorder_patterns(pat_list):
            scan = edges
            rename: dict[str, str] = {}
            for pos, term in (("subj", pat.subj), ("pred", pat.pred),
                              ("obj", pat.obj)):
                if term.startswith("?"):
                    rename[pos] = term[1:]
                else:
                    scan = scan.where(
                        F.col(id_col[pos]) == const_id(term, pos))
            scan, rename = _dedupe_repeated_vars(
                scan, {id_col[p]: v for p, v in rename.items()})
            proj = [F.col(c).alias(f"_tid_{v}")
                    for c, v in rename.items()]
            idscan = (scan.select(*proj).distinct() if proj
                      else scan.select(F.lit(1).alias("_m")).limit(1))
            vars_ = set(rename.values())
            if plan is None:
                plan = idscan
            else:
                keys = [f"_tid_{v}" for v in sorted(bound & vars_)]
                plan = plan.join(idscan, keys) if keys \
                    else plan.crossJoin(idscan)
            bound |= vars_
        return plan, bound

    plan, bound = compile_bgp(pats, None, set())

    # trailing OPTIONALs: §8.3 LeftJoin on the shared-variable id keys.
    # Exact BECAUSE of two loud rejections — (a) an OPTIONAL-introduced
    # variable re-shared by a LATER optional would need a §10.2
    # compatibility join, (b) a disjoint OPTIONAL is a keep-left cross —
    # both are lexical-engine territory, not silent wrong answers.
    # Compiling every required pattern first is semantics-preserving
    # under (a): Join(LeftJoin(P1,P2),P3) = LeftJoin(Join(P1,P3),P2)
    # whenever vars(P2)∖vars(P1) ∩ vars(P3) = ∅, which (a) guarantees.
    nullable: set[str] = set()
    for sub_pats in opt_pats:
        sub_plan, sub_bound = compile_bgp(sub_pats, None, set())
        shared = sorted(bound & sub_bound)
        if nullable & sub_bound:
            raise SparqlError(
                "query_encoded: a variable introduced by one OPTIONAL "
                "is shared by a later OPTIONAL — needs the lexical "
                "engine's compatibility joins (use query())")
        if not shared:
            raise SparqlError(
                "query_encoded: OPTIONAL shares no variable with the "
                "required patterns (use query())")
        plan = plan.join(sub_plan,
                         [f"_tid_{v}" for v in shared], "left")
        nullable |= sub_bound - bound
        bound |= sub_bound

    # decode: projection surface + filter vars (join-only vars stay ids)
    needed = (set(bound) if items is None
              else (_all_vars(toks[1:w]) | _all_vars(tail)) & bound)
    for f in filters:
        needed |= _all_vars(f) & bound
    dec_base = terms.select(F.col("term_id"), F.col("lexical"),
                            F.col("kind"), F.col("datatype"), F.col("lang"))
    for v in sorted(needed):
        dec = dec_base.select(
            F.col("term_id").alias(f"_tid_{v}"),
            F.col("lexical").alias(v),
            F.col("kind").alias(f"_kind_{v}"),
            F.col("datatype").alias(f"_dt_{v}"),
            F.col("lang").alias(f"_lang_{v}"))
        # an OPTIONAL-introduced var may hold a NULL id (= unbound):
        # decode with a LEFT join so the non-matching rows survive
        plan = plan.join(dec, [f"_tid_{v}"],
                         "left" if v in nullable else "inner")
    for ftoks in filters:
        plan = plan.where(_filter_sql(ftoks, set(plan.columns)))
    plan = plan.drop(*[c for c in plan.columns
                       if c.startswith(("_tid_", "_m", "_kind_", "_dt_",
                                        "_lang_"))])

    # tail modifiers: the SAME compiler the lexical engine uses — id-only
    # scans keep their plans, and every aggregate form (DISTINCT
    # aggregates, GROUP_CONCAT SEPARATOR, hidden HAVING/ORDER BY
    # aggregates, GROUP BY expressions, GROUP BY-only ≡ distinct keys)
    # works identically instead of falling back to the lexical engine
    return _select_tail(plan, set(needed), distinct, items, tail)[0]

