"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship: full KG pipeline over sf0.001 documents
  (documents → pages with embedded JSON-LD → extract → skolemize → encode)
  answering a two-pattern BGP join.
- ``queries()``      — one entry per operator family from SURVEY.md §2:
  RFC conformance kernels (golden-vector oracles, consolidated into two
  per-kernel-family union suites), KG pipeline end-to-end
  (SQL-reconstructable oracle), SPARQL 1.1/1.2 surface incl. graph-scoped
  Update + function library, RDF 1.2 triple terms, Turtle/TriG/N-Quads/
  JSON-LD round-trips, dedup/clustering/sampling/similarity/text ops,
  streaming sessionization, relational and window queries.  Exactly 50
  entries — the driver verifies at most the first 50, so every registered
  query gets a hard CORRECTNESS row.  Two remain rows-only with
  documented reasons (lang_id: corpus labels independent of text;
  embedding_near_dup_lsh: lossy across hyperplane boundaries) and carry
  pytest recall/behavior gates instead.
- ``extra_queries()``/``extra_oracle_sql()`` — test-only mirrors outside
  the window (consolidated singles, deliberately-quadratic verify twins of
  the LSH scale paths), oracle-checked by the local bit-faithful mirror.
- ``oracle_sql()``   — DuckDB equivalents, column names aligned 1:1.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

# ---------------------------------------------------------------------------
# shared bits
# ---------------------------------------------------------------------------

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
SCHEMA = "https://schema.org/"
DOC_BASE = "https://docs.trident-spark.dev"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

_QUERY_VEC_ID = 7  # fixed query vector for similarity search


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DOC_TRIPLES_CACHE: dict[tuple[str, str], DataFrame] = {}
_DISTINCT_TRIPLES_CACHE: dict[tuple[str, str], DataFrame] = {}
_MINHASH_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _doc_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → pages → extract → skolemize: lexical triples.

    Materialized once per (session, sf_dir) via localCheckpoint: the KG
    queries reference the triples frame 2-3x per plan (self-joins) and the
    driver runs ~25 of them back to back — without this, every reference
    re-runs the Python extraction over the whole corpus.  Extraction is
    deterministic (content-hashed ids), so caching cannot change results.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _DOC_TRIPLES_CACHE.get(key)
    if hit is not None:
        return hit
    from trident_spark.pipeline import extract_stage, kg
    from trident_spark.pipeline.docs_to_pages import docs_to_page_results

    raw = extract_stage.raw_triples(
        docs_to_page_results(_read(spark, sf_dir, "documents")))
    out = kg.skolemize(raw).localCheckpoint(eager=True)
    _DOC_TRIPLES_CACHE[key] = out
    return out


def _distinct_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 6-column triples, materialized once per (session, sf_dir)
    like :func:`_doc_triples`: five serializer/stat queries start from this
    exact frame, and the distinct is a full shuffle of the text-bearing
    literals — without the checkpoint each of them re-pays it."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _DISTINCT_TRIPLES_CACHE.get(key)
    if hit is not None:
        return hit
    out = (
        _doc_triples(spark, sf_dir)
        .select("subj", "pred", "obj_lexical", "obj_kind", "obj_datatype", "obj_lang")
        .distinct()
        .localCheckpoint(eager=True)
    )
    _DISTINCT_TRIPLES_CACHE[key] = out
    return out


def _doc_quads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc triples as quads: the capture url is the graph term."""
    return _doc_triples(spark, sf_dir).select(
        "subj", "pred", "obj_lexical", "obj_kind", "obj_datatype",
        "obj_lang", F.col("url").alias("graph"),
    )


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG over sf0.001 documents, BGP join (?d provider ?o .
    ?o name ?n) — exactly the oracle-checked q_kg_bgp_provider, ordered."""
    return q_kg_bgp_provider(spark, "/root/testdata/sf0.001").orderBy("doc")


# ---------------------------------------------------------------------------
# conformance-vector queries (golden values as the oracle)
# ---------------------------------------------------------------------------


def _values_sql(rows: list[tuple], cols: tuple) -> str:
    def q(v) -> str:
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, int):
            return f"CAST({v} AS BIGINT)"
        return "'" + str(v).replace("'", "''") + "'"

    values = ", ".join("(" + ", ".join(q(v) for v in row) + ")" for row in rows)
    return f"SELECT * FROM (VALUES {values}) AS t({', '.join(cols)})"


def _iri_resolve_vectors():
    from trident_spark.conformance import ABNORMAL_RESOLUTION, NORMAL_RESOLUTION

    merged = {**NORMAL_RESOLUTION, **ABNORMAL_RESOLUTION}
    return sorted(merged.items())


def _iri_normalize_vectors():
    from trident_spark.conformance import HOST_NORMALIZE_CASES, NORMALIZE_CASES

    return [(i, e) for i, e in NORMALIZE_CASES + HOST_NORMALIZE_CASES if i]


def _iri_to_uri_vectors():
    from trident_spark.conformance import TO_URI_CASES

    return list(TO_URI_CASES)


def _langtag_vectors():
    from trident_spark.conformance import LANGTAG_NORMALIZE_OK

    return list(LANGTAG_NORMALIZE_OK)


def q_iri_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.functions.iri_funcs import iri_resolve

    base = "http://a/b/c/d;p?q"
    df = spark.createDataFrame(
        [(base, rel) for rel, _ in _iri_resolve_vectors()], "base string, rel string"
    )
    return df.select("rel", iri_resolve("base", "rel")["value"].alias("resolved"))


def q_iri_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.functions.iri_funcs import iri_normalize

    df = spark.createDataFrame(
        [(i,) for i, _ in _iri_normalize_vectors()], "input string"
    )
    return df.select("input", iri_normalize("input")["value"].alias("normalized"))


def q_iri_to_uri(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.functions.iri_funcs import iri_to_uri

    df = spark.createDataFrame([(i,) for i, _ in _iri_to_uri_vectors()], "input string")
    return df.select("input", iri_to_uri("input")["value"].alias("uri"))


def q_langtag_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.functions.langtag_funcs import langtag_normalize

    df = spark.createDataFrame([(t,) for t, _ in _langtag_vectors()], "tag string")
    return df.select("tag", langtag_normalize("tag")["tag"].alias("canonical"))


def _uri_to_iri_vectors():
    from trident_spark.conformance import FROM_URI_CASES

    return [(u, e) for u, e, err in FROM_URI_CASES if not err]


def q_uri_to_iri(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.functions.iri_funcs import uri_to_iri

    df = spark.createDataFrame([(u,) for u, _ in _uri_to_iri_vectors()], "input string")
    return df.select("input", uri_to_iri("input")["value"].alias("iri"))


def _relativize_vectors():
    from trident_spark.conformance import RELATIVIZE_CASES

    return list(RELATIVIZE_CASES)


def q_iri_relativize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.functions.iri_funcs import iri_relativize

    df = spark.createDataFrame(
        [(b, t) for b, t, _ in _relativize_vectors()], "base string, target string"
    )
    return df.select(
        "base", "target", iri_relativize("base", "target")["value"].alias("rel")
    )


def _langtag_parse_vectors():
    from trident_spark.conformance import LANGTAG_PARSE_OK

    return list(LANGTAG_PARSE_OK)


def q_langtag_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.functions.langtag_funcs import langtag_parse

    df = spark.createDataFrame([(t,) for t, _ in _langtag_parse_vectors()], "tag string")
    return df.select("tag", langtag_parse("tag")["tag"].alias("wellformed"))


def q_iri_parse_wellformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-exact storage of valid IRI-references (reference Ref contract:
    the stored string is exactly the input, iri/iri.go:71-84)."""
    from trident_spark.conformance import PARSE_VALID_REFS
    from trident_spark.functions.iri_funcs import iri_parse

    df = spark.createDataFrame([(v,) for v in PARSE_VALID_REFS], "input string")
    p = iri_parse("input")
    return df.select("input", p["iri"].alias("stored"),
                     p["error"].isNull().alias("valid"))


def q_iri_reject_invalid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.conformance import PARSE_INVALID_REFS
    from trident_spark.functions.iri_funcs import iri_parse

    df = spark.createDataFrame([(v,) for v in PARSE_INVALID_REFS], "input string")
    return df.select(
        "input", iri_parse("input")["error"].isNotNull().alias("rejected"))


def q_langtag_reject_invalid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rejection tables for both modes: Parse (well-formedness) and
    ParseAndNormalize (registry validity)."""
    from trident_spark.conformance import (
        LANGTAG_NORMALIZE_INVALID, LANGTAG_PARSE_INVALID,
    )
    from trident_spark.functions.langtag_funcs import (
        langtag_normalize, langtag_parse,
    )

    p = spark.createDataFrame(
        [(t, "parse") for t in LANGTAG_PARSE_INVALID], "tag string, mode string"
    ).select("tag", "mode", langtag_parse("tag")["error"].isNotNull().alias("rejected"))
    v = spark.createDataFrame(
        [(t, "normalize") for t in LANGTAG_NORMALIZE_INVALID], "tag string, mode string"
    ).select("tag", "mode",
             langtag_normalize("tag")["error"].isNotNull().alias("rejected"))
    return p.unionByName(v)


def q_langtag_extlang_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.conformance import EXTLANG_FORM_CASES
    from trident_spark.functions.langtag_funcs import langtag_to_extlang

    df = spark.createDataFrame([(t,) for t, _ in EXTLANG_FORM_CASES], "tag string")
    return df.select("tag", langtag_to_extlang("tag")["tag"].alias("extlang_form"))


# ---------------------------------------------------------------------------
# consolidated conformance suites — the driver verifies at most 50 queries,
# so the 11 single-purpose vector queries above are union'd into two frames
# (one per kernel family) carrying every vector with a suite label.  The
# individual queries stay registered in extra_queries() and keep their
# oracle rows in the local bit-faithful mirror (tests/test_entry_contract.py).
# ---------------------------------------------------------------------------


def q_iri_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every IRI kernel conformance vector in one frame: RFC 3986 §5.4
    resolution, syntax-based + host normalization, IRI↔URI (RFC 3987 §3.1/
    §3.6), relativization round-trips, and byte-exact parse/reject tables
    (reference contract: iri/iri.go + iri/resolve.go + iri/normalize.go)."""
    from trident_spark.conformance import PARSE_INVALID_REFS, PARSE_VALID_REFS
    from trident_spark.functions.iri_funcs import (
        iri_normalize, iri_parse, iri_relativize, iri_resolve, iri_to_uri,
        uri_to_iri,
    )

    base = "http://a/b/c/d;p?q"
    frames = []
    res = spark.createDataFrame(
        [(base, rel) for rel, _ in _iri_resolve_vectors()],
        "base string, rel string",
    )
    frames.append(res.select(
        F.lit("resolve").alias("suite"), F.col("rel").alias("input"),
        iri_resolve("base", "rel")["value"].alias("output")))
    norm = spark.createDataFrame(
        [(i,) for i, _ in _iri_normalize_vectors()], "input string")
    frames.append(norm.select(
        F.lit("normalize").alias("suite"), "input",
        iri_normalize("input")["value"].alias("output")))
    touri = spark.createDataFrame(
        [(i,) for i, _ in _iri_to_uri_vectors()], "input string")
    frames.append(touri.select(
        F.lit("to_uri").alias("suite"), "input",
        iri_to_uri("input")["value"].alias("output")))
    fromuri = spark.createDataFrame(
        [(u,) for u, _ in _uri_to_iri_vectors()], "input string")
    frames.append(fromuri.select(
        F.lit("from_uri").alias("suite"), "input",
        uri_to_iri("input")["value"].alias("output")))
    rel = spark.createDataFrame(
        [(b, t) for b, t, _ in _relativize_vectors()],
        "base string, target string",
    )
    frames.append(rel.select(
        F.lit("relativize").alias("suite"),
        F.concat_ws(" ", "base", "target").alias("input"),
        iri_relativize("base", "target")["value"].alias("output")))
    pv = spark.createDataFrame([(v,) for v in PARSE_VALID_REFS], "input string")
    p = iri_parse("input")
    frames.append(pv.select(
        F.lit("parse").alias("suite"), "input",
        F.when(p["error"].isNull(), p["iri"])
        .otherwise(F.lit("REJECTED")).alias("output")))
    pi = spark.createDataFrame(
        [(v,) for v in PARSE_INVALID_REFS], "input string")
    p2 = iri_parse("input")
    frames.append(pi.select(
        F.lit("reject").alias("suite"), "input",
        F.when(p2["error"].isNotNull(), F.lit("REJECTED"))
        .otherwise(p2["iri"]).alias("output")))
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def _iri_conformance_oracle() -> str:
    from trident_spark.conformance import PARSE_INVALID_REFS, PARSE_VALID_REFS

    rows = [("resolve", rel, exp) for rel, exp in _iri_resolve_vectors()]
    rows += [("normalize", i, e) for i, e in _iri_normalize_vectors()]
    rows += [("to_uri", i, e) for i, e in _iri_to_uri_vectors()]
    rows += [("from_uri", u, e) for u, e in _uri_to_iri_vectors()]
    rows += [("relativize", f"{b} {t}", e) for b, t, e in _relativize_vectors()]
    rows += [("parse", v, v) for v in PARSE_VALID_REFS]
    rows += [("reject", v, "REJECTED") for v in PARSE_INVALID_REFS]
    return _values_sql(rows, ("suite", "input", "output"))


def q_langtag_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every BCP 47 conformance vector in one frame: Parse well-formedness,
    ParseAndNormalize canonicalization (RFC 5646 §4.5), both rejection
    tables, and ToExtlangForm (reference: langtag/langtag.go)."""
    from trident_spark.conformance import (
        EXTLANG_FORM_CASES, LANGTAG_NORMALIZE_INVALID, LANGTAG_PARSE_INVALID,
    )
    from trident_spark.functions.langtag_funcs import (
        langtag_normalize, langtag_parse, langtag_to_extlang,
    )

    frames = []
    norm = spark.createDataFrame(
        [(t,) for t, _ in _langtag_vectors()], "input string")
    frames.append(norm.select(
        F.lit("normalize").alias("suite"), "input",
        langtag_normalize("input")["tag"].alias("output")))
    par = spark.createDataFrame(
        [(t,) for t, _ in _langtag_parse_vectors()], "input string")
    frames.append(par.select(
        F.lit("parse").alias("suite"), "input",
        langtag_parse("input")["tag"].alias("output")))
    rp = spark.createDataFrame(
        [(t,) for t in LANGTAG_PARSE_INVALID], "input string")
    pp = langtag_parse("input")
    frames.append(rp.select(
        F.lit("reject_parse").alias("suite"), "input",
        F.when(pp["error"].isNotNull(), F.lit("REJECTED"))
        .otherwise(pp["tag"]).alias("output")))
    rn = spark.createDataFrame(
        [(t,) for t in LANGTAG_NORMALIZE_INVALID], "input string")
    nn = langtag_normalize("input")
    frames.append(rn.select(
        F.lit("reject_normalize").alias("suite"), "input",
        F.when(nn["error"].isNotNull(), F.lit("REJECTED"))
        .otherwise(nn["tag"]).alias("output")))
    ex = spark.createDataFrame(
        [(t,) for t, _ in EXTLANG_FORM_CASES], "input string")
    frames.append(ex.select(
        F.lit("extlang").alias("suite"), "input",
        langtag_to_extlang("input")["tag"].alias("output")))
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def _langtag_conformance_oracle() -> str:
    from trident_spark.conformance import (
        EXTLANG_FORM_CASES, LANGTAG_NORMALIZE_INVALID, LANGTAG_PARSE_INVALID,
    )

    rows = [("normalize", t, e) for t, e in _langtag_vectors()]
    rows += [("parse", t, e) for t, e in _langtag_parse_vectors()]
    rows += [("reject_parse", t, "REJECTED") for t in LANGTAG_PARSE_INVALID]
    rows += [("reject_normalize", t, "REJECTED")
             for t in LANGTAG_NORMALIZE_INVALID]
    rows += [("extlang", t, e) for t, e in EXTLANG_FORM_CASES]
    return _values_sql(rows, ("suite", "input", "output"))


# ---------------------------------------------------------------------------
# KG pipeline queries (oracle reconstructs triples from documents in SQL)
# ---------------------------------------------------------------------------


def q_kg_doc_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _distinct_triples(spark, sf_dir).select(
        "subj", "pred", "obj_lexical", "obj_kind",
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
    )


_KG_TRIPLES_ORACLE = f"""
WITH base AS (
  SELECT '{DOC_BASE}/doc/' || doc_id AS doc,
         '{DOC_BASE}/org/' || source AS org,
         text, lang, source, n_chars
  FROM documents
), t AS (
  SELECT doc AS subj, '{RDF_TYPE}' AS pred,
         '{SCHEMA}TextDigitalDocument' AS obj_lexical, 'iri' AS obj_kind,
         '' AS obj_datatype FROM base
  UNION ALL
  SELECT doc, '{SCHEMA}text', text, 'literal', '' FROM base
  UNION ALL
  SELECT doc, '{SCHEMA}inLanguage', lang, 'literal', '' FROM base
  UNION ALL
  SELECT doc, '{SCHEMA}characterCount', CAST(n_chars AS VARCHAR), 'literal',
         '{XSD_INT}' FROM base
  UNION ALL
  SELECT doc, '{SCHEMA}provider', org, 'iri', '' FROM base
  UNION ALL
  SELECT DISTINCT org, '{RDF_TYPE}', '{SCHEMA}Organization', 'iri', '' FROM base
  UNION ALL
  SELECT DISTINCT org, '{SCHEMA}name', source, 'literal', '' FROM base
)
SELECT DISTINCT subj, pred, obj_lexical, obj_kind, obj_datatype FROM t
"""


def q_kg_predicate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _distinct_triples(spark, sf_dir)
        .groupBy(F.col("pred").alias("predicate"))
        .agg(F.count("*").alias("n"))
    )


_KG_PRED_STATS_ORACLE = f"""
WITH counts AS (
  SELECT '{RDF_TYPE}' AS predicate,
         (SELECT COUNT(*) FROM documents) + (SELECT COUNT(DISTINCT source) FROM documents) AS n
  UNION ALL SELECT '{SCHEMA}text', COUNT(*) FROM documents
  UNION ALL SELECT '{SCHEMA}inLanguage', COUNT(*) FROM documents
  UNION ALL SELECT '{SCHEMA}characterCount', COUNT(*) FROM documents
  UNION ALL SELECT '{SCHEMA}provider', COUNT(*) FROM documents
  UNION ALL SELECT '{SCHEMA}name', COUNT(DISTINCT source) FROM documents
)
SELECT predicate, n FROM counts
"""


def q_kg_bgp_provider(spark: SparkSession, sf_dir: str) -> DataFrame:
    triples = _distinct_triples(spark, sf_dir)
    provider = triples.where(F.col("pred") == SCHEMA + "provider").select(
        F.col("subj").alias("doc"), F.col("obj_lexical").alias("org")
    )
    name = triples.where(F.col("pred") == SCHEMA + "name").select(
        F.col("subj").alias("org"), F.col("obj_lexical").alias("org_name")
    ).distinct()
    return provider.join(name, "org").select("doc", "org_name")


_KG_BGP_ORACLE = f"""
SELECT '{DOC_BASE}/doc/' || doc_id AS doc, source AS org_name FROM documents
"""


def q_kg_sparql_bgp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's proposed g.Query(sparql) surface (README.md:94-120):
    a two-pattern BGP compiled to DataFrame joins."""
    from trident_spark.query.sparql import query

    return query(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        SELECT ?doc ?org_name WHERE {
            ?doc schema:provider ?org .
            ?org schema:name ?org_name .
        }
        """,
    )


_KG_SPARQL_SCOPE_ORACLE = f"""
SELECT '{DOC_BASE}/doc/' || doc_id AS doc, source AS n FROM documents
"""


def q_kg_sparql_scope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict SPARQL §18.2 bottom-up filter scoping (r5): a FILTER inside
    a plain nested group reads enclosing-group variables as UNBOUND.
    Leg 1's FILTER(!BOUND(?doc)) is therefore TRUE — the subgroup passes
    whole and joins normally (a lenient post-join evaluation would see
    ?doc bound and return ZERO rows, so this query discriminates).  Leg
    2's FILTER(?n = ?doc) is an expression error → false → empty leg.
    The union equals exactly the plain provider→name join."""
    from trident_spark.query.sparql import query

    return query(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        SELECT ?doc ?n WHERE {
            { ?doc schema:provider ?org .
              { ?org schema:name ?n . FILTER(!BOUND(?doc)) } }
            UNION
            { ?doc schema:provider ?org .
              { ?org schema:name ?n . FILTER(?n = ?doc) } }
        }
        """,
    )


def q_kg_sparql_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIONAL: every typed subject, with its schema:name when one exists
    (docs have no name → null → coalesced to '' for dtype-stable hashing).

    r5: a second variant joins a LATER pattern on the OPTIONAL-introduced
    variable — SPARQL §8.3/§10.2 compatibility semantics: an org row
    (?name bound) equi-joins its own name; a doc row (?name unbound) is
    compatible with EVERY org name and ?name re-binds (the classic W3C
    optional-then-join shape SQL left-join null semantics gets wrong).
    Both variants union into one frame, tagged by ``shape``."""
    from trident_spark.query.sparql import query

    res = query(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        SELECT ?s ?t ?name WHERE {
            ?s a ?t .
            OPTIONAL { ?s schema:name ?name }
        }
        """,
    ).select("s", "t", F.coalesce("name", F.lit("")).alias("name"))
    rejoin = query(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        SELECT ?s ?t ?name WHERE {
            ?s a ?t .
            OPTIONAL { ?s schema:name ?name }
            ?org schema:name ?name .
        }
        """,
    ).select("s", "t", F.col("name"))
    return (res.withColumn("shape", F.lit("optional"))
            .unionByName(rejoin.withColumn("shape", F.lit("rejoin")))
            .distinct())


_KG_SPARQL_OPTIONAL_ORACLE = f"""
SELECT DISTINCT '{DOC_BASE}/doc/' || doc_id AS s,
       '{SCHEMA}TextDigitalDocument' AS t, '' AS name, 'optional' AS shape
FROM documents
UNION ALL
SELECT DISTINCT '{DOC_BASE}/org/' || source, '{SCHEMA}Organization', source,
       'optional'
FROM documents
UNION ALL
-- rejoin: orgs keep their own name (bound side of the compatibility
-- join); docs (?name unbound) re-bind to every org name
SELECT DISTINCT '{DOC_BASE}/org/' || source, '{SCHEMA}Organization', source,
       'rejoin'
FROM documents
UNION ALL
SELECT DISTINCT '{DOC_BASE}/doc/' || d.doc_id, '{SCHEMA}TextDigitalDocument',
       o.source, 'rejoin'
FROM documents d CROSS JOIN (SELECT DISTINCT source FROM documents) o
"""


def q_kg_sparql_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates + GROUP BY over the graph: subjects per rdf:type."""
    from trident_spark.query.sparql import query

    return query(
        _distinct_triples(spark, sf_dir),
        """
        SELECT ?t (COUNT(?s) AS ?n) WHERE {
            ?s <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> ?t .
        } GROUP BY ?t
        """,
    )


_KG_SPARQL_AGG_ORACLE = f"""
SELECT '{SCHEMA}TextDigitalDocument' AS t, COUNT(*) AS n FROM documents
UNION ALL
SELECT '{SCHEMA}Organization', COUNT(DISTINCT source) FROM documents
"""


def q_kg_sparql_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION of two disjoint type patterns."""
    from trident_spark.query.sparql import query

    return query(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        SELECT DISTINCT ?x WHERE {
            { ?x a schema:Organization } UNION { ?x a schema:TextDigitalDocument }
        }
        """,
    )


_KG_SPARQL_UNION_ORACLE = f"""
SELECT DISTINCT '{DOC_BASE}/org/' || source AS x FROM documents
UNION
SELECT '{DOC_BASE}/doc/' || doc_id FROM documents
"""


def q_kg_sparql_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property path: ?doc schema:provider/schema:name ?org_name — the
    sequence path compiles to the same join as the 2-pattern BGP, so the
    BGP oracle applies."""
    from trident_spark.query.sparql import query

    return query(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        SELECT ?doc ?org_name WHERE {
            ?doc schema:provider/schema:name ?org_name .
            ?doc a schema:TextDigitalDocument .
        }
        """,
    ).distinct()


def q_kg_sparql_minus_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES (inline data) narrows the type, MINUS (anti join) drops every
    subject that has a schema:name — i.e. the docs (orgs are named).
    The data block carries UNDEF in both positions (SPARQL 1.1 §10.2):
    an UNDEF ?m rides along unbound, and an UNDEF ?t row is compatible
    with every type binding — so each doc solves twice, once with ?m
    unbound and once with ?m = "anytype"."""
    from trident_spark.query.sparql import query

    return query(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        SELECT DISTINCT ?s ?m WHERE {
            ?s a ?t .
            VALUES (?t ?m) { (schema:TextDigitalDocument UNDEF)
                             (UNDEF "anytype")
                             (schema:Organization "org") }
            MINUS { ?s schema:name ?n }
        }
        """,
    )


_KG_SPARQL_MINUS_VALUES_ORACLE = f"""
SELECT DISTINCT s, m FROM (
  SELECT '{DOC_BASE}/doc/' || doc_id AS s, CAST(NULL AS VARCHAR) AS m
  FROM documents
  UNION ALL
  SELECT '{DOC_BASE}/doc/' || doc_id, 'anytype' FROM documents
) t
"""


def q_kg_sparql_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER EXISTS correlated on ?d: docs whose provider's name starts
    with "src1" (11 of the 20 sources) — compiles to a left-semi join."""
    from trident_spark.query.sparql import query

    return query(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        SELECT ?d WHERE {
            ?d a schema:TextDigitalDocument .
            FILTER EXISTS {
                ?d schema:provider ?org .
                ?org schema:name ?n .
                FILTER(STRSTARTS(?n, "src1"))
            }
        }
        """,
    ).distinct()


_KG_SPARQL_EXISTS_ORACLE = f"""
SELECT DISTINCT '{DOC_BASE}/doc/' || doc_id AS d FROM documents
WHERE source LIKE 'src1%'
"""


def q_kg_sparql_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING: providers with more than 10 English docs."""
    from trident_spark.query.sparql import query

    return query(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        SELECT ?org (COUNT(?d) AS ?n) WHERE {
            ?d schema:provider ?org ;
               schema:inLanguage "en" .
        } GROUP BY ?org HAVING(COUNT(?d) > 10)
        """,
    )


_KG_SPARQL_HAVING_ORACLE = f"""
SELECT '{DOC_BASE}/org/' || source AS org, COUNT(*) AS n FROM documents
WHERE lang = 'en' GROUP BY source HAVING COUNT(*) > 10
"""


def q_kg_sparql_bind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIND: computed label column (CONCAT + UCASE, JVM-side expressions)."""
    from trident_spark.query.sparql import query

    return query(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        SELECT DISTINCT ?label WHERE {
            ?org a schema:Organization ; schema:name ?n .
            BIND(CONCAT("ORG:", UCASE(?n)) AS ?label)
        }
        """,
    )


_KG_SPARQL_BIND_ORACLE = """
SELECT DISTINCT 'ORG:' || UPPER(source) AS label FROM documents
"""


def q_kg_sparql_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery: inner GROUP BY aggregation joined to the outer pattern."""
    from trident_spark.query.sparql import query

    return query(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        SELECT ?org ?n WHERE {
            ?org a schema:Organization .
            { SELECT ?org (COUNT(?d) AS ?n) WHERE {
                ?d schema:provider ?org } GROUP BY ?org }
        }
        """,
    ).distinct()


_KG_SPARQL_SUBQUERY_ORACLE = f"""
SELECT '{DOC_BASE}/org/' || source AS org, COUNT(*) AS n FROM documents
GROUP BY source
"""


def q_kg_sparql_ask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASK query form: single-row boolean DataFrame."""
    from trident_spark.query.sparql import query

    return query(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        ASK { ?d schema:inLanguage "en" }
        """,
    )


_KG_SPARQL_ASK_ORACLE = """
SELECT (COUNT(*) > 0) AS ask FROM documents WHERE lang = 'en'
"""


def q_kg_sparql_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONSTRUCT query form: reversed provider edges as a new graph, with
    object term kinds recovered from the source graph's term dictionary.
    r5: the output carries full literal term identity (obj_datatype /
    obj_lang) — the second template triple constructs a lang-tagged
    constant, so metadata propagation is oracle-checked too."""
    from trident_spark.query.sparql import construct

    return construct(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        CONSTRUCT { ?org schema:published ?d .
                    ?d schema:note "indexed"@en }
        WHERE { ?d schema:provider ?org }
        """,
    )


_KG_SPARQL_CONSTRUCT_ORACLE = f"""
SELECT DISTINCT '{DOC_BASE}/org/' || source AS subj,
       '{SCHEMA}published' AS pred,
       '{DOC_BASE}/doc/' || doc_id AS obj_lexical,
       'iri' AS obj_kind,
       CAST(NULL AS VARCHAR) AS obj_datatype,
       CAST(NULL AS VARCHAR) AS obj_lang
FROM documents
UNION ALL
SELECT DISTINCT '{DOC_BASE}/doc/' || doc_id, '{SCHEMA}note',
       'indexed', 'literal', NULL, 'en'
FROM documents
"""


def q_kg_rdfstar_reify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDF 1.2 triple terms: annotate every provider edge with its document
    (rdf:reifies + schema:about pair per triple, reifier = content-hashed
    blank node), then serialize to N-Triples 1.2 and parse back — the
    oracle reconstructs the reification graph in SQL, so a divergence in
    rendering, hashing, or the triple-term parser all go red."""
    from trident_spark.pipeline import rdfstar, sinks

    prov = _distinct_triples(spark, sf_dir).where(
        F.col("pred") == SCHEMA + "provider")
    reified = rdfstar.reify(
        prov.withColumn("prov_doc", F.col("subj")),
        SCHEMA + "about", "prov_doc", ann_kind="iri")
    back = sinks.from_ntriples(sinks.to_ntriples(reified))
    return back.select("subj", "pred", "obj_lexical", "obj_kind")


_KG_RDFSTAR_ORACLE = f"""
WITH p AS (
  SELECT '<<( <{DOC_BASE}/doc/' || doc_id || '> <{SCHEMA}provider> ' ||
         '<{DOC_BASE}/org/' || source || '> )>>' AS tt,
         '{DOC_BASE}/doc/' || doc_id AS doc
  FROM documents
)
SELECT '_:r' || md5(tt) AS subj,
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#reifies' AS pred,
       tt AS obj_lexical, 'triple' AS obj_kind FROM p
UNION ALL
SELECT '_:r' || md5(tt), '{SCHEMA}about', doc, 'iri' FROM p
"""


def q_kg_sparql_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.2 quoted-triple pattern over the reified provider edges:
    bind the embedded (doc, org) components and join the annotation —
    component extraction is pure Catalyst regexp (no Python).  r5: the
    same triple term is also bound whole (?tt) and destructured with the
    1.2 accessor builtins SUBJECT()/PREDICATE() under an isTRIPLE()
    guard, so the accessors get a hard oracle row too."""
    from trident_spark.pipeline import rdfstar
    from trident_spark.query.sparql import query

    prov = _distinct_triples(spark, sf_dir).where(
        F.col("pred") == SCHEMA + "provider")
    reified = rdfstar.reify(
        prov.withColumn("prov_doc", F.col("subj")),
        SCHEMA + "about", "prov_doc", ann_kind="iri")
    return query(
        reified,
        f"""
        SELECT ?d ?org ?noted ?p ?d2 WHERE {{
            ?r <http://www.w3.org/1999/02/22-rdf-syntax-ns#reifies>
               <<( ?d <{SCHEMA}provider> ?org )>> .
            ?r <http://www.w3.org/1999/02/22-rdf-syntax-ns#reifies> ?tt .
            ?r <{SCHEMA}about> ?noted .
            FILTER(isTRIPLE(?tt))
            BIND(PREDICATE(?tt) AS ?p)
            BIND(SUBJECT(?tt) AS ?d2)
        }}
        """,
    ).distinct()


_KG_SPARQL_STAR_ORACLE = f"""
SELECT DISTINCT '{DOC_BASE}/doc/' || doc_id AS d,
       '{DOC_BASE}/org/' || source AS org,
       '{DOC_BASE}/doc/' || doc_id AS noted,
       '{SCHEMA}provider' AS p,
       '{DOC_BASE}/doc/' || doc_id AS d2
FROM documents
"""


def q_kg_sparql_datatype(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATATYPE() filter: typed-literal metadata carried alongside the
    lexical binding (hidden _dt_/_lang_ columns in the pattern scan)."""
    from trident_spark.query.sparql import query

    return query(
        _distinct_triples(spark, sf_dir),
        f"""
        PREFIX schema: <https://schema.org/>
        SELECT ?s ?c WHERE {{
            ?s schema:characterCount ?c .
            FILTER(DATATYPE(?c) = "{XSD_INT}")
        }}
        """,
    ).distinct()


_KG_SPARQL_DATATYPE_ORACLE = f"""
SELECT '{DOC_BASE}/doc/' || doc_id AS s, CAST(n_chars AS VARCHAR) AS c
FROM documents
"""


def q_kg_sparql_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 Update in immutable form: DELETE the provider edges,
    INSERT the reversed schema:published edges, return the NEW graph —
    the oracle reconstructs the whole post-update triple set."""
    from trident_spark.query.sparql import update

    return update(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        DELETE { ?d schema:provider ?org }
        INSERT { ?org schema:published ?d }
        WHERE  { ?d schema:provider ?org }
        """,
    ).select("subj", "pred", "obj_lexical", "obj_kind").distinct()


_KG_SPARQL_UPDATE_ORACLE = f"""
WITH base AS (
  SELECT '{DOC_BASE}/doc/' || doc_id AS doc,
         '{DOC_BASE}/org/' || source AS org,
         text, lang, source, n_chars
  FROM documents
), t AS (
  SELECT doc AS subj, '{RDF_TYPE}' AS pred,
         '{SCHEMA}TextDigitalDocument' AS obj_lexical, 'iri' AS obj_kind
  FROM base
  UNION ALL SELECT doc, '{SCHEMA}text', text, 'literal' FROM base
  UNION ALL SELECT doc, '{SCHEMA}inLanguage', lang, 'literal' FROM base
  UNION ALL SELECT doc, '{SCHEMA}characterCount', CAST(n_chars AS VARCHAR),
            'literal' FROM base
  UNION ALL SELECT org, '{SCHEMA}published', doc, 'iri' FROM base
  UNION ALL SELECT DISTINCT org, '{RDF_TYPE}', '{SCHEMA}Organization', 'iri'
            FROM base
  UNION ALL SELECT DISTINCT org, '{SCHEMA}name', source, 'literal' FROM base
)
SELECT DISTINCT subj, pred, obj_lexical, obj_kind FROM t
"""


# fixed Turtle doc exercising [...] property lists and (...) collections;
# generated blank labels are deterministic (salt = blake2b of the doc), so
# the oracle can carry them as literal expected rows
_EXTRA_TTL = ('@prefix s: <https://schema.org/> .\n'
              '<https://docs.trident-spark.dev/extra/1> s:author '
              '[ s:name "Ada" ; s:knows ( "b1" "b2" ) ] .')
_EXTRA_TTL_ROWS = [
    # (subj, pred, obj_lexical, obj_kind, obj_datatype) — salt 4c0ee4b3064c45114bf5d4281229395b
    ("https://docs.trident-spark.dev/extra/1", SCHEMA + "author",
     "_:g4c0ee4b3064c45114bf5d4281229395bn1", "blank", ""),
    ("_:g4c0ee4b3064c45114bf5d4281229395bn1", SCHEMA + "name", "Ada", "literal", ""),
    ("_:g4c0ee4b3064c45114bf5d4281229395bn1", SCHEMA + "knows", "_:g4c0ee4b3064c45114bf5d4281229395bn2", "blank", ""),
    ("_:g4c0ee4b3064c45114bf5d4281229395bn2", RDF_TYPE[:-4] + "first", "b1", "literal", ""),
    ("_:g4c0ee4b3064c45114bf5d4281229395bn2", RDF_TYPE[:-4] + "rest", "_:g4c0ee4b3064c45114bf5d4281229395bn3",
     "blank", ""),
    ("_:g4c0ee4b3064c45114bf5d4281229395bn3", RDF_TYPE[:-4] + "first", "b2", "literal", ""),
    ("_:g4c0ee4b3064c45114bf5d4281229395bn3", RDF_TYPE[:-4] + "rest", RDF_TYPE[:-4] + "nil",
     "iri", ""),
]


def q_kg_sparql_update_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-scoped SPARQL Update (WITH <g> DELETE/INSERT WHERE) over the
    per-document quads dataset: archive one document's graph — delete its
    triples, insert an archived marker per subject — leaving every other
    named graph untouched.  Oracle reconstructs the full post-update quad
    set in SQL."""
    from trident_spark.query.sparql import update_quads

    quads = _doc_quads(spark, sf_dir)
    out = update_quads(
        quads,
        f"""
        WITH <{DOC_BASE}/doc/0>
        DELETE {{ ?s ?p ?o }}
        INSERT {{ ?s <{SCHEMA}archived> "true" }}
        WHERE  {{ ?s ?p ?o }}
        """,
    )
    return out.select(
        "subj", "pred", "obj_lexical", "obj_kind", "graph").distinct()


def q_kg_turtle_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize the doc KG to Turtle and parse it back — fully distributed
    (each subject block + @prefix header is a self-contained document row).
    A fixed document with blank-node property lists and a collection rides
    along: parsed (from_turtle), serialized with everything else, parsed
    again — its deterministic labels are literal rows in the oracle.
    The oracle is the independent SQL reconstruction of the triples, so a
    round-trip that loses or mangles one term goes red."""
    from trident_spark.pipeline.sinks import to_turtle, turtle_header
    from trident_spark.pipeline.turtle import from_turtle

    extra = from_turtle(
        spark.createDataFrame([(_EXTRA_TTL,)], "doc string"))
    triples = _distinct_triples(spark, sf_dir).unionByName(extra)
    blocks = to_turtle(triples)
    docs = blocks.select(
        F.concat(F.lit(turtle_header() + "\n"), F.col("block")).alias("doc")
    )
    parsed = from_turtle(docs)
    return parsed.select(
        "subj", "pred", "obj_lexical", "obj_kind",
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
    ).distinct()


def q_kg_sparql_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAPH patterns over a quads dataset (graph = capture url): bind the
    graph term, scope to it a property-path closure inside a NESTED group
    (r4: per-graph path relations thread through nested scope
    compilation) joined with a plain pattern, count per graph —
    exercises dataset semantics (top-level patterns would see only the
    default graph) + per-graph closure + join + aggregate.  provider+
    closes in one hop here (orgs have no provider), so the SQL oracle
    stays the direct reconstruction."""
    from trident_spark.query.sparql import query

    quads = _doc_quads(spark, sf_dir)
    return query(
        quads,
        f"""
        SELECT ?g ?lang (COUNT(?s) AS ?n) WHERE {{
            GRAPH ?g {{
                {{ ?s <{SCHEMA}provider>+ ?org . }}
                ?s <{SCHEMA}inLanguage> ?lang .
            }}
        }} GROUP BY ?g ?lang
        """,
    )


_KG_SPARQL_GRAPH_ORACLE = f"""
SELECT '{DOC_BASE}/doc/' || doc_id AS g, lang, CAST(1 AS BIGINT) AS n
FROM documents
"""


def q_kg_sparql_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE query form: forward description (all triples whose subject
    is a described resource) of the orgs whose name starts with 'src1'."""
    from trident_spark.query.sparql import describe

    return describe(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        DESCRIBE ?org WHERE {
            ?org schema:name ?n .
            FILTER(STRSTARTS(?n, "src1"))
        }
        """,
    )


_KG_SPARQL_DESCRIBE_ORACLE = f"""
WITH orgs AS (
  SELECT DISTINCT '{DOC_BASE}/org/' || source AS org, source
  FROM documents WHERE source LIKE 'src1%'
)
SELECT org AS subj, '{RDF_TYPE}' AS pred,
       '{SCHEMA}Organization' AS obj_lexical, 'iri' AS obj_kind FROM orgs
UNION ALL
SELECT org, '{SCHEMA}name', source, 'literal' FROM orgs
"""


def q_kg_nquads_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named graphs: serialize doc triples as N-Quads with the capture url
    as the graph term, parse back, return distinct quads.  Oracle is the
    per-document SQL reconstruction (graph = doc IRI)."""
    from trident_spark.pipeline.sinks import from_nquads, to_nquads

    quads = _doc_quads(spark, sf_dir)
    lines = to_nquads(quads, graph_col="graph")
    parsed = from_nquads(lines)
    return parsed.select(
        "subj", "pred", "obj_lexical", "obj_kind",
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
        "graph",
    ).distinct()


_KG_NQUADS_ORACLE = f"""
WITH base AS (
  SELECT '{DOC_BASE}/doc/' || doc_id AS doc,
         '{DOC_BASE}/org/' || source AS org,
         text, lang, source, n_chars
  FROM documents
), t AS (
  SELECT doc AS graph, doc AS subj, '{RDF_TYPE}' AS pred,
         '{SCHEMA}TextDigitalDocument' AS obj_lexical, 'iri' AS obj_kind,
         '' AS obj_datatype FROM base
  UNION ALL SELECT doc, doc, '{SCHEMA}text', text, 'literal', '' FROM base
  UNION ALL SELECT doc, doc, '{SCHEMA}inLanguage', lang, 'literal', '' FROM base
  UNION ALL SELECT doc, doc, '{SCHEMA}characterCount',
                   CAST(n_chars AS VARCHAR), 'literal', '{XSD_INT}' FROM base
  UNION ALL SELECT doc, doc, '{SCHEMA}provider', org, 'iri', '' FROM base
  UNION ALL SELECT doc, org, '{RDF_TYPE}', '{SCHEMA}Organization', 'iri', ''
            FROM base
  UNION ALL SELECT doc, org, '{SCHEMA}name', source, 'literal', '' FROM base
)
SELECT DISTINCT subj, pred, obj_lexical, obj_kind, obj_datatype, graph FROM t
"""

_KG_SPARQL_UPDATE_GRAPH_ORACLE = f"""
WITH allq AS ({_KG_NQUADS_ORACLE})
SELECT DISTINCT subj, pred, obj_lexical, obj_kind, graph
FROM allq WHERE graph <> '{DOC_BASE}/doc/0'
UNION ALL
SELECT DISTINCT subj, '{SCHEMA}archived', 'true', 'literal',
       '{DOC_BASE}/doc/0'
FROM allq WHERE graph = '{DOC_BASE}/doc/0'
"""


def q_kg_jsonld_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone JSON-LD documents: serialize the doc KG as one compact
    node object per subject, parse back with the JSON-LD reader (the same
    kernel that parses embedded ld+json), return distinct triples — the
    oracle is the independent SQL reconstruction."""
    from trident_spark.pipeline.jsonld import from_jsonld, to_jsonld

    triples = _distinct_triples(spark, sf_dir)
    parsed = from_jsonld(to_jsonld(triples))
    return parsed.select(
        "subj", "pred", "obj_lexical", "obj_kind",
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
    ).distinct()


def q_kg_trig_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TriG (named-graph Turtle): serialize the per-document quads as
    `<g> { block }` chunks, parse back with the TriG reader, return
    distinct quads — the oracle is the same independent per-document SQL
    reconstruction the N-Quads round-trip uses."""
    from trident_spark.pipeline.sinks import to_trig, turtle_header
    from trident_spark.pipeline.turtle import from_trig

    quads = _doc_quads(spark, sf_dir)
    chunks = to_trig(quads)
    docs = chunks.select(
        F.concat(F.lit(turtle_header() + "\n"), F.col("chunk")).alias("doc"))
    parsed = from_trig(docs)
    return parsed.select(
        "subj", "pred", "obj_lexical", "obj_kind",
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
        "graph",
    ).distinct()


def q_kg_jsonld_quads_roundtrip(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """JSON-LD dataset documents: the per-document quads serialized as
    {"@id": g, "@graph": [node]} shards, parsed back with the dataset
    reader — same independent SQL reconstruction oracle as N-Quads."""
    from trident_spark.pipeline.jsonld import (
        from_jsonld_quads, to_jsonld_quads,
    )

    quads = _doc_quads(spark, sf_dir)
    parsed = from_jsonld_quads(to_jsonld_quads(quads))
    return parsed.select(
        "subj", "pred", "obj_lexical", "obj_kind",
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
        "graph",
    ).distinct()


def q_kg_quads_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union suite of the three named-graph round-trips (window
    consolidation, r4): the same per-document quads serialized+parsed
    via N-Quads lines, TriG `<g> { block }` chunks, and JSON-LD dataset
    documents; each leg keeps its standalone mirror in extra_queries()."""
    nq = q_kg_nquads_roundtrip(spark, sf_dir) \
        .withColumn("suite", F.lit("nquads"))
    tg = q_kg_trig_roundtrip(spark, sf_dir) \
        .withColumn("suite", F.lit("trig"))
    jq = q_kg_jsonld_quads_roundtrip(spark, sf_dir) \
        .withColumn("suite", F.lit("jsonld"))
    return nq.unionByName(tg).unionByName(jq)


_KG_QUADS_ROUNDTRIP_ORACLE = f"""
WITH rt AS ({_KG_NQUADS_ORACLE})
SELECT subj, pred, obj_lexical, obj_kind, obj_datatype, graph,
       'nquads' AS suite FROM rt
UNION ALL
SELECT subj, pred, obj_lexical, obj_kind, obj_datatype, graph,
       'trig' AS suite FROM rt
UNION ALL
SELECT subj, pred, obj_lexical, obj_kind, obj_datatype, graph,
       'jsonld' AS suite FROM rt
"""


def q_kg_rdfxml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDF/XML (the dominant legacy dump format): serialize the doc KG as
    one self-contained single-line document per subject, parse back with
    the strict RDF/XML reader, return distinct triples — the oracle is
    the independent SQL reconstruction, so a divergence in XML escaping,
    QName splitting, or the parser goes red."""
    from trident_spark.pipeline.rdfxml import from_rdfxml, to_rdfxml

    triples = _distinct_triples(spark, sf_dir)
    parsed = from_rdfxml(to_rdfxml(triples))
    return parsed.select(
        "subj", "pred", "obj_lexical", "obj_kind",
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
    ).distinct()


def q_kg_text_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extracted text must round-trip byte-identically per url."""
    from trident_spark.pipeline.docs_to_pages import docs_to_page_results

    results = docs_to_page_results(_read(spark, sf_dir, "documents"))
    return results.agg(
        F.count("*").alias("n_pages"),
        F.sum(F.when(F.col("text_ok"), 0).otherwise(1)).alias("n_violations"),
    )


_KG_TEXT_INVARIANT_ORACLE = (
    "SELECT COUNT(*) AS n_pages, 0 AS n_violations FROM documents"
)


# ---------------------------------------------------------------------------
# dedup / text / similarity queries
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.operators.dedup import exact_dedup

    return exact_dedup(_read(spark, sf_dir, "documents"))


_DEDUP_EXACT_ORACLE = """
SELECT doc_id, md5(text) AS digest,
       ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dup_rank,
       ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) > 1 AS is_dup
FROM documents
"""


def q_dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document segment-level dedup (line/paragraph dedup): 20-token
    windows, md5 frequency, one surviving copy corpus-wide (min-id owner).
    The document text never shuffles — only (doc_id, idx, digest) rows."""
    from trident_spark.operators.dedup import segment_dedup

    return segment_dedup(_read(spark, sf_dir, "documents"), window=20)


_DEDUP_SEGMENTS_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), segs AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(t[(i*20+1):(i*20+20)], ' ') AS seg
  FROM toks, unnest(range(CAST(ceil(len(t)/20.0) AS BIGINT))) AS u(i)
), nz AS (
  SELECT * FROM segs WHERE seg <> ''
), freq AS (
  SELECT md5(seg) AS h, count(DISTINCT doc_id) AS nd, min(doc_id) AS owner
  FROM nz GROUP BY 1
), marked AS (
  SELECT s.doc_id, s.seg_idx, s.seg,
         (f.nd >= 2 AND s.doc_id <> f.owner) AS dropped
  FROM nz s JOIN freq f ON md5(s.seg) = f.h
)
SELECT doc_id, count(*) AS n_segments,
       count(*) FILTER (WHERE dropped) AS n_removed,
       coalesce(string_agg(CASE WHEN NOT dropped THEN seg END, ' '
                           ORDER BY seg_idx), '') AS clean_text
FROM marked GROUP BY doc_id
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _read(spark, sf_dir, "documents"), n=3, threshold=0.5
    ).select("a", "b")


_NGRAM_JACCARD_ORACLE = r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents
), g AS (
  SELECT doc_id,
         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                        for i in range(1, len(toks) - 1)]) AS grams
  FROM d
)
SELECT a.doc_id AS a, b.doc_id AS b
FROM g a JOIN g b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
      / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5
"""


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified LSH pair set (96/32, threshold 0.5 — the parameters BOTH
    dedup queries use), materialized once per (session, sf_dir) like
    _doc_triples: dedup_minhash_lsh and dedup_clusters otherwise each
    re-run the identical signature/banding/verify pipeline."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _MINHASH_PAIRS_CACHE.get(key)
    if hit is not None:
        return hit
    from trident_spark.operators.dedup import minhash_lsh_pairs

    out = minhash_lsh_pairs(
        _read(spark, sf_dir, "documents"), n_hashes=96, bands=32, threshold=0.5
    ).localCheckpoint(eager=True)
    _MINHASH_PAIRS_CACHE[key] = out
    return out


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LSH candidates are exact-Jaccard-verified, and on this corpus recall is
    # 1.0 (asserted in tests/), so the exact n-gram-Jaccard oracle applies.
    return _minhash_pairs(spark, sf_dir).select("a", "b")


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering end-to-end: LSH pairs → connected components →
    canonical representative per cluster.  Oracle: recursive-CTE transitive
    closure over the exact-Jaccard pairs with min-reachable-id labels."""
    from trident_spark.operators.dedup import dedup_clusters

    return dedup_clusters(_read(spark, sf_dir, "documents"),
                          pairs=_minhash_pairs(spark, sf_dir))


_DEDUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE sym AS (
  SELECT a AS u, b AS v FROM ({_NGRAM_JACCARD_ORACLE}) p
  UNION
  SELECT b, a FROM ({_NGRAM_JACCARD_ORACLE}) p
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, reach.r FROM reach JOIN sym e ON e.u = reach.id
)
SELECT id AS doc_id, MIN(r) AS cluster_id,
       (id = MIN(r)) AS is_canonical
FROM reach GROUP BY id
"""


def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based 10% sample — the same rows on every engine and re-run
    (df.sample() can't promise either)."""
    from trident_spark.operators.sampling import deterministic_sample

    return deterministic_sample(
        _read(spark, sf_dir, "documents"), "doc_id", 10
    ).select("doc_id", "lang")


_SAMPLE_DET_ORACLE = """
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 10
"""


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic rates (en 50%, rest 10%) — the corpus
    up/down-mix step."""
    from trident_spark.operators.sampling import stratified_sample

    return stratified_sample(
        _read(spark, sf_dir, "documents"), "doc_id", "lang", {"en": 50},
        default_pct=10,
    ).select("doc_id", "lang")


_SAMPLE_STRAT_ORACLE = """
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100
      < CASE WHEN lang = 'en' THEN 50 ELSE 10 END
"""


def q_text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 bigrams (count desc, gram asc — total order, so
    the rank boundary is engine-stable)."""
    from trident_spark.operators.textstats import top_ngrams

    return top_ngrams(_read(spark, sf_dir, "documents"), n=2, k=20)


_TOP_NGRAMS_ORACLE = r"""
WITH d AS (
  SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents
), g AS (
  SELECT unnest([toks[i] || ' ' || toks[i+1]
                 for i in range(1, len(toks))]) AS gram
  FROM d
)
SELECT gram, COUNT(*) AS cnt FROM g
GROUP BY gram ORDER BY cnt DESC, gram ASC LIMIT 20
"""


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label element-wise centroids in long form (grp, dim, c)."""
    from trident_spark.operators.similarity import embedding_centroids

    return embedding_centroids(_read(spark, sf_dir, "embeddings"))


_EMB_CENTROIDS_ORACLE = """
SELECT label AS grp, (idx - 1)::INT AS dim, ROUND(AVG(CAST(v AS DOUBLE)), 4) AS c
FROM (SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS idx
      FROM embeddings)
GROUP BY label, idx
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pigeonhole block-join candidates + popcount verify: exact by
    construction (any pair within Hamming k shares one of k+1 blocks), so
    the quadratic SQL mirror below is a true oracle.  Token hashes are
    md5-derived specifically so DuckDB can recompute the signatures."""
    from trident_spark.operators.dedup import simhash_pairs

    return simhash_pairs(_read(spark, sf_dir, "documents"), max_hamming=3)


_DEDUP_SIMHASH_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents
), h AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS hv FROM toks
), votes AS (
  SELECT doc_id, i,
         SUM(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE 0 END) AS ones,
         COUNT(*) AS n
  FROM h, range(64) t(i) GROUP BY doc_id, i
), sig AS (
  SELECT doc_id,
         SUM(CASE WHEN ones * 2 >= n
                  THEN CASE WHEN i = 63 THEN -9223372036854775808
                            ELSE (1::BIGINT << i) END
                  ELSE 0 END)::BIGINT AS simhash
  FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS a, b.doc_id AS b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.operators.textstats import token_count

    return token_count(_read(spark, sf_dir, "documents")).select(
        "doc_id", "n_tokens", "n_chars",
        F.col("n_subword_est").cast("long").alias("n_subword_est"),
    )


_TOKEN_COUNT_ORACLE = r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
       length(text) AS n_chars,
       CAST(ceil(length(regexp_replace(text, '\s+', '', 'g')) / 4.0) AS BIGINT)
         AS n_subword_est
FROM documents
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.operators.textstats import fingerprint

    return fingerprint(_read(spark, sf_dir, "documents"))


_FINGERPRINT_ORACLE = r"""
SELECT doc_id,
       md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
FROM documents
"""


def _pii_augmented_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with deterministic synthetic PII appended (the corpus
    text carries none by construction) — the SQL oracle rebuilds the
    identical augmentation, so detection AND redaction are end-to-end
    checkable."""
    return _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact doc"), F.col("doc_id"),
            F.lit("@example.com or (415) 555-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)), 4, "0"),
            F.lit(" ip 10.0."), F.pmod(F.col("doc_id"), F.lit(256)),
            F.lit(".7"),
        ).alias("text"),
    )


def q_pii_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over PII-augmented documents: per-doc
    category counts joined with the redacted text.  Patterns live in the
    Java-regex ∩ RE2 subset, so the oracle evaluates the IDENTICAL
    expressions."""
    from trident_spark.operators.pii import pii_signals, redact_pii

    docs = _pii_augmented_docs(spark, sf_dir)
    return pii_signals(docs).join(
        redact_pii(docs).select("id", F.col("text").alias("redacted"),
                                "was_redacted"),
        "id",
    )


def _pii_oracle() -> str:
    from trident_spark.operators.pii import PII_PATTERNS

    aug = ("text || ' contact doc' || doc_id || '@example.com or "
           "(415) 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
           "|| ' ip 10.0.' || (doc_id % 256) || '.7'")
    counts = ", ".join(
        f"len(regexp_extract_all(t, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    red = "t"
    for _, pat, token in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return f"""
WITH aug AS (SELECT doc_id AS id, {aug} AS t FROM documents),
c AS (SELECT id, t, {counts} FROM aug)
SELECT id, n_email, n_credit_card, n_ssn, n_phone, n_ipv4,
       {total} AS n_pii_total,
       {red} AS redacted, {red} <> t AS was_redacted
FROM c
"""


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination with planted contamination: the
    benchmark IS the first three documents, so those three must flag at
    overlap 1.0 against themselves; every cross-doc collision the corpus
    happens to contain is recomputed identically by the oracle."""
    from trident_spark.operators.decontaminate import decontaminate

    docs = _read(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("bench_id"), "text")
    return decontaminate(docs, bench, threshold=0.5, n=8).select(
        "id", "max_overlap", "worst_bench_id", "is_contaminated")


_DECONTAMINATION_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, t, unnest(range(1, greatest(len(t) - 6, 1))) AS i
  FROM toks WHERE len(t) >= 8
),
grams AS (
  SELECT DISTINCT doc_id, md5(array_to_string(t[i : i + 7], ' ')) AS h
  FROM pos
),
bg AS (SELECT doc_id AS bench_id, h FROM grams WHERE doc_id < 3),
bsz AS (SELECT bench_id, COUNT(*) AS bench_grams FROM bg GROUP BY bench_id),
hits AS (
  SELECT g.doc_id AS id, bg.bench_id, COUNT(*) AS n_shared
  FROM grams g JOIN bg ON g.h = bg.h
  GROUP BY g.doc_id, bg.bench_id
),
scored AS (
  SELECT id, hits.bench_id,
         round(n_shared / CAST(bench_grams AS DOUBLE), 4) AS overlap_frac
  FROM hits JOIN bsz ON hits.bench_id = bsz.bench_id
),
worst AS (
  SELECT id, overlap_frac AS max_overlap, bench_id AS worst_bench_id
  FROM (SELECT *, row_number() OVER (
            PARTITION BY id
            ORDER BY overlap_frac DESC, bench_id DESC) AS rn
        FROM scored)
  WHERE rn = 1
)
SELECT d.doc_id AS id,
       coalesce(w.max_overlap, 0.0) AS max_overlap,
       w.worst_bench_id,
       coalesce(w.max_overlap, 0.0) >= 0.5 AS is_contaminated
FROM documents d LEFT JOIN worst w ON d.doc_id = w.id
"""


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode/whitespace normalization over documents augmented with
    deterministic mess (leading spaces, CRLF runs, a zero-width char) —
    the oracle rebuilds the same input and mirrors every step, NFC via
    DuckDB's nfc_normalize."""
    from trident_spark.operators.textstats import normalize_text

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("  "), F.col("text"),
                 F.lit("\r\n\r\n\r\nend\u200b.")).alias("text"),
    )
    return normalize_text(docs)


def _text_normalize_oracle() -> str:
    zw = "".join(chr(c) for c in (0x200B, 0x200C, 0x200D, 0xFEFF))
    aug = "'  ' || text || (chr(13) || chr(10)) || (chr(13) || chr(10)) || (chr(13) || chr(10)) || 'end' || chr(8203) || '.'"
    chain = f"regexp_replace(t, '\\r\\n?', chr(10), 'g')"
    chain = (f"regexp_replace({chain}, "
             "'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')")
    chain = f"regexp_replace({chain}, '[{zw}]', '', 'g')"
    chain = f"regexp_replace({chain}, '[ \\t]+', ' ', 'g')"
    chain = f"regexp_replace({chain}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    chain = f"nfc_normalize(trim({chain}))"
    return f"""
WITH aug AS (SELECT doc_id AS id, {aug} AS t FROM documents)
SELECT id, {chain} AS text, {chain} <> t AS was_changed FROM aug
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.operators.textstats import quality_features

    return quality_features(_read(spark, sf_dir, "documents")).select(
        "doc_id", "n_tokens", "mean_token_len", "punct_ratio", "stopword_ratio"
    )


_TEXT_QUALITY_ORACLE = r"""
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '\s+', '', 'g')) AS n_nonws
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       round(n_nonws::DOUBLE / len(toks), 4) AS mean_token_len,
       round((n_chars - length(regexp_replace(text, '[^\w\s]', '', 'g')))::DOUBLE
             / greatest(n_chars, 1), 4) AS punct_ratio,
       round(len(list_filter(toks, x -> list_contains(
         ['the','a','an','and','or','of','to','in','is','was','for','on',
          'with','as','by','at','it','this','that','be','are','from'], x)))::DOUBLE
             / greatest(len(toks), 1), 4) AS stopword_ratio
FROM t
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.operators.textstats import lang_id

    return lang_id(_read(spark, sf_dir, "documents"))


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        _read(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == _QUERY_VEC_ID)
        .first()
    )
    return [float(x) for x in row["embedding"]]


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.operators.similarity import cosine_topk

    q = _query_vector(spark, sf_dir)
    return cosine_topk(_read(spark, sf_dir, "embeddings"), q, k=10).select("vec_id")


_SIMILARITY_TOPK_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {_QUERY_VEC_ID})
SELECT vec_id
FROM embeddings, q
ORDER BY list_cosine_similarity(embedding, qv) DESC, vec_id ASC
LIMIT 10
"""


def q_similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Oracle-green via an exact SQL mirror of the ANN semantics: the
    # hyperplanes are deterministic constants, so bucket prefilter + exact
    # rescore is fully expressible in DuckDB (see _ann_lsh_oracle).
    from trident_spark.operators.similarity import lsh_bucket_topk

    q = _query_vector(spark, sf_dir)
    return lsh_bucket_topk(
        _read(spark, sf_dir, "embeddings"), q, k=10, n_bits=6, probes=4
    ).select("vec_id")


def _ann_lsh_oracle(n_bits: int = 6, probes: int = 4, k: int = 10,
                    dim: int = 64, seed: int = 11) -> str:
    """DuckDB mirror of lsh_bucket_topk: same deterministic hyperplanes
    (inputs, like conformance vectors), bucket + multiprobe + exact cosine
    re-expressed in SQL — so the oracle checks the ANN semantics themselves,
    not a recall assumption."""
    from trident_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_bits, seed)
    plane_rows = ", ".join(
        "(" + str(i) + ", [" + ", ".join(repr(float(v)) for v in row) + "])"
        for i, row in enumerate(planes)
    )
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}),
planes(i, p) AS (VALUES {plane_rows}),
qbits AS (
  SELECT i,
         CASE WHEN list_dot_product(p, qv) > 0 THEN 1 ELSE 0 END AS bit,
         abs(list_dot_product(p, qv)) AS margin
  FROM planes, q
),
base AS (SELECT CAST(SUM(bit * (1 << i)) AS BIGINT) AS b FROM qbits),
flips AS (SELECT CAST(1 << i AS BIGINT) AS f FROM qbits
          ORDER BY margin, i LIMIT {probes - 1}),
probeset AS (
  SELECT b AS bucket FROM base
  UNION ALL SELECT xor(b, f) FROM base, flips
),
sig AS (
  SELECT vec_id, embedding,
         CAST(SUM(CASE WHEN list_dot_product(p, embedding) > 0
                       THEN (1 << i) ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings, planes GROUP BY vec_id, embedding
)
SELECT vec_id FROM sig, q
WHERE bucket IN (SELECT bucket FROM probeset)
ORDER BY list_cosine_similarity(embedding, qv) DESC, vec_id
LIMIT {k}
"""


def q_similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k (r4: now SQL-mirror-oracled like similarity_ann_lsh).
    The codebook is deterministic given the data — md5(id)-ordered
    sample + seeded numpy k-means — so the oracle re-trains the identical
    codebook from the same parquet and mirrors cell assignment, probe
    selection, and exact rescore in DuckDB."""
    from trident_spark.operators.similarity import ivf_topk

    q = _query_vector(spark, sf_dir)
    return ivf_topk(_read(spark, sf_dir, "embeddings"), q, k=10,
                    n_cells=16, n_probe=4).select("vec_id")


import functools


@functools.lru_cache(maxsize=None)
def _ann_ivf_oracle(n_cells: int = 16, n_probe: int = 4, k: int = 10,
                    seed: int = 13,
                    sf_dir: str = "/root/testdata/sf0.01") -> str:
    """DuckDB mirror of ivf_topk: the codebook is RE-TRAINED here from
    the same parquet with the identical pure-numpy k-means over the same
    md5(id)-ordered sample, then embedded as literals; cell assignment
    (argmax dot, lowest index on ties), probe selection and exact cosine
    rescore are SQL — the oracle checks the ANN semantics themselves.
    The driver evaluates oracles at sf0.01 (pinned path, like the
    conformance-vector oracles carry their inputs).

    Float-boundary audit (CLAUDE.md rule 7): every decision this query
    takes on floats was margin-measured on the fixed sf0.01 corpus —
    min top1-vs-top2 cell-assignment gap 7.2e-3, probe-4-vs-5 gap
    8.4e-3, rank-10-vs-11 rescore gap 4.7e-3 — versus cross-engine
    summation divergence ≤ ~1e-13, ten orders of magnitude of headroom
    on a corpus that never changes; rounding the keys would not close
    a boundary this comparison cannot reach."""
    import duckdb

    from trident_spark.operators.similarity import kmeans_codebook

    try:
        sample = duckdb.sql(
            f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
            "ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 4096"
        ).fetchall()
    except Exception:  # noqa: BLE001 — codebook source absent on this host:
        # only THIS oracle may fail (at execution, loudly), never the
        # construction of the whole oracle dict (r4 review finding)
        return "SELECT error('ivf codebook source parquet unavailable')"
    cents = kmeans_codebook([row[0] for row in sample], n_cells, seed=seed)
    cent_rows = ", ".join(
        "(" + str(i) + ", [" + ", ".join(repr(float(v)) for v in row) + "])"
        for i, row in enumerate(cents)
    )
    return f"""
WITH cents(i, c) AS (VALUES {cent_rows}),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}),
probe AS (
  SELECT i FROM cents, q
  ORDER BY list_dot_product(c, qv) DESC, i LIMIT {n_probe}
),
scored AS (
  SELECT e.vec_id, e.embedding, c.i,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY list_dot_product(c.c, e.embedding) DESC,
                                     c.i) AS rn
  FROM embeddings e, cents c
),
assigned AS (SELECT vec_id, embedding, i AS cell FROM scored WHERE rn = 1)
SELECT vec_id FROM assigned, q
WHERE cell IN (SELECT i FROM probe)
ORDER BY list_cosine_similarity(embedding, qv) DESC, vec_id
LIMIT {k}
"""


def q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB near-dup path: LSH-bucket candidate join + exact rescore.
    r5: SQL-mirror-oracled like similarity_ann_lsh — the hyperplanes are
    deterministic constants, so bucket assignment + same-bucket pairing +
    exact rescore is fully expressible in DuckDB (_near_dup_lsh_oracle);
    the oracle checks the LSH semantics themselves, not a recall bound."""
    from trident_spark.operators.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        _read(spark, sf_dir, "embeddings"), threshold=0.45, use_lsh=True,
        n_bits=8, dim=64,
    ).select("a", "b")


def _near_dup_lsh_oracle(threshold: float = 0.45, n_bits: int = 8,
                         dim: int = 64, seed: int = 11) -> str:
    """DuckDB mirror of embedding_near_dup_pairs(use_lsh=True): identical
    deterministic hyperplanes, bucket = sign pattern over the UNIT-normalized
    vector (matching _normalized → hyperplane_signatures), same-bucket
    (a < b) candidates, cosine = round(dot of normalized, 4) ≥ threshold.

    Float-boundary audit on the fixed sf0.01 corpus (CLAUDE.md rule 7):
    min |plane·v| bucket-bit margin 1.1e-3; min |cos − 0.44995| distance to
    the round-then-compare boundary 3.0e-3 — vs cross-engine summation
    divergence ≤ ~1e-13, ten orders of magnitude of headroom."""
    from trident_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_bits, seed)
    plane_rows = ", ".join(
        "(" + str(i) + ", [" + ", ".join(repr(float(v)) for v in row) + "])"
        for i, row in enumerate(planes)
    )
    return f"""
WITH planes(i, p) AS (VALUES {plane_rows}),
nv AS (
  SELECT vec_id,
         list_transform(
             embedding,
             x -> x / sqrt(list_dot_product(embedding, embedding))) AS v
  FROM embeddings
),
sig AS (
  SELECT vec_id, v,
         CAST(SUM(CASE WHEN list_dot_product(p, v) > 0
                       THEN (1 << i) ELSE 0 END) AS BIGINT) AS bucket
  FROM nv, planes GROUP BY vec_id, v
)
SELECT a.vec_id AS a, b.vec_id AS b
FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v), 4) >= {threshold}
"""


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trident_spark.operators.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        _read(spark, sf_dir, "embeddings"), threshold=0.45, use_lsh=False
    ).select("a", "b")


_EMBEDDING_NEAR_DUP_ORACLE = """
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
"""


# ---------------------------------------------------------------------------
# relational + window queries (scan/join/agg/sort/window coverage, C3/C15/C18/C20)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


_PRICING_SUMMARY_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    cust = _read(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .where(F.col("c_mktsegment") == "BUILDING")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_TOP_ORDERS_ORACLE = """
SELECT l_orderkey, o_orderdate,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    sup = _read(spark, sf_dir, "supplier")
    nat = _read(spark, sf_dir, "nation")
    reg = _read(spark, sf_dir, "region")
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


_REGION_REVENUE_ORACLE = """
SELECT r_name AS region,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.col("event_type"),
            F.date_trunc("hour", F.col("ts")).alias("hour"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_EVENTS_HOURLY_ORACLE = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""


def q_events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via window functions: 30-min inactivity gap (C20)."""
    from pyspark.sql.window import Window

    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    with_session = (
        ev.withColumn("new_session", (gap.isNull() | (gap > 1800)).cast("int"))
        .withColumn("session_id", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return with_session.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


# the Spark side compares SECOND-TRUNCATED unix_timestamp deltas, so the
# oracle must floor epochs too — exact INTERVAL comparison disagrees on
# gaps within 1s of the 1800s boundary (the corpus HAS such gaps)
_EVENTS_SESSION_ORACLE = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN floor(epoch(ts))::BIGINT
                   - floor(epoch(LAG(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts)))::BIGINT > 1800
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id, value,
         -- DuckDB windowed SUM(int) yields HUGEINT, which pandas renders as
         -- float64 and the driver then value-hashes 1.0 vs Spark's 1; the
         -- values are identical, so pin the dtype (CLAUDE.md rule 7)
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM g
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS session_value
FROM s GROUP BY user_id, session_id
"""


def q_events_sessionized_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming sessionization (C21) driven end-to-end by the
    oracle: the stateful applyInPandasWithState operator runs over the real
    events table as an availableNow file stream (two micro-batches — the
    per-user far-future sentinel file advances the watermark past every
    real session's gap, closing them), and the emitted sessions must match
    the batch window semantics recomputed in SQL."""
    import shutil
    import tempfile

    from trident_spark.streaming.sessionize import sessionize_stream

    ev = _read(spark, sf_dir, "events").select("user_id", "ts", "value")
    # ONE synthetic sentinel user 10 days past the global max: its row
    # advances the (global) watermark so availableNow's final batch fires
    # every real user's event-time timeout, and filtering it back out is
    # STRUCTURAL (user_id = -1), not dependent on any user's idle span
    max_real_ts = ev.agg(F.max("ts")).first()[0]
    sentinels = spark.createDataFrame(
        [(-1, max_real_ts)], "user_id long, ts timestamp"
    ).select("user_id", (F.col("ts") + F.expr("INTERVAL 10 DAYS")).alias("ts"),
             F.lit(0.0).alias("value"))

    tmp = tempfile.mkdtemp(prefix="sess_stream_")
    src = f"{tmp}/src"
    import os

    os.makedirs(src)
    try:
        for i, frame in enumerate((ev, sentinels)):
            stage = f"{tmp}/stage{i}"
            frame.coalesce(1).write.mode("overwrite").parquet(stage)
            part = next(p for p in os.listdir(stage)
                        if p.endswith(".parquet"))
            dst = f"{src}/{i}.parquet"
            shutil.copy(f"{stage}/{part}", dst)
            # modification-time order fixes batch order (latestFirst=false)
            os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

        stream = (
            spark.readStream
            .schema("user_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src)
        )
        name = "sessions_stream_" + os.path.basename(tmp).split("_")[-1]
        q = (
            sessionize_stream(stream)
            .writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "sessionization stream exceeded its 300s budget — "
                "failing loudly instead of reading a partial sink")
        out = (
            spark.table(name)
            .where(F.col("user_id") != -1)
            .select("user_id", "session_start", "n_events", "session_value")
            .localCheckpoint(eager=True)
        )
    finally:
        # /tmp persists across sessions on this VM (CLAUDE.md rule 15) —
        # never leak the staged parquet + checkpoint trees
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# the stateful operator compares SECOND-TRUNCATED timestamps (the batch
# window's unix_timestamp does too), so the oracle floors epochs — exact
# INTERVAL comparison would disagree on gaps within 1s of the boundary
_EVENTS_SESSION_STREAM_ORACLE = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN floor(epoch(ts))::BIGINT
                   - floor(epoch(LAG(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts)))::BIGINT > 1800
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM g
)
SELECT user_id,
       to_timestamp(floor(epoch(MIN(ts))))::TIMESTAMP AS session_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS session_value
FROM s GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# rows-only extras (non-SQL-expressible: iterative / approximate / stubbed)
# ---------------------------------------------------------------------------


def q_kg_top_hubs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most-connected subjects of the doc KG (C18 top-k)."""
    from trident_spark.pipeline.diff import top_hubs

    return top_hubs(_distinct_triples(spark, sf_dir), k=10)


_KG_TOP_HUBS_ORACLE = f"""
SELECT '{DOC_BASE}/doc/' || doc_id AS subj, 5 AS degree
FROM documents ORDER BY subj ASC LIMIT 10
"""


def q_events_salted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation (C16) — must equal a plain groupBy."""
    from trident_spark.pipeline.skew import salted_count

    return salted_count(_read(spark, sf_dir, "events"), ["event_type"], n_salt=32)


_EVENTS_SALTED_ORACLE = "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type"


def q_kg_triple_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (C19): triples removed when dropping half the corpus."""
    from trident_spark.pipeline.diff import triple_diff

    docs = _read(spark, sf_dir, "documents")
    half = docs.where(F.col("doc_id") % 2 == 0)
    from trident_spark.pipeline import extract_stage, kg
    from trident_spark.pipeline.docs_to_pages import docs_to_page_results

    def triples_of(d):
        return kg.skolemize(
            extract_stage.raw_triples(docs_to_page_results(d))
        )

    # the full-corpus side is exactly the cached extraction — only the
    # half-corpus side needs a fresh Python pass
    return triple_diff(triples_of(half), _doc_triples(spark, sf_dir)).select(
        "subj", "pred", "obj_lexical", "obj_kind",
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"),
        "change",
    )


_KG_TRIPLE_DIFF_ORACLE = f"""
WITH odd AS (
  SELECT '{DOC_BASE}/doc/' || doc_id AS doc,
         '{DOC_BASE}/org/' || source AS org,
         text, lang, source, n_chars
  FROM documents WHERE doc_id % 2 = 1
), gone AS (  -- orgs whose every document is odd disappear entirely
  SELECT '{DOC_BASE}/org/' || source AS org, source
  FROM documents GROUP BY source
  HAVING COUNT(*) FILTER (WHERE doc_id % 2 = 0) = 0
), t AS (
  SELECT doc AS subj, '{RDF_TYPE}' AS pred,
         '{SCHEMA}TextDigitalDocument' AS obj_lexical, 'iri' AS obj_kind,
         '' AS obj_datatype FROM odd
  UNION ALL SELECT doc, '{SCHEMA}text', text, 'literal', '' FROM odd
  UNION ALL SELECT doc, '{SCHEMA}inLanguage', lang, 'literal', '' FROM odd
  UNION ALL SELECT doc, '{SCHEMA}characterCount', CAST(n_chars AS VARCHAR),
                   'literal', '{XSD_INT}' FROM odd
  UNION ALL SELECT doc, '{SCHEMA}provider', org, 'iri', '' FROM odd
  UNION ALL SELECT org, '{RDF_TYPE}', '{SCHEMA}Organization', 'iri', '' FROM gone
  UNION ALL SELECT org, '{SCHEMA}name', source, 'literal', '' FROM gone
)
SELECT DISTINCT subj, pred, obj_lexical, obj_kind, obj_datatype,
       'removed' AS change
FROM t
"""


def q_kg_full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline incl. linking + connected components on the synthetic
    web corpus (pages synthesized deterministically per north rule).

    Oracle: an independent pure-Python reimplementation of the same
    semantics (spec-derived triples, linking rules, union-find CC,
    pure-Python Spark-compatible xxhash64 ids) — pipeline/golden.py —
    emitted as a VALUES table, covering C11-C14 end-to-end."""
    from trident_spark.pipeline import build_kg
    from trident_spark.pipeline.alias_dict import alias_dict_df
    from trident_spark.pipeline.pages import pages_df

    pages = pages_df(spark, 200)
    result = build_kg(pages, alias_dict=alias_dict_df(spark))
    return result.triples.select("subj_id", "pred_id", "obj_id")


def _kg_full_pipeline_oracle() -> str:
    from trident_spark.pipeline.golden import full_pipeline_golden_ids

    return _values_sql(full_pipeline_golden_ids(200),
                       ("subj_id", "pred_id", "obj_id"))


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end, projected to hashable columns: the
    raw ``array<float>`` API stays for library users, but the driver's
    canonicalization sorts every column, so the vector is digested to md5
    of its float32 bytes (bit-exact, no float formatting)."""
    from trident_spark.operators.multimodal import (
        extract_features, feature_digest, synthetic_media_df,
    )

    feats = extract_features(synthetic_media_df(spark, 60), feature_dim=8)
    return feats.select(
        "media_id",
        "kind",
        F.coalesce(F.size("feature"), F.lit(-1)).alias("n_dims"),
        F.coalesce(feature_digest(F.col("feature")), F.lit(""))
        .alias("feature_digest"),
        F.coalesce("decode_error", F.lit("")).alias("decode_error"),
    )


def _multimodal_expected_rows(n: int = 60, seed: int = 42,
                              feature_dim: int = 8) -> list[tuple]:
    """Independent pure-Python recomputation of the media features — image
    pixel stats over the PPM pixels, audio RMS/ZCR/FFT bands over the PCM
    samples, video = the decode-error path.  The math is re-derived here,
    NOT imported from the operator module — this is the oracle."""
    import hashlib

    import numpy as np

    def md5_of(feats: np.ndarray) -> str:
        out = np.zeros(feature_dim, dtype=np.float64)
        out[: min(feature_dim, len(feats))] = feats[:feature_dim]
        return hashlib.md5(out.astype(np.float32).tobytes()).hexdigest()

    rows = []
    for i in range(n):
        rng = np.random.RandomState((seed << 16) ^ i)
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            w, h = 8 + i % 8, 6 + i % 6
            px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8).astype(
                np.float64)
            feats = np.array([
                h, w, px[:, :, 0].mean(), px[:, :, 1].mean(),
                px[:, :, 2].mean(), px.std(), px.min(), px.max(),
            ])
            rows.append((i, kind, feature_dim, md5_of(feats), ""))
        elif kind == "audio":
            rate = 8000
            n_samp = 800 + (i % 5) * 200
            t = np.arange(n_samp) / rate
            freq = 200.0 + 50.0 * (i % 10)
            x = (np.sin(2 * np.pi * freq * t) * 12000).astype(
                np.int16).astype(np.float64) / 32768.0
            zcr = float(np.mean(np.abs(np.diff(np.sign(x))) > 0))
            spec = np.abs(np.fft.rfft(x))
            bands = [float(b.mean()) for b in np.array_split(spec, 4)]
            feats = np.array([len(x), rate,
                              float(np.sqrt(np.mean(x * x))), zcr, *bands])
            rows.append((i, kind, feature_dim, md5_of(feats), ""))
        else:
            rows.append((i, kind, -1, "", "no video codec available"))
    return rows


# ---------------------------------------------------------------------------
# consolidated operator suites (driver-window economy, same evidence):
# the component queries remain in extra_queries() for the local mirror.
# ---------------------------------------------------------------------------


def q_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring + document fingerprinting in one
    frame (joined on doc_id — each is a narrow per-doc projection, so the
    join is a zip of co-partitioned scans, no extra pass over text)."""
    from trident_spark.operators.textstats import (
        fingerprint, quality_features, token_count,
    )

    docs = _read(spark, sf_dir, "documents")
    tok = token_count(docs).select(
        "doc_id", "n_tokens", "n_chars",
        F.col("n_subword_est").cast("long").alias("n_subword_est"),
    )
    qual = quality_features(docs).select(
        "doc_id", "mean_token_len", "punct_ratio", "stopword_ratio")
    return tok.join(qual, "doc_id").join(fingerprint(docs), "doc_id")


def _text_features_oracle() -> str:
    return f"""
SELECT t.doc_id, t.n_tokens, t.n_chars, t.n_subword_est,
       q.mean_token_len, q.punct_ratio, q.stopword_ratio, f.fingerprint
FROM ({_TOKEN_COUNT_ORACLE}) t
JOIN ({_TEXT_QUALITY_ORACLE}) q ON t.doc_id = q.doc_id
JOIN ({_FINGERPRINT_ORACLE}) f ON t.doc_id = f.doc_id
"""


def q_sample_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample + stratified per-language sample (en 50%,
    rest 10%) in one frame, labeled by mode."""
    det = q_sample_deterministic(spark, sf_dir).select(
        F.lit("det").alias("mode"), "doc_id", "lang")
    strat = q_sample_stratified(spark, sf_dir).select(
        F.lit("strat").alias("mode"), "doc_id", "lang")
    return det.unionByName(strat)


def _sample_suite_oracle() -> str:
    return f"""
SELECT 'det' AS mode, doc_id, lang FROM ({_SAMPLE_DET_ORACLE}) d
UNION ALL
SELECT 'strat', doc_id, lang FROM ({_SAMPLE_STRAT_ORACLE}) s
"""


def q_similarity_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k (the verify path) and the hyperplane-
    LSH bucket-prefiltered ANN top-k (the 100 TB path) in one frame — both
    oracle-exact (the LSH mirror recomputes bucket semantics in SQL)."""
    from trident_spark.operators.similarity import cosine_topk, lsh_bucket_topk

    q = _query_vector(spark, sf_dir)
    emb = _read(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, q, k=10).select(
        F.lit("exact").alias("method"), "vec_id")
    lsh = lsh_bucket_topk(emb, q, k=10, n_bits=6, probes=4).select(
        F.lit("lsh").alias("method"), "vec_id")
    return exact.unionByName(lsh)


def _similarity_suite_oracle() -> str:
    return f"""
SELECT 'exact' AS method, vec_id FROM ({_SIMILARITY_TOPK_ORACLE}) e
UNION ALL
SELECT 'lsh', vec_id FROM ({_ann_lsh_oracle()}) l
"""


def q_kg_sparql_bind_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery (inner GROUP BY aggregation) joined to the outer pattern,
    plus BIND computing a label from an outer binding — one driver row
    covering both features."""
    from trident_spark.query.sparql import query

    return query(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        SELECT DISTINCT ?label ?n WHERE {
            ?org a schema:Organization ; schema:name ?nm .
            { SELECT ?org (COUNT(?d) AS ?n) WHERE {
                ?d schema:provider ?org } GROUP BY ?org }
            BIND(CONCAT("ORG:", UCASE(?nm)) AS ?label)
        }
        """,
    )


_KG_SPARQL_BIND_SUBQUERY_ORACLE = """
SELECT 'ORG:' || UPPER(source) AS label, COUNT(*) AS n
FROM documents GROUP BY source
"""


def q_kg_sparql_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 function library end-to-end: STR/UCASE/SUBSTR/REPLACE/
    STRAFTER/STRBEFORE/IF/COALESCE/IN/sameTerm/arithmetic/TIMEZONE (r5:
    xsd:dayTimeDuration lexical — Z, +05:30 and -04:00 offsets) in FILTER
    and BIND, every value independently recomputed by the DuckDB oracle."""
    from trident_spark.query.sparql import query

    return query(
        _distinct_triples(spark, sf_dir),
        """
        PREFIX schema: <https://schema.org/>
        SELECT DISTINCT ?doc ?langU ?srcnum ?sizeclass ?nlen ?nmh ?tzd WHERE {
            ?doc schema:provider ?org ;
                 schema:inLanguage ?lang ;
                 schema:characterCount ?n .
            ?org schema:name ?nm .
            FILTER(sameTerm(?lang, ?lang) && isNUMERIC(?n) &&
                   ?nm IN ("src1", "src2", "src3", "src4"))
            BIND(UCASE(STR(?lang)) AS ?langU)
            BIND(REPLACE(STRAFTER(?nm, "src"), "1", "9") AS ?srcnum)
            BIND(IF(?n * 2 >= 1000, "big",
                    COALESCE(STRBEFORE(?nm, "rc"), "small")) AS ?sizeclass)
            BIND(STRLEN(?nm) - 1 AS ?nlen)
            BIND(MD5(?nm) AS ?nmh)
            BIND(TIMEZONE(CONCAT("2024-03-01T12:00:00",
                 IF(?nm = "src1", "Z",
                    IF(?nm = "src2", "+05:30", "-04:00")))) AS ?tzd)
        }
        """,
    ).withColumn("nlen", F.col("nlen").cast("long"))


_KG_SPARQL_FUNCTIONS_ORACLE = f"""
SELECT DISTINCT '{DOC_BASE}/doc/' || doc_id AS doc,
       UPPER(lang) AS langU,
       REPLACE(substr(source, 4), '1', '9') AS srcnum,
       CASE WHEN n_chars * 2 >= 1000 THEN 'big' ELSE 's' END AS sizeclass,
       CAST(length(source) - 1 AS BIGINT) AS nlen,
       md5(source) AS nmh,
       CASE WHEN source = 'src1' THEN 'PT0S'
            WHEN source = 'src2' THEN 'PT5H30M'
            ELSE '-PT4H' END AS tzd
FROM documents
WHERE source IN ('src1', 'src2', 'src3', 'src4')
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-verified set — kept ≤50 entries so every row gets a hard
    CORRECTNESS check (the driver verifies at most the first 50).  Queries
    that were consolidated or are quadratic verify-paths live in
    extra_queries() and are oracle-checked by the local bit-faithful mirror
    (tests/test_entry_contract.py).  Ordered with the queries that lacked a
    driver row in round 2 first, defensively."""
    return {
        # --- no driver row in CORRECTNESS_r02 (tail of the old 64) ---
        "text_features": q_text_features,
        "similarity_suite": q_similarity_suite,
        "similarity_ann_ivf": q_similarity_ann_ivf,
        "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
        "multimodal_features": q_multimodal_features,
        "pricing_summary": q_pricing_summary,
        "top_orders": q_top_orders,
        "region_revenue": q_region_revenue,
        "events_hourly": q_events_hourly,
        "events_sessionized": q_events_sessionized,
        "events_sessionized_stream": q_events_sessionized_stream,
        # --- KG pipeline + SPARQL surface ---
        "kg_doc_triples": q_kg_doc_triples,
        "kg_predicate_stats": q_kg_predicate_stats,
        "kg_sparql_bgp": q_kg_sparql_bgp,
        "kg_sparql_optional": q_kg_sparql_optional,
        "kg_sparql_agg_having": q_kg_sparql_having,
        "kg_sparql_union": q_kg_sparql_union,
        "kg_sparql_path": q_kg_sparql_path,
        "kg_sparql_minus_values": q_kg_sparql_minus_values,
        "kg_sparql_exists": q_kg_sparql_exists,
        "kg_sparql_bind_subquery": q_kg_sparql_bind_subquery,
        "kg_sparql_functions": q_kg_sparql_functions,
        "kg_sparql_ask": q_kg_sparql_ask,
        "kg_sparql_construct": q_kg_sparql_construct,
        "kg_rdfstar_reify": q_kg_rdfstar_reify,
        "kg_sparql_star": q_kg_sparql_star,
        "kg_sparql_graph": q_kg_sparql_graph,
        "kg_sparql_describe": q_kg_sparql_describe,
        "kg_sparql_datatype": q_kg_sparql_datatype,
        "kg_sparql_update": q_kg_sparql_update,
        "kg_sparql_update_graph": q_kg_sparql_update_graph,
        "kg_turtle_roundtrip": q_kg_turtle_roundtrip,
        "kg_quads_roundtrip": q_kg_quads_roundtrip,
        "kg_jsonld_roundtrip": q_kg_jsonld_roundtrip,
        "kg_rdfxml_roundtrip": q_kg_rdfxml_roundtrip,
        "kg_text_invariant": q_kg_text_invariant,
        "kg_top_hubs": q_kg_top_hubs,
        "kg_triple_diff": q_kg_triple_diff,
        "kg_full_pipeline": q_kg_full_pipeline,
        "events_salted_counts": q_events_salted_counts,
        # --- LLM-data ops (scale paths only; quadratic verify paths are
        #     test-side oracles in extra_queries) ---
        "dedup_exact": q_dedup_exact,
        "dedup_segments": q_dedup_segments,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_clusters": q_dedup_clusters,
        "dedup_simhash": q_dedup_simhash,
        "sample_suite": q_sample_suite,
        "text_top_ngrams": q_text_top_ngrams,
        "embedding_centroids": q_embedding_centroids,
        # --- RFC conformance (green in r01 AND r02; consolidated) ---
        "iri_conformance": q_iri_conformance,
        "langtag_conformance": q_langtag_conformance,
    }


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Oracle-checked locally (tests/test_entry_contract.py runs the same
    bit-faithful canonicalization as the driver) but kept out of the
    driver's 50-query window: the per-vector conformance queries now
    consolidated into {iri,langtag}_conformance, the single-purpose SPARQL
    queries consolidated into agg_having / bind_subquery, and the
    deliberately-quadratic verify twins of the LSH scale paths."""
    return {
        # lang_id: no SQL oracle expressible (the corpus lang column is
        # provably independent of its text — CLAUDE.md rule 11); verified
        # by the 18/18 held-out accuracy pytest gate instead
        "lang_id": q_lang_id,
        "iri_resolve_rfc3986": q_iri_resolve,
        "iri_normalize_rfc3986": q_iri_normalize,
        "iri_to_uri_rfc3987": q_iri_to_uri,
        "uri_to_iri_rfc3987": q_uri_to_iri,
        "iri_relativize": q_iri_relativize,
        "langtag_normalize_rfc5646": q_langtag_normalize,
        "langtag_parse_rfc5646": q_langtag_parse,
        "iri_parse_wellformed": q_iri_parse_wellformed,
        "iri_reject_invalid": q_iri_reject_invalid,
        "langtag_reject_invalid": q_langtag_reject_invalid,
        "langtag_extlang_form": q_langtag_extlang_form,
        "kg_bgp_provider": q_kg_bgp_provider,
        "kg_nquads_roundtrip": q_kg_nquads_roundtrip,
        "kg_trig_roundtrip": q_kg_trig_roundtrip,
        "kg_jsonld_quads_roundtrip": q_kg_jsonld_quads_roundtrip,
        "kg_sparql_agg": q_kg_sparql_agg,
        "kg_sparql_scope": q_kg_sparql_scope,
        "kg_sparql_having": q_kg_sparql_having,
        "kg_sparql_bind": q_kg_sparql_bind,
        "kg_sparql_subquery": q_kg_sparql_subquery,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "embedding_near_dup": q_embedding_near_dup,
        "similarity_topk": q_similarity_topk,
        "similarity_ann_lsh": q_similarity_ann_lsh,
        "sample_deterministic": q_sample_deterministic,
        "sample_stratified": q_sample_stratified,
        "text_token_count": q_text_token_count,
        "text_quality": q_text_quality,
        "doc_fingerprint": q_doc_fingerprint,
        # --- r4 training-data hygiene ops ---
        "pii_suite": q_pii_suite,
        "decontamination": q_decontamination,
        "text_normalize": q_text_normalize,
    }


def _iri_parse_wellformed_oracle() -> str:
    from trident_spark.conformance import PARSE_VALID_REFS

    return _values_sql([(v, v, True) for v in PARSE_VALID_REFS],
                       ("input", "stored", "valid"))


def _reject_oracle_iri() -> str:
    from trident_spark.conformance import PARSE_INVALID_REFS

    return _values_sql([(v, True) for v in PARSE_INVALID_REFS],
                       ("input", "rejected"))


def _reject_oracle_langtag() -> str:
    from trident_spark.conformance import (
        LANGTAG_NORMALIZE_INVALID, LANGTAG_PARSE_INVALID,
    )

    rows = [(t, "parse", True) for t in LANGTAG_PARSE_INVALID]
    rows += [(t, "normalize", True) for t in LANGTAG_NORMALIZE_INVALID]
    return _values_sql(rows, ("tag", "mode", "rejected"))


def _extlang_oracle() -> str:
    from trident_spark.conformance import EXTLANG_FORM_CASES

    return _values_sql(list(EXTLANG_FORM_CASES), ("tag", "extlang_form"))


def oracle_sql() -> dict[str, str]:
    return {
        "text_features": _text_features_oracle(),
        "similarity_suite": _similarity_suite_oracle(),
        "multimodal_features": _values_sql(
            _multimodal_expected_rows(),
            ("media_id", "kind", "n_dims", "feature_digest", "decode_error"),
        ),
        "pricing_summary": _PRICING_SUMMARY_ORACLE,
        "top_orders": _TOP_ORDERS_ORACLE,
        "region_revenue": _REGION_REVENUE_ORACLE,
        "events_hourly": _EVENTS_HOURLY_ORACLE,
        "events_sessionized": _EVENTS_SESSION_ORACLE,
        "events_sessionized_stream": _EVENTS_SESSION_STREAM_ORACLE,
        "kg_doc_triples": _KG_TRIPLES_ORACLE,
        "kg_predicate_stats": _KG_PRED_STATS_ORACLE,
        "kg_sparql_bgp": _KG_BGP_ORACLE,
        "kg_sparql_optional": _KG_SPARQL_OPTIONAL_ORACLE,
        "kg_sparql_agg_having": _KG_SPARQL_HAVING_ORACLE,
        "kg_sparql_union": _KG_SPARQL_UNION_ORACLE,
        "kg_sparql_path": f"SELECT DISTINCT doc, org_name FROM ({_KG_BGP_ORACLE}) b",
        "kg_sparql_minus_values": _KG_SPARQL_MINUS_VALUES_ORACLE,
        "kg_sparql_exists": _KG_SPARQL_EXISTS_ORACLE,
        "kg_sparql_bind_subquery": _KG_SPARQL_BIND_SUBQUERY_ORACLE,
        "kg_sparql_functions": _KG_SPARQL_FUNCTIONS_ORACLE,
        "kg_sparql_ask": _KG_SPARQL_ASK_ORACLE,
        "kg_sparql_construct": _KG_SPARQL_CONSTRUCT_ORACLE,
        "kg_rdfstar_reify": _KG_RDFSTAR_ORACLE,
        "kg_sparql_star": _KG_SPARQL_STAR_ORACLE,
        "kg_sparql_graph": _KG_SPARQL_GRAPH_ORACLE,
        "kg_sparql_describe": _KG_SPARQL_DESCRIBE_ORACLE,
        "kg_sparql_datatype": _KG_SPARQL_DATATYPE_ORACLE,
        "kg_sparql_update": _KG_SPARQL_UPDATE_ORACLE,
        "kg_sparql_update_graph": _KG_SPARQL_UPDATE_GRAPH_ORACLE,
        # round-trip must reproduce the same independent reconstruction,
        # plus the fixed [...]/(...) document's deterministic triples
        "kg_turtle_roundtrip": (
            f"SELECT * FROM ({_KG_TRIPLES_ORACLE}) base UNION ALL "
            + _values_sql(_EXTRA_TTL_ROWS,
                          ("subj", "pred", "obj_lexical", "obj_kind",
                           "obj_datatype"))),
        "kg_quads_roundtrip": _KG_QUADS_ROUNDTRIP_ORACLE,
        "kg_jsonld_roundtrip": _KG_TRIPLES_ORACLE,
        "kg_rdfxml_roundtrip": _KG_TRIPLES_ORACLE,
        "kg_text_invariant": _KG_TEXT_INVARIANT_ORACLE,
        "kg_top_hubs": _KG_TOP_HUBS_ORACLE,
        "kg_triple_diff": _KG_TRIPLE_DIFF_ORACLE,
        "kg_full_pipeline": _kg_full_pipeline_oracle(),
        "events_salted_counts": _EVENTS_SALTED_ORACLE,
        "dedup_exact": _DEDUP_EXACT_ORACLE,
        "dedup_segments": _DEDUP_SEGMENTS_ORACLE,
        # minhash-LSH candidates are exact-Jaccard-verified and recall is 1.0
        # on this corpus, so the exact pairwise oracle is the right check
        "dedup_minhash_lsh": f"SELECT a, b FROM ({_NGRAM_JACCARD_ORACLE}) pairs",
        "dedup_clusters": _DEDUP_CLUSTERS_ORACLE,
        "dedup_simhash": _DEDUP_SIMHASH_ORACLE,
        "sample_suite": _sample_suite_oracle(),
        "text_top_ngrams": _TOP_NGRAMS_ORACLE,
        "embedding_centroids": _EMB_CENTROIDS_ORACLE,
        "iri_conformance": _iri_conformance_oracle(),
        "langtag_conformance": _langtag_conformance_oracle(),
        "similarity_ann_ivf": _ann_ivf_oracle(),
        "embedding_near_dup_lsh": _near_dup_lsh_oracle(),
        # rows-only (approximate / no meaningful oracle):
        # lang_id (corpus labels are label⟂text noise — see textstats.lang_id)
    }


def extra_oracle_sql() -> dict[str, str]:
    """Oracles for extra_queries() — exercised by the local mirror only."""
    return {
        "iri_resolve_rfc3986": _values_sql(_iri_resolve_vectors(), ("rel", "resolved")),
        "iri_normalize_rfc3986": _values_sql(_iri_normalize_vectors(), ("input", "normalized")),
        "iri_to_uri_rfc3987": _values_sql(_iri_to_uri_vectors(), ("input", "uri")),
        "uri_to_iri_rfc3987": _values_sql(_uri_to_iri_vectors(), ("input", "iri")),
        "iri_relativize": _values_sql(_relativize_vectors(), ("base", "target", "rel")),
        "langtag_normalize_rfc5646": _values_sql(_langtag_vectors(), ("tag", "canonical")),
        "langtag_parse_rfc5646": _values_sql(_langtag_parse_vectors(), ("tag", "wellformed")),
        "iri_parse_wellformed": _iri_parse_wellformed_oracle(),
        "iri_reject_invalid": _reject_oracle_iri(),
        "langtag_reject_invalid": _reject_oracle_langtag(),
        "langtag_extlang_form": _extlang_oracle(),
        "kg_bgp_provider": _KG_BGP_ORACLE,
        "kg_nquads_roundtrip": _KG_NQUADS_ORACLE,
        "kg_trig_roundtrip": _KG_NQUADS_ORACLE,
        "kg_jsonld_quads_roundtrip": _KG_NQUADS_ORACLE,
        "kg_sparql_agg": _KG_SPARQL_AGG_ORACLE,
        "kg_sparql_scope": _KG_SPARQL_SCOPE_ORACLE,
        "kg_sparql_having": _KG_SPARQL_HAVING_ORACLE,
        "kg_sparql_bind": _KG_SPARQL_BIND_ORACLE,
        "kg_sparql_subquery": _KG_SPARQL_SUBQUERY_ORACLE,
        "dedup_ngram_jaccard": _NGRAM_JACCARD_ORACLE,
        "embedding_near_dup": _EMBEDDING_NEAR_DUP_ORACLE,
        "similarity_topk": _SIMILARITY_TOPK_ORACLE,
        "similarity_ann_lsh": _ann_lsh_oracle(),
        "sample_deterministic": _SAMPLE_DET_ORACLE,
        "sample_stratified": _SAMPLE_STRAT_ORACLE,
        "text_token_count": _TOKEN_COUNT_ORACLE,
        "text_quality": _TEXT_QUALITY_ORACLE,
        "doc_fingerprint": _FINGERPRINT_ORACLE,
        "pii_suite": _pii_oracle(),
        "decontamination": _DECONTAMINATION_ORACLE,
        "text_normalize": _text_normalize_oracle(),
    }
