"""PII detection and redaction for training-data pipelines.

A standard pre-training cleanup: find and mask personally identifiable
information before a corpus ships.  Everything is Catalyst
``regexp_count`` / ``regexp_replace`` — whole-stage codegen, zero
shuffles, zero Python — so it runs at scan speed on any corpus size.

Patterns are deliberately written in the common Java-regex ∩ RE2 subset
(no backreferences, no lookaround) so the DuckDB oracle can evaluate the
IDENTICAL expressions — detection and redaction are both end-to-end
oracle-checkable.

Like every heuristic PII pass this trades recall for auditability:
emails, phone numbers, IPv4s, credit-card-shaped and SSN-shaped digit
runs.  It does not attempt NER-grade name detection (a model call, out
of scope for a deterministic kernel); counts are per-category so
downstream policy can threshold each independently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# category → (pattern, replacement token).  Order matters for redaction:
# more specific digit shapes (cards, SSNs) mask before generic phones.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("credit_card",
     r"\b(?:\d[ \-]?){13,16}\b",
     "[CARD]"),
    ("ssn",
     r"\b\d{3}-\d{2}-\d{4}\b",
     "[SSN]"),
    ("phone",
     r"(?:\+?\d{1,3}[ .\-]?)?\(?\d{3}\)?[ .\-]\d{3}[ .\-]\d{4}\b",
     "[PHONE]"),
    ("ipv4",
     r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
     "[IP]"),
]


def _count_cols(text_col: str) -> list[Column]:
    """One n_<category> regexp_count per pattern."""
    return [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def _total_col() -> Column:
    """Sum of the n_<category> columns built by _count_cols."""
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return total


def _redacted_col(text_col: str) -> Column:
    """Chained regexp_replace in declaration order (most-specific digit
    shapes mask first)."""
    col = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        col = F.regexp_replace(col, F.lit(pat), F.lit(token))
    return col


def pii_signals(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document PII counts: (id, n_email, n_credit_card, n_ssn,
    n_phone, n_ipv4, n_pii_total).  Pure codegen — one narrow pass."""
    from trident_spark.util import ensure_parallelism

    # the regex passes run inside the scan stage (zero shuffles by design);
    # rule 3: single-row-group inputs scan as ONE task, so spread the scan
    # when the plan has no other source of parallelism
    out = ensure_parallelism(docs).select(
        F.col(id_col).alias("id"), *_count_cols(text_col))
    return out.withColumn("n_pii_total", _total_col())


def pii_report(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Counts AND redaction in ONE narrow projection (no join, no second
    scan): (id, n_<category>..., n_pii_total, redacted, was_redacted)."""
    from trident_spark.util import ensure_parallelism

    red = _redacted_col(text_col)
    out = ensure_parallelism(docs).select(
        F.col(id_col).alias("id"), *_count_cols(text_col),
        red.alias("redacted"),
        (red != F.col(text_col)).alias("was_redacted"),
    )
    return out.withColumn("n_pii_total", _total_col())


def redact_pii(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(id, text) with every detected span replaced by its category token
    — see ``_redacted_col`` ordering.  Returns (id, text, was_redacted)."""
    from trident_spark.util import ensure_parallelism

    red = _redacted_col(text_col)
    return ensure_parallelism(docs).select(
        F.col(id_col).alias("id"),
        red.alias("text"),
        (red != F.col(text_col)).alias("was_redacted"),
    )
