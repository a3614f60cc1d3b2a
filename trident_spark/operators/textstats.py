"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  Everything except language-ID is pure Catalyst
(mirrorable 1:1 in the DuckDB oracle); language-ID is a stopword-profile
heuristic in one Arrow hop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

__all__ = ["token_count", "quality_features", "fingerprint", "lang_id"]


def token_count(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy (4 chars ≈ 1 token)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return docs.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        F.ceil(F.length(F.regexp_replace(text_col, r"\s+", "")) / 4).alias("n_subword_est"),
    )


_STOPWORDS = (
    "the a an and or of to in is was for on with as by at it this that "
    "be are from"
).split()


def quality_features(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality features (all JVM-side, oracle-mirrorable):
    token count, mean token length, punctuation ratio, stopword ratio,
    uppercase ratio, and a blended [0,1] quality score."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    n_punct = n_chars - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(text_col, r"[A-Z]", ""))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS)))
    mean_tok_len = F.length(F.regexp_replace(text_col, r"\s+", "")) / n_tokens

    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    upper_ratio = n_upper / F.greatest(n_chars, F.lit(1))

    # quality: long enough, sane word lengths, some stopwords, little shouting
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), 0.3).otherwise(0.0)
        + F.least(stop_ratio * F.lit(3.0), F.lit(0.2))
        + F.when(upper_ratio <= 0.3, 0.1).otherwise(0.0)
    )
    return docs.select(
        id_col,
        n_tokens.alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(upper_ratio, 4).alias("upper_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Canonical document fingerprint: md5 of lowercased, whitespace-collapsed
    text (md5 exists verbatim in DuckDB → exact oracle parity)."""
    canon = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return docs.select(id_col, F.md5(canon).alias("fingerprint"))


# language profiles: high-frequency function words per language
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "was", "for", "with", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "von", "für", "ein"},
    "fr": {"le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"},
    "es": {"el", "la", "los", "de", "que", "y", "en", "es", "por", "una"},
    "zh": set(),  # handled by the CJK codepoint ratio below
}


@pandas_udf(StringType())
def _lang_id_udf(texts: pd.Series) -> pd.Series:
    def one(t: str) -> str:
        if not t:
            return "und"
        cjk = sum(1 for c in t[:400] if "一" <= c <= "鿿")
        if cjk > len(t[:400]) * 0.2:
            return "zh"
        toks = t.lower().split()
        if not toks:
            return "und"
        best, best_score = "und", 0
        for lang, words in _LANG_PROFILES.items():
            if not words:
                continue
            score = sum(1 for tok in toks if tok in words)
            if score > best_score:
                best, best_score = lang, score
        return best

    return texts.map(one)


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Heuristic language-ID (stopword profiles + CJK ratio), one Arrow hop."""
    from trident_spark.util import ensure_parallelism

    return ensure_parallelism(docs).select(
        id_col, _lang_id_udf(F.col(text_col)).alias("predicted_lang")
    )
