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

__all__ = ["token_count", "quality_features", "fingerprint", "lang_id",
           "normalize_text"]


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

_STOPWORDS_BY_LANG: dict[str, list[str]] = {}


def _stopwords_for(lang: str) -> list[str]:
    """Per-language stopword lists derived from the lang-ID seed corpora
    (frequent short function words); English keeps the curated list."""
    if lang == "en":
        return _STOPWORDS
    if not _STOPWORDS_BY_LANG:
        for lg, seed in _SEED_TEXT.items():
            counts: dict[str, int] = {}
            for w in seed.split():
                if len(w) <= 5:
                    counts[w] = counts.get(w, 0) + 1
            top = sorted(((c, w) for w, c in counts.items() if c >= 2),
                         key=lambda x: (-x[0], x[1]))
            _STOPWORDS_BY_LANG[lg] = [w for _, w in top[:25]]
    return _STOPWORDS_BY_LANG.get(lang, _STOPWORDS)


def quality_features(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     lang_col: str | None = None) -> DataFrame:
    """Deterministic quality features (all JVM-side, oracle-mirrorable):
    token count, mean token length, punctuation ratio, stopword ratio,
    uppercase ratio, and a blended [0,1] quality score.

    ``lang_col`` (e.g. the output of :func:`lang_id`) switches the
    stopword list per row to the language's own function words — without
    it, non-English docs silently lose the stopword component of the
    score.  Still pure Catalyst: one chained CASE over constant arrays."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    n_punct = n_chars - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(text_col, r"[A-Z]", ""))
    if lang_col is None:
        n_stop = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS)))
    else:
        n_stop = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS)))
        def _count_in(words):
            # NB: a 2-arg lambda (even with a default) is read by the HOF
            # API as (element, index) — a closure factory is required
            return F.size(F.filter(toks, lambda t: t.isin(words)))

        for lg in _SEED_TEXT:
            if lg == "en":
                continue
            n_stop = F.when(
                F.col(lang_col) == lg, _count_in(_stopwords_for(lg)),
            ).otherwise(n_stop)
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


# ---------------------------------------------------------------------------
# Language-ID: char-trigram profiles (Cavnar-Trenkle style) + script shortcuts
# ---------------------------------------------------------------------------
#
# Deterministic and dependency-free: profiles are built once per worker from
# small embedded seed corpora (self-authored sentences of common function
# words), scored by cosine over char-trigram counts.  Non-Latin scripts are
# decided by codepoint ranges first (orders faster and near-perfect).

_SEED_TEXT = {
    "en": ("the quick brown fox jumps over the lazy dog and this is what we "
           "said when they were there because it was not the same thing that "
           "would have been with all of the people from which there is more "
           "than one way to do it and you should know about these things "
           "it was a good day and the work went fast because every part of the plan was small and clear so we could sort the line by value and count each row in the big table before the group was done"),
    "de": ("der schnelle braune fuchs springt über den faulen hund und das "
           "ist was wir gesagt haben als sie dort waren weil es nicht das "
           "gleiche war die mit allen von den leuten für welche es mehr als "
           "einen weg gibt und du solltest über diese dinge bescheid wissen "
           "ich habe eine frage zu der nächsten woche nicht schlecht "
           "es war ein guter tag und die arbeit ging schnell weil jeder teil des plans klein und klar war also konnten wir die zeile nach wert sortieren und jede reihe in der großen tabelle zählen"),
    "fr": ("le renard brun rapide saute par dessus le chien paresseux et "
           "c'est ce que nous avons dit quand ils étaient là parce que ce "
           "n'était pas la même chose qui aurait été avec tous les gens pour "
           "lesquels il y a plus d'une façon de le faire et vous devriez "
           "savoir des choses à propos de la semaine prochaine très bien "
           "c'était une bonne journée et le travail est allé vite parce que chaque partie du plan était petite et claire donc nous pouvions trier la ligne par valeur et compter chaque rangée de la table"),
    "es": ("el rápido zorro marrón salta sobre el perro perezoso y esto es "
           "lo que dijimos cuando ellos estaban allí porque no era la misma "
           "cosa que habría sido con toda la gente para la cual hay más de "
           "una manera de hacerlo y usted debería saber sobre estas cosas "
           "tengo una pregunta sobre la próxima semana muy bien gracias "
           "fue un buen día y el trabajo fue rápido porque cada parte del plan era pequeña y clara así que pudimos ordenar la línea por valor y contar cada fila de la tabla grande antes de terminar"),
    "pt": ("a rápida raposa marrom pula sobre o cão preguiçoso e isto é o "
           "que dissemos quando eles estavam lá porque não era a mesma coisa "
           "que teria sido com todas as pessoas para as quais há mais de uma "
           "maneira de fazer isso e você deveria saber sobre essas coisas "
           "tenho uma pergunta sobre a próxima semana muito obrigado "
           "foi um bom dia e o trabalho foi rápido porque cada parte do plano era pequena e clara então pudemos ordenar a linha por valor e contar cada fileira da tabela grande antes de terminar"),
    "it": ("la veloce volpe marrone salta sopra il cane pigro e questo è "
           "quello che abbiamo detto quando erano lì perché non era la "
           "stessa cosa che sarebbe stata con tutte le persone per le quali "
           "c'è più di un modo per farlo e dovresti sapere queste cose ho "
           "una domanda sulla prossima settimana va bene grazie mille "
           "è stata una buona giornata e il lavoro è andato veloce perché ogni parte del piano era piccola e chiara così potevamo ordinare la linea per valore e contare ogni riga della grande tabella"),
    "nl": ("de snelle bruine vos springt over de luie hond en dit is wat we "
           "zeiden toen ze daar waren omdat het niet hetzelfde was dat zou "
           "zijn geweest met alle mensen voor wie er meer dan één manier is "
           "om het te doen en je zou over deze dingen moeten weten ik heb "
           "een vraag over de volgende week heel goed dank je wel "
           "het was een goede dag en het werk ging snel omdat elk deel van het plan klein en duidelijk was dus konden we de lijn op waarde sorteren en elke rij in de grote tabel tellen voor het einde"),
}


def _trigrams(text: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for word in text.lower().split():
        w = f" {word} "
        for i in range(len(w) - 2):
            g = w[i : i + 3]
            out[g] = out.get(g, 0) + 1
    return out


def _build_profiles() -> dict[str, dict[str, float]]:
    import math

    profiles = {}
    for lang, seed in _SEED_TEXT.items():
        counts = _trigrams(seed)
        norm = math.sqrt(sum(c * c for c in counts.values())) or 1.0
        profiles[lang] = {g: c / norm for g, c in counts.items()}
    return profiles


_PROFILES = _build_profiles()


def _classify(t: str) -> str:
    if not t:
        return "und"
    head = t[:400]
    n = len(head) or 1
    # script shortcuts: decisive and cheap
    if sum(1 for c in head if "가" <= c <= "힯") > n * 0.15:
        return "ko"
    if sum(1 for c in head if "぀" <= c <= "ヿ") > n * 0.05:
        return "ja"  # kana present → Japanese even with shared CJK ideographs
    if sum(1 for c in head if "一" <= c <= "鿿") > n * 0.15:
        return "zh"
    if sum(1 for c in head if "Ѐ" <= c <= "ӿ") > n * 0.3:
        return "ru"
    grams = _trigrams(head)
    if not grams:
        return "und"
    import math

    norm = math.sqrt(sum(c * c for c in grams.values()))
    best, best_score = "und", 0.0
    for lang, prof in _PROFILES.items():
        dot = sum(c * prof.get(g, 0.0) for g, c in grams.items())
        score = dot / norm
        if score > best_score:
            best, best_score = lang, score
    return best if best_score > 0.05 else "und"


@pandas_udf(StringType())
def _lang_id_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: _classify(t) if t else "und")


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Language-ID: script-range shortcuts (zh/ja/ko/ru) + char-trigram
    cosine against embedded profiles (en/de/fr/es/pt/it/nl); one Arrow hop.

    Note: the driver's synthetic ``documents.text`` is English-like SQL
    keywords under EVERY value of its ``lang`` column (the label is
    independent of the text — measured nearest-centroid split accuracy 0.23
    ≈ chance), so on that corpus correct behavior is predicting ``en``
    almost everywhere; real accuracy is asserted on multilingual sentences
    in tests/test_operators.py."""
    from trident_spark.util import ensure_parallelism

    return ensure_parallelism(docs).select(
        id_col, _lang_id_udf(F.col(text_col)).alias("predicted_lang")
    )


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 20,
               text_col: str = "text") -> DataFrame:
    """Corpus-level top-k word n-grams → (gram, cnt), deterministically
    ordered (count desc, gram asc — a total order, so the rank-k boundary
    is engine-stable).  Explode → partial-aggregated count (map-side
    combine) → TakeOrderedAndProject: no global sort materializes."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    if n == 1:
        grams = toks
    else:
        idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
        # guard: sequence(1, 0) counts DOWN in Spark — short docs must
        # yield an empty gram array, not a slice-at-0 error
        grams = F.when(
            F.size(toks) >= n,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
        ).otherwise(F.array().cast("array<string>"))
    from trident_spark.util import ensure_parallelism

    # gram build + explode + map-side partial count all run in the scan
    # stage — parallelize it (rule 3: single-row-group inputs scan as ONE
    # task); real multi-split corpora skip the repartition entirely
    return (
        ensure_parallelism(docs).select(F.explode(grams).alias("gram"))
        .groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("gram").asc())
        .limit(k)
    )


def remove_boilerplate(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       max_doc_frac: float = 0.05,
                       min_docs: int = 2) -> DataFrame:
    """Corpus-level boilerplate removal: drop paragraphs that repeat across
    more than ``max_doc_frac`` of the corpus (and at least ``min_docs``
    documents) — headers, footers, cookie banners.  The standard
    training-corpus cleanup, entirely in Catalyst:

    explode paragraphs (keeping position) → per-paragraph distinct-doc
    counts (one agg on the md5 hash) → anti-filter → reassemble each
    document in original order.  Two shuffles total (the count agg and the
    per-doc reassembly), both on narrow rows; the hash join against the
    boilerplate set is broadcast when small, AQE otherwise.

    Returns (id, text, n_paras_kept, n_paras_dropped); documents whose
    every paragraph is boilerplate come back with empty text (never
    dropped — downstream length filters decide)."""
    paras = (
        docs.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), r"\n{2,}"))
            .alias("pos", "para"),
        )
        .withColumn("para_hash", F.md5(F.trim(F.col("para"))))
    )
    n_docs = docs.count()
    # docstring contract, exactly: MORE than max_doc_frac of the corpus
    # (strictly above the frac line) AND at least min_docs documents
    cutoff = max(int(n_docs * max_doc_frac) + 1, min_docs)
    boiler = (
        paras.groupBy("para_hash")
        .agg(F.countDistinct("id").alias("n_docs"))
        .where(F.col("n_docs") >= cutoff)
        .select("para_hash")
    )
    kept = paras.join(boiler, "para_hash", "left_anti")
    dropped_counts = (
        paras.join(boiler, "para_hash", "left_semi")
        .groupBy("id").agg(F.count("*").alias("n_paras_dropped"))
    )
    out = (
        kept.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
                ),
                "\n\n",
            ).alias("clean_text"),
            F.count("*").alias("n_paras_kept"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(out, "id", "left")
        .join(dropped_counts, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("text"),
            F.coalesce("n_paras_kept", F.lit(0)).alias("n_paras_kept"),
            F.coalesce("n_paras_dropped", F.lit(0)).alias("n_paras_dropped"),
        )
    )


def gopher_quality_filter(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          min_words: int = 50, max_words: int = 100_000,
                          min_mean_word_len: float = 3.0,
                          max_mean_word_len: float = 10.0,
                          max_symbol_ratio: float = 0.1,
                          max_bullet_ratio: float = 0.9,
                          min_alpha_word_ratio: float = 0.8
                          ) -> DataFrame:
    """Gopher/C4-style document quality rules, pure Catalyst: returns
    (id, keep, reasons) where ``reasons`` lists every violated rule (an
    auditable filter — a corpus pipeline logs WHY a doc was dropped, not
    just that it was).  Rules (names follow the Gopher paper's repetition/
    quality heuristics, thresholds overridable):

    - word_count: min_words ≤ #words ≤ max_words
    - mean_word_length: within [min, max]
    - symbol_ratio: '#' and ellipsis chars / words ≤ max
    - bullet_ratio: lines starting with a bullet ≤ max of all lines
    - alpha_words: fraction of words containing ≥1 alphabetic char ≥ min
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.size(toks)
    n_chars_nonws = F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
    mean_wl = n_chars_nonws / F.greatest(n_words, F.lit(1))
    n_sym = (F.length(F.col(text_col))
             - F.length(F.regexp_replace(F.col(text_col), r"[#…]", "")))
    sym_ratio = n_sym / F.greatest(n_words, F.lit(1))
    lines = F.split(F.col(text_col), r"\n")
    n_lines = F.size(lines)
    n_bullets = F.size(F.filter(
        lines, lambda l: F.trim(l).rlike(r"^([-*•]|\d+[.)])\s")))
    bullet_ratio = n_bullets / F.greatest(n_lines, F.lit(1))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_ratio = n_alpha / F.greatest(n_words, F.lit(1))

    checks = [
        ("word_count",
         (n_words >= min_words) & (n_words <= max_words)),
        ("mean_word_length",
         (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)),
        ("symbol_ratio", sym_ratio <= max_symbol_ratio),
        ("bullet_ratio", bullet_ratio <= max_bullet_ratio),
        ("alpha_words", alpha_ratio >= min_alpha_word_ratio),
    ]
    reasons = F.filter(
        F.array(*[F.when(~ok, F.lit(name)) for name, ok in checks]),
        lambda x: x.isNotNull(),
    )
    return docs.select(
        id_col,
        (F.size(reasons) == 0).alias("keep"),
        reasons.alias("reasons"),
    )


def repetition_signals(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher repetition heuristics, per document and pure Catalyst:

    - dup_line_fraction: 1 − distinct(non-empty lines)/lines
    - dup_para_fraction: same over blank-line-separated paragraphs
    - top_bigram_fraction: occurrences of the most frequent word bigram
      over all bigram slots (boilerplate/spam marker)

    Array expressions only (no shuffle, no Python) — combine with
    :func:`gopher_quality_filter` for the full Gopher rule set."""
    def frac_dup(parts):
        n = F.size(parts)
        return F.when(
            n > 0,
            F.round(1.0 - F.size(F.array_distinct(parts)) / n, 4)
        ).otherwise(0.0)

    lines = F.filter(F.split(F.col(text_col), r"\n"),
                     lambda l: F.trim(l) != "")
    paras = F.filter(F.split(F.col(text_col), r"\n{2,}"),
                     lambda p: F.trim(p) != "")
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_toks = F.size(toks)
    grams = F.when(n_toks >= 2, F.transform(
        F.sequence(F.lit(1), n_toks - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i),
                              F.element_at(toks, i + 1)),
    )).otherwise(F.array().cast("array<string>"))
    # most-frequent-bigram count via aggregate over the distinct grams.
    # O(distinct × grams) per document, so cap the window at the first
    # 2000 bigram slots — repetition spam dominates early and the signal
    # is a ratio, robust to truncation; the cap bounds per-row cost at
    # any document length (no quadratic blowup on 1MB docs).
    grams = F.slice(grams, 1, 2000)
    top = F.aggregate(
        F.array_distinct(grams).alias("d"),
        F.lit(0),
        lambda acc, g: F.greatest(
            acc, F.size(F.filter(grams, lambda x: x == g))),
    )
    top_frac = F.when(F.size(grams) > 0,
                      F.round(top / F.size(grams), 4)).otherwise(0.0)
    return docs.select(
        id_col,
        frac_dup(lines).alias("dup_line_fraction"),
        frac_dup(paras).alias("dup_para_fraction"),
        top_frac.alias("top_bigram_fraction"),
    )


def normalize_text(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Corpus text normalization: the deterministic cleanup pass a
    training pipeline runs before tokenization.

    Steps, in order (each mirrorable 1:1 in the DuckDB oracle):

    1. line endings: ``\\r\\n`` / lone ``\\r`` → ``\\n``
    2. strip C0 controls except TAB/LF (and DEL)
    3. remove zero-width characters (ZWSP/ZWNJ/ZWJ/BOM)
    4. collapse runs of spaces/tabs to one space
    5. collapse 3+ newlines to a paragraph break (2)
    6. trim
    7. Unicode NFC (the one Python hop — vectorized Arrow batch;
       DuckDB mirror: ``nfc_normalize``)

    Returns (id, text, was_changed).
    """
    @pandas_udf(StringType())
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda t: None if t is None
                     else unicodedata.normalize("NFC", t))

    col = F.col(text_col)
    col = F.regexp_replace(col, "\r\n?", "\n")
    col = F.regexp_replace(col, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    col = F.regexp_replace(col, "[\u200b\u200c\u200d\ufeff]", "")
    col = F.regexp_replace(col, "[ \t]+", " ")
    col = F.regexp_replace(col, "\n{3,}", "\n\n")
    col = _nfc(F.trim(col))
    from trident_spark.util import ensure_parallelism

    # project the normalized value ONCE, derive was_changed from the
    # projected column (the Arrow NFC hop is the expensive node — naming
    # it in two expressions evaluates it twice per row); NULL input text
    # reads as not-changed, not NULL
    return (
        ensure_parallelism(docs)
        .select(
            F.col(id_col).alias("id"),
            col.alias("text"),
            F.col(text_col).alias("_orig"),
        )
        .select(
            "id",
            "text",
            F.coalesce(F.col("text") != F.col("_orig"),
                       F.lit(False)).alias("was_changed"),
        )
    )
