"""Text-analysis operators over a documents corpus (doc_id, text, lang, …).

Training-data-pipeline staples: token counting, quality scoring, language
ID, document fingerprinting. Everything here is expressed with BUILT-IN
pyspark.sql.functions (JVM-side, codegen-friendly, no Python in the hot
path); the winnowing fingerprint is the only pandas-UDF operator because
rolling-window minima over char k-grams aren't SQL-expressible.

Each operator has a DuckDB-equivalent oracle in __spark_entry__.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Pinned stopword list for the quality score (subset of the en profile in
# kernels/textstats.py — duplicated as a LITERAL so the SQL oracle can pin
# the identical list).
QUALITY_STOPWORDS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "it", "for",
    "on", "with", "as", "are", "was", "be", "this", "have", "from", "or",
]

# BPE-ish token regex (letters run | digit run | single symbol) — same
# class structure in Spark (Java regex) and DuckDB (RE2).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]"


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish tokens + char count per document."""
    return documents.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_RE)).alias("bpe_tokens"),
        F.length("text").alias("chars"),
    )


def quality_stats(documents: DataFrame) -> DataFrame:
    """Quality-signal columns (integers — exact across engines):
    words, alpha chars, digit chars, punct chars, stopword hits,
    max word length. The composite score lives in quality_score()."""
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    stop_lit = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    return documents.select(
        "doc_id",
        F.size(words).alias("words"),
        F.regexp_count("text", F.lit(r"[A-Za-z]")).alias("alpha_chars"),
        F.regexp_count("text", F.lit(r"[0-9]")).alias("digit_chars"),
        F.regexp_count("text", F.lit(r"[^A-Za-z0-9\s]")).alias("punct_chars"),
        F.size(F.filter(words, lambda w: F.array_contains(stop_lit, w))).alias(
            "stop_hits"
        ),
        F.array_max(F.transform(words, F.length)).alias("max_word_len"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Pinned composite quality score in [0,1], rounded to 4 decimals.

    score = 0.4·min(words/50,1) + 0.3·alpha_ratio + 0.3·min(5·stop_ratio,1)
    (length / alphabetic-density / stopword-density mix — the standard
    web-text quality heuristics, cf. C4/Gopher filtering rules).
    """
    s = quality_stats(documents).withColumn(
        "chars", F.greatest(F.lit(1), F.col("alpha_chars") + F.col("digit_chars") + F.col("punct_chars"))
    )
    score = (
        0.4 * F.least(F.col("words") / F.lit(50.0), F.lit(1.0))
        + 0.3 * (F.col("alpha_chars") / F.col("chars"))
        + 0.3 * F.least(5.0 * F.col("stop_hits") / F.greatest(F.col("words"), F.lit(1)), F.lit(1.0))
    )
    # floor-scaling, not round(): both engines floor bit-identical doubles
    # identically, while round-half rules differ at decimal boundaries.
    return s.select(
        "doc_id", "words", (F.floor(score * 10000) / 10000).alias("quality")
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Stopword-profile language scores, JVM-side (SURVEY training ops).

    Emits per-language hit counts + argmax label; ties broken by the
    fixed profile order en>es>de>fr (pinned; the SQL oracle mirrors it).
    """
    profiles = {
        "en": ["the", "of", "and", "to", "in", "is", "that", "it", "for", "was"],
        "es": ["de", "la", "que", "el", "en", "los", "se", "las", "por", "un"],
        "de": ["der", "die", "und", "den", "von", "zu", "das", "mit", "sich", "auf"],
        "fr": ["le", "et", "les", "des", "une", "dans", "est", "pour", "qui", "par"],
    }
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    df = documents.select("doc_id", words.alias("_w"))
    score_cols = []
    for lang, sw in profiles.items():
        lit = F.array(*[F.lit(w) for w in sw])
        df = df.withColumn(
            f"{lang}_hits", F.size(F.filter(F.col("_w"), lambda w: F.array_contains(lit, w)))
        )
        score_cols.append(lang)
    # argmax with ties broken by profile order (en>es>de>fr): the first
    # profile in order whose hits equal the max wins
    pred_lang = F.lit("und")
    max_col = F.greatest(*[F.col(f"{lang}_hits") for lang in score_cols])
    for lang in reversed(score_cols):
        pred_lang = F.when(
            (F.col(f"{lang}_hits") == max_col) & (max_col > 0), F.lit(lang)
        ).otherwise(pred_lang)
    return df.select(
        "doc_id",
        *[F.col(f"{lang}_hits") for lang in score_cols],
        pred_lang.alias("pred_lang"),
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Exact-dedup document fingerprint: md5 of normalized text.

    Normalization pinned identically in kernels/textstats.normalize_text
    and the SQL oracle: lower → non-alnum runs → ' ' → trim.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"[^0-9a-z]+", " "))
    return documents.select(
        "doc_id", F.md5(norm.cast("binary")).alias("fingerprint")
    )


# ── winnowing fingerprint (pandas UDF — non-SQL-expressible) ────────────────


@F.pandas_udf(T.ArrayType(T.LongType()))
def winnow_udf(texts: pd.Series) -> pd.Series:
    from ..kernels.textstats import winnow_fingerprint

    return texts.map(lambda t: winnow_fingerprint(t or ""))


def winnow_fingerprints(documents: DataFrame) -> DataFrame:
    """Winnowing (rolling k-gram min) fingerprints — robust near-dup keys."""
    return documents.select(
        "doc_id",
        winnow_udf(F.col("text")).alias("winnow"),
    ).select("doc_id", F.size("winnow").alias("n_grams"), "winnow")
