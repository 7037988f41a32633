"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

Design constraint: every function is a pure Column expression (JVM
codegen, no Python in the hot path) AND has an exact ANSI-SQL twin so
the DuckDB oracle can verify it value-for-value. Hashes use md5 hex
strings (identical across engines); counts use regexp_count with
engine-portable patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker words per language for the n-gram language-ID heuristic.
# Deterministic and portable — the oracle embeds the same table.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ein"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "que", "una", "por"),
    "zh": ("的", "是", "了", "在", "我"),
}

# "BPE-ish" tokenizer: letter runs | digit runs | single non-space
# symbol. Java and RE2 agree on this pattern.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def marker_hits(text: Column, word: str) -> Column:
    """Occurrences of ``word`` as a whitespace-delimited token, counted
    via length differencing — portable to any SQL dialect (no regex
    word boundaries, which differ across engines)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        lang: sum(
            (marker_hits(text, w) for w in words), start=F.lit(0)
        ).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    }


def predict_lang(text: Column) -> Column:
    """argmax language by marker-word hits; ties broken by the fixed
    language order above; 'und' (undetermined) when no marker hits."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build the when-ladder in reverse so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(expr)
    return expr


def whitespace_token_count(text: Column) -> Column:
    """Whitespace tokenization: count of space-separated tokens."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, " +"))
    )


def bpe_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, alpha ratio, punctuation ratio,
    mean word length, stopword ratio — the usual pre-training corpus
    filters (C4/Gopher-style rules), all as codegen'd expressions."""
    t = F.col(text_col)
    n = F.length(t).cast("double")
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", "")).cast("double")
    digits = F.length(F.regexp_replace(t, "[^0-9]", "")).cast("double")
    spaces = F.length(F.regexp_replace(t, "[^ ]", "")).cast("double")
    words = whitespace_token_count(t).cast("double")
    stop_hits = sum(
        (marker_hits(t, w) for w in LANG_MARKERS["en"]), start=F.lit(0)
    ).cast("double")
    return (
        df.withColumn("n_chars_m", n.cast("long"))
        .withColumn("n_words", words.cast("long"))
        .withColumn("alpha_ratio", F.round(alpha / F.greatest(n, F.lit(1.0)), 6))
        .withColumn("digit_ratio", F.round(digits / F.greatest(n, F.lit(1.0)), 6))
        .withColumn(
            "mean_word_len",
            F.round((n - spaces) / F.greatest(words, F.lit(1.0)), 6),
        )
        .withColumn(
            "stopword_ratio", F.round(stop_hits / F.greatest(words, F.lit(1.0)), 6)
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0–1 quality score + keep/drop flag (Gopher-ish rules:
    enough words, sane word length, some stopwords, low digit noise)."""
    feats = quality_features(df, text_col)
    score = (
        F.when(F.col("n_words") >= 10, 0.25).otherwise(0.0)
        + F.when((F.col("mean_word_len") >= 2) & (F.col("mean_word_len") <= 12), 0.25).otherwise(0.0)
        + F.when(F.col("stopword_ratio") > 0, 0.25).otherwise(0.0)
        + F.when(F.col("digit_ratio") < 0.2, 0.25).otherwise(0.0)
    )
    return feats.withColumn("quality_score", F.round(score, 6)).withColumn(
        "keep", score >= F.lit(0.75)
    )


def char_shingles(text: Column, k: int = 8) -> Column:
    """All k-char shingles of the text as an array (sliding window via
    sequence+transform — stays in codegen)."""
    n = F.length(text)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substring(text, i, k))


def fingerprint(text: Column, k: int = 8) -> Column:
    """Document fingerprint: min md5 over the k-char shingle set (a
    1-hash winnowing/rolling-hash scheme — same shape as MOSS). Equal
    fingerprints ⇒ shared minimal shingle ⇒ near-dup candidate."""
    return F.array_min(F.transform(char_shingles(text, k), F.md5))
