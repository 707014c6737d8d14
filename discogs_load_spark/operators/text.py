"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting. All JVM-side expressions (no Python in the row
path); dialect-paired fragments from functions/textfns.py keep the DuckDB
oracle byte-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.textfns import (
    STOPWORDS,
    char_class_count_sql,
    doc_shingles_sql,
    norm_sql,
    stopword_hits_sql,
    token_count_sql,
    tokens_sql,
)


def _toks_expr(text_col: str) -> str:
    return tokens_sql(norm_sql(text_col, "spark"), "spark")


def token_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Adds n_tokens (BPE-ish), n_words, n_chars, avg_word_len."""
    toks = _toks_expr(text_col)
    return (
        df.withColumn("n_tokens", F.expr(token_count_sql(text_col, "spark")))
        .withColumn("n_words", F.expr(f"size({toks})"))
        .withColumn("n_chars_obs", F.length(text_col))
        .withColumn(
            "avg_word_len",
            F.when(
                F.col("n_words") > 0,
                F.expr(
                    f"aggregate({toks}, 0, (acc, t) -> acc + length(t))"
                ).cast("double")
                / F.col("n_words"),
            ).otherwise(F.lit(0.0)),
        )
    )


def quality_signals(df: DataFrame, text_col: str) -> DataFrame:
    """Heuristic quality signals: punctuation/digit/space ratios, stopword
    ratio, plus a composite keep/drop flag — the standard pre-training
    corpus filter shape (length bounds + symbol soup + no stopwords)."""
    toks = _toks_expr(text_col)
    n_chars = F.length(text_col)
    punct = F.expr(char_class_count_sql(text_col, "[a-zA-Z0-9 ]", "spark"))
    digits = F.expr(char_class_count_sql(text_col, "[^0-9]", "spark"))
    stop_en = F.expr(stopword_hits_sql(toks, STOPWORDS["en"], "spark"))
    n_words = F.expr(f"size({toks})")
    out = (
        df.withColumn("n_chars_obs", n_chars)
        .withColumn("punct_ratio", punct / F.greatest(n_chars, F.lit(1)))
        .withColumn("digit_ratio", digits / F.greatest(n_chars, F.lit(1)))
        .withColumn("n_words", n_words)
        .withColumn(
            "stopword_ratio",
            stop_en / F.greatest(F.col("n_words"), F.lit(1)),
        )
    )
    return out.withColumn(
        "keep",
        (F.col("n_words") >= 5)
        & (F.col("punct_ratio") < 0.3)
        & (F.col("digit_ratio") < 0.3)
        & (F.col("stopword_ratio") > 0.0),
    )


def language_id(df: DataFrame, text_col: str, out: str = "lang_guess") -> DataFrame:
    """Stopword-profile language guess with a fixed tie-break order.

    A production pipeline would use a fastText-style classifier in a Pandas
    UDF; this n-gram/stopword heuristic is the built-in-only baseline and is
    fully oracle-checkable.
    """
    toks = _toks_expr(text_col)
    langs = sorted(STOPWORDS)  # fixed fold order: earlier lang wins ties
    guess: Column = F.lit("unknown")
    score: Column = F.lit(0)
    for lang in langs:
        s = F.expr(stopword_hits_sql(toks, STOPWORDS[lang], "spark"))
        guess = F.when(s > score, F.lit(lang)).otherwise(guess)
        score = F.when(s > score, s).otherwise(score)
    return df.withColumn(out, guess)


def fingerprint(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, n_min: int = 4
) -> DataFrame:
    """Content fingerprints: full-text md5 + a winnowing-style fingerprint
    (md5 over the n_min lexicographically-smallest shingle hashes — robust
    to small edits, no shuffle: everything is per-row array math)."""
    shingles = doc_shingles_sql(text_col, k, "spark")
    kmin = (
        f"slice(array_sort(transform(array_distinct({shingles}), s -> md5(s))), 1, {n_min})"
    )
    return df.select(
        F.col(id_col),
        F.md5(F.expr(norm_sql(text_col, "spark"))).alias("content_md5"),
        F.md5(F.expr(f"concat_ws(',', {kmin})")).alias("winnow_fp"),
    )
