"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting. All JVM-side expressions (no Python in the row
path); dialect-paired fragments from functions/textfns.py keep the DuckDB
oracle byte-identical.

Perf note: the normalize→tokenize chain (two regexp_replace passes + split)
is the expensive part, so every operator materializes it ONCE as a real
column and derives everything from that. Inlining the chain into each
consumer looks equivalent but is ~9x slower measured: the copies land inside
different CASE branches where whole-stage codegen's subexpression
elimination can't merge them, so each row pays the regex walk per consumer.
Catalyst's CollapseProject keeps a multiply-referenced non-trivial alias as
its own projection instead of re-inlining it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.textfns import (
    STOPWORDS,
    char_class_count_sql,
    norm_sql,
    stopword_hits_sql,
    token_count_sql,
    tokens_sql,
)


def _toks_expr(text_col: str) -> str:
    return tokens_sql(norm_sql(text_col, "spark"), "spark")


def token_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Adds n_tokens (BPE-ish), n_words, n_chars, avg_word_len."""
    return (
        df.withColumn("__toks", F.expr(_toks_expr(text_col)))
        .withColumn("n_tokens", F.expr(token_count_sql(text_col, "spark")))
        .withColumn("n_words", F.size("__toks"))
        .withColumn("n_chars_obs", F.length(text_col))
        .withColumn(
            "avg_word_len",
            F.when(
                F.col("n_words") > 0,
                F.expr(
                    "aggregate(__toks, 0, (acc, t) -> acc + length(t))"
                ).cast("double")
                / F.col("n_words"),
            ).otherwise(F.lit(0.0)),
        )
        .drop("__toks")
    )


def quality_signals(df: DataFrame, text_col: str) -> DataFrame:
    """Heuristic quality signals: punctuation/digit/space ratios, stopword
    ratio, plus a composite keep/drop flag — the standard pre-training
    corpus filter shape (length bounds + symbol soup + no stopwords)."""
    n_chars = F.length(text_col)
    punct = F.expr(char_class_count_sql(text_col, "[a-zA-Z0-9 ]", "spark"))
    digits = F.expr(char_class_count_sql(text_col, "[^0-9]", "spark"))
    stop_en = F.expr(stopword_hits_sql("__toks", STOPWORDS["en"], "spark"))
    out = (
        df.withColumn("__toks", F.expr(_toks_expr(text_col)))
        .withColumn("n_chars_obs", n_chars)
        .withColumn("punct_ratio", punct / F.greatest(n_chars, F.lit(1)))
        .withColumn("digit_ratio", digits / F.greatest(n_chars, F.lit(1)))
        .withColumn("n_words", F.size("__toks"))
        .withColumn(
            "stopword_ratio",
            stop_en / F.greatest(F.col("n_words"), F.lit(1)),
        )
        .drop("__toks")
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
    langs = sorted(STOPWORDS)  # fixed fold order: earlier lang wins ties
    scored = df.withColumn("__toks", F.expr(_toks_expr(text_col)))
    for lang in langs:
        scored = scored.withColumn(
            f"__s_{lang}",
            F.expr(stopword_hits_sql("__toks", STOPWORDS[lang], "spark")),
        )
    guess: Column = F.lit("unknown")
    score: Column = F.lit(0)
    for lang in langs:
        s = F.col(f"__s_{lang}")
        guess = F.when(s > score, F.lit(lang)).otherwise(guess)
        score = F.when(s > score, s).otherwise(score)
    return scored.withColumn(out, guess).drop(
        "__toks", *[f"__s_{lang}" for lang in langs]
    )


def fingerprint(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, n_min: int = 4
) -> DataFrame:
    """Content fingerprints: full-text md5 + a winnowing-style fingerprint
    (md5 over the n_min lexicographically-smallest shingle hashes — robust
    to small edits, no shuffle: everything is per-row array math)."""
    from ..functions.textfns import shingles_sql

    kmin = (
        f"slice(array_sort(transform(array_distinct(__sh), s -> md5(s))), 1, {n_min})"
    )
    return (
        df.withColumn("__norm", F.expr(norm_sql(text_col, "spark")))
        .withColumn(
            "__sh",
            F.expr(shingles_sql(tokens_sql("__norm", "spark"), k, "spark")),
        )
        .select(
            F.col(id_col),
            F.md5("__norm").alias("content_md5"),
            F.md5(F.expr(f"concat_ws(',', {kmin})")).alias("winnow_fp"),
        )
    )
