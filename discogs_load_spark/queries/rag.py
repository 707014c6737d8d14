"""Document-preparation query surface: RAG chunking, PII redaction, and
repetition-based quality filtering over the ``documents`` fixture — the
text-side curation steps between raw crawl and training/retrieval corpora
(north-star extension ops alongside queries/text.py and queries/dedup.py).

All three are pure map-side per-document transforms (array HOFs + regex,
no Python, no shuffle before the final small aggregate), so they run at
scan speed on any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.textfns import norm_sql, shingles_sql, tokens_sql
from ..operators.chunking import (
    DEFAULT_CHUNK_TOKENS,
    DEFAULT_STRIDE,
    chunk_documents,
    chunk_oracle_sql,
)
from ..session import load_tables
from .registry import REGISTRY, register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ["documents"])["documents"]


@register(
    "q96_doc_chunks",
    oracle=chunk_oracle_sql("documents", "doc_id", "text"),
    tags=("rag", "chunking", "text"),
)
def q96_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (size 32, stride 24) — the RAG /
    context-packing preprocessor. Map-side HOFs + one posexplode; the
    window layout math is shared with the DuckDB oracle
    (operators/chunking.chunk_count_expr)."""
    return chunk_documents(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        size=DEFAULT_CHUNK_TOKENS,
        stride=DEFAULT_STRIDE,
    )


# --- PII redaction ---------------------------------------------------------
#
# The fixture corpus is synthetic lowercase prose with no PII, so the query
# INJECTS deterministic addresses/phones derived from doc_id, then redacts
# them — exercising the scrub exactly as a crawl pipeline would, with a
# non-vacuous oracle. Patterns stay in the Java-regex ∩ RE2 common subset
# (character classes + bounded repeats; no backslash classes — Spark SQL
# string literals eat backslashes, DuckDB's don't).

_EMAIL_PAT = "[a-z0-9._]+@[a-z0-9.]+"
_PHONE_PAT = "[0-9]{3}-[0-9]{4}"


def _pii_sql(dialect: str) -> dict[str, str]:
    cast = "VARCHAR" if dialect == "duckdb" else "STRING"
    g = ", 'g'" if dialect == "duckdb" else ""
    pii = (
        f"concat(text, ' contact user', CAST(doc_id AS {cast}),"
        f" '@mail.example.com or call 555-',"
        f" lpad(CAST(doc_id % 10000 AS {cast}), 4, '0'))"
    )
    red = (
        f"regexp_replace(regexp_replace({pii}, '{_EMAIL_PAT}', '<EMAIL>'{g}),"
        f" '{_PHONE_PAT}', '<PHONE>'{g})"
    )
    if dialect == "duckdb":
        n_at = f"len(regexp_extract_all({pii}, '{_EMAIL_PAT}'))"
        n_ph = f"len(regexp_extract_all({pii}, '{_PHONE_PAT}'))"
        n_res = (
            f"len(regexp_extract_all({red}, '{_EMAIL_PAT}'))"
            f" + len(regexp_extract_all({red}, '{_PHONE_PAT}'))"
        )
    else:
        n_at = f"size(regexp_extract_all({pii}, '({_EMAIL_PAT})', 1))"
        n_ph = f"size(regexp_extract_all({pii}, '({_PHONE_PAT})', 1))"
        n_res = (
            f"size(regexp_extract_all({red}, '({_EMAIL_PAT})', 1))"
            f" + size(regexp_extract_all({red}, '({_PHONE_PAT})', 1))"
        )
    return {"red": red, "n_emails": n_at, "n_phones": n_ph, "n_residual": n_res}


_PD = _pii_sql("duckdb")


@register(
    "q97_pii_redaction",
    oracle=f"""
    WITH per_doc AS (
        SELECT source,
               {_PD['n_emails']} AS n_emails,
               {_PD['n_phones']} AS n_phones,
               {_PD['n_residual']} AS n_residual,
               {_PD['red']} AS redacted
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_emails) AS BIGINT) AS total_emails,
           CAST(SUM(n_phones) AS BIGINT) AS total_phones,
           CAST(SUM(n_residual) AS BIGINT) AS residual_pii,
           CAST(SUM(length(redacted)) AS BIGINT) AS total_redacted_chars,
           COUNT(DISTINCT md5(redacted)) AS n_distinct_redacted
    FROM per_doc GROUP BY source
    """,
    tags=("curation", "pii", "text"),
)
def q97_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: inject deterministic email+phone per doc, redact with the
    shared regex set, and audit — match counts, residual-PII count (must
    be 0), redacted-length and distinct-hash checksums per source."""
    p = _pii_sql("spark")
    per_doc = _docs(spark, sf_dir).select(
        "source",
        F.expr(p["n_emails"]).alias("n_emails"),
        F.expr(p["n_phones"]).alias("n_phones"),
        F.expr(p["n_residual"]).alias("n_residual"),
        F.expr(p["red"]).alias("redacted"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_emails").cast("bigint").alias("total_emails"),
        F.sum("n_phones").cast("bigint").alias("total_phones"),
        F.sum("n_residual").cast("bigint").alias("residual_pii"),
        F.sum(F.length("redacted")).cast("bigint").alias("total_redacted_chars"),
        F.countDistinct(F.md5("redacted")).alias("n_distinct_redacted"),
    )


# --- repetition-ratio quality filter ---------------------------------------

REPETITION_K = 2
REPETITION_THRESHOLD = 0.10


def _rep_sql(dialect: str) -> dict[str, str]:
    sh = shingles_sql(tokens_sql(norm_sql("text", dialect), dialect), REPETITION_K, dialect)
    if dialect == "duckdb":
        total, dist = f"len({sh})", f"len(list_distinct({sh}))"
    else:
        total, dist = f"size({sh})", f"size(array_distinct({sh}))"
    return {"total": total, "dist": dist}


_RD = _rep_sql("duckdb")


@register(
    "q98_repetition_filter",
    oracle=f"""
    WITH per_doc AS (
        SELECT doc_id,
               CAST({_RD['total']} AS BIGINT) AS n_grams,
               CAST({_RD['dist']} AS BIGINT) AS n_distinct
        FROM documents
    )
    SELECT doc_id, n_grams, n_distinct,
           CASE WHEN n_grams = 0 THEN NULL
                ELSE CAST(1 AS DOUBLE)
                     - CAST(n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE)
           END AS rep_ratio,
           (n_grams > 0 AND
            CAST(1 AS DOUBLE) - CAST(n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE)
              >= {REPETITION_THRESHOLD}) AS flagged
    FROM per_doc
    """,
    tags=("curation", "quality", "text"),
)
def q98_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-n-gram quality signal: per doc, the fraction of word
    2-grams that are duplicates (1 - distinct/total) — the standard
    boilerplate/spam detector a crawl-filtering pipeline applies before
    dedup. Integer set sizes → one double division, identical bits in both
    engines."""
    r = _rep_sql("spark")
    per_doc = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(r["total"]).cast("bigint").alias("n_grams"),
        F.expr(r["dist"]).cast("bigint").alias("n_distinct"),
    )
    ratio = (
        F.lit(1).cast("double")
        - F.col("n_distinct").cast("double") / F.col("n_grams").cast("double")
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_distinct",
        F.when(F.col("n_grams") == 0, F.lit(None).cast("double"))
        .otherwise(ratio)
        .alias("rep_ratio"),
        ((F.col("n_grams") > 0) & (ratio >= F.lit(REPETITION_THRESHOLD))).alias(
            "flagged"
        ),
    )


RRF_K = 60  # the standard reciprocal-rank-fusion constant
RRF_SCALE = 1_000_000_000_000  # integer RRF: SCALE div (K + rank), no floats
FUSED_TOP = 10


def _rrf_oracle() -> str:
    """q173 referee: re-derive both arms — the q145 BM25 list (its oracle
    builder) and the q55 dense top-k (its REGISTERED oracle text, the q129
    reuse pattern, so a future q55 oracle change propagates here instead
    of silently diverging) — then fuse with integer RRF. ``//`` on
    positive BIGINTs truncates identically to Spark's ``div``."""
    # importing .similarity loads its module and registers q55 (rag is
    # imported first in queries/__init__, so force the dependency here)
    from .registry import REGISTRY
    from .similarity import QUERY_IDS  # noqa: F401  (forces registration)
    from .text import _bm25_oracle

    dense = REGISTRY["q55_ann_bruteforce_topk"].oracle
    return f"""
    WITH lex0 AS ({_bm25_oracle()}),
    lex AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT)
                   AS lex_rank
        FROM lex0
    ),
    dense0 AS ({dense}),
    qids AS (SELECT DISTINCT query_id FROM dense0),
    lexq AS (
        SELECT q.query_id, l.doc_id, l.lex_rank FROM qids q CROSS JOIN lex l
    ),
    denser AS (
        SELECT query_id, neighbor_id AS doc_id, CAST(rank AS INT) AS dense_rank
        FROM dense0
    ),
    fused AS (
        SELECT COALESCE(l.query_id, d.query_id) AS query_id,
               COALESCE(l.doc_id, d.doc_id) AS doc_id,
               l.lex_rank, d.dense_rank
        FROM lexq l FULL OUTER JOIN denser d
          ON l.query_id = d.query_id AND l.doc_id = d.doc_id
    ),
    scored AS (
        SELECT query_id, doc_id, lex_rank, dense_rank,
               CAST(COALESCE({RRF_SCALE} // (CAST({RRF_K} AS BIGINT) + lex_rank), 0)
                  + COALESCE({RRF_SCALE} // (CAST({RRF_K} AS BIGINT) + dense_rank), 0)
                  AS BIGINT) AS rrf_scaled
        FROM fused
    )
    SELECT query_id, doc_id, lex_rank, dense_rank, rrf_scaled,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY rrf_scaled DESC, doc_id
           ) AS INT) AS fused_rank
    FROM scored
    QUALIFY fused_rank <= {FUSED_TOP}
    ORDER BY query_id, fused_rank
    """


@register(
    "q173_hybrid_rrf",
    oracle=_rrf_oracle(),
    tags=("rag", "search", "hybrid", "rrf"),
)
def q173_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009):
    fuse the lexical arm (the q145 BM25 standing-query list) with the
    dense arm (the q55 exact cosine top-k per query vector, vec_id ==
    doc_id by fixture convention) as score = sum over arms of
    SCALE div (60 + rank) — INTEGER division, so fusion is bitwise
    reproducible and needs no float summation anywhere.

    Both arms are the already-verified registered queries, called as
    plain functions — composition over reimplementation (the q169
    discipline). Scale shape: each arm bounds its own candidate set
    (BM25: matching docs only; dense: broadcast queries x corpus scan,
    both TakeOrdered/windowed to constant rows), so the fusion join is
    (3 x 20) full-outer (3 x 10) — constant-size frames; the per-query
    re-rank window only ever sees <= 30 rows. At 100 TB the cost IS the
    two arms; fusion is free."""
    lex0 = REGISTRY["q145_bm25_topk"].fn(spark, sf_dir)
    # rank the constant-row top list (q124 discipline: the single-partition
    # window sees BM25_TOP rows, never the corpus)
    lex = lex0.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("int")
        .alias("lex_rank"),
    )
    dense0 = REGISTRY["q55_ann_bruteforce_topk"].fn(spark, sf_dir)
    # eager checkpoint (r14): the |queries| x k dense arm feeds BOTH the
    # qids distinct and the fusion join — left lazy, each consumer re-ran
    # q55's brute-force corpus scan (racing twin scans in the profile)
    dense = dense0.select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("int").alias("dense_rank"),
    ).localCheckpoint()
    qids = dense.select("query_id").distinct()
    lexq = qids.crossJoin(F.broadcast(lex))
    fused = lexq.join(dense, ["query_id", "doc_id"], "full")
    rrf = (
        F.coalesce(
            F.expr(f"{RRF_SCALE}L div ({RRF_K}L + CAST(lex_rank AS BIGINT))"),
            F.lit(0).cast("bigint"),
        )
        + F.coalesce(
            F.expr(f"{RRF_SCALE}L div ({RRF_K}L + CAST(dense_rank AS BIGINT))"),
            F.lit(0).cast("bigint"),
        )
    ).cast("bigint")
    scored = fused.select(
        "query_id", "doc_id", "lex_rank", "dense_rank", rrf.alias("rrf_scaled")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("rrf_scaled"), F.asc("doc_id"))
    return (
        scored.withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("fused_rank") <= FUSED_TOP)
        .orderBy("query_id", "fused_rank")
    )
