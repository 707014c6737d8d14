"""Document chunking for retrieval / training pipelines.

Splits each document into overlapping fixed-size token windows — the
standard RAG / context-window preprocessing step. Entirely map-side: the
token array, chunk count, and per-chunk slices are all computed with array
HOFs inside one projection, and the only row-multiplying step is a
``posexplode`` of a small per-row index array. No shuffle, no Python — at
100 TB this runs at parquet-scan speed and parallelizes per input split.

Chunk layout: starts at 0, stride apart; the number of chunks is
``1 + ceil(max(0, n_tokens - size) / stride)`` so the final window always
reaches the end of the document and no chunk is a strict subset of the
previous one (a start is only emitted while the previous window has not
already covered the tail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textfns import norm_sql, tokens_sql

DEFAULT_CHUNK_TOKENS = 32
DEFAULT_STRIDE = 24


def chunk_count_expr(n: str, size: int, stride: int) -> str:
    """#chunks for an ``n``-token doc: 1 + ceil(max(0, n-size)/stride).

    Written with integer arithmetic valid in both Spark SQL and DuckDB:
    the numerator is clamped non-negative BEFORE the division, so the
    engines' differing negative-division conventions (truncate vs floor)
    never see a negative operand.
    """
    return f"(1 + greatest(0, (({n}) - {size} + {stride - 1})) DIV {stride})"


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = DEFAULT_CHUNK_TOKENS,
    stride: int = DEFAULT_STRIDE,
) -> DataFrame:
    """(id, chunk_id, n_chunk_tokens, chunk_hash) — overlapping token
    windows of ``text_col``.

    ``chunk_hash`` is md5 of the space-joined window (chunk text is
    reproducible from it downstream; hashing keeps the output narrow).
    """
    toks = tokens_sql(norm_sql(text_col, "spark"), "spark")
    n_chunks = chunk_count_expr("size(__toks)", size, stride)
    return (
        df.withColumn("__toks", F.expr(toks))
        .select(
            F.col(id_col),
            F.col("__toks"),
            F.posexplode(F.expr(f"sequence(0, {n_chunks} - 1)")).alias(
                "chunk_id", "__start_idx"
            ),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.expr(
                f"CAST(size(slice(__toks, chunk_id * {stride} + 1, {size})) AS BIGINT)"
            ).alias("n_chunk_tokens"),
            F.expr(
                f"md5(array_join(slice(__toks, chunk_id * {stride} + 1, {size}), ' '))"
            ).alias("chunk_hash"),
        )
    )


def chunk_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    size: int = DEFAULT_CHUNK_TOKENS,
    stride: int = DEFAULT_STRIDE,
) -> str:
    """DuckDB dual of :func:`chunk_documents` (same layout math, 1-based
    list slicing)."""
    toks = tokens_sql(norm_sql(text_col, "duckdb"), "duckdb")
    n_chunks = chunk_count_expr("len(toks)", size, stride).replace("DIV", "//")
    return f"""
    WITH t AS (SELECT {id_col}, {toks} AS toks FROM {table}),
    c AS (
        SELECT {id_col}, toks,
               unnest(range({n_chunks})) AS chunk_id
        FROM t
    )
    SELECT {id_col},
           chunk_id,
           CAST(len(toks[chunk_id * {stride} + 1 : chunk_id * {stride} + {size}]) AS BIGINT)
             AS n_chunk_tokens,
           md5(array_to_string(
               toks[chunk_id * {stride} + 1 : chunk_id * {stride} + {size}], ' '))
             AS chunk_hash
    FROM c
    """
