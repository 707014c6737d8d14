"""Shared count-min sketch building blocks.

Two queries maintain CMS grids — q180 (batch, per-source grids merged
cell-wise) and q190 (streaming, per-micro-batch partial grids merged
from a foreachBatch ledger) — and both point-query the merged grid the
same way. The hashing, depth fan-out, and min-over-rows estimate live
here so a fix to the estimate path cannot silently apply to one copy
and not the other.

Determinism contract: the cell index is an exact integer function of
md5 (nibble-weighted 8-hex-char prefix mod width — functions/textfns),
so grids, merges, and estimates are bitwise cross-engine; the DuckDB
oracles re-derive the same expression per call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..functions.textfns import hex_prefix_num_sql


def cms_cell_sql(key_str_expr: str, d_expr: str, width: int | str) -> str:
    """Cell index for hash row ``d_expr``: md5(key # d) prefix mod width
    (Spark dialect; oracle duals re-derive the same text per site).
    ``width`` may be an integer literal or a SQL expression string (the
    adaptive ladder over a broadcast corpus statistic — q209)."""
    return (
        hex_prefix_num_sql(
            f"md5(concat({key_str_expr}, '#', CAST({d_expr} AS STRING)))", 8
        )
        + f" % {width}"
    )


def cms_fanout(
    df: DataFrame, key_col: str, depth: int, width: int | str
) -> DataFrame:
    """Append (d, cell) per hash row: rows x ``depth``, keeping all
    input columns. The key is rendered CAST(key AS STRING) so integer
    and string keys hash identically to their oracle duals."""
    return df.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    ).withColumn(
        "cell",
        F.expr(cms_cell_sql(f"CAST({key_col} AS STRING)", "d", width)),
    )


def cms_point_query(
    grid: DataFrame,
    exact_topk: DataFrame,
    key_col: str,
    depth: int,
    width: int | str,
) -> DataFrame:
    """Estimate the top-k keys against a merged grid.

    ``grid``: (d, cell, cell_count) — <= depth*width rows, broadcast to
    the probe join (point queries never rescan the corpus — the
    sketch's contract). ``exact_topk``: (key, exact_count), already
    limited and deterministically tie-broken. Returns (key,
    exact_count, est_count, overcount, rank) ordered by exact_count
    desc then key; est = min over hash rows, so overcount >= 0 is the
    measured collision error."""
    probes = cms_fanout(exact_topk, key_col, depth, width)
    est = (
        probes.join(F.broadcast(grid), ["d", "cell"])
        .groupBy(key_col, "exact_count")
        .agg(F.min("cell_count").alias("est_count"))
    )
    return est.select(
        key_col,
        "exact_count",
        "est_count",
        (F.col("est_count") - F.col("exact_count")).alias("overcount"),
        F.row_number()
        .over(W.orderBy(F.col("exact_count").desc(), F.col(key_col)))
        .cast("int")
        .alias("rank"),
    ).orderBy(F.col("exact_count").desc(), key_col)
