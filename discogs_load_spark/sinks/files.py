"""Lake-file sink: parquet (primary at scale) + bucketed tables.

CSV/JSON/ORC interchange is exercised directly by the declared queries
(q101/q162) through the DataFrame writer API — no wrapper indirection.

At 100 TB the relational store is the *serving* layer; the engine's primary
output is partitioned parquet that later stages (and the query surface) scan
with pushdown. ``bucket_by`` enables shuffle-free joins on the bucket key for
downstream consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates rows by key so later equi-joins on
    ``bucket_col`` skip the shuffle entirely (SortMergeJoin with no
    Exchange). The lake analogue of the reference's b-tree join indexes
    (sql/indexes.sql:7-16)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(name)
    )
