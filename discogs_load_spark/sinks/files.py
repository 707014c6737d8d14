"""Lake-file sink: parquet (primary at scale), CSV/JSON for interchange.

At 100 TB the relational store is the *serving* layer; the engine's primary
output is partitioned parquet that later stages (and the query surface) scan
with pushdown. ``bucket_by`` enables shuffle-free joins on the bucket key for
downstream consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).option("header", "true").csv(path)


def read_json(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).json(path)
