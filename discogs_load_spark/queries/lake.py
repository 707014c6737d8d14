"""Interchange-format round trips: prove the engine's non-parquet batch
sources/sinks carry data losslessly by writing the ``documents`` table out
as JSON-lines and CSV, reading each back with an EXPLICIT schema, and
fingerprinting the result per (format, lang) — doc counts, exact char
sums, and distinct-text-hash cardinality. The oracle computes the same
fingerprint straight from the parquet fixture, so any loss, duplication,
or mangling in either round trip breaks the value hash.

Schema notes (the production-relevant part):
- JSONL/CSV readers get the schema declared, never inferred — inference
  costs an extra full pass and silently drifts (a lang column of "true"
  becomes BOOLEAN, ids overflow to DOUBLE).
- The CSV leg writes quoted fields with escaped quotes; the fixture text
  is single-line so the read side stays splittable (``multiLine`` off —
  the option that turns a 100 TB CSV read single-task-per-file is the
  first thing to audit in a slow CSV job).
- Round-trip outputs are cached per fixture dir (same _SUCCESS protocol
  as q88's stream re-materialization) so bench warm runs measure the
  read+aggregate, not the rewrite.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..session import load_tables
from .registry import register

_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _roundtrip_dir(sf_dir: str, fmt: str) -> str:
    # key includes the source mtime: a regenerated fixture invalidates the
    # cached round-trip instead of serving stale rows against a fresh oracle
    mtime = int(os.path.getmtime(os.path.join(sf_dir, "documents.parquet")))
    key = f"{sf_dir.strip('/').replace('/', '_')}_{mtime}"
    return os.path.join(tempfile.gettempdir(), f"lake_{fmt}_{key}")


def _fingerprint(df: DataFrame, fmt: str) -> DataFrame:
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    ).select(F.lit(fmt).alias("fmt"), "*")


_FP_SQL = """
    SELECT '{fmt}' AS fmt, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT md5(text)) AS n_distinct_texts,
           MIN(doc_id) AS min_id,
           MAX(doc_id) AS max_id
    FROM documents GROUP BY lang
"""


@register(
    "q101_interchange_roundtrip",
    oracle=(_FP_SQL.format(fmt="json") + " UNION ALL " + _FP_SQL.format(fmt="csv")),
    tags=("sources", "sinks", "json", "csv"),
)
def q101_interchange_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSONL → read-back and documents → CSV → read-back, each
    fingerprinted per lang; identical fingerprints to the parquet original
    prove both interchange paths are lossless."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]

    legs = []
    for fmt in ("json", "csv"):
        out = _roundtrip_dir(sf_dir, fmt)
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            w = docs.write.mode("overwrite")
            if fmt == "csv":
                w.option("header", "true").option("quoteAll", "true").csv(out)
            else:
                w.json(out)
        r = spark.read.schema(_DOC_SCHEMA)
        back = (
            r.option("header", "true").csv(out) if fmt == "csv" else r.json(out)
        )
        legs.append(_fingerprint(back, fmt))
    return legs[0].unionByName(legs[1])


@register(
    "q111_partitioned_lake",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) = DATE '2024-01-15'
    GROUP BY event_type
    """,
    tags=("sinks", "sources", "partitioning"),
)
def q111_partitioned_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned lake layout: events written ``partitionBy(event_date)``,
    then read back with a single-day predicate — the layout that makes a
    100 TB fact table affordable to query (the scan lists ONE date
    directory; the other 29 days are never opened). The plan must show the
    predicate as a PartitionFilter, not a post-scan Filter — asserted in
    tests/test_plans.py::test_partitioned_lake_prunes_partitions.

    Production notes encoded here: partition by a LOW-cardinality derived
    column (a date: ~10^3 dirs over years — never a raw id); within each
    partition, files stay row-group sized so maxPartitionBytes splits
    work evenly."""
    from pyspark.sql import functions as F

    from ..functions.numeric import dec_sum

    events = load_tables(spark, sf_dir, ["events"])["events"]
    mtime = int(os.path.getmtime(os.path.join(sf_dir, "events.parquet")))
    lake = os.path.join(
        tempfile.gettempdir(),
        f"lake_part_{sf_dir.strip('/').replace('/', '_')}_{mtime}",
    )
    if not os.path.exists(os.path.join(lake, "_SUCCESS")):
        (
            events.withColumn("event_date", F.to_date("ts"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(lake)
        )
    back = spark.read.parquet(lake).filter(
        F.col("event_date") == F.lit("2024-01-15").cast("date")
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), dec_sum("value", "total_value")
    )
