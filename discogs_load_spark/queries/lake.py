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


@register(
    "q132_bucketed_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("lake", "bucketing", "join"),
)
def q132_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange-free fact-fact join off BUCKETED lake tables — the lake
    analogue of the reference's b-tree join indexes (sql/indexes.sql:7-16)
    promoted from a test into the declared surface: both sides are
    written bucketed+sorted by the join key once (cached per fixture
    mtime), and the merge-hinted join then runs with NO shuffle on
    either side — the plan shows no hashpartitioning exchange on the
    join keys (asserted in test_plans). At 100 TB this is the difference
    between re-shuffling two fact tables per query and reading
    pre-colocated buckets.

    The oracle joins the raw tables — bucketing must not change a single
    row, only the plan.
    """
    from ..sinks.files import write_bucketed_table

    import re

    mtime = int(os.path.getmtime(os.path.join(sf_dir, "orders.parquet")))
    key = re.sub(r"[^A-Za-z0-9_]", "_", f"{sf_dir.strip('/')}_{mtime}")
    db = "q132_bucketed"
    loc = os.path.join(tempfile.gettempdir(), db)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    ot, lt = f"{db}.orders_b_{key}", f"{db}.lineitem_b_{key}"
    tables = load_tables(spark, sf_dir, ["orders", "lineitem"])

    def ensure(name: str, df, col: str) -> None:
        if spark.catalog.tableExists(name):
            return
        # a FRESH session's in-memory catalog doesn't know tables a prior
        # process wrote; the managed location on disk then blocks
        # saveAsTable — clear it and rewrite (bucket metadata lives in the
        # catalog, so adopting the bare files would lose the bucketing)
        leftover = os.path.join(loc, name.split(".", 1)[1])
        if os.path.exists(leftover):
            import shutil

            shutil.rmtree(leftover, ignore_errors=True)
        write_bucketed_table(df, name, col, n_buckets=8)

    ensure(ot, tables["orders"].select("o_orderkey", "o_orderpriority"), "o_orderkey")
    ensure(lt, tables["lineitem"].select("l_orderkey", "l_quantity"), "l_orderkey")
    ob, lb = spark.table(ot), spark.table(lt)
    joined = ob.hint("merge").join(lb, ob.o_orderkey == lb.l_orderkey)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr(
                "CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)"
            ).alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )
