"""Core relational query surface (SURVEY §2.B B1-B9 + §2.C categories).

The reference delegates all of these to Postgres after load
(reference README.md:77-83, access paths in sql/indexes.sql:7-16); here each
is a native DataFrame-API plan. Every query has a DuckDB oracle; numeric
aggregates follow the deterministic-decimal recipe in functions/numeric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.numeric import dec_avg, dec_avg_sql, dec_sum, dec_sum_sql
from ..session import load_tables
from .registry import register


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tables = load_tables(spark, sf_dir, list(names))
    return [tables[n] for n in names]


# --------------------------------------------------------------------------
# B9 / TPC-H Q1 shape: scan → filter → groupBy → 8 aggregates
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dec_sum_sql("l_quantity", "sum_qty")},
           {dec_sum_sql("l_extendedprice", "sum_base_price")},
           {dec_sum_sql("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {dec_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {dec_avg_sql("l_quantity", "avg_qty")},
           {dec_avg_sql("l_extendedprice", "avg_price")},
           {dec_avg_sql("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "B9"),
    doc="TPC-H Q1 pricing summary: the flagship scan→filter→agg pipeline.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum("l_extendedprice * (1 - l_discount)", "sum_disc_price"),
            dec_sum(
                "l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge"
            ),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# B1: full scan + projection (+ computed column)
# --------------------------------------------------------------------------
@register(
    "q02_scan_project",
    oracle="""
    SELECT p_partkey, p_name, UPPER(p_brand) AS brand_u,
           p_retailprice * 1.1 AS marked_up
    FROM part
    """,
    tags=("scan", "B1"),
)
def q02_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with expressions — column pruning reaches the parquet scan."""
    (part,) = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        "p_name",
        F.upper("p_brand").alias("brand_u"),
        (F.col("p_retailprice") * 1.1).alias("marked_up"),
    )


# --------------------------------------------------------------------------
# B2: point lookup / range filter (predicate pushdown)
# --------------------------------------------------------------------------
@register(
    "q03_point_lookup",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = 42",
    tags=("filter", "B2"),
)
def q03_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup on the key — pushed to the parquet reader as an EqualTo."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") == 42).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "q04_range_filter",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_totalprice BETWEEN 1000 AND 2000
      AND o_orderstatus = 'F'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
    """,
    tags=("filter", "B2"),
)
def q04_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_totalprice").between(1000, 2000)
        & (F.col("o_orderstatus") == "F")
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


# --------------------------------------------------------------------------
# B3/B6: fact ⋈ dimension equi-join + aggregate
# --------------------------------------------------------------------------
@register(
    "q05_revenue_per_customer",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           COUNT(*) AS n_orders,
           {dec_sum_sql("o.o_totalprice", "revenue")}
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join", "agg", "B3"),
)
def q05_revenue_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join on the FK; customer is small → broadcast (no fact shuffle
    for the join; only the groupBy shuffles, on the same key)."""
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice", "revenue"),
        )
    )


@register(
    "q06_lineitem_orders_priority",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           {dec_sum_sql("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o.o_orderpriority
    """,
    tags=("join", "agg", "B4"),
)
def q06_lineitem_orders_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    return (
        lineitem.join(
            orders.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dec_sum("l_extendedprice * (1 - l_discount)", "revenue"),
        )
    )


# --------------------------------------------------------------------------
# B5: 3-way join through dimension chain (customer ⋈ nation ⋈ region)
# --------------------------------------------------------------------------
@register(
    "q07_customers_per_region",
    oracle=f"""
    SELECT r.r_name,
           COUNT(*) AS n_customers,
           {dec_sum_sql("c.c_acctbal", "total_acctbal")}
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("join", "B5"),
)
def q07_customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension chain: both nation and region broadcast — zero shuffles
    before the final (5-row) aggregate."""
    customer, nation, region = _t(spark, sf_dir, "customer", "nation", "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_sum("c_acctbal", "total_acctbal"),
        )
    )


@register(
    "q08_brand_supplier_revenue",
    oracle=f"""
    SELECT p.p_brand, s.s_name,
           COUNT(DISTINCT l.l_orderkey) AS n_orders,
           {dec_sum_sql("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY p.p_brand, s.s_name
    """,
    tags=("join", "B5", "B6"),
)
def q08_brand_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part, supplier = _t(spark, sf_dir, "lineitem", "part", "supplier")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            dec_sum("l_extendedprice * (1 - l_discount)", "revenue"),
        )
    )


# --------------------------------------------------------------------------
# B8: outer / semi / anti joins (optional children in the star schema)
# --------------------------------------------------------------------------
@register(
    "q09_left_join_order_counts",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    ) t
    GROUP BY n_orders
    """,
    tags=("join", "B8"),
)
def q09_left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeps customers with zero orders (count(col) skips
    the nulls the outer join introduces)."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(orders, orders.o_custkey == customer.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "q10_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
    tags=("join", "B8"),
)
def q10_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    finished = orders.filter(F.col("o_orderstatus") == "F")
    return customer.join(
        finished, customer.c_custkey == finished.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q11_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
    tags=("join", "B8"),
)
def q11_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# B9: aggregate suite incl. distinct aggregates; HAVING
# --------------------------------------------------------------------------
@register(
    "q12_agg_suite",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           COUNT(DISTINCT o_custkey) AS n_customers,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           {dec_sum_sql("o_totalprice", "sum_price")},
           {dec_avg_sql("o_totalprice", "avg_price")}
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "B9"),
)
def q12_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        dec_sum("o_totalprice", "sum_price"),
        dec_avg("o_totalprice", "avg_price"),
    )


@register(
    "q13_having",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {dec_sum_sql("o_totalprice", "spend")}
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
    """,
    tags=("agg", "B9"),
)
def q13_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice", "spend"))
        .filter(F.col("n_orders") >= 3)
    )


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube
# --------------------------------------------------------------------------
@register(
    "q14_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {dec_sum_sql("o_totalprice", "sum_price")}
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
)
def q14_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dec_sum("o_totalprice", "sum_price")
    )


@register(
    "q15_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {dec_sum_sql("o_totalprice", "sum_price")}
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def q15_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dec_sum("o_totalprice", "sum_price")
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------
@register(
    "q16_window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    ) t WHERE rn <= 3
    """,
    tags=("window",),
)
def q16_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer; unique tie-break on the key keeps the
    selection deterministic."""
    (orders,) = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rn"
        )
    )


@register(
    "q17_window_running",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type,
           RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id)
               AS value_rank
    FROM events
    """,
    tags=("window",),
)
def q17_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum (exact decimal accumulation), lag, rank in one pass —
    all three share one window partitioning, so one shuffle."""
    (events,) = _t(spark, sf_dir, "events")
    w_seq = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_seq.rowsBetween(W.unboundedPreceding, W.currentRow)
    w_val = W.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(25,6)"))
        .over(w_run)
        .cast("double")
        .alias("running_value"),
        F.lag("event_type").over(w_seq).alias("prev_type"),
        F.rank().over(w_val).alias("value_rank"),
    )


# --------------------------------------------------------------------------
# Sort / limit / top-k
# --------------------------------------------------------------------------
@register(
    "q18_global_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    tags=("sort", "limit"),
)
def q18_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit compiles to TakeOrderedAndProject — per-partition top-K
    then a K-row merge on the driver, never a global sort."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------
@register(
    "q19_set_ops",
    oracle="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         active AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                    WHERE o_orderstatus = 'O')
    SELECT 'intersect' AS op, COUNT(*) AS n FROM (
        SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM active) t
    UNION ALL
    SELECT 'union' AS op, COUNT(*) AS n FROM (
        SELECT c_custkey FROM building UNION SELECT c_custkey FROM active) t
    UNION ALL
    SELECT 'except' AS op, COUNT(*) AS n FROM (
        SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM active) t
    """,
    tags=("setop",),
)
def q19_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    active = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )

    def count_of(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")

    return (
        count_of(building.intersect(active), "intersect")
        .unionAll(count_of(building.union(active).distinct(), "union"))
        .unionAll(count_of(building.subtract(active), "except"))
    )


# --------------------------------------------------------------------------
# Scalar function library (string / math / date)
# --------------------------------------------------------------------------
@register(
    "q20_scalar_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_u,
           LOWER(p_brand) AS brand_l,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_name, 1, 4) AS name4,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_name, ' ', '_') AS name_snake,
           TRIM(p_name) AS name_trim,
           ROUND(p_retailprice, 1) AS price_r1,
           ABS(p_retailprice - 1000.0) AS price_dist,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
           CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
           MOD(p_size, 5) AS size_mod5,
           CAST(SQRT(CAST(p_size AS DOUBLE)) AS DOUBLE) AS size_sqrt
    FROM part
    """,
    tags=("scalar",),
)
def q20_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_u"),
        F.lower("p_brand").alias("brand_l"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name4"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.round("p_retailprice", 1).alias("price_r1"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("price_dist"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        (F.col("p_size") % 5).alias("size_mod5"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
    )


@register(
    "q21_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS d,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL '30' DAY AS due_date
    FROM orders WHERE o_orderkey <= 500
    """,
    tags=("scalar", "date"),
)
def q21_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") <= 500).select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL '30' DAY")).alias("due_date"),
    )


# --------------------------------------------------------------------------
# Distinct / conditional aggregation / CASE bucketing
# --------------------------------------------------------------------------
@register(
    "q22_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    tags=("distinct",),
)
def q22_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "q23_conditional_agg",
    oracle=f"""
    SELECT CAST(DATE_TRUNC('year', o_orderdate) AS TIMESTAMP) AS y,
           {dec_sum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END", "finished_rev")},
           {dec_sum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END", "open_rev")},
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
    FROM orders GROUP BY DATE_TRUNC('year', o_orderdate)
    """,
    tags=("agg", "pivot"),
)
def q23_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-shaped conditional aggregation (SUM(CASE ...)), the
    shuffle-friendly form of a wide pivot."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_trunc("year", F.col("o_orderdate")).alias("y")
    ).agg(
        dec_sum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END", "finished_rev"),
        dec_sum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END", "open_rev"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_pending"),
    )


@register(
    "q24_case_bucketing",
    oracle="""
    SELECT CASE WHEN o_totalprice < 500 THEN 'small'
                WHEN o_totalprice < 2000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
    tags=("scalar", "agg"),
)
def q24_case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 500, "small")
        .when(F.col("o_totalprice") < 2000, "medium")
        .otherwise("large")
        .alias("bucket")
    )
    return orders.groupBy(bucket).agg(F.count(F.lit(1)).alias("n"))


@register(
    "q37_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {dec_sum_sql("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "tpch"),
    doc="TPC-H Q3 shape: selective dim filter -> two joins -> agg -> top-10.",
)
def q37_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): the canonical filter→join→join→agg→
    top-k pipeline. customer filters to one segment and broadcasts;
    lineitem only shuffles for its own aggregation; top-10 is
    TakeOrderedAndProject with a unique tie-break (l_orderkey) so the
    LIMIT is deterministic."""
    customer, orders, lineitem = _t(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") < F.lit("1995-03-15").cast("date"))
            & (F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dec_sum("l_extendedprice * (1 - l_discount)", "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )
