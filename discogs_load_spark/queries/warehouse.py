"""Third-ring warehouse coverage: disjunctive predicate pushdown, EXISTS
decorrelation, histograms, arg-max aggregates.

These exercise optimizer behaviors the earlier rings don't: OR-of-ANDs
predicates (Q19 shape), EXISTS→semi-join rewrites (Q4 shape), and the
width_bucket / max_by scalar+aggregate families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.numeric import dec_sum, dec_sum_sql
from ..session import load_tables
from .registry import register


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tables = load_tables(spark, sf_dir, list(names))
    return [tables[n] for n in names]


@register(
    "q38_disjunctive_predicates",
    oracle=f"""
    SELECT {dec_sum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
           COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 25)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 50)
    """,
    tags=("join", "tpch", "pushdown"),
)
def q38_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs predicate straddling the join.

    Catalyst extracts the common part-side disjunction
    (brand∈{1,3,5} ∧ size ranges) below the join — the part scan prunes
    before shuffling — while the mixed l_quantity×brand terms evaluate
    post-join. part is dim-sized → broadcast hash join, so lineitem never
    shuffles at all: the whole query is one map-side pass + a scalar agg.

    Reference delegates all querying to Postgres (SURVEY §2.C,
    README.md:77-83); this is the disjunctive access path its
    `sql/indexes.sql` b-trees would serve.
    """
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    j = lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 25))
        | ((F.col("p_brand") == "Brand#3") & sz.between(10, 30) & q.between(10, 40))
        | ((F.col("p_brand") == "Brand#5") & sz.between(20, 50) & q.between(20, 50))
    )
    return j.filter(cond).agg(
        dec_sum("l_extendedprice * (1 - l_discount)", "revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q39_exists_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL '30' DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("subquery", "semi-join", "tpch"),
)
def q39_exists_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → left-semi join.

    Catalyst rewrites the EXISTS into a semi join on l_orderkey with the
    correlated date comparison as the join's extra condition; the semi
    join short-circuits per key (no fan-out, no dedup pass), and the date
    filter on orders pushes to the scan. At 100 TB both sides shuffle
    once on orderkey — the minimum for this semantics — and AQE can flip
    to broadcast when the filtered orders side is small.
    """
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    orders.createOrReplaceTempView("orders")
    lineitem.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= DATE '1996-01-01'
          AND o.o_orderdate < DATE '1996-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL '30' DAY
          )
        GROUP BY o_orderpriority
        """
    )


# 25k-wide buckets over [0, 600k); floor of an exact double division by a
# power-of-ten-ish constant is bitwise identical in both engines.
_BUCKET = "CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT)"


@register(
    "q48_price_histogram",
    oracle=f"""
    SELECT {_BUCKET} AS bucket,
           COUNT(*) AS n,
           MIN(o_orderkey) AS first_order
    FROM orders
    GROUP BY bucket
    """,
    tags=("agg", "histogram"),
)
def q48_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via a floor-division bucket (the same SQL
    text runs in both dialects; DuckDB lacks width_bucket) — the scalable
    form of a distribution profile (vs. sort-based quantiles): one
    map-side bucket assignment + a tiny 24-key aggregate, no global sort.
    All outputs are integers, so cross-engine parity is exact by
    construction."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.select(F.expr(_BUCKET).alias("bucket"), "o_orderkey")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.min("o_orderkey").alias("first_order"))
    )


@register(
    "q49_argmax_aggregates",
    oracle="""
    SELECT o_custkey,
           arg_max(o_totalprice, o_orderkey) AS latest_price,
           arg_min(o_orderstatus, o_orderkey) AS first_status,
           MAX(o_orderkey) AS last_order,
           MIN(o_orderkey) AS first_order
    FROM orders
    GROUP BY o_custkey
    """,
    tags=("agg", "argmax"),
)
def q49_argmax_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (arg-max) aggregates: per customer, the payload of
    the row with the extreme ordering key — one hash aggregate instead of
    the window+filter idiom (q16), so no sort and no second pass. The
    ordering key (o_orderkey) is unique per group, making the arg-max
    deterministic; Spark max_by == DuckDB arg_max."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.expr("max_by(o_totalprice, o_orderkey)").alias("latest_price"),
        F.expr("min_by(o_orderstatus, o_orderkey)").alias("first_status"),
        F.max("o_orderkey").alias("last_order"),
        F.min("o_orderkey").alias("first_order"),
    )


@register(
    "q148_scd2_dimension",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type AS state, ts, event_id,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_state
        FROM events
    ),
    changes AS (
        SELECT user_id, state, ts AS valid_from, event_id
        FROM ordered WHERE prev_state IS NULL OR prev_state <> state
    )
    SELECT user_id,
           CAST(ROW_NUMBER() OVER w AS INT) AS version,
           state, valid_from,
           LEAD(valid_from) OVER w AS valid_to,
           (LEAD(valid_from) OVER w IS NULL) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
    """,
    tags=("warehouse", "scd2", "cdc"),
)
def q148_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from an event change log:
    collapse each user's event stream to its state-CHANGE rows (lag
    window), then derive [valid_from, valid_to) intervals and an
    is_current flag (lead window) — the standard dimension-history table
    every warehouse maintains, built in one pass.

    Scale shape: both windows partition by user_id, so Catalyst plans ONE
    user-keyed exchange and runs lag, the change filter, the version
    row_number, and lead inside the same sorted partition — no second
    shuffle, no self-join (the naive interval build joins the change set
    to itself on version+1). Change rows are a small fraction of events,
    so the second window's input is already collapsed. Determinism: event
    ordering ties broken by event_id at both window levels.
    """
    events = _t(spark, sf_dir, "events")[0]
    ordered = events.select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        "event_id",
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("prev_state"),
    )
    changes = ordered.filter(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state"))
    ).select("user_id", "state", F.col("ts").alias("valid_from"), "event_id")
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        F.row_number().over(w2).cast("int").alias("version"),
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


QCUT_BINS = 10  # equal-frequency decile cuts


@register(
    "q189_quantile_cut_bins",
    oracle=f"""
    WITH q AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
    ),
    vc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS m FROM q GROUP BY c),
    tot AS (SELECT CAST(SUM(m) AS BIGINT) AS n FROM vc),
    w AS (
        SELECT c, m,
               SUM(m) OVER (ORDER BY c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM vc
    ),
    cuts AS (
        SELECT g.k, MIN(w.c) AS cut
        FROM w CROSS JOIN tot
        JOIN generate_series(1, {QCUT_BINS - 1}) AS g(k)
          ON w.cum * {QCUT_BINS} >= g.k * tot.n
        GROUP BY g.k
    ),
    binned AS (
        SELECT v.c, v.m,
               1 + COALESCE(SUM(CASE WHEN v.c > cuts.cut THEN 1 END), 0)
                   AS bin
        FROM vc v LEFT JOIN cuts ON TRUE
        GROUP BY v.c, v.m
    ),
    spine AS (SELECT k AS bin FROM generate_series(1, {QCUT_BINS}) AS s(k))
    SELECT s.bin,
           COALESCE(CAST(SUM(b.m) AS BIGINT), 0) AS n_rows,
           CAST(MIN(b.c) AS DOUBLE) / 100 AS lo_price,
           CAST(MAX(b.c) AS DOUBLE) / 100 AS hi_price,
           CAST(COALESCE(SUM(b.m), 0) AS DOUBLE) / (SELECT n FROM tot)
               AS share
    FROM spine s LEFT JOIN binned b ON b.bin = s.bin
    GROUP BY s.bin
    ORDER BY s.bin
    """,
    tags=("agg", "histogram", "quantile"),
)
def q189_quantile_cut_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile-cut) histogram of order prices — the
    quantile binning a feature pipeline uses where q48's width_bucket
    uses equal WIDTH. Cut k is the smallest price value whose cumulative
    count reaches k/{QCUT_BINS} of the rows (the q186 discrete-quantile
    rule: integer cross-multiply, no float quantile), ties stay whole —
    unlike ntile, a repeated value never straddles bins, which is what
    makes the binning a pure function of the VALUE and therefore
    hash-green cross-engine AND computable without a global row sort:
    the only window runs over DISTINCT price values (value-domain-
    bounded), where ntile would single-partition the whole fact table.
    Empty bins (possible under heavy ties) surface as n_rows = 0 rows
    from the static bin spine.

    Scale shape: one map-side-combinable value-histogram shuffle, a
    window over distinct values, a {QCUT_BINS - 1}-row broadcast cut
    table, and a bins-sized rollup."""
    from pyspark.sql import Window as W

    from pyspark.storagelevel import StorageLevel

    (orders,) = _t(spark, sf_dir, "orders")
    # bounded: distinct price values; persisted because vc feeds the
    # total, the cumulative window, and the bin assignment — without it
    # each branch re-runs the corpus value-histogram shuffle
    vc = (
        orders.select(
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c")
        )
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = vc.agg(F.sum("m").cast("bigint").alias("n"))
    # bounded: the window runs over distinct price VALUES, not rows
    w = vc.withColumn(
        "cum",
        F.sum("m").over(
            W.orderBy("c").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    ks = spark.range(1, QCUT_BINS).select(F.col("id").alias("k"))
    cuts = (
        w.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(ks),
            F.expr(f"cum * {QCUT_BINS} >= k * n"),
        )
        .groupBy("k")
        .agg(F.min("c").alias("cut"))
    )
    binned = (
        vc.join(F.broadcast(cuts), F.expr("TRUE"), "left")
        .groupBy("c", "m")
        .agg(
            (
                F.lit(1)
                + F.coalesce(
                    F.sum(F.when(F.col("c") > F.col("cut"), 1)), F.lit(0)
                )
            ).alias("bin")
        )
    )
    spine = spark.range(1, QCUT_BINS + 1).select(F.col("id").alias("bin"))
    return (
        spine.join(binned, "bin", "left")
        .groupBy("bin")
        .agg(
            F.coalesce(F.sum("m"), F.lit(0)).cast("bigint").alias("n_rows"),
            F.expr("CAST(MIN(c) AS DOUBLE) / 100").alias("lo_price"),
            F.expr("CAST(MAX(c) AS DOUBLE) / 100").alias("hi_price"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_rows",
            "lo_price",
            "hi_price",
            F.expr("CAST(n_rows AS DOUBLE) / n").alias("share"),
        )
        .orderBy("bin")
    )
