"""Deep multi-way-join warehouse queries (TPC-H Q5/Q7/Q8/Q10/Q13/Q14/Q15/
Q17/Q18/Q21/Q22 shapes, adapted to the fixture schema — no partsupp table,
so Q2/Q9/Q11/Q16/Q20 have no faithful mapping here; Q21's lateness predicate
is re-derived from shipdate vs orderdate since commit/receipt dates are
absent).

These are the join-planner workout the earlier rings lack: 6-table star
joins, nation self-joins with disjunctive pair predicates, market-share
ratio aggregates, scalar-subquery thresholds joined back against the fact
table, and the NOT-EXISTS + above-average-balance anti-join.

Scale notes (the part that matters at 100 TB):
  - region/nation are O(10^1..2) rows forever → always broadcast, hinted
    explicitly so the plan doesn't depend on stats being fresh.
  - supplier/part/customer grow with SF → NO broadcast hint; AQE decides
    from runtime sizes (at sf0.1 they still broadcast; on a 1000-executor
    cluster they flip to shuffle joins without a code change).
  - every orders⋈lineitem join shuffles both sides on orderkey exactly
    once; the per-year/per-nation aggregates that follow reuse that
    clustering where possible (partial aggregation is map-side anyway).
  - threshold patterns (Q15/Q17/Q18/Q22) compute the scalar/per-key
    threshold as a separate tiny aggregate and join it back — at scale
    the threshold side is orders of magnitude smaller than the fact side,
    so AQE broadcasts it; never a cartesian or a window over the fact.

Reference context: the reference delegates every one of these shapes to
Postgres after load (README.md:77-83); its sql/indexes.sql b-trees on the
FK columns (sql/indexes.sql:7-16) declare exactly these access paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.numeric import dec_sum, dec_sum_sql
from ..session import load_tables
from .registry import register

_REV = "l_extendedprice * (1 - l_discount)"


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tables = load_tables(spark, sf_dir, list(names))
    return [tables[n] for n in names]


@register(
    "q73_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {dec_sum_sql(_REV, "revenue")}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "tpch", "deep"),
)
def q73_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-table join where customer and supplier must share a
    nation (the join graph has a cycle: supplier joins lineitem on suppkey
    AND customer on nationkey).

    Plan shape that survives 100 TB: orders filtered by date (pushed to
    scan) ⋈ customer shuffles on custkey; that result ⋈ lineitem shuffles
    on orderkey — the two unavoidable big shuffles. supplier joins with a
    compound key (suppkey + the cycle-closing nationkey equality folded
    into the join condition, NOT a post-filter, so the hash table keys on
    both). nation/region broadcast unconditionally.
    """
    customer, orders, lineitem, supplier, nation, region = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    asia = (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("n_nationkey", "n_name")
    )
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    j = (
        customer.select("c_custkey", "c_nationkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier.select("s_suppkey", "s_nationkey"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("n_name")
        .agg(dec_sum(_REV, "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q74_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l_shipdate) AS l_year,
           {dec_sum_sql(_REV, "revenue")}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "tpch", "deep"),
)
def q74_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: trade volume between two nations, either direction, per
    ship year — nation joined twice (supplier side and customer side) with
    a disjunctive pair predicate that can only evaluate after both joins.

    The two nation copies broadcast (25 rows each, forever); the pair
    disjunction sits above them but below the aggregate. The supplier join
    keys on suppkey only — at 100 TB supplier is too big to broadcast, and
    AQE decides; lineitem⋈orders⋈customer is the standard two-shuffle
    chain with the shipdate range pushed to the lineitem scan.
    """
    lineitem, orders, customer, supplier, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    j = (
        li.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dec_sum(_REV, "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def _dec_sum_expr(expr: str) -> str:
    """dec_sum_sql without the trailing alias — for use inside arithmetic."""
    return dec_sum_sql(expr, "x").rsplit(" AS ", 1)[0]


_NATION_REV = f"CASE WHEN n2.n_name = 'NATION_3' THEN {_REV} ELSE 0 END"


@register(
    "q75_market_share",
    oracle=f"""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
           {dec_sum_sql(_NATION_REV, "nation_rev")},
           {dec_sum_sql(_REV, "total_rev")},
           {_dec_sum_expr(_NATION_REV)} / {_dec_sum_expr(_REV)} AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'EUROPE'
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("join", "tpch", "deep", "ratio"),
)
def q75_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of supplier revenue into a region, per
    order year — a conditional-aggregate ratio over a 7-table join.

    The ratio is numerator/denominator of two exact decimal sums divided
    in double AFTER aggregation (deterministic for the oracle; also the
    scalable form — one aggregation pass, no second scan). Customer-side
    nation+region prune the fact rows (EUROPE filter folds into the
    broadcast hash lookup); supplier-side nation only labels them.
    """
    lineitem, orders, customer, supplier, nation, region = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region"
    )
    cust_nat = (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    supp_nat = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    j = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(cust_nat), F.col("c_nationkey") == F.col("c_nk"))
        .join(
            supplier.select("s_suppkey", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(supp_nat), F.col("s_nationkey") == F.col("s_nk"))
    )
    nat_rev = f"CASE WHEN supp_nation = 'NATION_3' THEN {_REV} ELSE 0 END"
    agg = (
        j.withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(dec_sum(nat_rev, "nation_rev"), dec_sum(_REV, "total_rev"))
    )
    return agg.select(
        "o_year",
        "nation_rev",
        "total_rev",
        (F.col("nation_rev") / F.col("total_rev")).alias("mkt_share"),
    ).orderBy("o_year")


@register(
    "q76_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {dec_sum_sql(_REV, "revenue")},
           CAST(MAX(c_acctbal) AS DOUBLE) AS c_acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "tpch", "deep", "topk"),
)
def q76_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in a
    quarter-ish window.

    The top-k over the aggregate is a TakeOrderedAndProject (per-partition
    heaps + one 20-row driver merge — no global sort), tie-broken on
    custkey for determinism. Both the returnflag filter and the date range
    push to their scans; the groupBy key includes the functionally-
    dependent name/nation columns so no second join is needed after
    aggregation (at 100 TB re-joining post-agg would be cheaper only if
    the agg output were huge — it's ≤ |customer|, so keeping them in the
    grouping key rides the same shuffle).
    """
    customer, orders, lineitem, nation = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    j = (
        customer.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dec_sum(_REV, "revenue"),
            F.max("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q77_small_quantity_revenue",
    oracle=f"""
    WITH part_avg AS (
        SELECT l_partkey AS pk,
               CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
                 / COUNT(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {dec_sum_sql("l_extendedprice", "total_price")} ,
           COUNT(*) AS n_small
    FROM lineitem JOIN part_avg ON l_partkey = pk
    WHERE l_quantity < 0.5 * avg_qty
    """,
    tags=("subquery", "tpch", "deep"),
)
def q77_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below half their part's average quantity.

    The correlated scalar subquery decorrelates into a per-partkey
    aggregate joined back to lineitem. The threshold side has ≤ |part|
    rows — AQE broadcasts it, so the fact table is scanned once, shuffled
    once (for its own per-part aggregate), and the final filter+sum is
    map-side. The naive window-function phrasing (AVG OVER partkey) would
    instead shuffle the FULL fact table including the payload columns;
    the agg+join form moves only (partkey, sum, count).

    Determinism: avg_qty is an exact decimal sum divided by a count in
    double — identical bits in both engines; quantities are integers in
    double, never on the 0.5*avg boundary ulp.
    """
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    part_avg = lineitem.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.expr("CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        lineitem.join(part_avg, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            dec_sum("l_extendedprice", "total_price"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "q78_large_volume_customer",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey AS bk, {dec_sum_sql("l_quantity", "total_qty")}
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > 140
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice, total_qty
    FROM big
    JOIN orders   ON o_orderkey = bk
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("join", "tpch", "deep", "having", "topk"),
)
def q78_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold, with
    their customers, top-25 by price.

    The HAVING aggregate runs FIRST and shrinks the orderkey set to the
    rare heavy hitters; joining orders/customer after means those joins
    see only qualifying keys (semi-join-sized probe side → AQE broadcast).
    The exact decimal HAVING comparison is order-insensitive — a double
    SUM here could flip rows right at the threshold between runs with
    different partitioning.
    """
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        lineitem.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(
            dec_sum("l_quantity", "total_qty"),
            F.expr("SUM(CAST(l_quantity AS DECIMAL(25,6)))").alias("_exact"),
        )
        .filter(F.col("_exact") > 140)
        .drop("_exact")
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("bk"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@register(
    "q79_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS sk, {dec_sum_sql(_REV, "total_revenue")}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = sk
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
    tags=("subquery", "tpch", "deep"),
)
def q79_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum revenue in a quarter —
    a scalar MAX subquery over a derived aggregate, kept (not top-1) so
    ties all surface, exactly as the spec's view formulation does.

    The revenue CTE computes once and feeds both the MAX (one tiny
    all-to-one agg over ≤|supplier| rows) and the equality filter — in
    Spark that's a self-referencing reuse Catalyst handles via a scalar
    subquery broadcast; the big lineitem scan happens exactly once.
    MAX over doubles that are each exact-decimal-sums is deterministic.
    """
    supplier, lineitem = _t(spark, sf_dir, "supplier", "lineitem")
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(dec_sum(_REV, "total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        supplier.join(rev, F.col("s_suppkey") == F.col("sk"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q80_dormant_customers",
    oracle="""
    WITH pos AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
                 / COUNT(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("subquery", "anti-join", "tpch", "deep"),
)
def q80_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich customers (balance above the positive-balance
    average) with no recent orders (none since 2000-01-01), by nation.

    Two classic decorrelations in one query: the scalar AVG becomes a
    1-row broadcast cross join (not a collect — stays a lazy plan edge),
    and NOT EXISTS becomes a left-anti join on custkey. At 100 TB the
    anti join shuffles both sides on custkey; orders needs only its key
    column read (column pruning cuts the probe payload to 8 bytes/row).
    """
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    rich = customer.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    dormant = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        dormant.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)").alias(
                "totacctbal"
            ),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q102_order_count_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "tpch", "deep"),
)
def q102_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer × orders LEFT join with the filter IN THE JOIN
    CONDITION (a WHERE would silently turn the outer join inner and drop
    zero-order customers), per-customer order counts, then the count-of-
    counts histogram. Two aggregations, each map-side combinable; the
    second one's input is |customers| rows of two ints — negligible at
    any scale."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.select("c_custkey")
        .join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT").select(
                "o_custkey", "o_orderkey"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q103_promo_revenue_share",
    oracle=f"""
    SELECT CAST(DATE_TRUNC('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           CAST(100.0 AS DOUBLE)
             * CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV}
                                  ELSE 0 END AS DECIMAL(25,6))) AS DOUBLE)
             / CAST(SUM(CAST({_REV} AS DECIMAL(25,6))) AS DOUBLE)
             AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY DATE_TRUNC('month', l_shipdate)
    ORDER BY ship_month
    """,
    tags=("join", "tpch", "deep"),
)
def q103_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue percentage per ship month. The part join
    carries only (p_partkey, p_type) — column pruning keeps the build side
    skinny enough to broadcast far past the sizes where the full part
    table couldn't. Both sums use the decimal recipe; the ratio is one
    double division (same bits both engines)."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    j = lineitem.select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount").join(
        part.select("p_partkey", "p_type"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = f"CASE WHEN p_type LIKE 'PROMO%' THEN {_REV} ELSE 0 END"
    return (
        j.groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            (
                F.lit(100.0).cast("double")
                * F.expr(f"CAST(SUM(CAST(({promo}) AS DECIMAL(25,6))) AS DOUBLE)")
                / F.expr(f"CAST(SUM(CAST(({_REV}) AS DECIMAL(25,6))) AS DOUBLE)")
            ).alias("promo_share")
        )
        .orderBy("ship_month")
    )


@register(
    "q104_sole_late_supplier",
    oracle="""
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    ),
    multi AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) > 1
    ),
    sole AS (
        SELECT DISTINCT l.l_orderkey, l.l_suppkey
        FROM late l
        JOIN multi m ON l.l_orderkey = m.l_orderkey
        WHERE NOT EXISTS (
            SELECT 1 FROM late o
            WHERE o.l_orderkey = l.l_orderkey AND o.l_suppkey <> l.l_suppkey
        )
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM sole JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    tags=("join", "tpch", "deep", "exists"),
)
def q104_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (lateness adapted to the fixture: shipdate more
    than 60 days after the order date — no commit/receipt dates here):
    suppliers who were the ONLY late supplier on a multi-supplier order.

    The classic double-correlated EXISTS/NOT-EXISTS is expressed as
    aggregates over the derived `late` set instead of two correlated
    self-joins on the fact table: per (orderkey) count late suppliers,
    keep rows where that count == 1 — same semantics, and the fact table
    is scanned twice total (once for `late`, once for `multi`) rather
    than four times. All joins equi on orderkey/suppkey."""
    lineitem, orders, supplier = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    late = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY"))
        .select("l_orderkey", "l_suppkey")
    )
    multi = (
        lineitem.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") > 1)
        .select("l_orderkey")
    )
    # NOT EXISTS(other late supplier) == this order has exactly one
    # distinct late supplier — and that sole supplier IS max(l_suppkey),
    # so ONE aggregate yields (order, supplier) directly (r14: the
    # previous form re-derived `late` a second time for a distinct +
    # semi-join against this aggregate — one extra lineitem⋈orders pass
    # and one extra shuffle for rows the aggregate already pins)
    sole = (
        late.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_late"),
            F.max("l_suppkey").alias("l_suppkey"),
        )
        .filter(F.col("n_late") == 1)
        .select("l_orderkey", "l_suppkey")
        .join(multi, "l_orderkey", "left_semi")
    )
    return (
        sole.join(supplier.select("s_suppkey", "s_name"),
                  F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


# ---------------------------------------------------------------------------
# partsupp-shape adaptations. The fixture has no partsupp table, so TPC-H
# Q2/Q9/Q11/Q16/Q20 have no faithful column-level mapping — but their PLAN
# SHAPES (the part the optimizer must survive) do map: the part↔supplier
# relationship lives in lineitem here. Each query below names the shape it
# preserves and what stands in for the missing columns.
# ---------------------------------------------------------------------------


@register(
    "q117_cheapest_supplier",
    oracle="""
    WITH eur_supp AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    offers AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_price
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM eur_supp)
        GROUP BY l_partkey, l_suppkey
    ),
    best AS (
        SELECT l_partkey AS b_partkey, MIN(unit_price) AS min_price
        FROM offers GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, unit_price
    FROM part
    JOIN offers ON p_partkey = l_partkey
    JOIN best ON l_partkey = b_partkey AND unit_price = min_price
    JOIN eur_supp ON l_suppkey = s_suppkey
    WHERE p_size = 15 AND p_type = 'SMALL'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("join", "tpch", "correlated-subquery"),
)
def q117_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 SHAPE (min-cost supplier per part via correlated scalar
    subquery, region-restricted). ps_supplycost is absent, so the offered
    unit price is derived from lineitem (MIN over a supplier's shipments
    of extendedprice/quantity — an exact per-row IEEE division, so MIN and
    the equality join-back are bit-identical across engines).

    Plan shape preserved: the correlated "= (SELECT MIN ...)" becomes a
    tiny per-part aggregate joined back by (partkey, price) equality —
    at 100 TB the aggregate side is |parts| rows, broadcast by AQE, never
    a window over the fact table. The region filter semi-joins lineitem
    BEFORE the per-(part,supplier) aggregate, so the shuffled agg input
    is already pruned to ~1/5 of suppliers."""
    part, supplier, lineitem, nation, region = _t(
        spark, sf_dir, "part", "supplier", "lineitem", "nation", "region"
    )
    eur_supp = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        lineitem.join(
            eur_supp.select("s_suppkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.expr("l_extendedprice / l_quantity")).alias("unit_price"))
    )
    best = offers.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_price").alias("min_price")
    )
    sized = part.filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    ).select("p_partkey", "p_type")
    return (
        sized.join(offers, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_price") == F.col("min_price")),
        )
        .join(eur_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "unit_price")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_PROFIT = "l_extendedprice * (1 - l_discount) - l_quantity * p_retailprice * 0.01"


@register(
    "q118_product_profit",
    oracle=f"""
    SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
           {dec_sum_sql(_PROFIT, "sum_profit")}
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    tags=("join", "tpch", "deep"),
)
def q118_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 SHAPE (product-type profit by nation and year): 5-table
    join with a LIKE-substring part filter, per-row profit arithmetic,
    nation/year rollup. The missing ps_supplycost is replaced by a
    retailprice-derived cost (one per-row double expression, textually
    identical in both dialects; summed with the exact decimal recipe).

    Scale shape: the selective p_name filter broadcasts into the lineitem
    join (runtime bloom filter prunes the fact scan); lineitem⋈orders is
    the one big orderkey shuffle; supplier/nation broadcast."""
    part, supplier, lineitem, orders, nation = _t(
        spark, sf_dir, "part", "supplier", "lineitem", "orders", "nation"
    )
    bolts = part.filter(F.col("p_name").like("%bolt%")).select(
        "p_partkey", "p_retailprice"
    )
    j = (
        lineitem.join(bolts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            F.expr(_PROFIT).alias("__p"),
        )
        .groupBy("nation", "o_year")
        .agg(dec_sum("__p", "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q11_FRACTION = 0.0008


@register(
    "q119_important_parts",
    oracle=f"""
    WITH pv AS (
        SELECT l_partkey, {dec_sum_sql(_REV, "part_value")}
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (
        SELECT {dec_sum_sql(_REV, "total_value")} FROM lineitem
    )
    SELECT l_partkey, part_value
    FROM pv, tot
    WHERE part_value > total_value * {Q11_FRACTION}
    ORDER BY part_value DESC, l_partkey
    """,
    tags=("tpch", "scalar-subquery", "threshold"),
)
def q119_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 SHAPE (keys whose aggregate value exceeds a FRACTION of
    the global total — the global-scalar-subquery threshold). Value =
    lineitem revenue per part (partsupp's availqty*supplycost is absent).

    Scale shape: one shuffle for the per-part aggregate; the global total
    is a second map-side-partial aggregate reduced to ONE row and
    cross-joined (broadcast) as the threshold — never a window over the
    fact, never a second full shuffle. Both sums use the exact decimal
    recipe, so the > comparison is bit-identical across engines."""
    lineitem = _t(spark, sf_dir, "lineitem")[0]
    pv = lineitem.groupBy("l_partkey").agg(dec_sum(_REV, "part_value"))
    tot = lineitem.select(F.expr(_REV).alias("__r")).agg(
        dec_sum("__r", "total_value")
    )
    return (
        pv.join(F.broadcast(tot))
        .filter(F.col("part_value") > F.col("total_value") * Q11_FRACTION)
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@register(
    "q120_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "anti-join", "count-distinct"),
)
def q120_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 SHAPE (supplier variety per part attribute group, with a
    NOT-IN supplier exclusion): COUNT(DISTINCT supplier) grouped by
    (brand, type, size), suppliers related to parts through lineitem, and
    the "complaints" exclusion mapped to negative account balance.

    Scale shape: the NOT IN becomes a broadcast anti-join (the exclusion
    list is tiny at any SF — it's a filtered dimension); COUNT DISTINCT
    shuffles on the group key with partial distinct map-side. Key-never-
    null makes NOT IN ≡ anti-join (no three-valued-logic trap)."""
    part, supplier, lineitem = _t(spark, sf_dir, "part", "supplier", "lineitem")
    sized = part.filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(sized, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q20_QTY_THRESHOLD = 60


@register(
    "q121_excess_shippers",
    oracle=f"""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey, {dec_sum_sql("l_quantity", "qty")}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
          )
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM shipped WHERE qty > {Q20_QTY_THRESHOLD}
    )
    ORDER BY s_name
    """,
    tags=("tpch", "nested-subquery", "semi-join"),
)
def q121_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 SHAPE (the doubly-nested IN: suppliers who shipped an
    excess quantity of name-filtered parts in a year window). The
    availqty > 0.5*sum(qty) correlation needs partsupp; the stand-in is a
    fixed per-(part,supplier) annual quantity threshold — same nesting:
    part-name IN-subquery inside the shipped aggregate, whose qualifying
    supplier set feeds the outer IN.

    Scale shape: both INs are semi-joins (the part filter broadcast into
    the lineitem scan via runtime bloom filter; the supplier set tiny);
    the only shuffle is the (partkey, suppkey) aggregate, date-pruned at
    the scan."""
    part, supplier, lineitem, nation = _t(
        spark, sf_dir, "part", "supplier", "lineitem", "nation"
    )
    red = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    shipped = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(red, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(dec_sum("l_quantity", "qty"))
        .filter(F.col("qty") > Q20_QTY_THRESHOLD)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "q122_forecast_revenue",
    oracle=f"""
    SELECT {dec_sum_sql("l_extendedprice * l_discount", "revenue_delta")},
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "scan", "pushdown"),
)
def q122_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan -> filter -> global aggregate, zero joins.

    The canonical predicate-pushdown benchmark: every filter (shipdate
    range, discount band, quantity cap) reaches the parquet scan as a
    PushedFilter and the ReadSchema is 4 columns, so at 100 TB the scan
    reads a fraction of the fact table and the aggregate is one map-side
    partial + a single-row final — no shuffle of any data to speak of.
    test_plans asserts the pushdown actually happens.
    """
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum("l_extendedprice * l_discount", "revenue_delta"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
