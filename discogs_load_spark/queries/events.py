"""Event-stream (batch-mode) query surface over the ``events`` fixture:
tumbling windows, sessionization, as-of join, JSON extraction.

The reference has no event-time semantics (its FSM is streaming-shaped but
batch-only, SURVEY §2.C); these are the capabilities a Spark engine adds.
Streaming duals live in discogs_load_spark.streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.numeric import dec_sum, dec_sum_sql, epoch_us, floordiv_sql
from ..operators.relational import asof_join, sessionize
from ..session import load_tables
from .registry import register

SESSION_GAP_SECONDS = 6 * 3600  # 6h gap → multi-event sessions on the fixture


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ["events"])["events"]


@register(
    "q40_tumbling_window",
    oracle=f"""
    SELECT DATE_TRUNC('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           {dec_sum_sql("value", "total_value")}
    FROM events
    GROUP BY DATE_TRUNC('hour', ts), event_type
    """,
    tags=("events", "window-agg"),
)
def q40_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window aggregate (batch form of the streaming
    window() agg; date_trunc keeps the oracle dual exact)."""
    events = _events(spark, sf_dir)
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"), dec_sum("value", "total_value"))


@register(
    "q41_sessionization",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                            > CAST({SESSION_GAP_SECONDS} AS BIGINT) * 1000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_id, value,
               CAST(SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS INT) AS session_seq
        FROM seq
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           {dec_sum_sql("value", "session_value")}
    FROM sess
    GROUP BY user_id, session_seq
    """,
    tags=("events", "session"),
)
def q41_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (lag + cumsum, one shuffle) then per-session agg."""
    events = _events(spark, sf_dir)
    sessions = sessionize(
        events, ["user_id"], "ts", SESSION_GAP_SECONDS, order_tiebreak=["event_id"]
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        dec_sum("value", "session_value"),
    )


@register(
    "q42_asof_join",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts AS click_ts, MAX(event_id) AS click_event_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    )
    SELECT p.user_id, p.event_id, p.ts, p.value,
           c.click_ts, c.click_event_id,
           epoch_us(p.ts) - epoch_us(c.click_ts) AS gap_us
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
    tags=("events", "asof"),
)
def q42_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase gets the latest prior click of the
    same user. Spark side is the union-sort operator (one shuffle; no range
    explosion); DuckDB side is its native ASOF JOIN — an independent
    implementation, which is exactly what an oracle should be."""
    events = _events(spark, sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_event_id"))
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_payload=["click_ts", "click_event_id"],
    )
    return joined.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        "click_ts",
        "click_event_id",
        (epoch_us("ts") - epoch_us("click_ts")).alias("gap_us"),
    )


@register(
    "q43_json_extraction",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("events", "json"),
)
def q43_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: JSON path extraction + typed agg."""
    events = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "q46_sliding_window",
    oracle=f"""
    WITH contrib AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
               event_type, value
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes',
               event_type, value
        FROM events
    )
    SELECT CAST(window_start AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           {dec_sum_sql("value", "total_value")}
    FROM contrib GROUP BY window_start, event_type
    """,
    tags=("events", "window-agg", "sliding"),
)
def q46_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window: 10-minute windows every 5 minutes — each
    event lands in exactly 2 overlapping windows. Spark's window() explodes
    the event into its windows before the aggregate (same shape the
    streaming version uses); the oracle mirrors that with a 2-way
    time_bucket union. Both are epoch-aligned."""
    events = _events(spark, sf_dir)
    return events.groupBy(
        F.window("ts", "10 minutes", "5 minutes"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"), dec_sum("value", "total_value")
    ).select(
        F.col("window.start").alias("window_start"),
        "event_type",
        "n",
        "total_value",
    )


# Shared WITH RECURSIVE body: identical SQL text runs in BOTH engines
# (Spark 4 added recursive CTEs; DuckDB has had them) — the date spine
# densifies a sparse daily series with explicit zero rows, the gap-filling
# step dashboards/forecasting need. Anchor/bound are literals matching the
# fixture's generated range; recursion depth 30 stays far under Spark's
# default cteRecursionLevelLimit (100).
_SPINE_SQL = """
    WITH RECURSIVE spine(day) AS (
        SELECT DATE '2024-01-01'
        UNION ALL
        SELECT day + 1 FROM spine WHERE day < DATE '2024-01-30'
    ),
    daily AS (
        SELECT CAST(ts AS DATE) AS day,
               COUNT(*) AS n,
               {total}
        FROM {events} WHERE event_type = 'purchase' AND value >= 180
        GROUP BY CAST(ts AS DATE)
    )
    SELECT CAST(s.day AS TIMESTAMP) AS day,
           COALESCE(d.n, 0) AS n_high_value,
           COALESCE(d.total_value, CAST(0 AS DOUBLE)) AS total_value
    FROM spine s LEFT JOIN daily d ON s.day = d.day
"""


@register(
    "q109_recursive_spine",
    oracle=_SPINE_SQL.format(
        total=dec_sum_sql("value", "total_value"), events="events"
    ),
    tags=("recursive-cte", "events", "densify"),
)
def q109_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE date spine + gap fill: high-value purchase days are
    sparse (value >= 180), so the 30-day spine generated by WITH RECURSIVE
    left-joins the daily aggregate and emits explicit zero rows for the
    gaps. Runs the SAME recursive SQL text in Spark (4.x recursion
    support) and DuckDB. Scale shape: the recursion materializes 30 rows —
    the spine side is trivially broadcast; the fact side aggregates before
    the join."""
    load_tables(spark, sf_dir, ["events"])["events"].createOrReplaceTempView(
        "q109_events"
    )
    return spark.sql(
        _SPINE_SQL.format(
            total=dec_sum_sql("value", "total_value"), events="q109_events"
        )
    )


TRAIL_DAYS = 6  # frame: current day + 6 preceding = trailing week


@register(
    "q163_trailing_window_revenue",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS INT) AS day_idx,
               SUM(CAST(value AS DECIMAL(25,6))) AS day_dec,
               COUNT(*) AS n_events
        FROM events GROUP BY day_idx
    )
    SELECT day_idx,
           CAST(day_dec AS DOUBLE) AS day_value,
           CAST(CAST(SUM(day_dec) OVER w AS DECIMAL(25,6)) AS DOUBLE)
               AS trailing_value,
           CAST(COUNT(*) OVER w AS INT) AS n_days_in_frame,
           n_events
    FROM daily
    WINDOW w AS (ORDER BY day_idx
                 RANGE BETWEEN {TRAIL_DAYS} PRECEDING AND CURRENT ROW)
    """,
    tags=("events", "window", "range-frame"),
)
def q163_trailing_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day revenue per day via a RANGE window frame — the
    physical frame kind the suite's other windows don't exercise (ROWS
    frames and unbounded partitions): RANGE over the integer day index
    includes value-neighbors, so missing days genuinely shrink the frame
    (n_days_in_frame says by how much) instead of sliding a fixed row
    count. The window's input is the DAILY aggregate (|days| rows), not
    the event stream — the q144/q160 discipline — and the frame sums
    DECIMAL day totals, so the trailing sum is exact no matter how the
    engine associates the frame additions (segment trees vs running
    sums), then casts to double once."""
    from pyspark.sql import Window as W

    from ..functions.numeric import epoch_us

    events = load_tables(spark, sf_dir, ["events"])["events"]
    daily = (
        events.select(
            epoch_us("ts").alias("ep"), F.col("value")
        )
        .select(
            F.expr(
                f"CAST({floordiv_sql('ep', 86400000000, 'spark')} AS INT)"
            ).alias("day_idx"),
            "value",
        )
        .groupBy("day_idx")
        .agg(
            F.expr("SUM(CAST(value AS DECIMAL(25,6)))").alias("day_dec"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w = W.orderBy("day_idx").rangeBetween(-TRAIL_DAYS, 0)
    return daily.select(
        "day_idx",
        F.expr("CAST(day_dec AS DOUBLE)").alias("day_value"),
        F.expr("CAST(day_dec AS DECIMAL(25,6))").alias("_dd"),
        F.count(F.lit(1)).over(w).cast("int").alias("n_days_in_frame"),
        "n_events",
    ).withColumn(
        "trailing_value",
        F.expr(
            "CAST(CAST(SUM(_dd) OVER (ORDER BY day_idx RANGE BETWEEN "
            f"{TRAIL_DAYS} PRECEDING AND CURRENT ROW) AS DECIMAL(25,6)) "
            "AS DOUBLE)"
        ),
    ).select(
        "day_idx", "day_value", "trailing_value", "n_days_in_frame", "n_events"
    )


DECAY_CLAMP = 62  # 2^d stays inside BIGINT; the fixture spans 30 days


@register(
    "q188_halflife_decay",
    oracle=f"""
    WITH anchor AS (SELECT MAX(CAST(ts AS DATE)) AS a FROM events),
    e AS (
        SELECT user_id,
               CAST(ROUND(value * 100) AS BIGINT) AS v,
               LEAST(datediff('day', CAST(ts AS DATE), a), {DECAY_CLAMP})
                   AS d
        FROM events CROSS JOIN anchor
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE) / 100 AS raw_value,
           CAST(SUM(CAST(v AS DECIMAL(38,0))
                    * CAST(CAST(1 AS BIGINT) << ({DECAY_CLAMP} - d)
                           AS DECIMAL(38,0))) AS DOUBLE)
               / CAST(CAST(1 AS BIGINT) << {DECAY_CLAMP} AS DOUBLE) / 100
               AS decayed_value
    FROM e GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("events", "recency", "decay"),
)
def q188_halflife_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement score with a one-day half-life —
    weight = 2^-days_ago — computed WITHOUT transcendentals: exp/pow
    differ in the last ulp across libm implementations (the class the
    hash gate bans), but halving is exact in binary, so the decayed sum
    is taken as an EXACT integer: cents * 2^(CLAMP - d) accumulated in
    DECIMAL(38,0) (order-insensitive), closed by one division by the
    constant 2^CLAMP (an exponent shift, exact) and one /100. The score
    is therefore bitwise-identical across engines, partitionings, and
    run orders — the recency weighting every engagement/feature-freshness
    pipeline wants, in the deterministic subset. Events older than
    {DECAY_CLAMP} days clamp to the {DECAY_CLAMP}-day weight (documented;
    2^-62 is already ~0 at double precision).

    Scale shape: the anchor date is a 1-row broadcast; the decay weight
    is a per-row projection; one map-side-combinable groupBy(user_id)
    carries everything — same cost as a plain per-user sum."""
    events = _events(spark, sf_dir)
    anchor = events.agg(F.max(F.col("ts").cast("date")).alias("a"))
    e = events.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("v"),
        F.expr(
            f"LEAST(datediff(a, CAST(ts AS DATE)), {DECAY_CLAMP})"
        ).alias("d"),
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.expr(
                "CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE) / 100"
            ).alias("raw_value"),
            F.expr(
                f"CAST(SUM(CAST(v AS DECIMAL(38,0))"
                f" * CAST(shiftleft(CAST(1 AS BIGINT), {DECAY_CLAMP} - d)"
                f" AS DECIMAL(38,0))) AS DOUBLE)"
                f" / CAST(shiftleft(CAST(1 AS BIGINT), {DECAY_CLAMP})"
                f" AS DOUBLE) / 100"
            ).alias("decayed_value"),
        )
        .orderBy("user_id")
    )
