"""Structured Streaming operators over the events stream.

The reference has no event-time semantics at all (its FSM is a batch loop —
SURVEY §2.C); these are the streaming capabilities a Spark-native engine
adds on top of the same logical operators the batch queries declare:

- tumbling/sliding window aggregates with watermarked late-data handling;
- gap-based session windows (``session_window`` — the streaming dual of
  operators/relational.sessionize);
- watermarked stream dedup (``dropDuplicatesWithinWatermark`` — the
  streaming dual of first_wins_dedup);
- a custom stateful operator via ``applyInPandasWithState`` (running
  per-user counters) for semantics the built-ins can't express.

All take/return streaming DataFrames, so sources (kafka/files) and sinks
(foreachBatch → JDBC/parquet) compose around them. Tests drive them with a
file source + memory sink via ``processAllAvailable`` — batch rows, real
streaming runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark, path: str) -> DataFrame:
    """File-source event stream (tests); swap for kafka in production —
    the downstream operators are source-agnostic."""
    return spark.readStream.schema(EVENT_SCHEMA).parquet(path)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per event type.

    The watermark bounds state: windows older than max(event time) -
    watermark are finalized and evicted, so state size is O(active windows),
    independent of stream length — the property that matters at 100 TB/day.
    """
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_aggregates(
    events: DataFrame, gap: str = "6 hours", watermark: str = "12 hours"
) -> DataFrame:
    """Gap-based session windows per user (streaming dual of
    operators/relational.sessionize — same gap semantics, incremental
    state instead of a sort)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Drop duplicate event_ids within the watermark horizon — the
    streaming analogue of first-wins dedup (A11) with bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def running_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator: per-user running (count, value-sum) via
    applyInPandasWithState — the escape hatch for semantics windowed aggs
    can't express (cross-batch running state emitted per batch)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def purchase_click_join(
    purchases: DataFrame,
    clicks: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched with the same
    user's clicks in the following ``horizon``.

    Both sides carry watermarks and the join condition bounds event time in
    BOTH directions — that pair of constraints is what lets Spark evict
    buffered rows (state is O(rows inside the horizon window per side), not
    O(stream)). Without the time bound, a stream-stream join must buffer a
    side forever. The equi key (user_id) carries the state-store sharding,
    so state scales out with the shuffle like every other keyed operator.
    """
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_event"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("c_event"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    ).withWatermark("c_ts", watermark)
    return p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") > F.col("p_ts"))
        & (F.col("c_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select("p_event", "p_user", "c_event", "c_ts", "c_value")
