"""Event-stream analytics (batch form; streaming/ reuses these plans).

North-star surface over the ``events`` table: JSON prop extraction,
tumbling and sliding event-time windows, and gap-based sessionization.
All are built-ins (``get_json_object``, ``F.window``, lag/cumsum window
functions) — at scale the window aggregates are partial-aggregated
map-side, and sessionization shuffles once on user_id.

Window-struct convention: ``F.window`` yields struct(start,end); we
flatten to ``window_start``/``window_end`` so the driver's column-name
comparator lines up with the oracle's ``date_trunc`` arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MINUTES = 30


def with_json_props(events: DataFrame) -> DataFrame:
    """Extract ``props`` JSON fields ({"k": int} in testdata)."""
    return events.withColumn(
        "prop_k", F.get_json_object(F.col("props"), "$.k").cast("bigint")
    )


def json_kv_rollup(events: DataFrame) -> DataFrame:
    """Per-event-type rollup of the JSON ``k`` prop."""
    return (
        with_json_props(events)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("prop_k").cast("bigint").alias("sum_k"),
            F.round(F.avg("prop_k"), 4).alias("avg_k"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def tumbling_rollup(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows per event_type."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sliding_rollup(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding windows (each event lands in width/slide windows)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    from the previous event exceeds ``gap_minutes``.

    Classic lag + running-sum-of-boundaries; one shuffle on user_id.
    Ordering ties broken by event_id for determinism.
    """
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_user = Window.partitionBy("user_id").orderBy(*order)
    # micros, not unix_timestamp: ts carries sub-second precision and a
    # second-truncating gap compare would disagree with the oracle.
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w_user))
    is_new = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    with_sessions = events.withColumn(
        "session_seq",
        F.sum(is_new).over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            (
                F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
            ).alias("duration_us"),
        )
    )
