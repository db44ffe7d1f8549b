"""Streaming window aggregates with watermarked late-data handling.

Not required for reference parity (the reference has no time-window
semantics — SURVEY.md §2.10) but a first-class north-star surface: the
same tumbling/sliding rollups as operators/events.py, expressed over an
unbounded stream. The watermark bounds state: windows older than
``ts_max − delay`` are finalized and evicted, so state size is
O(windows-in-flight), not O(stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.events import money, value_cents

DEFAULT_WATERMARK = "2 hours"


def streaming_tumbling_rollup(
    events_stream: DataFrame,
    width: str = "1 hour",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Watermarked tumbling rollup per event_type (append-able sink).

    Same output schema as the batch ``operators.events.tumbling_rollup``
    so batch/stream parity is testable row-for-row.
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_cents()).alias("__cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            F.round(money(F.col("__cents")), 2).alias("sum_value"),
            # tie-exact integer half-up rounding — see events.tumbling_rollup
            (
                F.expr(
                    "(2 * __cents * 100 + n_events) div (2 * n_events)"
                ).cast("double")
                / F.lit(10000.0)
            ).alias("avg_value"),
        )
    )


def streaming_session_windows(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Native session windows (``F.session_window``): gap-merged
    per-user sessions over the stream; state evicted by watermark.

    The batch analogue is ``operators.events.sessionize`` (lag+cumsum
    formulation — same sessions for gap-closed data).
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(money(F.sum(value_cents())), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
