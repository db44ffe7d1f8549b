"""Stream-stream interval join: the unbounded twin of the batch range
join (`operators.joins.windowed_range_join`).

Not in the reference (its pipeline is batch-only — SURVEY.md §2.10);
north-star surface for event-driven attribution: join two live streams
(purchases ⋈ clicks) on key + a bounded time interval. Spark's
stream-stream join keeps both sides in keyed state; the WATERMARKS plus
the INTERVAL CONDITION are what bound that state — rows older than
``watermark + interval`` can provably never match a future row and are
evicted, so state is O(rows-in-flight·interval), not O(stream).

Append-mode safe (inner joins emit exactly when both sides have
arrived), so the output lands in any append sink. Batch parity is
pinned in ``tests/test_streaming.py`` against the bucketized batch
range join on identical data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_JOIN_WATERMARK = "2 hours"


def purchases_with_preceding_clicks(
    purchases: DataFrame,
    clicks: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = DEFAULT_JOIN_WATERMARK,
) -> DataFrame:
    """Pairs (purchase, click) with the click in the interval
    ``(purchase_ts − window, purchase_ts]`` for the same user — the
    exact predicate of the batch ``windowed_range_join`` twin
    (strict lower bound, inclusive upper).

    Both inputs must carry ``event_id``/``user_id``/``ts``. The
    watermark delay is the lateness budget: a click later than
    ``watermark`` behind the max event time seen may be dropped —
    identical semantics to the windowed aggregates in
    :mod:`blinkit_etl_pipeline_spark.streaming.windows`.
    """
    p = purchases.select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    cond = F.expr(
        f"user_id = click_user"
        f" AND click_ts > purchase_ts - INTERVAL {window}"
        f" AND click_ts <= purchase_ts"
    )
    return p.join(c, cond, "inner").select(
        "purchase_event_id", "user_id", "purchase_ts", "click_ts"
    )
