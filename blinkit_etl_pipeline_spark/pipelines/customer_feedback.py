"""Customer feedback pipeline (reference ``03_customer_feedback_etl.py``).

Richest written script in the reference: dedup+parse → two-stage CASE
derivation (normalize, score) → three left joins (broadcast rating dim,
customers, orders) → dual-sink fan-out (processed enriched table +
curated per-area aggregate). The fan-out point is where the reference
recomputes the whole upstream plan twice (no cache, SURVEY.md §3.2) —
callers here persist the enriched DF when materializing both sinks.

Parity map: dedup/parse 03:75-78; normalize 03:81-87; score 03:90-96;
joins 03:102-107; partition cols 03:110-113; aggregate 03:132-140.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import clean, derive, joins


def enriched_feedback(
    feedback: DataFrame,
    customers: DataFrame,
    orders: DataFrame,
    rating_icons: DataFrame,
) -> DataFrame:
    fb = clean.dedup(
        clean.require_not_null(feedback, "feedback_id"), ["feedback_id"]
    )
    fb = clean.parse_timestamp(fb, "feedback_date")
    fb = derive.with_sentiment_normalized(fb)
    fb = derive.with_sentiment_score(fb)

    cust = customers.select("customer_id", "area", "customer_segment")
    ords = orders.select("order_id", "order_date", "delivery_status")

    fb = joins.enrich_left(fb, rating_icons, "rating")          # 5-row dim (broadcast)
    fb = joins.enrich_left(fb, cust, "customer_id")             # dim (broadcast)
    fb = joins.enrich_left(fb, ords, "order_id", broadcast=False)  # fact-sized at scale
    return derive.with_date_parts(fb, "feedback_date", day=False)
