"""Delivery performance pipeline — reconstructed (IA3).

The reference's ``02_delivery_performance_etl.py`` is a byte-identical
copy of ``01`` (SURVEY.md §2.13.1): the delivery logic was never
written. Semantics are reconstructed from the consuming SQL
(``delivery_partner.sql:4-14``) over the minimal delivery schema
declared in FIXTURES.md (delivery_partner_id, delivery_time_hours,
distance_km, is_delayed on orders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import agg, clean


def partner_performance(orders: DataFrame) -> DataFrame:
    o = clean.dedup(
        clean.require_not_null(orders, "order_id", "delivery_partner_id"), ["order_id"]
    )
    return agg.delivery_partner_performance(o)
