"""Sales & revenue pipeline — the reference's fact-table build.

Re-expresses ``01_sales_revenue_etl.py`` (and its byte-identical copy
``02_delivery_performance_etl.py``) Spark-first: clean → 3-way join →
derive → (sink). The curated IA1 aggregate (revenue_by_category) feeds
``customer_metrics.sql``.

Reference parity map (file:line in /root/reference):
- dedup orders/products, null filters: 01:53-64
- inner joins order_items ⋈ orders ⋈ products: 01:70-72
- line_total / profit_margin: 01:75-83
- year/month/day partition cols: 01:87-89
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import clean, derive, joins

FACT_COLUMNS = [
    "order_id",
    "product_id",
    "customer_id",
    "order_date",
    "delivery_status",
    "quantity",
    "unit_price",
    "line_total",
    "product_name",
    "category",
    "price",
    "margin_percentage",
    "profit_margin",
    "year",
    "month",
    "day",
]


def sales_fact(orders: DataFrame, order_items: DataFrame, products: DataFrame) -> DataFrame:
    """Build the sales fact table (processed zone)."""
    o = clean.dedup(
        clean.require_not_null(orders, "order_id"), ["order_id"]
    ).select("order_id", "customer_id", "order_date", "delivery_status")
    items = clean.require_not_null(order_items, "order_id", "product_id").filter(
        F.col("quantity") > 0
    )
    p = clean.dedup(clean.require_not_null(products, "product_id"), ["product_id"])

    # items⋈orders shuffles on order_id (both large at scale); products is
    # a dimension → broadcast so the fact side never reshuffles for it.
    fact = joins.fact_join(items, (o, "order_id"), (F.broadcast(p), "product_id"))
    fact = derive.with_line_total(fact)
    fact = derive.with_profit_margin(fact)
    fact = derive.with_date_parts(fact, "order_date", day=True)
    return fact.select(*FACT_COLUMNS)
