"""Explicit schema registry — FIXTURES.md as code.

The reference infers schemas on every CSV read (``inferSchema=True``,
reference ``01_sales_revenue_etl.py:35-48`` et al.), which costs an extra
full scan per read and risks type drift (e.g. the rating equi-join at
``03_customer_feedback_etl.py:102`` silently degrades if inference yields
string on one side). This engine declares every boundary schema once.

Layer A (raw-zone Blinkit-domain CSV inputs) is reverse-engineered
column-by-column from the reference's read/use sites; citations live in
FIXTURES.md. Layer B (the testdata mapping) lives in
``sources/testdata.py``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Layer A: raw-zone input schemas (CSV with header) -----------------

ORDERS = T.StructType(
    [
        T.StructField("order_id", T.StringType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("order_date", T.StringType()),  # parsed via to_timestamp downstream
        T.StructField("delivery_status", T.StringType()),
        T.StructField("delivery_partner_id", T.StringType()),
        T.StructField("delivery_time_hours", T.DoubleType()),
        T.StructField("distance_km", T.DoubleType()),
        T.StructField("is_delayed", T.IntegerType()),
    ]
)

ORDER_ITEMS = T.StructType(
    [
        T.StructField("order_id", T.StringType()),
        T.StructField("product_id", T.StringType()),
        T.StructField("quantity", T.IntegerType()),
        T.StructField("unit_price", T.DoubleType()),
    ]
)

PRODUCTS = T.StructType(
    [
        T.StructField("product_id", T.StringType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("margin_percentage", T.DoubleType()),
    ]
)

CUSTOMERS = T.StructType(
    [
        T.StructField("customer_id", T.StringType()),
        T.StructField("area", T.StringType()),
        T.StructField("customer_segment", T.StringType()),
    ]
)

FEEDBACK = T.StructType(
    [
        T.StructField("feedback_id", T.StringType()),
        T.StructField("order_id", T.StringType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("rating", T.IntegerType()),
        T.StructField("sentiment", T.StringType()),
        T.StructField("feedback_date", T.StringType()),
    ]
)

MARKETING = T.StructType(
    [
        T.StructField("campaign_id", T.StringType()),
        T.StructField("campaign_name", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("impressions", T.LongType()),
        T.StructField("clicks", T.LongType()),
        T.StructField("conversions", T.LongType()),
        T.StructField("spend", T.DoubleType()),
        T.StructField("revenue_generated", T.DoubleType()),
    ]
)

INVENTORY = T.StructType(
    [
        T.StructField("product_id", T.StringType()),
        T.StructField("date", T.StringType()),  # parsed via to_date downstream
        T.StructField("stock_received", T.IntegerType()),
        T.StructField("damaged_stock", T.IntegerType()),
    ]
)

RAW_SCHEMAS: dict[str, T.StructType] = {
    "orders": ORDERS,
    "order_items": ORDER_ITEMS,
    "products": PRODUCTS,
    "customers": CUSTOMERS,
    "feedback": FEEDBACK,
    "marketing": MARKETING,
    "inventory": INVENTORY,
}

# --- North-star extension schemas --------------------------------------

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON string -> from_json
    ]
)

# Multimodal (north star): opaque payload + typed metadata. The decode
# step is stubbed (no image/audio libs in the container) but the schema,
# partitioning, and UDF plumbing are real — see operators/multimodal.py.
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)
