"""Semantic mapping of the driver testdata onto the Blinkit domain.

The driver provides deterministic TPC-H-ish parquet (``TESTDATA.md``):
``region nation customer supplier part orders lineitem events documents
embeddings``. The engine's queries run over Blinkit-domain tables
(orders, order_items, products, customers, feedback, marketing,
inventory_old/new — FIXTURES.md §A). This module maps one onto the other
with **pure deterministic SQL expressions written once** and executed
verbatim by BOTH Spark (``spark.sql``) and the DuckDB oracle (as CTEs) —
that shared text is what makes the driver's value-hash comparison exact.

Dialect notes (the shared subset):
- ``CAST(x AS STRING)`` is valid in both Spark SQL and DuckDB.
- Decimal literals differ (DuckDB parses ``24.0`` as DECIMAL, Spark as
  DECIMAL too but promotion rules differ) → always ``CAST(n AS DOUBLE)``.
- ``CAST(double AS INT)`` truncates in Spark but rounds in DuckDB →
  only applied to integral doubles, or via explicit FLOOR first.
- ``x % y`` on doubles is fmod in both (exact IEEE op, bit-stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# --- shared mapping SQL (identical text for Spark and DuckDB) ----------
# Keys are the Blinkit-domain view names registered for Spark; the same
# SELECTs become WITH-clauses in every oracle query.

MAPPING: dict[str, str] = {
    # orders: delivery fields synthesized deterministically (FIXTURES.md §B).
    "b_orders": """
        SELECT
          CAST(o_orderkey AS STRING)                    AS order_id,
          CAST(o_custkey AS STRING)                     AS customer_id,
          o_orderdate                                   AS order_date,
          o_orderstatus                                 AS delivery_status,
          'dp_' || CAST(o_orderkey % 10 AS STRING)      AS delivery_partner_id,
          o_totalprice % CAST(24 AS DOUBLE)             AS delivery_time_hours,
          o_totalprice % CAST(30 AS DOUBLE)             AS distance_km,
          CAST(CASE WHEN o_orderkey % 4 = 0 THEN 1 ELSE 0 END AS INT) AS is_delayed
        FROM orders
    """,
    "b_order_items": """
        SELECT
          CAST(l_orderkey AS STRING)        AS order_id,
          CAST(l_partkey AS STRING)         AS product_id,
          CAST(l_quantity AS INT)           AS quantity,
          l_extendedprice / l_quantity      AS unit_price
        FROM lineitem
    """,
    "b_products": """
        SELECT
          CAST(p_partkey AS STRING)             AS product_id,
          p_name                                AS product_name,
          p_type                                AS category,
          p_retailprice                         AS price,
          CAST(p_partkey % 40 + 5 AS DOUBLE)    AS margin_percentage
        FROM part
    """,
    "b_customers": """
        SELECT
          CAST(c_custkey AS STRING)   AS customer_id,
          c_mktsegment                AS area,
          c_mktsegment                AS customer_segment
        FROM customer
    """,
    # feedback: events re-keyed; sentiment vocabulary drawn from the
    # reference's normalization sets (03:81-87) plus unmapped noise.
    "b_feedback": """
        SELECT
          CAST(event_id AS STRING)                      AS feedback_id,
          CAST(1 + (event_id * 7) % 1500 AS STRING)     AS order_id,
          CAST(user_id AS STRING)                       AS customer_id,
          CAST(1 + event_id % 5 AS INT)                 AS rating,
          CASE CAST(event_id % 9 AS INT)
            WHEN 0 THEN 'positive' WHEN 1 THEN 'good'    WHEN 2 THEN 'excellent'
            WHEN 3 THEN 'negative' WHEN 4 THEN 'bad'     WHEN 5 THEN 'poor'
            WHEN 6 THEN 'neutral'  WHEN 7 THEN 'average' ELSE 'meh'
          END                                           AS sentiment,
          ts                                            AS feedback_date
        FROM events
    """,
    # marketing: per-campaign-day KPI inputs; zeros occur so the
    # reference's div-by-zero guards (04:57-95) are exercised.
    "b_marketing": """
        SELECT
          'camp_' || CAST(event_id % 50 AS STRING)      AS campaign_id,
          'Campaign ' || CAST(event_id % 50 AS STRING)  AS campaign_name,
          CASE CAST(event_id % 4 AS INT)
            WHEN 0 THEN 'social' WHEN 1 THEN 'search'
            WHEN 2 THEN 'email'  ELSE 'display'
          END                                           AS channel,
          ts                                            AS date,
          CAST((event_id * 13) % 10000 AS BIGINT)       AS impressions,
          CAST((event_id * 7) % 500 AS BIGINT)          AS clicks,
          CAST((event_id * 3) % 50 AS BIGINT)           AS conversions,
          value * CAST(10 AS DOUBLE)                    AS spend,
          value * CAST(25 AS DOUBLE)                    AS revenue_generated
        FROM events
    """,
    # inventory snapshots: lineitem demuxed by l_linenumber parity
    # (stands in for the reference's filename demux, 05:39-45).
    "b_inventory_old": """
        SELECT
          CAST(l_partkey AS STRING)                     AS product_id,
          CAST(l_shipdate AS DATE)                      AS date,
          CAST(l_quantity AS INT)                       AS stock_received,
          CAST(FLOOR(l_quantity * l_discount) AS INT)   AS damaged_stock
        FROM lineitem
        WHERE l_linenumber % 2 = 1
    """,
    "b_inventory_new": """
        SELECT
          CAST(l_partkey AS STRING)                     AS product_id,
          CAST(l_shipdate AS DATE)                      AS date,
          CAST(l_quantity AS INT)                       AS stock_received,
          CAST(FLOOR(l_quantity * l_discount) AS INT)   AS damaged_stock
        FROM lineitem
        WHERE l_linenumber % 2 = 0
    """,
}


# Registration memo: view setup is pure (same parquet → same views), but
# each spark.read.parquet costs a driver-side footer read (~0.5 s) and
# re-analyzing 8 mapping views adds more — a fixed multi-second tax PER
# QUERY if not cached. Keyed by (session id, sf_dir); invalidated
# implicitly when a new session is built.
_REGISTRY_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def register_base(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register the driver parquet tables as Spark temp views.

    ``events.ts`` has shipped as either TIMESTAMP(NANOS) (older driver
    testdata: Spark can't read it natively — with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a long we
    convert to a micros timestamp) or plain ``timestamp[us]`` without a
    UTC flag (current testdata: Spark reads TIMESTAMP_NTZ). Both are
    normalized to the session-TZ (UTC) TIMESTAMP type so downstream
    ``unix_micros``/window math type-checks; the values are identical
    either way, and DuckDB reads the same column as naive-UTC micros.
    """
    key = (id(spark), f"base::{sf_dir}")
    if key in _REGISTRY_CACHE:
        return _REGISTRY_CACHE[key]
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # non-settable on some builds; session.py sets it at build time
    out: dict[str, DataFrame] = {}
    for name in BASE_TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            ts_type = dict(df.dtypes).get("ts")
            if ts_type == "bigint":  # TIMESTAMP(NANOS) read via nanosAsLong
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif ts_type == "timestamp_ntz":  # timestamp[us], no UTC flag
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        df.createOrReplaceTempView(name)
        out[name] = df
    _REGISTRY_CACHE[key] = out
    return out


def register_blinkit(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register base + Blinkit-domain mapping views; return the mapped DFs.

    The mapping is lazy (plain Catalyst views) — filters/projections on
    the Blinkit views push straight down to the parquet scans.
    """
    key = (id(spark), f"blinkit::{sf_dir}")
    if key in _REGISTRY_CACHE:
        return _REGISTRY_CACHE[key]
    register_base(spark, sf_dir)
    out: dict[str, DataFrame] = {}
    for name, sql in MAPPING.items():
        df = spark.sql(sql)
        df.createOrReplaceTempView(name)
        out[name] = df
    _REGISTRY_CACHE[key] = out
    return out


def oracle_with_clause(*names: str) -> str:
    """``WITH`` prefix for an oracle query needing the given mapped views."""
    parts = [f"{n} AS ({MAPPING[n]})" for n in names]
    return "WITH " + ",\n".join(parts)
