"""Parity query plans: reference semantics → (Spark fn, DuckDB oracle).

Each entry pairs an idiomatic-PySpark implementation with an ANSI-SQL
oracle that DuckDB runs over the same parquet. Parity discipline:

- The testdata→Blinkit mapping is ONE shared SQL text
  (``sources.testdata.MAPPING``) executed by both engines.
- The six reference analytic queries are dialect-normalized once
  (``::float`` → CAST, deterministic LIMIT tiebreaks) and the SAME final
  SELECT text runs on a Spark temp view and as the oracle's outer query.
- Deterministic dedup: Spark ``row_number`` tiebreak order == the
  oracle's ``QUALIFY`` ORDER BY (column order of the mapped views).
- Aggregate edges rounded / integer sums cast BIGINT on both sides
  (operators/agg.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import agg
from ..pipelines import (
    customer_feedback,
    delivery_performance,
    inventory_recon,
    marketing_roi,
    sales_revenue,
)
from ..sources import readers
from ..sources.testdata import oracle_with_clause, register_blinkit

# ----------------------------------------------------------------------
# Shared oracle CTE fragments (DuckDB side). Column lists and alias
# names mirror the DataFrame builders exactly.
# ----------------------------------------------------------------------

SALES_FACT_CTE = """sales_fact AS (
  SELECT
    i.order_id, i.product_id, o.customer_id, o.order_date, o.delivery_status,
    i.quantity, i.unit_price,
    i.quantity * i.unit_price AS line_total,
    p.product_name, p.category, p.price, p.margin_percentage,
    (p.price - (p.price * (1 - p.margin_percentage / 100))) * i.quantity AS profit_margin,
    CAST(year(o.order_date) AS INT)  AS year,
    CAST(month(o.order_date) AS INT) AS month,
    CAST(day(o.order_date) AS INT)   AS day
  FROM b_order_items i
  JOIN b_orders o USING (order_id)
  JOIN b_products p USING (product_id)
  WHERE i.order_id IS NOT NULL AND i.product_id IS NOT NULL AND i.quantity > 0
)"""

REVENUE_BY_CATEGORY_CTE = """curated_revenue_by_category AS (
  SELECT
    category,
    COUNT(DISTINCT order_id)                                AS total_orders,
    COUNT(DISTINCT customer_id)                             AS unique_customers,
    ROUND(SUM(line_total), 2)                               AS total_revenue,
    ROUND(SUM(profit_margin), 2)                            AS total_profit,
    ROUND(SUM(line_total) / COUNT(DISTINCT order_id), 2)    AS avg_order_value
  FROM sales_fact
  GROUP BY category
)"""

RATING_ICONS_CTE = """rating_icons AS (
  SELECT * FROM (VALUES
    (1, '⭐'), (2, '⭐⭐'), (3, '⭐⭐⭐'), (4, '⭐⭐⭐⭐'), (5, '⭐⭐⭐⭐⭐')
  ) AS t(rating, rating_icon)
)"""

ENRICHED_FEEDBACK_CTE = """enriched_feedback AS (
  SELECT
    f.feedback_id, f.order_id, f.customer_id, f.rating, f.sentiment,
    f.feedback_date,
    CASE WHEN lower(f.sentiment) IN ('positive', 'good', 'excellent') THEN 'Positive'
         WHEN lower(f.sentiment) IN ('negative', 'bad', 'poor')       THEN 'Negative'
         WHEN lower(f.sentiment) IN ('neutral', 'average', 'okay')    THEN 'Neutral'
         ELSE 'Unknown' END AS sentiment_normalized,
    CASE WHEN lower(f.sentiment) IN ('positive', 'good', 'excellent') THEN 1
         WHEN lower(f.sentiment) IN ('negative', 'bad', 'poor')       THEN -1
         ELSE 0 END AS sentiment_score,
    ri.rating_icon,
    c.area, c.customer_segment,
    o.order_date, o.delivery_status,
    CAST(year(f.feedback_date) AS INT)  AS year,
    CAST(month(f.feedback_date) AS INT) AS month
  FROM b_feedback f
  LEFT JOIN rating_icons ri USING (rating)
  LEFT JOIN b_customers c USING (customer_id)
  LEFT JOIN (SELECT order_id, order_date, delivery_status FROM b_orders) o USING (order_id)
)"""

AREA_FEEDBACK_CTE = """curated_area_feedback_metrics AS (
  SELECT * ,
    positive_count / total_feedback AS satisfaction_rate
  FROM (
    SELECT
      area,
      COUNT(feedback_id)  AS total_feedback,
      AVG(rating)         AS avg_rating,
      CAST(SUM(CASE WHEN sentiment_normalized = 'Positive' THEN 1 ELSE 0 END) AS BIGINT) AS positive_count,
      CAST(SUM(CASE WHEN sentiment_normalized = 'Negative' THEN 1 ELSE 0 END) AS BIGINT) AS negative_count,
      AVG(sentiment_score) AS avg_sentiment_score
    FROM enriched_feedback
    GROUP BY area
  )
)"""

MARKETING_KPIS_CTE = """marketing_kpis AS (
  SELECT *,
    (conversion_rate * CAST(0.4 AS DOUBLE))
      + (roas_calculated * 10 * CAST(0.4 AS DOUBLE))
      + (ctr * CAST(0.2 AS DOUBLE)) AS effectiveness_score
  FROM (
    SELECT *,
      CASE WHEN impressions > 0 THEN (clicks / impressions) * 100 ELSE CAST(0 AS DOUBLE) END AS ctr,
      CASE WHEN clicks > 0 THEN (conversions / clicks) * 100 ELSE CAST(0 AS DOUBLE) END AS conversion_rate,
      CASE WHEN clicks > 0 THEN spend / clicks ELSE CAST(0 AS DOUBLE) END AS cpc,
      CASE WHEN conversions > 0 THEN spend / conversions ELSE CAST(0 AS DOUBLE) END AS cpa,
      CASE WHEN spend > 0 THEN revenue_generated / spend ELSE CAST(0 AS DOUBLE) END AS roas_calculated,
      CASE WHEN spend > 0 THEN ((revenue_generated - spend) / spend) * 100 ELSE CAST(0 AS DOUBLE) END AS roi_percentage
    FROM (
      SELECT * FROM b_marketing
      WHERE campaign_id IS NOT NULL AND date IS NOT NULL
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY campaign_id, date
        ORDER BY campaign_name ASC NULLS LAST, channel ASC NULLS LAST,
                 impressions ASC NULLS LAST, clicks ASC NULLS LAST,
                 conversions ASC NULLS LAST, spend ASC NULLS LAST,
                 revenue_generated ASC NULLS LAST
      ) = 1
    )
  )
)"""

CAMPAIGN_SUMMARY_CTE = """curated_campaign_performance_summary AS (
  SELECT
    campaign_id, campaign_name, channel,
    ROUND(SUM(spend), 2)                    AS total_spend,
    ROUND(SUM(revenue_generated), 2)        AS total_revenue,
    CAST(SUM(conversions) AS BIGINT)        AS total_conversions,
    ROUND(AVG(ctr), 4)                      AS avg_ctr,
    ROUND(AVG(conversion_rate), 4)          AS avg_conversion_rate,
    ROUND(AVG(roas_calculated), 4)          AS avg_roas,
    ROUND(CASE WHEN SUM(spend) > 0
               THEN ((SUM(revenue_generated) - SUM(spend)) / SUM(spend)) * 100
               ELSE CAST(0 AS DOUBLE) END, 2) AS overall_roi
  FROM marketing_kpis
  GROUP BY campaign_id, campaign_name, channel
)"""

DELIVERY_PERF_CTE = """curated_delivery_partner_performance AS (
  SELECT
    delivery_partner_id,
    COUNT(*)                                   AS total_deliveries,
    CAST(SUM(is_delayed) AS BIGINT)            AS delayed_deliveries,
    ROUND((SUM(is_delayed) / COUNT(*)) * 100, 2) AS delay_percentage,
    ROUND(AVG(delivery_time_hours), 2)         AS avg_delivery_time,
    ROUND(AVG(distance_km), 2)                 AS avg_distance
  FROM b_orders
  WHERE order_id IS NOT NULL AND delivery_partner_id IS NOT NULL
  GROUP BY delivery_partner_id
)"""

_INV_DEDUP = """(SELECT * FROM {src}
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY product_id, date
    ORDER BY stock_received ASC NULLS LAST, damaged_stock ASC NULLS LAST
  ) = 1)"""

INVENTORY_RECON_CTE = (
    """inventory_recon AS (
  SELECT
    r.product_id, r.date,
    r.old_stock_received, r.old_damaged_stock,
    r.new_stock_received, r.new_damaged_stock,
    r.stock_variance, r.damaged_variance, r.has_discrepancy,
    r.discrepancy_type, r.severity, r.severity_rank,
    p.product_name, p.category, p.price,
    abs(r.stock_variance) * COALESCE(p.price, CAST(0 AS DOUBLE)) AS financial_impact
  FROM (
    SELECT *,
      CASE WHEN stock_variance != 0 AND damaged_variance != 0 THEN 'Both Stock and Damaged Mismatch'
           WHEN stock_variance != 0 THEN 'Stock Mismatch'
           WHEN damaged_variance != 0 THEN 'Damaged Stock Mismatch'
           ELSE 'No Discrepancy' END AS discrepancy_type,
      CASE WHEN abs(stock_variance) > 100 THEN 'Critical'
           WHEN abs(stock_variance) > 50  THEN 'High'
           WHEN abs(stock_variance) > 10  THEN 'Medium'
           ELSE 'Low' END AS severity,
      CASE WHEN abs(stock_variance) > 100 THEN 4
           WHEN abs(stock_variance) > 50  THEN 3
           WHEN abs(stock_variance) > 10  THEN 2
           ELSE 1 END AS severity_rank
    FROM (
      SELECT *,
        CASE WHEN stock_variance != 0 OR damaged_variance != 0 THEN 1 ELSE 0 END AS has_discrepancy
      FROM (
        SELECT
          COALESCE(o.product_id, n.product_id) AS product_id,
          COALESCE(o.date, n.date)             AS date,
          o.stock_received  AS old_stock_received,
          o.damaged_stock   AS old_damaged_stock,
          n.stock_received  AS new_stock_received,
          n.damaged_stock   AS new_damaged_stock,
          COALESCE(n.stock_received, 0) - COALESCE(o.stock_received, 0) AS stock_variance,
          COALESCE(n.damaged_stock, 0) - COALESCE(o.damaged_stock, 0)   AS damaged_variance
        FROM """
    + _INV_DEDUP.format(src="b_inventory_old")
    + """ o
        FULL OUTER JOIN """
    + _INV_DEDUP.format(src="b_inventory_new")
    + """ n
        ON o.product_id = n.product_id AND o.date = n.date
      )
    )
  ) r
  LEFT JOIN (SELECT product_id, product_name, category, price FROM b_products) p
    USING (product_id)
)"""
)

CATEGORY_IMPACT_CTE = """curated_category_inventory_impact AS (
  SELECT
    category,
    ROUND(SUM(financial_impact), 2)   AS total_impact,
    COUNT(DISTINCT product_id)        AS affected_products,
    ROUND(AVG(stock_variance), 4)     AS avg_stock_variance,
    ROUND(AVG(damaged_variance), 4)   AS avg_damaged_variance
  FROM inventory_recon
  WHERE has_discrepancy = 1
  GROUP BY category
)"""

PRODUCT_DISCREPANCIES_CTE = """curated_product_inventory_discrepancies AS (
  SELECT
    product_id, product_name, category,
    discrepancy_occurrences, total_stock_variance, total_damaged_variance,
    total_impact,
    CASE max_severity_rank WHEN 4 THEN 'Critical' WHEN 3 THEN 'High'
         WHEN 2 THEN 'Medium' WHEN 1 THEN 'Low' ELSE 'None' END AS max_severity
  FROM (
    SELECT
      product_id, product_name, category,
      COUNT(*)                                  AS discrepancy_occurrences,
      CAST(SUM(stock_variance) AS BIGINT)       AS total_stock_variance,
      CAST(SUM(damaged_variance) AS BIGINT)     AS total_damaged_variance,
      ROUND(SUM(financial_impact), 2)           AS total_impact,
      MAX(severity_rank)                        AS max_severity_rank
    FROM inventory_recon
    WHERE has_discrepancy = 1
    GROUP BY product_id, product_name, category
  )
)"""

# ----------------------------------------------------------------------
# The six analytic queries — dialect-normalized ONCE, shared verbatim by
# Spark (over temp views) and DuckDB (over the CTEs above).
# Normalizations vs the reference files (SURVEY.md §2.13):
#   - customer_satisfaction.sql: `positive_count::float` → CAST AS DOUBLE.
#   - inventory_discrepancies.sql: deterministic top-k tiebreak
#     `, product_id` appended to ORDER BY (LIMIT 15 is order-sensitive).
# ----------------------------------------------------------------------

CUSTOMER_METRICS_SQL = """SELECT
    category,
    total_orders,
    unique_customers,
    ROUND(total_revenue, 2) AS total_revenue,
    ROUND(total_profit, 2) AS total_profit,
    ROUND(avg_order_value, 2) AS avg_order_value,
    ROUND((total_revenue / unique_customers), 2) AS revenue_per_customer,
    ROUND((total_profit / unique_customers), 2) AS profit_per_customer,
    ROUND((CAST(total_orders AS DOUBLE) / unique_customers), 2) AS avg_orders_per_customer,
    ROUND(((total_profit / total_revenue) * 100), 2) AS profit_margin_percentage
FROM curated_revenue_by_category
ORDER BY total_profit DESC"""

CUSTOMER_SATISFACTION_SQL = """SELECT
    area,
    total_feedback,
    ROUND(avg_rating, 2) AS avg_rating,
    positive_count,
    negative_count,
    ROUND(satisfaction_rate * 100, 2) AS satisfaction_percentage,
    ROUND(avg_sentiment_score, 2) AS sentiment_score,
    ROUND((CAST(positive_count AS DOUBLE) / total_feedback) * 100, 2) AS positive_feedback_percentage
FROM curated_area_feedback_metrics
ORDER BY satisfaction_rate DESC"""

CAMPAIGN_ROI_SQL = """SELECT
    campaign_id,
    campaign_name,
    channel,
    ROUND(total_spend, 2) AS spend,
    ROUND(total_revenue, 2) AS revenue,
    total_conversions,
    ROUND(avg_ctr, 4) AS ctr,
    ROUND(avg_conversion_rate, 4) AS conversion_rate,
    ROUND(overall_roi, 2) AS roi_percentage,
    ROUND(avg_roas, 2) AS roas
FROM curated_campaign_performance_summary
ORDER BY overall_roi DESC"""

DELIVERY_PARTNER_SQL = """SELECT
    delivery_partner_id,
    total_deliveries,
    delayed_deliveries,
    ROUND(delay_percentage, 2) AS delay_percentage,
    ROUND(avg_delivery_time, 2) AS avg_delivery_time_hours,
    ROUND(avg_distance, 2) AS avg_distance_km,
    CASE
        WHEN delay_percentage > 10 THEN 'High Risk'
        WHEN delay_percentage > 5 THEN 'Medium Risk'
        ELSE 'Low Risk'
    END AS performance_tier
FROM curated_delivery_partner_performance
ORDER BY delay_percentage DESC"""

INVENTORY_AND_REVENUE_SQL = """SELECT
    c.category,
    c.total_impact AS inventory_impact_loss,
    c.affected_products,
    c.avg_stock_variance,
    c.avg_damaged_variance,
    r.total_revenue,
    r.total_profit,
    r.total_orders,
    ROUND((c.total_impact / r.total_revenue) * 100, 2) AS impact_percentage_of_revenue
FROM curated_category_inventory_impact c
LEFT JOIN curated_revenue_by_category r ON c.category = r.category
ORDER BY c.total_impact DESC"""

INVENTORY_DISCREPANCIES_SQL = """SELECT
    product_id,
    product_name,
    category,
    discrepancy_occurrences,
    total_stock_variance,
    total_damaged_variance,
    ROUND(total_impact, 2) AS total_impact,
    max_severity,
    ROUND(total_impact / discrepancy_occurrences, 2) AS avg_impact_per_occurrence
FROM curated_product_inventory_discrepancies
WHERE total_impact > 0
ORDER BY total_impact DESC, product_id
LIMIT 15"""


# ----------------------------------------------------------------------
# Spark-side builders (DataFrame API; temp views for the shared SQL).
# ----------------------------------------------------------------------

def _sales_fact_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_blinkit(spark, sf_dir)
    return sales_revenue.sales_fact(t["b_orders"], t["b_order_items"], t["b_products"])


def _enriched_feedback_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_blinkit(spark, sf_dir)
    return customer_feedback.enriched_feedback(
        t["b_feedback"], t["b_customers"], t["b_orders"], readers.rating_icons(spark)
    )


def _recon_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_blinkit(spark, sf_dir)
    return inventory_recon.reconcile(
        t["b_inventory_old"], t["b_inventory_new"], t["b_products"]
    )


ENRICHED_FEEDBACK_COLUMNS = [
    "feedback_id", "order_id", "customer_id", "rating", "sentiment",
    "feedback_date", "sentiment_normalized", "sentiment_score", "rating_icon",
    "area", "customer_segment", "order_date", "delivery_status", "year", "month",
]


def q_sales_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sales_fact_df(spark, sf_dir)


def q_revenue_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.revenue_by_category(_sales_fact_df(spark, sf_dir))


def q_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg.revenue_by_category(_sales_fact_df(spark, sf_dir)).createOrReplaceTempView(
        "curated_revenue_by_category"
    )
    return spark.sql(CUSTOMER_METRICS_SQL)


def q_enriched_feedback(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _enriched_feedback_df(spark, sf_dir).select(*ENRICHED_FEEDBACK_COLUMNS)


def q_area_feedback_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.area_feedback_metrics(_enriched_feedback_df(spark, sf_dir))


def q_customer_satisfaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg.area_feedback_metrics(_enriched_feedback_df(spark, sf_dir)).createOrReplaceTempView(
        "curated_area_feedback_metrics"
    )
    return spark.sql(CUSTOMER_SATISFACTION_SQL)


MARKETING_KPI_COLUMNS = [
    "campaign_id", "campaign_name", "channel", "date",
    "impressions", "clicks", "conversions", "spend", "revenue_generated",
    "ctr", "conversion_rate", "cpc", "cpa", "roas_calculated",
    "roi_percentage", "effectiveness_score", "year", "month",
]


def q_marketing_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_blinkit(spark, sf_dir)
    return marketing_roi.marketing_kpis(t["b_marketing"]).select(*MARKETING_KPI_COLUMNS)


def q_campaign_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_blinkit(spark, sf_dir)
    return agg.campaign_performance_summary(marketing_roi.marketing_kpis(t["b_marketing"]))


def q_campaign_roi(spark: SparkSession, sf_dir: str) -> DataFrame:
    q_campaign_performance(spark, sf_dir).createOrReplaceTempView(
        "curated_campaign_performance_summary"
    )
    return spark.sql(CAMPAIGN_ROI_SQL)


def q_delivery_partner_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_blinkit(spark, sf_dir)
    return delivery_performance.partner_performance(t["b_orders"])


def q_delivery_partner(spark: SparkSession, sf_dir: str) -> DataFrame:
    q_delivery_partner_performance(spark, sf_dir).createOrReplaceTempView(
        "curated_delivery_partner_performance"
    )
    return spark.sql(DELIVERY_PARTNER_SQL)


def q_inventory_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _recon_df(spark, sf_dir)


def q_category_inventory_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.category_inventory_impact(_recon_df(spark, sf_dir))


def q_product_inventory_discrepancies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.product_inventory_discrepancies(_recon_df(spark, sf_dir))


def q_inventory_discrepancies(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg.product_inventory_discrepancies(_recon_df(spark, sf_dir)).createOrReplaceTempView(
        "curated_product_inventory_discrepancies"
    )
    return spark.sql(INVENTORY_DISCREPANCIES_SQL)


def q_inventory_and_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    recon = _recon_df(spark, sf_dir)
    agg.category_inventory_impact(recon).createOrReplaceTempView(
        "curated_category_inventory_impact"
    )
    fact = _sales_fact_df(spark, sf_dir)
    agg.revenue_by_category(fact).createOrReplaceTempView("curated_revenue_by_category")
    return spark.sql(INVENTORY_AND_REVENUE_SQL)


def q_top_products_per_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 window surface: per-category product revenue ranking, top-3.

    row_number is made deterministic with a product_id tiebreak;
    rank/dense_rank use the semantic order alone so revenue ties share
    a rank.
    """
    from ..operators import window as W

    rev = (
        _sales_fact_df(spark, sf_dir)
        .groupBy("category", "product_id", "product_name")
        .agg(F.round(F.sum("line_total"), 2).alias("product_revenue"))
    )
    ranked = W.with_ranks(
        rev,
        ["category"],
        [F.col("product_revenue").desc()],
        [F.col("product_id").asc()],
    )
    return ranked.filter(F.col("row_num") <= 3)


def q_customer_order_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op surface (§2.8 note): semi/anti joins + union, per segment."""
    t = register_blinkit(spark, sf_dir)
    cust, ords = t["b_customers"], t["b_orders"]
    with_orders = cust.join(ords, "customer_id", "left_semi").withColumn(
        "presence", F.lit("with_orders")
    )
    without = cust.join(ords, "customer_id", "left_anti").withColumn(
        "presence", F.lit("without_orders")
    )
    return (
        with_orders.unionByName(without)
        .groupBy("customer_segment", "presence")
        .agg(F.countDistinct("customer_id").alias("n_customers"))
    )


def q_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 note: CUBE grouping sets — all 4 subsets of (category, year)."""
    fact = _sales_fact_df(spark, sf_dir)
    return fact.cube("category", "year").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("line_total"), 2).alias("total_revenue"),
        F.grouping_id().cast("int").alias("gid"),
    )


def q_delay_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op surface beyond semi/anti: INTERSECT (distinct) and
    EXCEPT ALL (multiset) over delayed vs on-time order customers.

    ``exceptAll`` keeps multiplicity — a customer with 3 delayed and 1
    on-time order contributes 2 ``delayed_excess`` rows before the
    regroup — semantics a join can't express without explicit counting.
    """
    t = register_blinkit(spark, sf_dir)
    orders = t["b_orders"]
    delayed = orders.filter(F.col("is_delayed") == 1).select("customer_id")
    ontime = orders.filter(F.col("is_delayed") == 0).select("customer_id")
    both = delayed.intersect(ontime).select(
        "customer_id",
        F.lit("in_both").alias("kind"),
        F.lit(1).cast("bigint").alias("n"),
    )
    excess = (
        delayed.exceptAll(ontime)
        .groupBy("customer_id")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select("customer_id", F.lit("delayed_excess").alias("kind"), "n")
    )
    return both.unionByName(excess)


def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 note: ROLLUP grouping sets — (category, year), (category), ().

    ``grouping_id`` disambiguates real NULL keys from subtotal rows —
    the standard way to make rollup output unambiguous (and hashable by
    the driver comparator).
    """
    fact = _sales_fact_df(spark, sf_dir)
    return (
        fact.rollup("category", "year")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("line_total"), 2).alias("total_revenue"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


def q_sentiment_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 note: pivot — per-area sentiment counts as columns.

    Explicit pivot values (never inferred: inference costs an extra
    distinct scan and makes the output schema data-dependent).
    """
    enriched = _enriched_feedback_df(spark, sf_dir)
    return (
        enriched.groupBy("area")
        .pivot("sentiment_normalized", ["Positive", "Negative", "Neutral", "Unknown"])
        .count()
        .na.fill(0, ["Positive", "Negative", "Neutral", "Unknown"])
        .withColumnRenamed("Positive", "n_positive")
        .withColumnRenamed("Negative", "n_negative")
        .withColumnRenamed("Neutral", "n_neutral")
        .withColumnRenamed("Unknown", "n_unknown")
    )


REVENUE_ROLLUP_SQL = """SELECT category, year,
  CAST(count(*) AS BIGINT) AS n_rows,
  ROUND(SUM(line_total), 2) AS total_revenue,
  CAST(GROUPING(category, year) AS INT) AS gid
FROM sales_fact
GROUP BY ROLLUP(category, year)"""

SENTIMENT_PIVOT_SQL = """SELECT area,
  CAST(COALESCE(SUM(CASE WHEN sentiment_normalized = 'Positive' THEN 1 END), 0) AS BIGINT) AS n_positive,
  CAST(COALESCE(SUM(CASE WHEN sentiment_normalized = 'Negative' THEN 1 END), 0) AS BIGINT) AS n_negative,
  CAST(COALESCE(SUM(CASE WHEN sentiment_normalized = 'Neutral' THEN 1 END), 0) AS BIGINT) AS n_neutral,
  CAST(COALESCE(SUM(CASE WHEN sentiment_normalized = 'Unknown' THEN 1 END), 0) AS BIGINT) AS n_unknown
FROM enriched_feedback
GROUP BY area"""


TOP_PRODUCTS_CTE = """prod_rev AS (
  SELECT category, product_id, product_name,
    ROUND(SUM(line_total), 2) AS product_revenue
  FROM sales_fact GROUP BY category, product_id, product_name
)"""

TOP_PRODUCTS_SQL = """SELECT * FROM (
  SELECT *,
    CAST(row_number() OVER (PARTITION BY category
      ORDER BY product_revenue DESC, product_id ASC) AS INT) AS row_num,
    CAST(rank() OVER (PARTITION BY category
      ORDER BY product_revenue DESC) AS INT) AS rnk,
    CAST(dense_rank() OVER (PARTITION BY category
      ORDER BY product_revenue DESC) AS INT) AS dense_rnk
  FROM prod_rev
) WHERE row_num <= 3"""

CUSTOMER_PRESENCE_SQL = """SELECT customer_segment, presence,
  COUNT(DISTINCT customer_id) AS n_customers
FROM (
  SELECT c.*, 'with_orders' AS presence FROM b_customers c
  WHERE EXISTS (SELECT 1 FROM b_orders o WHERE o.customer_id = c.customer_id)
  UNION ALL
  SELECT c.*, 'without_orders' AS presence FROM b_customers c
  WHERE NOT EXISTS (SELECT 1 FROM b_orders o WHERE o.customer_id = c.customer_id)
)
GROUP BY customer_segment, presence"""

REVENUE_CUBE_SQL = """SELECT category, year,
  CAST(count(*) AS BIGINT) AS n_rows,
  ROUND(SUM(line_total), 2) AS total_revenue,
  CAST(GROUPING(category, year) AS INT) AS gid
FROM sales_fact
GROUP BY CUBE(category, year)"""

DELAY_SETOPS_CTES = (
    "delayed AS (SELECT customer_id FROM b_orders WHERE is_delayed = 1)",
    "ontime AS (SELECT customer_id FROM b_orders WHERE is_delayed = 0)",
)

DELAY_SETOPS_SQL = """SELECT customer_id, 'in_both' AS kind, CAST(1 AS BIGINT) AS n
FROM (SELECT customer_id FROM delayed INTERSECT SELECT customer_id FROM ontime)
UNION ALL
SELECT customer_id, 'delayed_excess' AS kind, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT customer_id FROM delayed EXCEPT ALL SELECT customer_id FROM ontime)
GROUP BY customer_id"""


# ----------------------------------------------------------------------
# Oracle SQL assembly.
# ----------------------------------------------------------------------

def _oracle(maps: tuple[str, ...], ctes: tuple[str, ...], final: str) -> str:
    head = oracle_with_clause(*maps)
    if ctes:
        head = head + ",\n" + ",\n".join(ctes)
    return f"{head}\n{final}"


_SALES_MAPS = ("b_orders", "b_order_items", "b_products")
_FEEDBACK_MAPS = ("b_feedback", "b_customers", "b_orders")
_INV_MAPS = ("b_inventory_old", "b_inventory_new", "b_products")

ORACLES: dict[str, str] = {
    "sales_fact": _oracle(_SALES_MAPS, (SALES_FACT_CTE,), "SELECT * FROM sales_fact"),
    "revenue_by_category": _oracle(
        _SALES_MAPS,
        (SALES_FACT_CTE, REVENUE_BY_CATEGORY_CTE),
        "SELECT * FROM curated_revenue_by_category",
    ),
    "customer_metrics": _oracle(
        _SALES_MAPS, (SALES_FACT_CTE, REVENUE_BY_CATEGORY_CTE), CUSTOMER_METRICS_SQL
    ),
    "enriched_feedback": _oracle(
        _FEEDBACK_MAPS,
        (RATING_ICONS_CTE, ENRICHED_FEEDBACK_CTE),
        "SELECT * FROM enriched_feedback",
    ),
    "area_feedback_metrics": _oracle(
        _FEEDBACK_MAPS,
        (RATING_ICONS_CTE, ENRICHED_FEEDBACK_CTE, AREA_FEEDBACK_CTE),
        "SELECT * FROM curated_area_feedback_metrics",
    ),
    "customer_satisfaction": _oracle(
        _FEEDBACK_MAPS,
        (RATING_ICONS_CTE, ENRICHED_FEEDBACK_CTE, AREA_FEEDBACK_CTE),
        CUSTOMER_SATISFACTION_SQL,
    ),
    "marketing_kpis": _oracle(
        ("b_marketing",),
        (MARKETING_KPIS_CTE,),
        "SELECT campaign_id, campaign_name, channel, date, impressions, clicks, "
        "conversions, spend, revenue_generated, ctr, conversion_rate, cpc, cpa, "
        "roas_calculated, roi_percentage, effectiveness_score, "
        "CAST(year(date) AS INT) AS year, CAST(month(date) AS INT) AS month "
        "FROM marketing_kpis",
    ),
    "campaign_performance": _oracle(
        ("b_marketing",),
        (MARKETING_KPIS_CTE, CAMPAIGN_SUMMARY_CTE),
        "SELECT * FROM curated_campaign_performance_summary",
    ),
    "campaign_roi": _oracle(
        ("b_marketing",), (MARKETING_KPIS_CTE, CAMPAIGN_SUMMARY_CTE), CAMPAIGN_ROI_SQL
    ),
    "delivery_partner_performance": _oracle(
        ("b_orders",), (DELIVERY_PERF_CTE,), "SELECT * FROM curated_delivery_partner_performance"
    ),
    "delivery_partner": _oracle(("b_orders",), (DELIVERY_PERF_CTE,), DELIVERY_PARTNER_SQL),
    "inventory_reconciliation": _oracle(
        _INV_MAPS, (INVENTORY_RECON_CTE,), "SELECT * FROM inventory_recon"
    ),
    "category_inventory_impact": _oracle(
        _INV_MAPS,
        (INVENTORY_RECON_CTE, CATEGORY_IMPACT_CTE),
        "SELECT * FROM curated_category_inventory_impact",
    ),
    "product_inventory_discrepancies": _oracle(
        _INV_MAPS,
        (INVENTORY_RECON_CTE, PRODUCT_DISCREPANCIES_CTE),
        "SELECT * FROM curated_product_inventory_discrepancies",
    ),
    "inventory_discrepancies": _oracle(
        _INV_MAPS,
        (INVENTORY_RECON_CTE, PRODUCT_DISCREPANCIES_CTE),
        INVENTORY_DISCREPANCIES_SQL,
    ),
    "inventory_and_revenue": _oracle(
        ("b_inventory_old", "b_inventory_new", "b_products", "b_orders", "b_order_items"),
        (
            INVENTORY_RECON_CTE,
            CATEGORY_IMPACT_CTE,
            SALES_FACT_CTE,
            REVENUE_BY_CATEGORY_CTE,
        ),
        INVENTORY_AND_REVENUE_SQL,
    ),
    "top_products_per_category": _oracle(
        _SALES_MAPS, (SALES_FACT_CTE, TOP_PRODUCTS_CTE), TOP_PRODUCTS_SQL
    ),
    "customer_order_presence": _oracle(
        ("b_customers", "b_orders"), (), CUSTOMER_PRESENCE_SQL
    ),
    "revenue_rollup": _oracle(_SALES_MAPS, (SALES_FACT_CTE,), REVENUE_ROLLUP_SQL),
    "revenue_cube": _oracle(_SALES_MAPS, (SALES_FACT_CTE,), REVENUE_CUBE_SQL),
    "delay_setops": _oracle(("b_orders",), DELAY_SETOPS_CTES, DELAY_SETOPS_SQL),
    "sentiment_pivot": _oracle(
        _FEEDBACK_MAPS,
        (RATING_ICONS_CTE, ENRICHED_FEEDBACK_CTE),
        SENTIMENT_PIVOT_SQL,
    ),
}

QUERIES = {
    "sales_fact": q_sales_fact,
    "revenue_by_category": q_revenue_by_category,
    "customer_metrics": q_customer_metrics,
    "enriched_feedback": q_enriched_feedback,
    "area_feedback_metrics": q_area_feedback_metrics,
    "customer_satisfaction": q_customer_satisfaction,
    "marketing_kpis": q_marketing_kpis,
    "campaign_performance": q_campaign_performance,
    "campaign_roi": q_campaign_roi,
    "delivery_partner_performance": q_delivery_partner_performance,
    "delivery_partner": q_delivery_partner,
    "inventory_reconciliation": q_inventory_reconciliation,
    "category_inventory_impact": q_category_inventory_impact,
    "product_inventory_discrepancies": q_product_inventory_discrepancies,
    "inventory_discrepancies": q_inventory_discrepancies,
    "inventory_and_revenue": q_inventory_and_revenue,
    "top_products_per_category": q_top_products_per_category,
    "customer_order_presence": q_customer_order_presence,
    "revenue_rollup": q_revenue_rollup,
    "revenue_cube": q_revenue_cube,
    "delay_setops": q_delay_setops,
    "sentiment_pivot": q_sentiment_pivot,
}
