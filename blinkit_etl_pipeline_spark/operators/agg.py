"""Aggregate builders: the written (A1-A3) and implied (IA1-IA5) curated
tables (SURVEY.md §2.5-2.6).

All are plain ``groupBy().agg(...)`` — Spark performs partial (map-side)
+ final hash aggregation automatically, so low-cardinality group keys
(category, area, channel) collapse before the shuffle.

Alias discipline: every computed column is aliased here AND identically
in the oracle SQL (plans/), because the driver's comparator sorts
columns by name before hashing. Rounding at the aggregate edge (the
reference SQL's own ROUND convention) absorbs float-summation-order
differences between Spark and DuckDB; int-derived measures are exact and
left unrounded. Integer sums are cast to BIGINT on both sides (DuckDB
sums ints into HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def area_feedback_metrics(enriched: DataFrame) -> DataFrame:
    """A1-A3: per-area feedback rollup (reference 03:132-140).

    ``satisfaction_rate`` is stored as a **fraction** (not ×100): the
    consuming SQL multiplies by 100 itself, fixing the reference's
    double-×100 bug (SURVEY.md §2.13.2).
    """
    pos = F.sum(F.when(F.col("sentiment_normalized") == "Positive", 1).otherwise(0))
    neg = F.sum(F.when(F.col("sentiment_normalized") == "Negative", 1).otherwise(0))
    total = F.count("feedback_id")
    return (
        enriched.groupBy("area")
        .agg(
            total.alias("total_feedback"),
            F.avg("rating").alias("avg_rating"),
            pos.cast("bigint").alias("positive_count"),
            neg.cast("bigint").alias("negative_count"),
            F.avg("sentiment_score").alias("avg_sentiment_score"),
        )
        .withColumn(
            "satisfaction_rate", F.col("positive_count") / F.col("total_feedback")
        )
    )


def revenue_by_category(sales_fact: DataFrame) -> DataFrame:
    """IA1: curated_revenue_by_category (consumed by customer_metrics.sql).

    Distinct-free plan: two ``countDistinct``s in one agg make Catalyst
    Expand the fact 3× before the shuffle — the dominant shuffle cost of
    this query at scale. ``order_id`` functionally determines
    ``customer_id`` (the fact joins items to exactly one order row), so
    the same measures fall out of a cascade of plain hash aggregates —
    (category, customer_id, order_id) → (category, customer_id) →
    (category) — each with map-side partial aggregation and nothing
    Expanded. Values are identical to the countDistinct spelling (the
    oracle keeps COUNT(DISTINCT ...)).
    """
    per_order = sales_fact.groupBy("category", "customer_id", "order_id").agg(
        F.sum("line_total").alias("_lt"),
        F.sum("profit_margin").alias("_pm"),
    )
    per_customer = per_order.groupBy("category", "customer_id").agg(
        F.count("*").alias("_n_orders"),
        F.sum("_lt").alias("_lt"),
        F.sum("_pm").alias("_pm"),
    )
    return per_customer.groupBy("category").agg(
        F.sum("_n_orders").alias("total_orders"),
        F.count("*").alias("unique_customers"),
        F.round(F.sum("_lt"), 2).alias("total_revenue"),
        F.round(F.sum("_pm"), 2).alias("total_profit"),
        F.round(F.sum("_lt") / F.sum("_n_orders"), 2).alias("avg_order_value"),
    )


def campaign_performance_summary(kpis: DataFrame) -> DataFrame:
    """IA2: curated_campaign_performance_summary (campaign_roi.sql:4-13).

    ``overall_roi = (Σrevenue − Σspend)/Σspend × 100`` over raw sums;
    ``avg_*`` are means of the per-day KPIs (reference 04:57-95).
    """
    sum_spend = F.sum("spend")
    sum_rev = F.sum("revenue_generated")
    return (
        kpis.groupBy("campaign_id", "campaign_name", "channel")
        .agg(
            F.round(sum_spend, 2).alias("total_spend"),
            F.round(sum_rev, 2).alias("total_revenue"),
            F.sum("conversions").cast("bigint").alias("total_conversions"),
            F.round(F.avg("ctr"), 4).alias("avg_ctr"),
            F.round(F.avg("conversion_rate"), 4).alias("avg_conversion_rate"),
            F.round(F.avg("roas_calculated"), 4).alias("avg_roas"),
            F.round(
                F.when(sum_spend > 0, (sum_rev - sum_spend) / sum_spend * 100).otherwise(
                    0.0
                ),
                2,
            ).alias("overall_roi"),
        )
    )


def delivery_partner_performance(orders: DataFrame) -> DataFrame:
    """IA3: curated_delivery_partner_performance (delivery_partner.sql:4-14).

    The reference never wrote this pipeline (script 02 is a byte-copy of
    01 — SURVEY.md §2.13.1); semantics are reconstructed from the
    consuming SQL. Conditional count via sum(is_delayed) (A2 pattern).
    """
    total = F.count("*")
    delayed = F.sum("is_delayed")
    return orders.groupBy("delivery_partner_id").agg(
        total.alias("total_deliveries"),
        delayed.cast("bigint").alias("delayed_deliveries"),
        F.round(delayed / total * 100, 2).alias("delay_percentage"),
        F.round(F.avg("delivery_time_hours"), 2).alias("avg_delivery_time"),
        F.round(F.avg("distance_km"), 2).alias("avg_distance"),
    )


def category_inventory_impact(recon: DataFrame) -> DataFrame:
    """IA4: curated_category_inventory_impact over discrepant rows
    (inventory_and_revenue.sql:4-12; filter has_discrepancy==1, 05:85).

    Distinct-free plan: ``countDistinct(product_id)`` beside plain aggs
    Expands the input 2×; regrouping through (category, product_id)
    gives the same values with two ordinary hash aggs (both partial
    map-side). AVG is reconstructed as Σ/n — same long-sum / long-count
    double division Spark's Average performs, so values are identical.
    """
    per_product = (
        recon.filter(F.col("has_discrepancy") == 1)
        .groupBy("category", "product_id")
        .agg(
            F.sum("financial_impact").alias("_fi"),
            F.sum("stock_variance").alias("_sv"),
            F.sum("damaged_variance").alias("_dv"),
            F.count("*").alias("_n"),
        )
    )
    return per_product.groupBy("category").agg(
        F.round(F.sum("_fi"), 2).alias("total_impact"),
        F.count("*").alias("affected_products"),
        F.round(F.sum("_sv") / F.sum("_n"), 4).alias("avg_stock_variance"),
        F.round(F.sum("_dv") / F.sum("_n"), 4).alias("avg_damaged_variance"),
    )


SEVERITY_FROM_RANK = (
    "CASE max_severity_rank WHEN 4 THEN 'Critical' WHEN 3 THEN 'High' "
    "WHEN 2 THEN 'Medium' WHEN 1 THEN 'Low' ELSE 'None' END"
)


def product_inventory_discrepancies(recon: DataFrame) -> DataFrame:
    """IA5: curated_product_inventory_discrepancies
    (inventory_discrepancies.sql:2-14). ``max_severity`` decodes the
    explicit ordinal rank — no lexicographic accident (SURVEY.md §7.4.3)."""
    return (
        recon.filter(F.col("has_discrepancy") == 1)
        .groupBy("product_id", "product_name", "category")
        .agg(
            F.count("*").alias("discrepancy_occurrences"),
            F.sum("stock_variance").cast("bigint").alias("total_stock_variance"),
            F.sum("damaged_variance").cast("bigint").alias("total_damaged_variance"),
            F.round(F.sum("financial_impact"), 2).alias("total_impact"),
            F.max("severity_rank").alias("max_severity_rank"),
        )
        .withColumn("max_severity", F.expr(SEVERITY_FROM_RANK))
        .drop("max_severity_rank")
    )


def basket_lift(lineitem: DataFrame, min_support: int = 2) -> DataFrame:
    """Market-basket association mining (the reference's retail
    domain): item-pair co-occurrence with support counts and exact
    integer lift — which products sell TOGETHER beyond what their
    individual popularity predicts.

    ``lift(a,b) = P(ab) / (P(a)·P(b)) = n_ab·N / (n_a·n_b)`` over
    distinct (order, part) incidences; emitted as ``lift_ppm`` (×10^6,
    truncating div — exact integer cross-engine). ``min_support``
    bounds the answer to pairs seen in ≥ that many orders.

    Scale shape: one distinct + self equi-join ON THE ORDER KEY —
    pair fan-out is per-basket-size² (bounded by the widest basket,
    never corpus²); per-item counts are a part-table-sized frame that
    broadcasts into the final joins; the order total is a one-row
    broadcast.
    """
    li = lineitem.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    tot = li.agg(F.count_distinct("o").alias("n_orders"))
    item = li.groupBy("p").agg(F.count("*").cast("long").alias("n_p"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")),
        )
        .groupBy(
            F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b")
        )
        .agg(F.count("*").cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    return (
        pairs.join(
            F.broadcast(
                item.select(
                    F.col("p").alias("part_a"), F.col("n_p").alias("n_a")
                )
            ),
            "part_a",
        )
        .join(
            F.broadcast(
                item.select(
                    F.col("p").alias("part_b"), F.col("n_p").alias("n_b")
                )
            ),
            "part_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            # numerator can exceed int64 once n_ab·n_orders passes
            # ~9.2e12 (a popular pair at a few million orders), and
            # Spark integer arithmetic silently wraps outside ANSI
            # mode — widen to DECIMAL(38,0) before multiplying
            # (IntegralDivide on decimals; the oracle mirrors it with
            # HUGEINT //, verified equal for the full int64 range)
            F.expr(
                "CAST(n_ab AS DECIMAL(38,0)) * n_orders * 1000000"
                " div (CAST(n_a AS DECIMAL(38,0)) * n_b)"
            )
            .cast("long")
            .alias("lift_ppm"),
        )
    )


def rfm_segments(orders: DataFrame) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary) with
    quartile scores from the 256-bin histogram sketch — the classic
    retail segmentation WITHOUT the global sort ``ntile`` would cost
    at warehouse scale (the histogram folds the corpus to ≤256 rows
    per measure; cutpoints are one broadcast row).

    Monetary is quantized to integer cents BEFORE bucketing (the
    double SUM's last-ulp depends on summation order; rounding to the
    cent kills it, so bin edges are derived from exact integers in
    both engines). Scores are 1-4 per measure (strictly-greater
    comparison against the 25/50/75% cutpoints); recency is inverted
    (recent = high score). ``rfm_cell = 100r + 10f + m`` is the
    segment key marketing reads (444 = champions).

    Plan shape (r8, fixing the r7 perf-weak finding): the three
    measures' cutpoints come from ONE
    :func:`~.sketch.histogram_quantiles_multi` call — the measures
    unpivot inside the scan, so the customer-level aggregate is read
    twice for all cutpoints instead of twice PER measure; ``base``
    (the one real shuffle, corpus → one row per customer) is
    materialized ONCE via a lazy ``localCheckpoint`` and shared by the
    sketch's two passes and the final scoring join, so the orders
    source is scanned once total. The r7 per-measure loop cost 18
    exchanges / 4 source scans. RDD-level checkpoint blocks (unlike a
    ``persist()`` CacheManager entry, which outlives the frame until
    an explicit unpersist — the r8 leak) are released by the
    ContextCleaner when the returned plan is garbage-collected, so a
    session looping over RFM builds leaks nothing. The trade:
    lineage truncation, i.e. an executor loss mid-query cannot
    recompute the one-shuffle subtree — the same trade the iterative
    operators (pagerank, k-means) already make for their state.
    """
    from .sketch import histogram_quantiles_multi

    maxd = orders.agg(F.max("o_orderdate").alias("_maxd"))
    base = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count("*").cast("long").alias("frequency"),
            F.round(F.sum("o_totalprice") * 100, 0)
            .cast("long")
            .alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "custkey",
            F.datediff(F.col("_maxd"), F.col("_last"))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
        .withColumn("_g", F.lit(0))
        .localCheckpoint(eager=False)
    )
    measures = ("recency_days", "frequency", "monetary_cents")
    cuts = histogram_quantiles_multi(
        base, ["_g"], list(measures), quantiles=(0.25, 0.5, 0.75)
    )
    # fold the ≤ 9 cutpoint rows to ONE broadcast row: _c{25,50,75}_{m}
    row = cuts.groupBy("_g").agg(
        *[
            F.max(
                F.when(
                    (F.col("q") == q) & (F.col("measure") == m),
                    F.col("quantile_estimate"),
                )
            ).alias(f"_c{int(q * 100)}_{m}")
            for m in measures
            for q in (0.25, 0.5, 0.75)
        ]
    )
    out = base.join(F.broadcast(row), "_g")
    band = {
        col: (
            F.lit(1)
            + (F.col(col) > F.col(f"_c25_{col}")).cast("int")
            + (F.col(col) > F.col(f"_c50_{col}")).cast("int")
            + (F.col(col) > F.col(f"_c75_{col}")).cast("int")
        ).cast("long")
        for col in measures
    }
    r_score = (F.lit(5) - band["recency_days"]).cast("long")
    f_score = band["frequency"]
    m_score = band["monetary_cents"]
    return out.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        r_score.alias("r_score"),
        f_score.alias("f_score"),
        m_score.alias("m_score"),
        (r_score * 100 + f_score * 10 + m_score).cast("long").alias(
            "rfm_cell"
        ),
    )
