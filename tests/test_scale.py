"""Scale techniques, asserted at the plan level: bucketed co-located
joins (no exchange), salted skew joins (same results), partition
pruning (pruned scan), observation metrics (no extra scan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from blinkit_etl_pipeline_spark.operators import joins
from blinkit_etl_pipeline_spark.sources import bucketing, metrics, sinks
from blinkit_etl_pipeline_spark.sources.testdata import register_blinkit

from conftest import SF_SMOKE


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    t = register_blinkit(spark, SF_SMOKE)
    items = t["b_order_items"]
    orders = t["b_orders"]

    bucketing.write_bucketed(items, "b_items_bkt", ["order_id"], num_buckets=4,
                             sort_cols=["order_id"])
    bucketing.write_bucketed(orders, "b_orders_bkt", ["order_id"], num_buckets=4,
                             sort_cols=["order_id"])
    left = bucketing.read_table(spark, "b_items_bkt")
    right = bucketing.read_table(spark, "b_orders_bkt")

    # force SMJ so the test asserts bucket co-location, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = left.join(right, "order_id")
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == left.join(right, "order_id").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_items_bkt")
        spark.sql("DROP TABLE IF EXISTS b_orders_bkt")


def test_salted_join_matches_plain_join(spark):
    t = register_blinkit(spark, SF_SMOKE)
    items = t["b_order_items"].select("order_id", "product_id", "quantity")
    orders = t["b_orders"].select("order_id", "customer_id")

    plain = items.join(orders, "order_id")
    salted = joins.salted_join(items, orders, "order_id", salt_buckets=4)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_partition_pruning(spark, tmp_path):
    t = register_blinkit(spark, SF_SMOKE)
    from blinkit_etl_pipeline_spark.pipelines import sales_revenue

    fact = sales_revenue.sales_fact(
        t["b_orders"], t["b_order_items"], t["b_products"]
    )
    path = str(tmp_path / "fact")
    sinks.write_partitioned(fact, path)

    back = spark.read.parquet(path)
    one_month = back.filter((F.col("year") == 1995) & (F.col("month") == 3))
    plan = _physical_plan(one_month)
    # partition filters applied at the scan — not a post-scan Filter
    assert "PartitionFilters: [" in plan
    assert "isnotnull(year" in plan or "(year" in plan
    assert one_month.count() == fact.filter(
        (F.col("year") == 1995) & (F.col("month") == 3)
    ).count()


def test_observation_counts_without_extra_scan(spark):
    t = register_blinkit(spark, SF_SMOKE)
    df, obs = metrics.with_row_count(t["b_order_items"], "items_rows")
    df.write.format("noop").mode("overwrite").save()  # the one action
    assert metrics.get_count(obs) == t["b_order_items"].count()
