"""Runner incremental mode (r10 addendum): the reference's event
contract — a raw file lands, the C1 routing decides which jobs react —
executed through the IVM curated stores instead of wholesale
recomputes. Pins: routing touches ONLY the routed stores, every
curated table's store read equals the batch recompute over everything
dropped (slice-decomposition exactness — per-drop transforms ≡ the
full-input transform), redelivered events are no-ops, C3
partial-failure statuses survive, and C4 re-registers analyst views.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blinkit_etl_pipeline_spark import runner
from blinkit_etl_pipeline_spark.operators import curated, snapshot
from blinkit_etl_pipeline_spark.pipelines import (
    customer_feedback,
    inventory_recon,
    marketing_roi,
    sales_revenue,
)
from blinkit_etl_pipeline_spark.sources import readers
from blinkit_etl_pipeline_spark.sources.testdata import register_blinkit

from conftest import SF_SMOKE

ALL_TABLES = tuple(
    t for ts in runner.CURATED_TABLES.values() for t in ts
)


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple(map(str, t)),
    )


def _versions(root):
    return {
        t: snapshot.current_version(runner.curated_store_path(root, t))
        for t in ALL_TABLES
    }


@pytest.fixture(scope="module")
def blinkit(spark):
    return register_blinkit(spark, SF_SMOKE)


def test_incremental_runner_event_contract(spark, blinkit, tmp_path):
    t = blinkit
    root = str(tmp_path / "stores")
    prod, cust = t["b_products"], t["b_customers"]
    # fact drops, hash-split on each table's slice grain; order items
    # follow their order (slice-complete on order_id)
    o = [
        t["b_orders"].filter(F.crc32(F.col("order_id")) % 2 == m)
        for m in (0, 1)
    ]
    items = [
        t["b_order_items"].join(
            od.select("order_id"), "order_id", "left_semi"
        )
        for od in o
    ]
    fb = [
        t["b_feedback"].filter(F.crc32(F.col("feedback_id")) % 2 == m)
        for m in (0, 1)
    ]
    mkkey = F.crc32(
        F.concat_ws("|", F.col("campaign_id"), F.col("date").cast("string"))
    )
    mk = [t["b_marketing"].filter(mkkey % 2 == m) for m in (0, 1)]
    invkey = F.crc32(
        F.concat_ws("|", F.col("product_id"), F.col("date").cast("string"))
    )
    inv_old = [
        t["b_inventory_old"].filter(invkey % 2 == m) for m in (0, 1)
    ]
    inv_new = [
        t["b_inventory_new"].filter(invkey % 2 == m) for m in (0, 1)
    ]

    r = runner.handle_new_file_incremental(
        spark,
        root,
        "orders_2024_03_01.csv",
        {"orders": o[0], "order_items": items[0], "products": prod},
    )
    assert r.overall == "ok"
    assert set(r.statuses) == {runner.JOB_SALES, runner.JOB_DELIVERY}
    v1 = _versions(root)
    assert v1["revenue_by_category"] is not None
    assert v1["delivery_partner"] is not None
    assert v1["campaign_summary"] is None  # untouched source

    r = runner.handle_new_file_incremental(
        spark,
        root,
        "customer_feedback_day1.csv",
        {"feedback": fb[0], "customers": cust, "orders": t["b_orders"]},
    )
    assert r.statuses == {runner.JOB_FEEDBACK: "succeeded"}
    r = runner.handle_new_file_incremental(
        spark, root, "marketing_day1.csv", {"marketing": mk[0]}
    )
    assert r.statuses == {runner.JOB_MARKETING: "succeeded"}
    r = runner.handle_new_file_incremental(
        spark,
        root,
        "inventory_day1.csv",
        {
            "inventory_old": inv_old[0],
            "inventory_new": inv_new[0],
            "products": prod,
        },
    )
    assert r.statuses == {runner.JOB_INVENTORY: "succeeded"}

    # C1 isolation: a marketing-only event bumps ONLY its store
    v2 = _versions(root)
    runner.handle_new_file_incremental(
        spark, root, "marketing_day2.csv", {"marketing": mk[1]}
    )
    v3 = _versions(root)
    assert v3["campaign_summary"] > v2["campaign_summary"]
    for tbl in ALL_TABLES:
        if tbl != "campaign_summary":
            assert v3[tbl] == v2[tbl], tbl

    # remaining day-2 drops
    runner.handle_new_file_incremental(
        spark,
        root,
        "orders_2024_03_02.csv",
        {"orders": o[1], "order_items": items[1], "products": prod},
    )
    runner.handle_new_file_incremental(
        spark,
        root,
        "customer_feedback_day2.csv",
        {"feedback": fb[1], "customers": cust, "orders": t["b_orders"]},
    )
    runner.handle_new_file_incremental(
        spark,
        root,
        "inventory_day2.csv",
        {
            "inventory_old": inv_old[1],
            "inventory_new": inv_new[1],
            "products": prod,
        },
    )

    # per-drop transforms folded through the stores ≡ the full-input
    # transform (slice-decomposition exactness), table by table
    full = {
        "revenue_by_category": sales_revenue.sales_fact(
            t["b_orders"], t["b_order_items"], prod
        ),
        "delivery_partner": t["b_orders"],
        "area_feedback": customer_feedback.enriched_feedback(
            t["b_feedback"], cust, t["b_orders"],
            readers.rating_icons(spark),
        ),
        "campaign_summary": marketing_roi.marketing_kpis(
            t["b_marketing"]
        ),
        "category_impact": inventory_recon.reconcile(
            t["b_inventory_old"], t["b_inventory_new"], prod
        ),
    }
    full["product_discrepancies"] = full["category_impact"]
    for tbl in ALL_TABLES:
        got = curated.read_curated(
            spark, runner.curated_store_path(root, tbl), tbl
        )
        want = curated.curated_delta_view(tbl, [full[tbl]])
        assert _rows(got) == _rows(want), tbl

    # C4: analyst views read the live store state
    view_rows = _rows(spark.sql("SELECT * FROM curated_revenue_by_category"))
    assert view_rows == _rows(
        curated.read_curated(
            spark,
            runner.curated_store_path(root, "revenue_by_category"),
            "revenue_by_category",
        )
    )

    # redelivered event (same filename ⇒ same batch ids): every routed
    # store's guard absorbs it — versions unchanged
    v4 = _versions(root)
    runner.handle_new_file_incremental(
        spark, root, "marketing_day2.csv", {"marketing": mk[1]}
    )
    assert _versions(root) == v4

    # the six analyst queries (C-entry-point analytics) answered from
    # the INCREMENTALLY maintained views equal the same SQL over the
    # quantized batch recompute — the reference's dashboards, served
    # from IVM stores end-to-end
    got_analytics = {
        name: _rows(df) for name, df in runner.run_analytics(spark).items()
    }
    for tbl in ALL_TABLES:
        curated.curated_delta_view(tbl, [full[tbl]]).createOrReplaceTempView(
            runner.CURATED_VIEWS[tbl]
        )
    want_analytics = {
        name: _rows(df) for name, df in runner.run_analytics(spark).items()
    }
    assert got_analytics == want_analytics
    assert all(len(v) > 0 for v in want_analytics.values())


def test_incremental_runner_partial_failure(spark, blinkit, tmp_path):
    """C3: an unrecognized filename routes ALL jobs (the catch-all);
    jobs whose inputs are missing fail without stopping the rest, and
    the overall status is 'partial'."""
    t = blinkit
    root = str(tmp_path / "stores")
    r = runner.handle_new_file_incremental(
        spark, root, "mystery_drop.csv", {"marketing": t["b_marketing"]}
    )
    assert r.statuses[runner.JOB_MARKETING] == "succeeded"
    failed = [j for j, s in r.statuses.items() if s == "failed"]
    assert set(failed) == {
        runner.JOB_SALES,
        runner.JOB_DELIVERY,
        runner.JOB_FEEDBACK,
        runner.JOB_INVENTORY,
    }
    assert r.overall == "partial"
    assert all(j in r.errors for j in failed)
    # C4 still ran for the succeeded job
    assert (
        spark.sql("SELECT count(*) AS n FROM curated_campaign_performance_summary")
        .collect()[0]["n"]
        > 0
    )


def test_area_feedback_spec_matches_batch_avg_with_null_ratings(spark):
    """The IVM spec must mirror the batch AVG's null semantics: AVG
    skips null ratings while total_feedback counts every row — a
    sum/row-count division would diverge (r10 review finding)."""
    from blinkit_etl_pipeline_spark.operators import agg

    rows = spark.createDataFrame(
        [
            ("f1", "North", 5, "Positive", 1),
            ("f2", "North", None, "Negative", -1),
            ("f3", "North", 2, "Neutral", 0),
            ("f4", "South", None, "Unknown", 0),
        ],
        "feedback_id string, area string, rating int, "
        "sentiment_normalized string, sentiment_score int",
    )
    got = _rows(curated.curated_delta_view("area_feedback", [rows]))
    want = _rows(agg.area_feedback_metrics(rows))
    assert got == want
    by_area = {r[0]: r for r in got}
    assert by_area["North"][1] == 3  # total_feedback counts null-rated
    assert by_area["North"][2] == 3.5  # AVG over the 2 non-null ratings
    assert by_area["South"][2] is None  # all-null group → NULL avg
