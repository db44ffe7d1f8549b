"""Runner contract: routing (C1), statuses (C2-C3), medallion writes +
catalog refresh (C4), and the six analytic queries end-to-end."""

from __future__ import annotations

import pytest

from blinkit_etl_pipeline_spark import runner

from conftest import SF_SMOKE


@pytest.mark.parametrize(
    ("filename", "expected"),
    [
        ("raw/orders_2024.csv", [runner.JOB_SALES, runner.JOB_DELIVERY]),
        ("PRODUCTS_new.csv", [runner.JOB_SALES, runner.JOB_DELIVERY]),
        ("customer_feedback.csv", [runner.JOB_FEEDBACK]),
        ("marketing_spend.csv", [runner.JOB_MARKETING]),
        ("inventoryNew_jan.csv", [runner.JOB_INVENTORY]),
        # catch-all: unrecognized → every job (reference lambda:52)
        ("mystery_dump.csv", list(runner.ALL_JOBS)),
        # multiple needles, dedup preserved in routing order
        ("order_product_merge.csv", [runner.JOB_SALES, runner.JOB_DELIVERY]),
    ],
)
def test_routing(filename, expected):
    assert runner.determine_jobs_to_run(filename) == expected


def test_full_run_and_analytics(spark, tmp_path):
    conf = runner.RunnerConfig(sf_dir=SF_SMOKE, out_dir=str(tmp_path))
    report = runner.run_jobs_sequential(spark, conf, list(runner.ALL_JOBS))
    assert report.overall == "ok", report.errors

    # C4: every curated view queryable; all six analytic queries run
    results = runner.run_analytics(spark)
    for name, df in results.items():
        assert df.count() > 0, f"{name} returned no rows"

    # processed zone is date-partitioned on disk (S5 layout)
    parts = list((tmp_path / "processed" / "sales_transactions").glob("year=*"))
    assert parts, "expected hive-style year= partitions"


def test_partial_failure_status(spark, tmp_path):
    conf = runner.RunnerConfig(sf_dir=SF_SMOKE, out_dir=str(tmp_path))
    original = runner.JOBS[runner.JOB_DELIVERY]
    runner.JOBS[runner.JOB_DELIVERY] = lambda s, c: (_ for _ in ()).throw(
        RuntimeError("boom")
    )
    try:
        report = runner.run_jobs_sequential(
            spark, conf, [runner.JOB_DELIVERY, runner.JOB_SALES]
        )
    finally:
        runner.JOBS[runner.JOB_DELIVERY] = original
    assert report.statuses[runner.JOB_DELIVERY] == "failed"
    assert report.statuses[runner.JOB_SALES] == "succeeded"  # still ran
    assert report.overall == "partial"
    assert "boom" in report.errors[runner.JOB_DELIVERY]


def test_stack_size_on_both_sides(spark):
    """-Xss8m must ride BOTH driver and executor JVM options (r14,
    VERDICT r13 #7): local[N] tasks run on driver threads, but a real
    cluster evaluates the pushed IN-list OR-tree in executor threads
    and overflows identically without it."""
    conf = spark.sparkContext.getConf()
    assert "-Xss8m" in (conf.get("spark.driver.extraJavaOptions") or "")
    assert "-Xss8m" in (conf.get("spark.executor.extraJavaOptions") or "")
