"""Declarative data-quality suite (operators/expect.py) — semantic
checks beyond the value-exact oracle run (ns_data_quality)."""

from __future__ import annotations

from blinkit_etl_pipeline_spark.operators import expect as E


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_row_local_constraints_share_one_pass(spark):
    df = _df(
        spark,
        [(1, "a", 5.0), (2, None, 50.0), (3, "c", -1.0), (3, "zz", 5.0)],
        "id bigint, name string, v double",
    )
    out = {
        (r["constraint"], r["column"]): r
        for r in E.verify(
            spark,
            df,
            [
                E.complete("name"),
                E.in_range("v", 0.0, 10.0),
                E.in_set("name", "a", "c"),
                E.matches("name", "^[a-c]$"),
                E.unique("id"),
            ],
        ).collect()
    }
    assert out[("complete", "name")]["violations"] == 1
    # range: one below-range + one above-range; NULLs would count too
    assert out[("in_range", "v")]["violations"] == 2
    # in_set/matches count the NULL as a violation (unknown ≠ accepted)
    assert out[("in_set", "name")]["violations"] == 2
    assert out[("matches", "name")]["violations"] == 2
    # both rows of the duplicated key count as violations
    u = out[("unique", "id")]
    assert u["violations"] == 2 and u["total"] == 4 and not u["passed"]


def test_references_counts_orphans(spark):
    child = _df(spark, [(1,), (2,), (9,)], "fk bigint")
    parent = _df(spark, [(1,), (2,), (3,)], "pk bigint")
    out = E.verify(
        spark, child, [E.references("fk", parent, "pk")]
    ).collect()[0]
    assert out["violations"] == 1 and out["total"] == 3
    assert not out["passed"]


def test_clean_table_passes_everything(spark):
    df = _df(spark, [(1, "a"), (2, "b")], "id bigint, name string")
    out = E.verify(
        spark, df, [E.unique("id"), E.complete("name")]
    ).collect()
    assert all(r["passed"] and r["violations"] == 0 for r in out)


def test_quantile_constraints_one_sketch_pass(spark):
    """r9 (verdict #6): has_quantile bands run through the suite —
    in-band passes, out-of-band fails, and a quantile row judges the
    STATISTIC (total=1), not rows. Values 1..100 uniform: the sketch
    median is ~50, p90 ~90."""
    rows = [(i, float(i)) for i in range(1, 101)]
    df = _df(spark, rows, "id bigint, v double")
    out = {
        r["constraint"]: r
        for r in E.verify(
            spark,
            df,
            [
                E.has_quantile("v", 0.5, 45.0, 55.0),
                E.has_quantile("v", 0.9, 85.0, 95.0),
                E.has_quantile("v", 0.5, 90.0, 99.0),  # out of band
                E.complete("v"),
            ],
        ).collect()
        if r["constraint"].startswith("quantile")
        or r["constraint"] == "complete"
    }
    assert out["quantile_0.9"]["violations"] == 0
    assert out["quantile_0.9"]["total"] == 1
    assert out["quantile_0.9"]["passed"]
    assert out["complete"]["violations"] == 0
    all_rows = E.verify(
        spark,
        df,
        [
            E.has_quantile("v", 0.5, 45.0, 55.0),
            E.has_quantile("v", 0.5, 90.0, 99.0),
        ],
    ).collect()
    verdicts = sorted(r["violations"] for r in all_rows)
    assert verdicts == [0, 1]  # in-band passes, out-of-band fails
    assert all(r["total"] == 1 for r in all_rows)
