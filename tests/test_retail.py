"""Retail analytics operators: market-basket lift and RFM segments."""

from __future__ import annotations

import datetime as dt

from blinkit_etl_pipeline_spark.operators.agg import basket_lift, rfm_segments


def _li(spark, baskets):
    rows = [
        (o, p, 1.0)
        for o, parts in baskets.items()
        for p in parts
    ]
    return spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity double"
    )


def test_basket_lift_hand_computed(spark):
    # A,B together in 2 of 3 orders; A in all 3, B in 2:
    # lift = n_ab*N/(n_a*n_b) = 2*3/(3*2) = 1.0 exactly
    li = _li(spark, {1: [10, 20, 30], 2: [10, 20], 3: [10, 40]})
    rows = {(r.part_a, r.part_b): r for r in basket_lift(li, 2).collect()}
    assert set(rows) == {(10, 20)}  # only the pair above min_support
    r = rows[(10, 20)]
    assert (r.n_ab, r.n_a, r.n_b) == (2, 3, 2)
    assert r.lift_ppm == 1_000_000


def test_basket_lift_positive_association_scores_above_one(spark):
    # C,D ALWAYS together but rare: lift = 2*4/(2*2) = 2.0
    li = _li(
        spark,
        {1: [1, 2], 2: [1, 3], 3: [5, 6, 1], 4: [5, 6, 2]},
    )
    rows = {(r.part_a, r.part_b): r.lift_ppm for r in basket_lift(li, 2).collect()}
    assert rows[(5, 6)] == 2_000_000  # perfectly-coupled pair
    # duplicate partkey rows in one order count once (distinct incidences)
    li2 = _li(spark, {1: [7, 7, 8], 2: [7, 8]})
    r2 = basket_lift(li2, 2).collect()[0]
    assert (r2.n_ab, r2.n_a, r2.n_b) == (2, 2, 2)


def test_rfm_scores_track_the_quartiles(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # customer c gets c orders of value 100*c, last order day c
    for c in range(1, 13):
        for i in range(c):
            rows.append((1000 * c + i, c, base + dt.timedelta(days=c), 100.0 * c))
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double",
    )
    out = {r.custkey: r for r in rfm_segments(orders).collect()}
    assert len(out) == 12
    # frequency/monetary rise with c -> scores non-decreasing in c
    for c in range(1, 12):
        assert out[c + 1].f_score >= out[c].f_score
        assert out[c + 1].m_score >= out[c].m_score
        # recency: later last-order day = MORE recent = higher r_score
        assert out[c + 1].r_score >= out[c].r_score
    assert out[12].f_score == out[12].m_score == 4
    assert out[1].f_score == out[1].m_score == 1
    assert out[12].r_score == 4 and out[1].r_score == 1
    for c, r in out.items():
        assert r.rfm_cell == r.r_score * 100 + r.f_score * 10 + r.m_score
        assert r.frequency == c
        assert r.monetary_cents == 100 * c * c * 100
