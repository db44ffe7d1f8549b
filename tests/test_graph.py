"""Integer PageRank (operators/graph.py) — semantic invariants beyond
the value-exact oracle check (ns_graph_pagerank)."""

from __future__ import annotations

from blinkit_etl_pipeline_spark.operators import graph


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src bigint, dst bigint")


def test_pagerank_in_degree_dominates(spark):
    # 1,3,4 all point at 2; 2 points back at 1; 6 is dangling (sink)
    rows = [(1, 2), (3, 2), (4, 2), (2, 1), (1, 6)]
    out = {
        r["node"]: r["rank_q"]
        for r in graph.pagerank(_edges(spark, rows), iterations=6).collect()
    }
    assert set(out) == {1, 2, 3, 4, 6}
    # 2 (three in-links) outranks the base-rank-only sources; 1
    # (receives ALL of 2's mass through its single out-edge) outranks 2
    assert out[2] > out[3]
    assert out[1] > out[2]
    # sources with no in-links share the base rank exactly
    assert out[3] == out[4]
    assert all(r > 0 for r in out.values())


def test_pagerank_conserves_mass_to_truncation(spark):
    rows = [(1, 2), (3, 2), (4, 2), (2, 1), (1, 6)]
    iters = 6
    out = graph.pagerank(_edges(spark, rows), iterations=iters).collect()
    total = sum(r["rank_q"] for r in out)
    # each integer division truncates < 1 unit per edge/node per
    # iteration — loss is bounded and tiny on the 10^12 lattice
    n, e = 5, len(rows)
    assert graph.RANK_SCALE - iters * (e + n + 2) <= total <= graph.RANK_SCALE


def test_pagerank_deterministic_across_runs(spark):
    rows = [(i, (i * 3) % 7 + 1) for i in range(1, 30)]
    a = {
        r["node"]: r["rank_q"]
        for r in graph.pagerank(_edges(spark, rows), iterations=5).collect()
    }
    b = {
        r["node"]: r["rank_q"]
        for r in graph.pagerank(_edges(spark, rows), iterations=5).collect()
    }
    assert a == b
