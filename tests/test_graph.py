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


def _signed(spark, rows):
    return spark.createDataFrame(
        rows, "src bigint, dst bigint, __sign bigint"
    )


# a strongly-covered base graph (every node has an out-edge): two
# triangles bridged, plus a parallel edge (multiplicity is semantic)
_BASE = [
    (1, 2), (2, 3), (3, 1),
    (4, 5), (5, 6), (6, 4),
    (3, 4), (4, 1),
    (1, 2),  # parallel
]
_ITERS = 5


def test_pagerank_delta_matches_full_recompute(spark):
    """Delta propagation is exact: folding a mixed insert/delete batch
    into the maintained state reproduces the full run on the final
    edge set BIT-EQUAL (ranks and every per-iteration vector)."""
    e0 = _edges(spark, _BASE)
    state, n = graph.pagerank_state(e0, iterations=_ITERS)
    delta = _signed(
        spark,
        [
            (1, 2, -1),   # drop the parallel copy (outdeg change)
            (3, 4, -1),   # drop the bridge
            (2, 6, 1),    # new cross edge
            (5, 1, 1),    # new back edge
            (5, 1, 1),    # ... with multiplicity 2
        ],
    )
    ranks, dstate = graph.pagerank_delta(e0, state, n, delta, _ITERS)
    final = _BASE[:]
    final.remove((1, 2))
    final.remove((3, 4))
    final += [(2, 6), (5, 1), (5, 1)]
    want = {
        r["node"]: r["rank_q"]
        for r in graph.pagerank(_edges(spark, final), iterations=_ITERS).collect()
    }
    got = {r["node"]: r["rank_q"] for r in ranks.collect()}
    assert got == want
    # folded state == fresh bootstrap on the final graph
    fresh, _ = graph.pagerank_state(_edges(spark, final), iterations=_ITERS)
    folded = {}
    for r in state.collect():
        folded[(r["node"], r["it"])] = folded.get((r["node"], r["it"]), 0) + r["s"]
    for r in dstate.collect():
        folded[(r["node"], r["it"])] = folded.get((r["node"], r["it"]), 0) + r["s"]
    folded = {k: v for k, v in folded.items() if v != 0}
    want_state = {
        (r["node"], r["it"]): r["s"] for r in fresh.collect() if r["s"] != 0
    }
    assert folded == want_state


def test_pagerank_delta_guards(spark):
    import pytest

    e0 = _edges(spark, _BASE)
    state, n = graph.pagerank_state(e0, iterations=_ITERS)
    with pytest.raises(ValueError, match="new nodes"):
        graph.pagerank_delta(
            e0, state, n, _signed(spark, [(1, 99, 1)]), _ITERS
        )
    with pytest.raises(ValueError, match="more times than it exists"):
        graph.pagerank_delta(
            e0, state, n, _signed(spark, [(3, 4, -1), (3, 4, -1)]), _ITERS
        )
    with pytest.raises(ValueError, match="empties"):
        # node 6's only out-edge
        graph.pagerank_delta(
            e0, state, n, _signed(spark, [(6, 4, -1)]), _ITERS
        )
    with pytest.raises(ValueError, match="dangling"):
        graph.pagerank_state(_edges(spark, [(1, 2), (2, 3)]), iterations=2)


def test_pagerank_store_twin_equals_batch_and_redelivery_noop(spark, tmp_path):
    """The agg-store composition (streaming/pagerank_ingest.py): edge
    batches folded through the persisted stores yield the same ranks
    as one batch run on the final edge set; redelivering an epoch
    changes nothing (batch-id guard)."""
    from blinkit_etl_pipeline_spark.streaming import pagerank_ingest as pi

    edge_store = str(tmp_path / "edges")
    state_store = str(tmp_path / "state")
    boot = _signed(spark, [(s, d, 1) for (s, d) in _BASE])
    pi.apply_edge_batch(
        spark, edge_store, state_store, boot, "epoch-0", iterations=_ITERS
    )
    d1 = _signed(spark, [(1, 2, -1), (2, 6, 1)])
    pi.apply_edge_batch(spark, edge_store, state_store, d1, "epoch-1")
    d2 = _signed(spark, [(3, 4, -1), (5, 1, 1), (5, 1, 1)])
    pi.apply_edge_batch(spark, edge_store, state_store, d2, "epoch-2")
    # crash-replay: redeliver epoch 2 — the guard must discard it
    pi.apply_edge_batch(spark, edge_store, state_store, d2, "epoch-2")
    final = _BASE[:]
    final.remove((1, 2))
    final.remove((3, 4))
    final += [(2, 6), (5, 1), (5, 1)]
    want = {
        r["node"]: r["rank_q"]
        for r in graph.pagerank(_edges(spark, final), iterations=_ITERS).collect()
    }
    got = {
        r["node"]: r["rank_q"]
        for r in pi.pagerank_from_store(spark, edge_store, state_store).collect()
    }
    assert got == want


def test_pagerank_store_replay_after_partial_epoch(spark, tmp_path):
    """The crash window the commit ORDER exists for: state deltas
    committed, edges not, crash, epoch replayed. The replay must
    detect the state commit, skip the (now-garbage) delta
    recomputation, finish ONLY the edge commit, and converge to the
    batch answer."""
    from blinkit_etl_pipeline_spark.operators import incremental
    from blinkit_etl_pipeline_spark.streaming import pagerank_ingest as pi
    from pyspark.sql import functions as F

    edge_store = str(tmp_path / "edges")
    state_store = str(tmp_path / "state")
    boot = _signed(spark, [(s, d, 1) for (s, d) in _BASE])
    pi.apply_edge_batch(
        spark, edge_store, state_store, boot, "epoch-0", iterations=_ITERS
    )
    d1 = _signed(spark, [(1, 2, -1), (2, 6, 1)])
    # reproduce the partial epoch BY HAND: compute the delta exactly as
    # apply_edge_batch would, commit ONLY the state store, "crash"
    old = pi.live_edges(spark, edge_store)
    state = incremental.read_agg_store(
        spark, state_store, ["node", "it"], ["s"]
    ).select("node", "it", "s")
    from blinkit_etl_pipeline_spark.operators import snapshot

    n_pinned = int(snapshot.table_properties(state_store)["pagerank_n"])
    _ranks, dstate = graph.pagerank_delta(old, state, n_pinned, d1, _ITERS)
    incremental.ingest_agg_deltas(
        spark, state_store,
        dstate.withColumn("__sign", F.lit(1)),
        ["node", "it"], {"s": F.col("s")}, batch_id="epoch-1",
    )
    # replay the whole epoch through the public entry point
    pi.apply_edge_batch(spark, edge_store, state_store, d1, "epoch-1")
    final = _BASE[:]
    final.remove((1, 2))
    final.append((2, 6))
    want = {
        r["node"]: r["rank_q"]
        for r in graph.pagerank(_edges(spark, final), iterations=_ITERS).collect()
    }
    got = {
        r["node"]: r["rank_q"]
        for r in pi.pagerank_from_store(spark, edge_store, state_store).collect()
    }
    assert got == want


def test_pagerank_bootstrap_crash_between_pin_and_state_commit(spark, tmp_path):
    """r9 (ADVICE): props pin BEFORE the state commit. The survivable
    crash window is now pin-done/state-missing — a replayed bootstrap
    must re-pin the same values idempotently (insert-only bootstrap ⇒
    same graph ⇒ same n), commit state + edges, and serve correct
    ranks. (The old order left a state-committed/unpinned store:
    every later epoch died on KeyError('pagerank_n') forever.)"""
    from blinkit_etl_pipeline_spark.operators import snapshot
    from blinkit_etl_pipeline_spark.streaming import pagerank_ingest as pi

    edge_store = str(tmp_path / "edges")
    state_store = str(tmp_path / "state")
    boot = _signed(spark, [(s, d, 1) for (s, d) in _BASE])
    # simulate the crash: the pin landed, nothing else did
    n = (
        boot.selectExpr("src AS node")
        .union(boot.selectExpr("dst AS node"))
        .distinct()
        .count()
    )
    snapshot.ensure_table_properties(
        state_store, {"pagerank_n": n, "pagerank_iterations": _ITERS}
    )
    # replay the bootstrap through the public entry point
    pi.apply_edge_batch(
        spark, edge_store, state_store, boot, "epoch-0", iterations=_ITERS
    )
    # and one normal delta epoch on top must work (no KeyError wedge)
    d1 = _signed(spark, [(1, 2, -1), (2, 6, 1)])
    pi.apply_edge_batch(spark, edge_store, state_store, d1, "epoch-1")
    final = _BASE[:]
    final.remove((1, 2))
    final.append((2, 6))
    want = {
        r["node"]: r["rank_q"]
        for r in graph.pagerank(
            _edges(spark, final), iterations=_ITERS
        ).collect()
    }
    got = {
        r["node"]: r["rank_q"]
        for r in pi.pagerank_from_store(
            spark, edge_store, state_store
        ).collect()
    }
    assert got == want


def test_pagerank_maintain_routes_and_both_paths_bit_equal(spark):
    """r9 (VERDICT r8 task #1): the pre-flight changed-src fraction
    routes localized churn to the delta path and dense churn to the
    re-bootstrap — and BOTH paths are bit-equal to the power method
    on the new edge set, returning foldable signed state deltas."""
    from pyspark.sql import functions as F

    e0 = _edges(spark, _BASE)
    state, n = graph.pagerank_state(e0, iterations=_ITERS)
    d1 = _signed(spark, [(1, 2, -1), (2, 6, 1)])
    final = _BASE[:]
    final.remove((1, 2))
    final.append((2, 6))
    want = {
        r["node"]: r["rank_q"]
        for r in graph.pagerank(
            _edges(spark, final), iterations=_ITERS
        ).collect()
    }
    # 2 changed srcs of 6 graph srcs = 0.33: above the default 0.1 →
    # recompute; with a permissive threshold → delta. Same answer.
    ranks_rc, ds_rc, m_rc = graph.pagerank_maintain(
        e0, state, n, d1, _ITERS
    )
    assert m_rc == "recompute"
    ranks_dl, ds_dl, m_dl = graph.pagerank_maintain(
        e0, state, n, d1, _ITERS, fallback_fraction=0.5, delta_min_srcs=0
    )
    assert m_dl == "delta"
    got_rc = {r["node"]: r["rank_q"] for r in ranks_rc.collect()}
    got_dl = {r["node"]: r["rank_q"] for r in ranks_dl.collect()}
    assert got_rc == want
    assert got_dl == want
    # the returned state deltas are equivalent: folding either into
    # the old state yields the same maintained state
    old = {(r["node"], r["it"]): r["s"] for r in state.collect()}

    def fold(ds):
        out = dict(old)
        for r in ds.collect():
            k = (r["node"], r["it"])
            out[k] = out.get(k, 0) + r["s"]
        return {k: v for k, v in out.items() if v != 0}

    assert fold(ds_rc) == fold(ds_dl)


def test_pagerank_maintain_recompute_guards(spark):
    """The fallback path keeps the maintenance contract: over-deletes
    and node-set changes raise instead of silently clamping."""
    import pytest

    e0 = _edges(spark, _BASE)
    state, n = graph.pagerank_state(e0, iterations=_ITERS)
    # delete an edge twice (only one (3,4) exists)
    bad = _signed(spark, [(3, 4, -1), (3, 4, -1), (2, 6, 1), (1, 6, 1)])
    with pytest.raises(ValueError, match="more times than"):
        graph.pagerank_maintain(e0, state, n, bad, _ITERS)
    # add a brand-new node (99) — N changes
    new_node = _signed(spark, [(1, 99, 1), (99, 1, 1), (2, 6, 1)])
    with pytest.raises(ValueError, match="node count changed"):
        graph.pagerank_maintain(e0, state, n, new_node, _ITERS)


def test_pagerank_maintain_frontier_cap_reroutes_hub_explosion(spark):
    """r9 review: a tiny changed set touching a high-out-degree hub
    passes the round-0 pre-flight but explodes the frontier at the
    first propagation round — the cap must reroute to the recompute,
    still bit-equal to the power method on the new edge set."""
    from pyspark.sql import functions as F

    # hub 0 points at 200 spokes; every spoke points back (no dangling)
    edges = [(0, i) for i in range(1, 201)] + [(i, 0) for i in range(1, 201)]
    e0 = _edges(spark, edges)
    state, n = graph.pagerank_state(e0, iterations=3)
    # one changed src (1 of 201 srcs = 0.5% — passes pre-flight)
    # rewires its edge away from the hub: the hub's received mass
    # moves substantially, so its 200 spokes all enter support(Δs₂) —
    # the second-expansion explosion the cap exists for. (A ±1-unit
    # delta would NOT explode: the integer lattice truncates it away —
    # the churn must move real mass.)
    d1 = _signed(spark, [(1, 0, -1), (1, 2, 1)])
    ranks, ds, method = graph.pagerank_maintain(
        e0, state, n, d1, 3, frontier_cap=50, delta_min_srcs=0
    )
    assert method == "recompute"
    new_edges = edges[:]
    new_edges.remove((1, 0))
    new_edges.append((1, 2))
    want = {
        r["node"]: r["rank_q"]
        for r in graph.pagerank(
            _edges(spark, new_edges), iterations=3
        ).collect()
    }
    got = {r["node"]: r["rank_q"] for r in ranks.collect()}
    assert got == want
    # without the cap the delta path handles it fine (cost, not
    # correctness, is what the cap protects)
    ranks2, _, m2 = graph.pagerank_maintain(
        e0,
        state,
        n,
        d1,
        3,
        frontier_cap=None,
        fallback_fraction=0.1,
        delta_min_srcs=0,
    )
    assert m2 == "delta"
    assert {r["node"]: r["rank_q"] for r in ranks2.collect()} == want


def test_pagerank_maintain_size_axis_routes_small_graphs_to_recompute(
    spark,
):
    """r10 (VERDICT r9 task #4): routing keys on graph SIZE as well as
    churn fraction — below ``delta_min_srcs`` the delta path is
    barrier-bound parity at best (PLANS.md r9 ring-lattice table), so
    localized churn on a small graph still takes the recompute. Both
    axes pinned here: (size small, churn local) → recompute under the
    default floor; same call with the floor disabled → delta; and a
    pinned ``n_srcs`` (the store-backed caller shape) routes
    identically to the probed one. Bit-equal across all of them."""
    e0 = _edges(spark, _BASE)
    state, n = graph.pagerank_state(e0, iterations=_ITERS)
    d1 = _signed(spark, [(1, 2, -1), (2, 6, 1)])
    # churn-local (fraction 0.33 <= 0.5) but graph is 6 srcs << 2M:
    # the default size floor must win and route to recompute
    ranks_sz, _, m_sz = graph.pagerank_maintain(
        e0, state, n, d1, _ITERS, fallback_fraction=0.5
    )
    assert m_sz == "recompute"
    # identical routing when the src count is PINNED (streaming shape)
    _, _, m_pin = graph.pagerank_maintain(
        e0, state, n, d1, _ITERS, fallback_fraction=0.5, n_srcs=6
    )
    assert m_pin == "recompute"
    # floor disabled → the fraction axis decides → delta
    ranks_dl, _, m_dl = graph.pagerank_maintain(
        e0, state, n, d1, _ITERS, fallback_fraction=0.5, delta_min_srcs=0
    )
    assert m_dl == "delta"
    final = _BASE[:]
    final.remove((1, 2))
    final.append((2, 6))
    want = {
        r["node"]: r["rank_q"]
        for r in graph.pagerank(
            _edges(spark, final), iterations=_ITERS
        ).collect()
    }
    assert {r["node"]: r["rank_q"] for r in ranks_sz.collect()} == want
    assert {r["node"]: r["rank_q"] for r in ranks_dl.collect()} == want
