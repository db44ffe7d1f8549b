"""ANN / k-means codebook quality and structural properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from blinkit_etl_pipeline_spark.operators import vector

from conftest import SF_SMOKE

K = 8


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def _mean_assigned_cosine(emb, codebook):
    """Mean cosine of each vector to its assigned centroid (CASE chain)."""
    # ivf_assign returns the quantized frame; join raw vectors back for
    # the float-space quality metric
    assigned = vector.ivf_assign(emb, codebook).join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    sim = None
    for cid, vec in codebook:
        c = vector.cosine(F.col("embedding"), F.array(*[F.lit(float(x)) for x in vec]))
        sim = F.when(F.col("centroid_id") == cid, c) if sim is None else sim.when(
            F.col("centroid_id") == cid, c
        )
    return assigned.select(F.avg(sim).alias("m")).collect()[0]["m"]


def test_kmeans_improves_assignment_quality(spark):
    emb = _emb(spark)
    init = [
        (i, [float(x) for x in r["embedding"]])
        for i, r in enumerate(emb.orderBy("vec_id").limit(K).collect())
    ]
    trained = vector.kmeans_codebook(emb, k=K, iters=3)
    assert len(trained) == K
    for _, vec in trained:
        nrm = sum(x * x for x in vec) ** 0.5
        # unit centroids up to the round-6 determinism contract
        assert abs(nrm - 1.0) < 1e-5
    before = _mean_assigned_cosine(emb, init)
    after = _mean_assigned_cosine(emb, trained)
    assert after >= before - 1e-9, (before, after)


def test_ivf_topk_accepts_trained_codebook(spark):
    emb = _emb(spark)
    trained = vector.kmeans_codebook(emb, k=K, iters=2)
    out = vector.ivf_topk(emb, query_ids=range(4), k=3, nprobe=2, codebook=trained)
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {0, 1, 2, 3}
    for q, rs in per_q.items():
        assert len(rs) == 3
        assert all(r["query_id"] != r["neighbor_id"] for r in rs)
        sims = [r["cosine_sim"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)


def _anisotropic_corpus(spark, n=200, dim=16, nclusters=8, lead_dims=4):
    """Embeddings whose leading dims are ~0 noise; signal lives in the
    tail dims — the shape that defeats coordinate-axis LSH."""
    import random as _random

    rng = _random.Random(7)
    centers = [
        [rng.gauss(0, 1) for _ in range(dim - lead_dims)] for _ in range(nclusters)
    ]
    rows = []
    for i in range(n):
        c = centers[i % nclusters]
        lead = [rng.gauss(0, 1e-3) for _ in range(lead_dims)]
        tail = [x + rng.gauss(0, 0.15) for x in c]
        rows.append((i, [float(v) for v in lead + tail]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>"), dim


def _recall_at_k(approx_rows, truth_rows):
    truth = {}
    for r in truth_rows:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    found = {}
    for r in approx_rows:
        found.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    per_q = [
        len(found.get(q, set()) & t) / len(t) for q, t in truth.items() if t
    ]
    return sum(per_q) / len(per_q)


def test_rp_lsh_beats_axis_lsh_on_anisotropic_vectors(spark):
    """Seeded random-projection hyperplanes must recover the recall that
    coordinate-axis buckets lose when leading dims carry no signal."""
    emb, dim = _anisotropic_corpus(spark)
    emb = emb.persist()
    qids = list(range(16))
    k, nbits = 5, 3
    truth = vector.brute_force_topk(emb, qids, k=k).collect()
    # single-table vs single-table: isolate the hyperplane choice
    rp = vector.lsh_topk(
        emb,
        qids,
        k=k,
        nbits=nbits,
        bucket_expr=vector.sign_bucket(F.col("embedding"), nbits, dim),
    ).collect()
    axis = vector.lsh_topk(
        emb,
        qids,
        k=k,
        nbits=nbits,
        bucket_expr=vector.axis_sign_bucket(F.col("embedding"), nbits),
    ).collect()
    recall_rp = _recall_at_k(rp, truth)
    recall_axis = _recall_at_k(axis, truth)
    assert recall_rp >= 0.6, recall_rp
    assert recall_rp > recall_axis + 0.1, (recall_rp, recall_axis)
    emb.unpersist()


def test_rp_buckets_are_balanced_on_anisotropic_vectors(spark):
    """Axis buckets collapse to noise on correlated-leading-dim data;
    RP buckets must spread the corpus (max share bounded)."""
    emb, dim = _anisotropic_corpus(spark)
    nbits = 3
    rp_counts = (
        emb.select(vector.sign_bucket(F.col("embedding"), nbits, dim).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in rp_counts)
    max_share = max(r["count"] for r in rp_counts) / total
    # 8 clusters over 8 buckets: no bucket should swallow the corpus
    assert max_share <= 0.5, max_share


def test_asof_join_semantics(spark):
    """Inclusive match, latest-prior selection, and no-match nulls."""
    from blinkit_etl_pipeline_spark.operators.joins import asof_join

    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 15, "c")], "k int, t int, tag string"
    )
    left = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 25), (2, 14), (3, 99)], "k int, t int"
    )
    out = {
        (r["k"], r["t"]): (r["asof_t"], r["asof_tag"])
        for r in asof_join(left, right, ["k"], "t", "t", ["tag"]).collect()
    }
    assert out[(1, 5)] == (None, None)        # before any right row
    assert out[(1, 10)] == (10, "a")          # equal ts matches (inclusive)
    assert out[(1, 25)] == (20, "b")          # latest prior, not first
    assert out[(2, 14)] == (None, None)       # right row is later
    assert out[(3, 99)] == (None, None)       # key absent from right


def test_quantization_parity_across_engines(spark):
    """Spark round, DuckDB round, and pyquantize must agree on exact
    half-way values (ties away from zero), both signs — the foundation
    of the exact-integer dot-product contract."""
    import duckdb
    import numpy as np

    Q = vector.QSCALE
    vals = [1.5 / Q, -1.5 / Q, 2.5 / Q, -2.5 / Q, 0.3, -0.3, 0.123457]
    f32 = [float(np.float32(v)) for v in vals]
    srow = (
        spark.createDataFrame([(f32,)], "embedding array<float>")
        .select(vector.quantize(F.col("embedding")).alias("q"))
        .collect()[0]["q"]
    )
    drow = duckdb.sql(
        f"SELECT list_transform({f32}::DOUBLE[], x -> round(x * {Q}))"
    ).fetchone()[0]
    prow = [vector.pyquantize(v) for v in f32]
    assert srow == [int(x) for x in drow] == prow


def test_sign_bucket_dim_mismatch_raises(spark):
    """ADVICE r2: a dim mismatch must fail loudly, not bucket-0 everything."""
    import pytest

    df = spark.createDataFrame([(0, [1.0, 2.0])], "vec_id bigint, embedding array<float>")
    with pytest.raises(Exception, match="expected dim=8"):
        df.select(vector.sign_bucket(F.col("embedding"), 2, 8).alias("b")).collect()


def test_bucketed_pairs_ownership_equals_global_dedup(spark):
    """First-collision ownership must emit exactly the unique colliding
    pair set — verified against an independent Python reference that
    computes buckets from the same planes and dedups globally."""
    import numpy as np

    rng = __import__("random").Random(99)
    dim, n, nbits, ntables, threshold = 16, 120, 3, 4, 0.2
    rows = [
        (i, [float(rng.gauss(0, 1)) for _ in range(dim)]) for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    got = {
        (r["vec_a"], r["vec_b"])
        for r in vector.cosine_neardup_pairs(
            emb, threshold, nbits=nbits, dim=dim, ntables=ntables
        ).collect()
    }

    # reference: quantize, bucket per table, collide-in-ANY-table, dedup,
    # then exact cosine threshold — all in plain numpy
    planes = np.array(
        vector.rp_hyperplanes(dim, nbits * ntables), dtype=np.float64
    ).T
    Q = np.array(
        [[vector.pyquantize(np.float32(x)) for x in v] for _, v in rows],
        dtype=np.float64,
    )
    S = Q @ planes
    weights = np.array([1 << j for j in range(nbits)])
    cand = set()
    for t in range(ntables):
        buckets = (S[:, t * nbits : (t + 1) * nbits] > 0) @ weights
        by_bucket = {}
        for i, b in enumerate(buckets):
            by_bucket.setdefault(b, []).append(i)
        for members in by_bucket.values():
            for ai in range(len(members)):
                for bi in range(ai + 1, len(members)):
                    cand.add((members[ai], members[bi]))
    qq = (Q * Q).sum(axis=1)
    want = set()
    for a, b in cand:
        cos = (Q[a] @ Q[b]) / (np.sqrt(qq[a]) * np.sqrt(qq[b]))
        if cos >= threshold:
            want.add((a, b))
    assert got == want, (len(got), len(want))


def test_quantize_magnitude_guard(spark):
    """ADVICE r3: out-of-budget elements (|x| > 8 → |q| > 2^23) must
    fail loudly — they'd silently break the order-independent exact-sum
    contract that makes BLAS == JVM fold == DuckDB."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    ok = spark.createDataFrame(
        [(1, [7.9, -7.9, 0.0])], "vec_id bigint, embedding array<double>"
    )
    ok.select(vector.quantize(F.col("embedding")).alias("q")).collect()

    bad = spark.createDataFrame(
        [(1, [0.5, 9.1, 0.0])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(Exception, match="exactness budget"):
        bad.select(vector.quantize(F.col("embedding")).alias("q")).collect()

    with pytest.raises(ValueError, match="exactness budget"):
        vector.pyquantize(9.1)

    with pytest.raises(ValueError, match="exactness budget"):
        vector._np_stack([np.array([1.0, float(vector.QMAX) * 2])])


def test_semantic_dedup_policy_and_cluster_blindness(spark):
    """Lowest-id-wins within a cluster; near-duplicates that straddle a
    cluster boundary are BOTH kept (the documented SemDeDup
    approximation)."""
    from blinkit_etl_pipeline_spark.operators import vector

    dim = 4
    ex = [1.0, 0.0, 0.0, 0.0]
    ey = [0.0, 1.0, 0.0, 0.0]
    codebook = [(0, ex), (1, ey)]
    rows = [
        (0, [1.0, 0.1, 0.0, 0.0]),   # cluster 0, kept (lowest id)
        (1, [1.0, 0.11, 0.0, 0.0]),  # cluster 0, ~identical to 0 → drop
        (2, [0.1, 1.0, 0.0, 0.0]),   # cluster 1: near-dup of 0/1 in
                                     # DIRECTION? no — near ey, kept
        (3, [0.0, 1.0, 0.05, 0.0]),  # cluster 1, ~identical to 2 → drop
        (4, [-1.0, 0.6, 0.0, 0.0]),  # cluster 1 (closer to ey), alone-ish
    ]
    emb = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<double>"
    )
    out = {
        r["vec_id"]: r
        for r in vector.semantic_dedup(emb, codebook, threshold=0.9).collect()
    }
    assert out[0]["is_kept"] and out[0]["max_lower_sim"] is None
    assert not out[1]["is_kept"] and out[1]["max_lower_sim"] > 0.99
    assert out[2]["is_kept"]  # lowest id of cluster 1
    assert not out[3]["is_kept"]
    assert out[4]["is_kept"] and out[4]["max_lower_sim"] < 0.9
    assert out[0]["centroid_id"] == out[1]["centroid_id"] == 0
    assert out[2]["centroid_id"] == out[3]["centroid_id"] == 1


def test_semantic_dedup_tiling_is_result_invariant(spark, monkeypatch):
    """Forcing 1-row tiles (tiny _BLOCK_CELLS) must not change a single
    keep/drop decision or found pair — the memory-bounding is pure
    mechanics."""
    from blinkit_etl_pipeline_spark.operators import vector

    dim = 4
    codebook = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    rows = [
        (i, [1.0 - 0.01 * i, 0.01 * i, 0.0, 0.0]) for i in range(12)
    ] + [(100 + i, [0.02 * i, 1.0, 0.0, 0.0]) for i in range(9)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    big = sorted(
        map(tuple, vector.semantic_dedup(emb, codebook, 0.95).collect())
    )
    pairs_big = sorted(
        map(tuple, vector.semantic_neardup_pairs(emb, codebook, 0.95).collect())
    )
    monkeypatch.setattr(vector, "_BLOCK_CELLS", 8)
    small = sorted(
        map(tuple, vector.semantic_dedup(emb, codebook, 0.95).collect())
    )
    pairs_small = sorted(
        map(tuple, vector.semantic_neardup_pairs(emb, codebook, 0.95).collect())
    )
    assert big == small
    assert pairs_big == pairs_small and len(pairs_big) > 0


def test_ivfpq_probe_all_equals_flat_pq(spark):
    """With nprobe = num_centroids the coarse pruning is a no-op, so
    IVFPQ must reproduce the flat PQ tier EXACTLY (both raw-ADC and
    reranked) — the composition adds pruning, never changes scoring."""
    from blinkit_etl_pipeline_spark.plans.codebook import (
        PQ_CODEBOOK,
        TRAINED_IVF_CODEBOOK,
    )

    emb = _emb(spark)
    qids = range(4)
    for kwargs in ({}, {"rerank": 20}):
        flat = sorted(
            map(tuple, vector.pq_adc_topk(emb, qids, PQ_CODEBOOK, k=3, **kwargs).collect())
        )
        comp = sorted(
            map(
                tuple,
                vector.ivfpq_topk(
                    emb, qids, TRAINED_IVF_CODEBOOK, PQ_CODEBOOK, k=3,
                    nprobe=len(TRAINED_IVF_CODEBOOK), **kwargs,
                ).collect(),
            )
        )
        assert flat == comp


def test_ivfpq_results_come_only_from_probed_lists(spark):
    """Every neighbor a query reports must live in one of that query's
    nprobe probed inverted lists — the pruning contract."""
    from blinkit_etl_pipeline_spark.plans.codebook import (
        PQ_CODEBOOK,
        TRAINED_IVF_CODEBOOK,
    )

    emb = _emb(spark)
    out = vector.ivfpq_topk(
        emb, range(4), TRAINED_IVF_CODEBOOK, PQ_CODEBOOK, k=3, nprobe=2, rerank=10
    ).collect()
    assigned = {
        r["vec_id"]: r["centroid_id"]
        for r in vector.ivf_assign(
            vector.with_q(emb), TRAINED_IVF_CODEBOOK
        ).collect()
    }
    import numpy as np

    cids, C, cqq = vector._qcodebook(
        sorted((int(c), [float(x) for x in v]) for c, v in TRAINED_IVF_CODEBOOK)
    )
    q = vector.with_q(emb).filter(F.col("vec_id") < 4).collect()
    probe = {}
    for r in q:
        v = np.array(list(r["qvec"]), dtype=np.float64)
        cos = (v @ C.T) / (np.sqrt(float(r["qq"])) * np.sqrt(cqq))
        probe[r["vec_id"]] = {
            int(cids[j]) for j in np.lexsort((cids, -cos))[:2]
        }
    assert len(out) == 12
    for r in out:
        assert assigned[r["neighbor_id"]] in probe[r["query_id"]]


def test_store_topk_kernels_validate_dim(spark):
    """ADVICE r6: the stored-probe kernels accepted a dim they never
    checked — a query frame wider than m*sub would silently ignore
    trailing dimensions and return wrong neighbors. They must raise,
    exactly like their on-the-fly siblings."""
    import pytest

    from blinkit_etl_pipeline_spark.plans.codebook import (
        PQ_CODEBOOK,
        TRAINED_IVF_CODEBOOK,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codes = vector.pq_encode(
        emb.limit(20), PQ_CODEBOOK, ivf_codebook=TRAINED_IVF_CODEBOOK
    )
    with pytest.raises(ValueError, match="geometry"):
        vector.pq_store_adc_topk(codes, emb, range(2), PQ_CODEBOOK, dim=32)
    with pytest.raises(ValueError, match="geometry"):
        vector.ivfpq_store_topk(
            codes, emb, range(2), TRAINED_IVF_CODEBOOK, PQ_CODEBOOK, dim=32
        )
    # width mismatch between the query frame and a VALID geometry:
    # widen the codebook instead (m*sub = 128 != embedding width 64)
    wide = [(j, c, list(v) + list(v)) for j, c, v in PQ_CODEBOOK]
    with pytest.raises(ValueError, match="width"):
        vector.pq_store_adc_topk(codes, emb, range(2), wide, dim=128)


def test_sq8_reconstruction_error_is_bounded(spark):
    """SQ8 codes round-trip within half a quantization step per dim:
    |recon - x| <= range/510 + 1 on the integer lattice."""
    import random

    from blinkit_etl_pipeline_spark.operators import vector as V

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    stats = V.sq8_stats(emb)
    q = V.with_q(emb)
    got = q.select(
        "qvec", V.sq8_recon(F.col("qvec"), stats).alias("rv")
    ).collect()
    steps = [max(mx - mn, 0) / 255.0 for mn, mx in stats]
    for r in got:
        for d, (x, rx) in enumerate(zip(r["qvec"], r["rv"])):
            assert abs(rx - x) <= steps[d] / 2 + 1


def test_sq8_topk_high_recall_vs_brute(spark):
    """8 bits/dim is a fine lattice — top-k should nearly match the
    exact ranking on a well-spread corpus."""
    import random

    from blinkit_etl_pipeline_spark.operators import quality as Q
    from blinkit_etl_pipeline_spark.operators import vector as V

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    truth = V.brute_force_topk(emb, range(8), k=5)
    approx = V.sq8_topk(emb, range(8), k=5)
    rec = Q.topk_recall(truth, approx, 5, "sq8").agg(
        F.avg("recall_at_k")
    ).collect()[0][0]
    assert rec >= 0.9


def test_knn_graph_shape_and_refinement(spark):
    """r10: the NN-Descent k-NN graph — per-node edge count ≤ k with
    dense ranks, every edge's cosine exact vs a direct recompute, and
    one refinement round never hurts (and here strictly helps) recall
    against the exact graph; the construction never goes all-pairs
    (the candidate volume stays bucket + k² bounded — plan asserted
    free of cartesian products)."""
    emb = _emb(spark)
    k = 5
    g1 = vector.knn_graph(emb, k=k, iters=1).cache()
    per_node = g1.groupBy("node_id").count().collect()
    assert all(r["count"] <= k for r in per_node)
    ranks = g1.groupBy("node_id").agg(
        F.max("rank").alias("mx"), F.count("*").alias("n")
    )
    assert ranks.filter(F.col("mx") != F.col("n")).count() == 0
    # exactness of edge scores: recompute one node's cosines directly
    assert "CartesianProduct" not in g1._jdf.queryExecution().executedPlan().toString()
    probe_ids = list(range(16))
    truth = vector.brute_force_topk(emb, probe_ids, k=k).select(
        "query_id", "neighbor_id"
    )

    def recall(g):
        gq = g.filter(F.col("node_id") < 16).select(
            F.col("node_id").alias("query_id"), "neighbor_id"
        )
        hit = gq.join(truth, ["query_id", "neighbor_id"]).count()
        return hit / (16 * k)

    g0 = vector.knn_graph(emb, k=k, iters=0)
    r0, r1 = recall(g0), recall(g1)
    assert r1 >= r0
    assert r1 > 0.5
    # sampled-seed scale mode: per-node degree still ≤ k, no neighbor
    # appears twice (capped kernels skip ownership dedup; the explicit
    # dropDuplicates must absorb cross-table repeats), refinement still
    # finds usable neighbors
    gc = vector.knn_graph(emb, k=k, iters=2, seed_cap=8)
    dup = gc.groupBy("node_id", "neighbor_id").count().filter(
        F.col("count") > 1
    )
    assert dup.count() == 0
    assert gc.groupBy("node_id").count().agg(F.max("count")).collect()[0][0] <= k
    assert recall(gc) > 0.3
    g1.unpersist()


def test_graph_search_recall_and_determinism(spark):
    """r10 addendum: graph-traversal serving — the beam walk over the
    k-NN graph must (a) be deterministic, (b) return exactly k ranked
    rows per query with ranks consistent with cosine order, and (c)
    recall at least what its own LSH entry points recall (the walk
    only ever ADDS scored candidates to the pool)."""
    emb = _emb(spark)
    qids = list(range(12))
    g = vector.knn_graph(emb, k=5, iters=1)
    res = vector.graph_search_topk(emb, g, qids, k=5, beam=8, rounds=2)
    rows = sorted(map(tuple, res.collect()))
    assert rows == sorted(map(tuple, vector.graph_search_topk(
        emb, g, qids, k=5, beam=8, rounds=2
    ).collect()))
    per_q = {}
    for qid, nid, cos, rank in rows:
        assert nid != qid
        per_q.setdefault(qid, []).append((rank, cos))
    for qid, rc in per_q.items():
        assert len(rc) == 5, qid
        by_rank = [c for _, c in sorted(rc)]
        assert by_rank == sorted(by_rank, reverse=True), qid

    truth = vector.brute_force_topk(emb, qids, k=5).select(
        "query_id", "neighbor_id"
    )
    def recall(df):
        return df.select("query_id", "neighbor_id").join(
            truth, ["query_id", "neighbor_id"]
        ).count()

    assert recall(res) >= recall(vector.lsh_topk(emb, qids, k=5))


def test_mmr_lam1_degenerates_to_relevance_order(spark):
    """With lam=1.0 the diversity term vanishes: the greedy loop must
    reproduce exact-cosine relevance order (scores = rel)."""
    emb = _emb(spark)
    qids = range(4)
    mmr = vector.mmr_topk(emb, qids, k=4, cand=12, lam=1.0).collect()
    brute = vector.brute_force_topk(emb, qids, k=4).collect()
    got = {(r["query_id"], r["mmr_rank"]): r["neighbor_id"] for r in mmr}
    want = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in brute}
    assert got == want


def test_mmr_structure_and_diversity_gain(spark):
    emb = _emb(spark)
    qids = range(4)
    k, cand = 4, 12
    mmr = vector.mmr_topk(emb, qids, k=k, cand=cand, lam=0.5)
    rows = mmr.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == set(qids)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in vector.brute_force_topk(emb, qids, k=cand).collect()
    }
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in vector.brute_force_topk(emb, qids, k=1).collect()
    }
    for q, rs in per_q.items():
        assert len(rs) == k
        ids = [r["neighbor_id"] for r in rs]
        assert len(set(ids)) == k  # no repeats
        assert all((q, i) in brute for i in ids)  # within the shortlist
        first = min(rs, key=lambda r: r["mmr_rank"])
        assert first["neighbor_id"] == top1[q]  # pick 1 = relevance argmax
    div = vector.mmr_diversity(emb, qids, k=k, cand=cand, lam=0.5).collect()
    assert len(div) == len(list(qids))
    for r in div:
        # the whole point of the rerank: picked set no less diverse,
        # at a relevance price bounded by the relevance top-k's mean
        assert r["mmr_avg_sim"] <= r["topk_avg_sim"] + 1e-9
        assert r["mmr_avg_rel"] <= r["topk_avg_rel"] + 1e-9


def test_facility_select_greedy_properties(spark):
    emb = _emb(spark)
    rows = vector.facility_select(
        emb, k_sel=5, knn_k=4, iters=1, nbits=6, ntables=4
    ).collect()
    rows.sort(key=lambda r: r["sel_rank"])
    assert [r["sel_rank"] for r in rows] == [1, 2, 3, 4, 5]
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 5  # no repeats
    gains = [r["gain_q6"] for r in rows]
    # submodularity: greedy marginal gains are non-increasing
    assert all(a >= b for a, b in zip(gains, gains[1:])), gains
    # coverage is the exact running sum of gains (integer bookkeeping)
    cum = 0
    for r in rows:
        cum += r["gain_q6"]
        assert r["coverage_q6"] == cum
    assert gains[-1] >= 0
