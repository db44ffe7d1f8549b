"""Exact-integer k-means: blob recovery, inertia monotonicity,
empty-cluster determinism."""

from __future__ import annotations

from blinkit_etl_pipeline_spark.operators import cluster


def _blobs(spark, centers, per=20, spread=0.01, dim=8):
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for p in range(per):
            jitter = ((ci * per + p) % 7 - 3) * spread
            rows.append((vid, [float(c[d] + jitter) for d in range(dim)]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_kmeans_recovers_separated_blobs(spark):
    centers = [[0.0] * 8, [1.0] * 8, [-1.0] * 8]
    emb = _blobs(spark, centers)
    out = cluster.kmeans_exact(emb, k=3, iters=3, dim=8).collect()
    lab = {r.vec_id: r.cluster for r in out}
    blobs = [set(lab[v] for v in range(b * 20, (b + 1) * 20))
             for b in range(3)]
    assert all(len(b) == 1 for b in blobs)  # each blob one label
    assert len(set().union(*blobs)) == 3  # all three labels used
    assert max(r.dist_q for r in out) < 8 * (40_000 ** 2)  # tight fit


def test_kmeans_more_iters_never_increase_inertia(spark):
    centers = [[0.3 * i] * 8 for i in range(4)]
    emb = _blobs(spark, centers, per=15, spread=0.05)
    inertia = []
    for it in [0, 1, 3]:
        out = cluster.kmeans_exact(emb, k=4, iters=it, dim=8).collect()
        inertia.append(sum(r.dist_q for r in out))
    assert inertia[1] <= inertia[0] and inertia[2] <= inertia[1]


def test_kmeans_empty_cluster_keeps_centroid_and_is_deterministic(spark):
    # 2 distinct locations, k=3: one cluster must empty out
    emb = _blobs(spark, [[0.0] * 8, [2.0] * 8], per=10, spread=0.0)
    a = sorted(
        (r.vec_id, r.cluster, r.dist_q)
        for r in cluster.kmeans_exact(emb, k=3, iters=3, dim=8).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster, r.dist_q)
        for r in cluster.kmeans_exact(emb, k=3, iters=3, dim=8).collect()
    )
    assert a == b
    assert len({c for _, c, _ in a}) == 2  # only 2 populated clusters
