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
    assigned = vector.ivf_assign(emb, codebook)
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
        assert abs(nrm - 1.0) < 1e-9  # spherical: unit centroids
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
