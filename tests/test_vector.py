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
