"""Beyond-bench scale rows for the r10-addendum + r11 families
(VERDICT r10 tasks #1/#2/#3/#7/#8) — the r7-r10 spot-tool pattern:
timing starts at query construction, every run forces materialization
(noop sink / count), corpora come from /tmp/sfscale (sf1 = 20k
vectors / 1M events / 50k docs; sf10 = 200k / 10M / 500k) with
in-memory replication above that.

Spots:
- ``graphserve``: graph-ANN serving walls across 20k → 200k → 2M
  vectors — ingest per drop (nbits widened at scale, the documented
  IVF-k analogue), then the store-seeded walk (pruned bucket files →
  beam rounds). Claim: seed scan flat (probe-sized file pruning),
  per-hop work query-bound, so serving wall ~flat while corpus grows
  100×.
- ``sq8serve``: the same serving combo from the SQ8-coded store —
  walk wall ≈ the full-precision walk at every scale while the
  persisted vector payload is ~8× smaller (byte codes vs int64
  lattice; both store sizes printed from the manifest files).
- ``hllcms``: HLL register + signed-CMS cell folds at 100M events —
  each 10M-event drop folds map-side into ≤512/≤1024-row partials;
  the 10th drop (store already holding 90M events' partials) must
  cost ~the 1st (drop-priced, corpus-independent); reads store-sized.
- ``runner_ivm``: the curated campaign_summary store folding a
  day-sized KPI drop against an sf100-scale history (~9.7M KPI rows
  ingested first) — drop-priced refresh at history scale, read
  store-sized.
- ``backfill``: knn takedown-depth repair at 200k vectors — repair
  wall ∝ over-drained nodes (takedown depth), never the corpus:
  measured at 4 vs 16 retracted mates on a zero-slack store.
- ``release``: the r11 corpus-release capstone at 500k docs — drop
  ingest walls (each ∝ its drop), the model-gated release read from
  stores (one postings pass, no re-tokenization), takedown + re-read.
- ``drift``: drift_from_store at 2M-vector occupancy — partial
  ingest ∝ the drop (one Arrow assign pass), the PSI gate read
  store-sized (≤k rows) at any corpus size.

Run: python tools/scale_spot_r11.py [which ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

SF1 = "/tmp/sfscale/sf1.0"
SF10 = "/tmp/sfscale/sf10"


def sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _store_bytes(table: str) -> int:
    from blinkit_etl_pipeline_spark.operators import snapshot

    m = snapshot.read_manifest(table)
    return sum(os.path.getsize(e["path"]) for e in m["files"])


def _emb2m(spark):
    """2M vectors: sf10 embeddings replicated 10× with a per-replica
    ±1 diagonal (the scale_testdata recipe — norm-preserving,
    cross-replica decorrelated), ids offset by replica."""
    import hashlib

    base = spark.read.parquet(f"{SF10}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = 200_000
    parts = []
    for r in range(10):
        if r == 0:
            parts.append(base)
            continue
        seed = hashlib.md5(f"r{r}".encode()).digest()
        signs = [1 if seed[i % 16] >> (i % 8) & 1 else -1 for i in range(64)]
        sign_col = F.array(
            *[F.lit(float(s)).cast("float") for s in signs]
        )
        parts.append(
            base.select(
                (F.col("vec_id") + F.lit(r * n)).alias("vec_id"),
                F.zip_with(
                    "embedding", sign_col, lambda x, s: x * s
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _serve_spot(spark, label, ingest_fn, search_fn, corpora) -> None:
    from blinkit_etl_pipeline_spark.operators import incremental

    for name, emb, nbits, drops in corpora:
        vs = tempfile.mkdtemp(prefix=f"{label}-{name}-") + "/vecs"
        gs = vs[: -len("/vecs")] + "/graph"
        t0 = time.perf_counter()
        for d in range(drops):
            ingest_fn(
                spark, vs, gs, emb.filter(F.col("vec_id") % drops == d),
                nbits=nbits,
            )
        t_ing = time.perf_counter() - t0
        qids = [1, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53]
        t0 = time.perf_counter()
        res = incremental.graph_search_from_store(
            spark, gs, vs, qids, k=5, beam=8, rounds=2, nbits=nbits,
        )
        nrows = res.count()
        t_serve = time.perf_counter() - t0
        print(
            f"{label} {name}: ingest({drops} drops)={t_ing:.1f}s "
            f"serve16q={t_serve:.2f}s rows={nrows} "
            f"vec_store={_store_bytes(vs) / 1e6:.1f}MB"
        )


def spot_graphserve(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import incremental

    def ing(spark_, vs, gs, emb, nbits):
        incremental.ingest_knn_graph(
            spark_, vs, gs, emb, k=5, nbits=nbits,
            compact_threshold=None,
        )

    corpora = [
        ("sf1-20k", spark.read.parquet(f"{SF1}/embeddings.parquet"), 6, 2),
        ("sf10-200k", spark.read.parquet(f"{SF10}/embeddings.parquet"), 9, 4),
        ("sf100-2M", _emb2m(spark), 12, 8),
    ]
    _serve_spot(spark, "graphserve", ing, None, corpora)


def spot_sq8serve(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import incremental, vector

    def ing(spark_, vs, gs, emb, nbits):
        incremental.ingest_knn_graph_sq8(
            spark_, vs, gs, emb, k=5, nbits=nbits,
            compact_threshold=None,
        )

    # the corpus-growth flatness claim is graphserve's (same walk);
    # this spot's claim is PARITY: sq8 serve wall ~= the full-precision
    # wall at the same scale, from an 8x smaller vector payload
    corpora = [
        ("sf1-20k", spark.read.parquet(f"{SF1}/embeddings.parquet"), 6, 2),
        ("sf10-200k", spark.read.parquet(f"{SF10}/embeddings.parquet"), 9, 4),
    ]
    _serve_spot(spark, "sq8serve", ing, None, corpora)


def spot_hllcms(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import incremental

    ev = spark.read.parquet(f"{SF10}/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    n = ev.count()
    hstore = tempfile.mkdtemp(prefix="hll100m-") + "/hll"
    cstore = tempfile.mkdtemp(prefix="cms100m-") + "/cms"
    walls_h, walls_c = [], []
    for r in range(10):
        drop = ev.select(
            (F.col("event_id") + F.lit(r * n)).alias("event_id"),
            "event_type",
            (F.col("user_id") + F.lit(r * 1_000_000)).alias("user_id"),
        )
        t0 = time.perf_counter()
        incremental.ingest_hll_registers(
            spark, hstore, drop, ["event_type"], "user_id",
            batch_id=f"d{r}",
        )
        walls_h.append(round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        incremental.ingest_cms_cells(
            spark, cstore, drop.select(
                F.concat_ws(":", "event_type", (F.col("user_id") % 97))
                .alias("k")
            ),
            "k", batch_id=f"d{r}",
        )
        walls_c.append(round(time.perf_counter() - t0, 2))
    t0 = time.perf_counter()
    est = incremental.hll_distinct_from_store(
        spark, hstore, ["event_type"]
    ).collect()
    t_read_h = time.perf_counter() - t0
    t0 = time.perf_counter()
    probe = incremental.cms_probe_from_store(
        spark, cstore,
        spark.createDataFrame([(f"view:{i}",) for i in range(8)], "k string"),
        "k",
    ).collect()
    t_read_c = time.perf_counter() - t0
    print(f"hllcms 100M: hll drop walls={walls_h} read={t_read_h:.2f}s "
          f"groups={len(est)}")
    print(f"hllcms 100M: cms drop walls={walls_c} probe={t_read_c:.2f}s "
          f"rows={len(probe)}")


def spot_runner_ivm(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import curated
    from blinkit_etl_pipeline_spark.pipelines import marketing_roi
    from blinkit_etl_pipeline_spark.sources.testdata import register_blinkit

    t = register_blinkit(spark, "/root/testdata/sf0.1")
    kpis = marketing_roi.marketing_kpis(t["b_marketing"]).select(
        "campaign_id", "campaign_name", "channel", "date", "spend",
        "revenue_generated", "conversions", "ctr", "conversion_rate",
        "roas_calculated",
    )
    n = kpis.count()
    hist = None
    for r in range(100):  # ~100× the sf0.1 KPI table ≈ sf100-scale rows
        p = kpis.withColumn(
            "campaign_id", F.concat_ws("-", "campaign_id", F.lit(r))
        )
        hist = p if hist is None else hist.unionByName(p)
    store = tempfile.mkdtemp(prefix="runnerivm-") + "/campaign_summary"
    t0 = time.perf_counter()
    curated.ingest_curated_deltas(
        spark, store, "campaign_summary", hist, batch_id="history",
    )
    t_hist = time.perf_counter() - t0
    day = kpis.withColumn(
        "campaign_id", F.concat_ws("-", "campaign_id", F.lit("new"))
    ).limit(300).localCheckpoint(eager=True)  # the drop file, landed
    t0 = time.perf_counter()
    curated.ingest_curated_deltas(
        spark, store, "campaign_summary", day, batch_id="day-drop",
    )
    t_day = time.perf_counter() - t0
    t0 = time.perf_counter()
    nrows = curated.read_curated(spark, store, "campaign_summary").count()
    t_read = time.perf_counter() - t0
    print(f"runner_ivm: history({n * 100} rows)={t_hist:.1f}s "
          f"day-drop(300 rows)={t_day:.2f}s read={t_read:.2f}s "
          f"view_rows={nrows}")


def spot_backfill(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import incremental, snapshot

    emb = spark.read.parquet(f"{SF10}/embeddings.parquet")
    vs = tempfile.mkdtemp(prefix="backfill-") + "/vecs"
    gs = vs[: -len("/vecs")] + "/graph"
    t0 = time.perf_counter()
    incremental.ingest_knn_graph(
        spark, vs, gs, emb, k=5, store_k=5, nbits=9,
        compact_threshold=None,
    )
    print(f"backfill: ingest 200k zero-slack = {time.perf_counter()-t0:.1f}s")
    neigh = [
        int(r["v"])
        for r in snapshot.read_snapshot(spark, gs)
        .select("v").distinct().limit(16).collect()
    ]
    for depth in (4, 16):
        gone = neigh[:depth]
        incremental.retract_docs(spark, vs, gone, id_col="vec_id")
        t0 = time.perf_counter()
        incremental.backfill_knn_depth(spark, vs, gs, k=5, store_k=5)
        print(f"backfill: depth={depth} repair={time.perf_counter()-t0:.2f}s")


def spot_release(spark) -> None:
    # 500k docs = sf0.1 replicated 10x VERBATIM (ids offset, text
    # unchanged): the sfscale corpus suffixes every token per replica,
    # which language-IDs every doc 'und' and empties the release —
    # verbatim replicas keep the gates meaningful AND let the exact
    # dedup demonstrate its job (cross-replica dups collapse to the
    # min-id copy, so the release is ~the base corpus's).
    from blinkit_etl_pipeline_spark.operators import release

    base = spark.read.parquet(
        "/root/testdata/sf0.1/documents.parquet"
    )
    n = base.count()
    parts = [base]
    for r in range(1, 10):
        parts.append(
            base.withColumn(
                "doc_id", (F.col("doc_id") + F.lit(r * n)).cast("long")
            )
        )
    docs = parts[0]
    for p_ in parts[1:]:
        docs = docs.unionByName(p_)
    root = tempfile.mkdtemp(prefix="release500k-") + "/rel"
    walls = []
    for m in (0, 1, 2):
        t0 = time.perf_counter()
        release.ingest_release(
            spark, root, docs.filter(F.col("doc_id") % 3 == m)
        )
        walls.append(round(time.perf_counter() - t0, 1))
    rates = {"en": 0.3, "zh": 0.5, "de": 1.0, "fr": 1.0}
    t0 = time.perf_counter()
    n1 = release.release_read(
        spark, root, strata_rates=rates, default_rate=0.2
    ).count()
    t_read = time.perf_counter() - t0
    release.release_takedown(spark, root, [5, 8, 13, 21])
    t0 = time.perf_counter()
    n2 = release.release_read(
        spark, root, strata_rates=rates, default_rate=0.2
    ).count()
    t_read2 = time.perf_counter() - t0
    print(f"release 500k docs: ingest walls={walls} read={t_read:.1f}s "
          f"({n1} rows) post-takedown read={t_read2:.1f}s ({n2} rows)")


def spot_drift(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import incremental, vector

    emb = spark.read.parquet(f"{SF10}/embeddings.parquet")
    big = _emb2m(spark)
    cb = vector.kmeans_codebook(
        emb.filter(F.col("vec_id") < 2000), k=8, iters=5
    )
    store = tempfile.mkdtemp(prefix="drift2m-") + "/drift"
    t0 = time.perf_counter()
    ref_v = incremental.ingest_drift_buckets(
        spark, store, incremental.ivf_occupancy_partial(emb, cb),
        batch_id="ref-200k",
    )
    t_ref = time.perf_counter() - t0
    t0 = time.perf_counter()
    incremental.ingest_drift_buckets(
        spark, store, incremental.ivf_occupancy_partial(big, cb),
        batch_id="arrivals-2M",
    )
    t_arr = time.perf_counter() - t0
    t0 = time.perf_counter()
    rows = incremental.drift_from_store(spark, store, ref_v).collect()
    t_read = time.perf_counter() - t0
    print(f"drift: ref-ingest(200k)={t_ref:.1f}s arrivals-ingest(2M)="
          f"{t_arr:.1f}s psi-read={t_read:.2f}s rows={len(rows)} "
          f"psi={float(rows[0]['psi']):.4f}")


def spot_serve2m(spark) -> None:
    """Serving wall at 2M vectors, with the store built DIRECTLY:
    the full ingest_knn_graph pairing at 2M needs more shuffle-spill
    disk than this box has (the 12-bit kernel emits ~8G candidate
    cells before the top-k fold — fine on a cluster's shuffle tier,
    not on one NVMe), so the vec store is one bucket_frame pass over
    the corpus and the graph is the 200k store's folded graph LIFTED
    to every replica (sign-flip diagonals preserve within-replica
    cosines exactly, so each lifted copy IS that replica's true
    within-replica k-NN graph; cross-replica affinity is decorrelated
    by construction). What this spot measures — the serving walk —
    is bit-honest: real bucket rows, real seeds, real beam rounds
    over a 2M-node store."""
    import glob as _glob

    from blinkit_etl_pipeline_spark.operators import incremental, snapshot, vector
    from blinkit_etl_pipeline_spark.operators.vector import bucket_frame, with_q

    src = sorted(_glob.glob("/tmp/graphserve-sf10-200k-*/graph"))
    if not src:
        print("serve2m: run graphserve first (needs the 200k graph store)")
        return
    big = _emb2m(spark)
    nbits = 12
    root = tempfile.mkdtemp(prefix="serve2m-")
    vs, gs = root + "/vecs", root + "/graph"
    t0 = time.perf_counter()
    rows = (
        bucket_frame(with_q(big), nbits, 8, 64)
        .withColumn(
            "tb", (F.col("t") * (1 << nbits) + F.col("bucket")).cast("int")
        )
        .select("vec_id", "qvec", "qq", "t", "bucket", "tb")
    )
    snapshot.write_snapshot(rows, vs, stats_col="tb")
    t_vec = time.perf_counter() - t0
    t0 = time.perf_counter()
    g200 = incremental.knn_graph_from_store(spark, src[0], k=5).select(
        F.col("node_id").alias("u"), F.col("neighbor_id").alias("v"),
        F.col("cosine_sim").alias("cos_raw"),
    )
    lifted = None
    for r in range(10):
        p_ = g200.select(
            (F.col("u") + F.lit(r * 200_000)).alias("u"),
            (F.col("v") + F.lit(r * 200_000)).alias("v"),
            "cos_raw",
        )
        lifted = p_ if lifted is None else lifted.unionByName(p_)
    snapshot.write_snapshot(lifted, gs)
    t_graph = time.perf_counter() - t0
    qids = [1, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53]
    t0 = time.perf_counter()
    n = incremental.graph_search_from_store(
        spark, gs, vs, qids, k=5, beam=8, rounds=2, nbits=nbits
    ).count()
    t_serve = time.perf_counter() - t0
    print(
        f"serve2m: vec-store(2M)={t_vec:.1f}s graph-lift={t_graph:.1f}s "
        f"serve16q={t_serve:.2f}s rows={n} "
        f"vec_store={_store_bytes(vs) / 1e6:.0f}MB"
    )


def spot_serve2m_slim(spark) -> None:
    """serve2m with the r11 SLIM layout (key-only bucket rows +
    payload twin): same walk, same graph — the delta vs serve2m is
    pure layout, isolating how much of the 2M serving wall was the
    scan of payloads duplicated across ntables bucket rows."""
    import glob as _glob

    from blinkit_etl_pipeline_spark.operators import incremental, snapshot
    from blinkit_etl_pipeline_spark.operators.vector import bucket_frame, with_q

    src = sorted(_glob.glob("/tmp/graphserve-sf10-200k-*/graph"))
    if not src:
        print("serve2m_slim: run graphserve first")
        return
    big = _emb2m(spark)
    nbits = 12
    root = tempfile.mkdtemp(prefix="serve2mslim-")
    vs, gs, ps = root + "/vecs", root + "/graph", root + "/payload"
    t0 = time.perf_counter()
    rows = (
        bucket_frame(with_q(big), nbits, 8, 64)
        .withColumn(
            "tb", (F.col("t") * (1 << nbits) + F.col("bucket")).cast("int")
        )
    )
    snapshot.write_snapshot(
        rows.filter(F.col("t") == 0).select("vec_id", "qvec", "qq"),
        ps, stats_col="vec_id",
    )
    snapshot.write_snapshot(
        rows.select("vec_id", "t", "bucket", "tb"), vs, stats_col="tb"
    )
    snapshot.ensure_table_properties(vs, {"payload_store": ps})
    t_vec = time.perf_counter() - t0
    g200 = incremental.knn_graph_from_store(spark, src[0], k=5).select(
        F.col("node_id").alias("u"), F.col("neighbor_id").alias("v"),
        F.col("cosine_sim").alias("cos_raw"),
    )
    lifted = None
    for r in range(10):
        p_ = g200.select(
            (F.col("u") + F.lit(r * 200_000)).alias("u"),
            (F.col("v") + F.lit(r * 200_000)).alias("v"),
            "cos_raw",
        )
        lifted = p_ if lifted is None else lifted.unionByName(p_)
    snapshot.write_snapshot(lifted, gs)
    qids = [1, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53]
    t0 = time.perf_counter()
    n = incremental.graph_search_from_store(
        spark, gs, vs, qids, k=5, beam=8, rounds=2, nbits=nbits
    ).count()
    t_serve = time.perf_counter() - t0
    print(
        f"serve2m_slim: stores(2M)={t_vec:.1f}s serve16q={t_serve:.2f}s "
        f"rows={n} slim+payload="
        f"{(_store_bytes(vs) + _store_bytes(ps)) / 1e6:.0f}MB"
    )


SPOTS = {
    "serve2m": spot_serve2m,
    "serve2m_slim": spot_serve2m_slim,
    "graphserve": spot_graphserve,
    "sq8serve": spot_sq8serve,
    "hllcms": spot_hllcms,
    "runner_ivm": spot_runner_ivm,
    "backfill": spot_backfill,
    "release": spot_release,
    "drift": spot_drift,
}


def main() -> None:
    which = sys.argv[1:] or list(SPOTS)
    spark = get_session("scale-spot-r11")
    for name in which:
        t0 = time.perf_counter()
        SPOTS[name](spark)
        print(f"[{name}] total {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
