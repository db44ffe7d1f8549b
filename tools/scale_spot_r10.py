"""sf100-class spot rows for the r9/r10 additions (VERDICT r9 task #6
+ this round's new operators), the r7-r9 pattern.

Relational tables replicate the sf10 files 10x in-memory with id
offsets (600M lineitem / 150M orders); documents/embeddings read the
materialized /tmp/sfscale/sf100 parquet. Timing starts at query
construction (the r7 scale-tool rule) and every run forces full
materialization (noop sink / sum-agg), so column pruning can't fake a
cheaper plan.

Spots:
- ``snapdiff``:  ns_snapshot_diff's manifest cancellation at 2.5M-obs
  store scale — the version diff must cost ~the touched-bucket delta,
  not the table (measured against a naive full exceptAll diff).
- ``maintain``:  pagerank_maintain routing overhead at 32M edges —
  the pre-flight probe with pinned n_srcs vs calling pagerank_delta
  directly (same ring-lattice/churn recipe as scale_pagerank_incr_r9).
- ``quality``:   ns_quality_quantiles at 600M lineitem rows (shares
  quantiles_multi's two scans — expect the same scan-bound shape).
- ``keywords`` / ``pmi``: the r9 text additions over the 5M-doc sf100
  corpus.
- ``incr``:      ns_incr_delivery_partner's partial fold at 150M
  orders (map-side partials; output is partner-sized).
- ``knn``:       knn_graph at sf1 (20k, exact seeds) and sf10 (200k,
  nbits=8 + seed_cap=64 — the documented scale knobs).

Run: python tools/scale_spot_r10.py [which ...]
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
SF100_DOCS = "/tmp/sfscale/sf100/documents.parquet"
COPIES = 10


def replicate(df, id_cols: dict[str, int]):
    parts = []
    for i in range(COPIES):
        p = df
        for c, stride in id_cols.items():
            p = p.withColumn(c, (F.col(c) + F.lit(i * stride)).cast("long"))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def spot_snapdiff(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import scd, snapshot

    ev = spark.read.parquet(f"{SF10}/events.parquet").filter(
        F.col("user_id") % 4 == 0
    ).select("user_id", "event_type", "ts", "event_id")
    cutoff = F.lit("2024-01-29 00:00:00").cast("timestamp")
    table = tempfile.mkdtemp(prefix="snapdiff-r10-") + "/dim"
    t0 = time.perf_counter()
    scd.scd2_apply_snapshot(
        spark, table, ev.filter(F.col("ts") <= cutoff),
        "user_id", "event_type", "ts", "event_id", n_buckets=64,
    )
    t_v1 = time.perf_counter() - t0
    # the claim under test is "diff cost ∝ the version DELTA (touched
    # buckets)", so the late batch must be bucket-LOCALIZED — a
    # uniformly-spread batch touches all 64 buckets and cancellation
    # rightfully prunes nothing (measured 1.28x NAIVE in the first
    # cut of this tool — the honest no-locality ceiling)
    late = ev.filter(
        (F.col("ts") > cutoff)
        & (
            F.pmod(F.xxhash64(F.col("user_id").cast("string")), F.lit(64))
            < 2
        )
    )
    n_late = late.count()
    t0 = time.perf_counter()
    touched = scd.scd2_apply_snapshot(
        spark, table, late, "user_id", "event_type", "ts", "event_id"
    )
    t_v2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    d = snapshot.snapshot_diff(spark, table, 1, 2)
    n_diff = d.count()
    t_diff = time.perf_counter() - t0
    # naive baseline: exceptAll over BOTH full versions, no pruning
    t0 = time.perf_counter()
    a = snapshot.read_snapshot(spark, table, 1)
    b = snapshot.read_snapshot(spark, table, 2)
    n_naive = (
        b.exceptAll(a).withColumn("change", F.lit("added"))
        .unionByName(a.exceptAll(b).withColumn("change", F.lit("removed")))
        .count()
    )
    t_naive = time.perf_counter() - t0
    print(
        f"RESULT snapdiff obs={ev.count()} late={n_late} "
        f"touched_buckets={len(touched)}/64 v1={t_v1:.2f}s v2={t_v2:.2f}s "
        f"diff={t_diff:.2f}s rows={n_diff} naive={t_naive:.2f}s "
        f"(naive_rows={n_naive}) pruned_vs_naive="
        f"{t_diff / max(t_naive, 1e-9):.2f}x",
        flush=True,
    )


def spot_maintain(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import graph
    from tools.scale_pagerank_incr_r9 import D, ITERS, ring_edges

    n_nodes = 4_000_000
    c = max(1, int(n_nodes * 0.001))
    edges0 = ring_edges(spark, n_nodes).localCheckpoint(eager=True)
    churn_src = spark.range(c).select(F.col("id").alias("src"))
    dels = churn_src.select(
        "src", ((F.col("src") + 1) % n_nodes).alias("dst")
    ).withColumn("__sign", F.lit(-1).cast("long"))
    ins = churn_src.select(
        "src", ((F.col("src") + D + 1) % n_nodes).alias("dst")
    ).withColumn("__sign", F.lit(1).cast("long"))
    delta = dels.unionByName(ins).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    state, n = graph.pagerank_state(edges0, ITERS)
    t_boot = time.perf_counter() - t0
    # direct delta (no routing)
    t0 = time.perf_counter()
    ranks, _ = graph.pagerank_delta(edges0, state, n, delta, ITERS)
    sink(ranks)
    t_delta = time.perf_counter() - t0
    # routed: pre-flight probe + size gate + delta (n_srcs pinned —
    # the streaming caller's shape)
    t0 = time.perf_counter()
    ranks2, _, method = graph.pagerank_maintain(
        edges0, state, n, delta, ITERS, n_srcs=n_nodes
    )
    sink(ranks2)
    t_routed = time.perf_counter() - t0
    print(
        f"RESULT maintain n={n_nodes} edges={n_nodes * D} churn={c} "
        f"method={method} boot={t_boot:.2f}s delta={t_delta:.2f}s "
        f"routed={t_routed:.2f}s overhead={t_routed - t_delta:+.2f}s",
        flush=True,
    )


def spot_quality(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import expect as E

    li10 = spark.read.parquet(f"{SF10}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    li = replicate(li10, {"l_orderkey": 1 << 40})
    t0 = time.perf_counter()
    out = E.verify(
        spark,
        li,
        [
            E.has_quantile("l_quantity", 0.5, 20.0, 31.0),
            E.has_quantile("l_extendedprice", 0.25, 10000.0, 30000.0),
            E.has_quantile("l_discount", 0.9, 0.05, 0.10),
            E.has_quantile("l_quantity", 0.95, 1.0, 5.0),
            E.complete("l_quantity"),
            E.in_range("l_discount", 0.0, 0.1),
        ],
    )
    rows = out.count()
    t = time.perf_counter() - t0
    print(
        f"RESULT quality rows=600M checks=6 verdicts={rows} t={t:.2f}s",
        flush=True,
    )


def spot_keywords(spark) -> None:
    from blinkit_etl_pipeline_spark.functions.text import tfidf_keywords

    docs = spark.read.parquet(SF100_DOCS).select("doc_id", "text")
    t0 = time.perf_counter()
    out = tfidf_keywords(docs, k=5)
    agg = out.agg(
        F.count("*").alias("n"), F.sum("score_q").alias("s")
    ).collect()[0]
    t = time.perf_counter() - t0
    print(
        f"RESULT keywords docs=5M out_rows={agg['n']} t={t:.2f}s",
        flush=True,
    )


def spot_pmi(spark) -> None:
    from blinkit_etl_pipeline_spark.functions.text import pmi_collocations

    docs = spark.read.parquet(SF100_DOCS).select("doc_id", "text")
    t0 = time.perf_counter()
    out = pmi_collocations(docs, min_count=5, top=20)
    rows = out.count()
    t = time.perf_counter() - t0
    print(f"RESULT pmi docs=5M out_rows={rows} t={t:.2f}s", flush=True)


def spot_incr(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import curated

    o10 = spark.read.parquet(f"{SF10}/orders.parquet")
    o = replicate(o10, {"o_orderkey": 1 << 40}).select(
        F.col("o_orderkey").cast("string").alias("order_id"),
        F.concat(
            F.lit("dp_"), (F.col("o_orderkey") % 10).cast("string")
        ).alias("delivery_partner_id"),
        (F.col("o_totalprice") % F.lit(24.0)).alias("delivery_time_hours"),
        (F.col("o_totalprice") % F.lit(30.0)).alias("distance_km"),
        F.when(F.col("o_orderkey") % 4 == 0, 1).otherwise(0).alias(
            "is_delayed"
        ),
    )
    t0 = time.perf_counter()
    out = curated.curated_delta_view(
        "delivery_partner",
        [o.withColumn("__sign", F.lit(1))],
    )
    rows = out.count()
    t = time.perf_counter() - t0
    print(
        f"RESULT incr_delivery orders=150M partners={rows} t={t:.2f}s",
        flush=True,
    )


def spot_knn(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import vector

    for sf_dir, nbits, cap, tag in (
        (SF1, 4, None, "sf1-exact"),
        (SF10, 8, 64, "sf10-capped"),
    ):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        t0 = time.perf_counter()
        g = vector.knn_graph(
            emb, k=5, iters=1, nbits=nbits, seed_cap=cap
        )
        rows = g.count()
        t = time.perf_counter() - t0
        print(
            f"RESULT knn {tag} n={emb.count()} edges={rows} t={t:.2f}s",
            flush=True,
        )


def spot_knnstore(spark) -> None:
    import shutil
    import tempfile
    import time as _t

    from blinkit_etl_pipeline_spark.operators import incremental

    scratch = tempfile.mkdtemp(prefix="knnstore-scale-")
    vstore, gstore = f"{scratch}/vecs", f"{scratch}/graph"
    emb = spark.read.parquet(f"{SF1}/embeddings.parquet")
    walls = []
    for m in range(4):
        batch = emb.filter(F.col("vec_id") % 4 == m)
        t0 = _t.perf_counter()
        incremental.ingest_knn_graph(
            spark, vstore, gstore, batch, k=5, nbits=6
        )
        walls.append(_t.perf_counter() - t0)
    t0 = _t.perf_counter()
    n = incremental.knn_graph_from_store(spark, gstore, k=5).count()
    t_read = _t.perf_counter() - t0
    print(
        f"RESULT knnstore n=20000 drops=4 ingest_walls="
        f"{[round(w, 2) for w in walls]} read={t_read:.2f}s edges={n}",
        flush=True,
    )
    shutil.rmtree(scratch, ignore_errors=True)


def main() -> None:
    which = set(sys.argv[1:]) or {
        "snapdiff", "maintain", "quality", "keywords", "pmi", "incr",
        "knn", "knnstore",
    }
    spark = get_session("scale-spot-r10")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for name, fn in (
        ("snapdiff", spot_snapdiff),
        ("maintain", spot_maintain),
        ("quality", spot_quality),
        ("keywords", spot_keywords),
        ("pmi", spot_pmi),
        ("incr", spot_incr),
        ("knn", spot_knn),
        ("knnstore", spot_knnstore),
    ):
        if name in which:
            fn(spark)
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
