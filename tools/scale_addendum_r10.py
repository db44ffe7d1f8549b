"""Scale rows for the r10 addendum operators (the scale_spot pattern).

Spots (inputs from the scale_testdata replicas at /tmp/sfscale):

- ``gsearch``: graph-traversal ANN serving — with the k-NN graph
  prebuilt and materialized, the search wall decomposes into one
  corpus-linear seed scan (lsh_topk's broadcast probe) plus
  corpus-INDEPENDENT traversal rounds (|Q|·beam·k scored pairs per
  hop). Expect the search wall to grow far slower than the corpus:
  sf1 (20k) → sf10 (200k) is 10× vectors, the walk's scored-pair
  count is identical.
- ``gstore``: the store-backed serving path at sf1 — seeds open only
  the probed buckets' files; wall should sit near the batch search.
- ``hll``: incremental COUNT DISTINCT — per-drop register-fold walls
  at sf1 (1M events) and sf10 (10M), each drop 1/3 of the corpus:
  ingest is one map-side register fold over the drop (linear in the
  DROP), the estimate read is store-sized (≤512·groups·batches rows,
  corpus-independent).
- ``curated_drop``: the runner's incremental mode at history scale —
  fold the full sf1 marketing history into the campaign_summary
  store, then measure a single additional DAY-sized drop's ingest:
  the drop wall must track the drop, not the 1M-row history.

Run: python tools/scale_addendum_r10.py [which ...]
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
QIDS = list(range(16))


def spot_gsearch(spark) -> None:
    from blinkit_etl_pipeline_spark.operators import vector

    for sf_dir, nbits, cap, tag in (
        ("/root/testdata/sf0.1", 4, None, "sf0.1"),
        (SF1, 6, None, "sf1"),
        (SF10, 8, 64, "sf10-capped"),
    ):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        g = vector.knn_graph(
            emb, k=5, iters=0, nbits=nbits, seed_cap=cap
        ).localCheckpoint(eager=True)  # graph prebuilt: serve-side spot
        walls = {}
        for rounds in (0, 2):
            t0 = time.perf_counter()
            res = vector.graph_search_topk(
                emb, g, QIDS, k=5, beam=8, rounds=rounds, nbits=nbits
            )
            rows = res.count()
            walls[rounds] = time.perf_counter() - t0
        print(
            f"RESULT gsearch {tag} n={emb.count()} rows={rows} "
            f"t_seed_only={walls[0]:.2f}s t_full={walls[2]:.2f}s "
            f"hops={walls[2] - walls[0]:.2f}s",
            flush=True,
        )


def spot_gstore(spark) -> None:
    import shutil

    from blinkit_etl_pipeline_spark.operators import incremental

    scratch = tempfile.mkdtemp(prefix="gstore-scale-")
    vstore, gstore = f"{scratch}/vecs", f"{scratch}/graph"
    emb = spark.read.parquet(f"{SF1}/embeddings.parquet")
    for m in (0, 1):
        incremental.ingest_knn_graph(
            spark, vstore, gstore, emb.filter(F.col("vec_id") % 2 == m),
            k=5, nbits=6,
        )
    t0 = time.perf_counter()
    rows = incremental.graph_search_from_store(
        spark, gstore, vstore, QIDS, k=5, beam=8, rounds=2
    ).count()
    t = time.perf_counter() - t0
    print(f"RESULT gstore sf1 rows={rows} t={t:.2f}s", flush=True)
    shutil.rmtree(scratch, ignore_errors=True)


def spot_hll(spark) -> None:
    import shutil

    from blinkit_etl_pipeline_spark.operators import incremental

    for sf_dir, tag in ((SF1, "sf1"), (SF10, "sf10")):
        scratch = tempfile.mkdtemp(prefix="hll-scale-")
        store = f"{scratch}/hll"
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "event_type", "user_id"
        )
        walls = []
        for m in (0, 1, 2):
            batch = ev.filter(F.col("event_id") % 3 == m)
            t0 = time.perf_counter()
            incremental.ingest_hll_registers(
                spark, store, batch, ["event_type"], "user_id",
                batch_id=f"d{m}",
            )
            walls.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        rows = incremental.hll_distinct_from_store(
            spark, store, ["event_type"]
        ).count()
        t_read = time.perf_counter() - t0
        print(
            f"RESULT hll {tag} n={ev.count()} "
            f"ingest_walls={[round(w, 2) for w in walls]} "
            f"read={t_read:.2f}s groups={rows}",
            flush=True,
        )
        shutil.rmtree(scratch, ignore_errors=True)


def spot_curated_drop(spark) -> None:
    import shutil

    from blinkit_etl_pipeline_spark.operators import curated
    from blinkit_etl_pipeline_spark.pipelines import marketing_roi
    from blinkit_etl_pipeline_spark.sources.testdata import MAPPING

    scratch = tempfile.mkdtemp(prefix="curated-scale-")
    store = f"{scratch}/campaign_summary"
    spark.read.parquet(f"{SF1}/events.parquet").createOrReplaceTempView(
        "events"
    )
    marketing = spark.sql(MAPPING["b_marketing"])
    kpis = marketing_roi.marketing_kpis(marketing).select(
        "campaign_id", "campaign_name", "channel", "date", "spend",
        "revenue_generated", "conversions", "ctr", "conversion_rate",
        "roas_calculated",
    )
    hist = kpis.filter(F.dayofmonth("date") != 15)
    day = kpis.filter(F.dayofmonth("date") == 15).localCheckpoint(
        eager=True
    )
    t0 = time.perf_counter()
    curated.ingest_curated_deltas(
        spark, store, "campaign_summary", hist, batch_id="history"
    )
    t_hist = time.perf_counter() - t0
    t0 = time.perf_counter()
    curated.ingest_curated_deltas(
        spark, store, "campaign_summary", day, batch_id="day-15"
    )
    t_day = time.perf_counter() - t0
    t0 = time.perf_counter()
    rows = curated.read_curated(spark, store, "campaign_summary").count()
    t_read = time.perf_counter() - t0
    print(
        f"RESULT curated_drop sf1 hist_rows={hist.count()} "
        f"day_rows={day.count()} t_hist={t_hist:.2f}s "
        f"t_day={t_day:.2f}s read={t_read:.2f}s out={rows}",
        flush=True,
    )
    shutil.rmtree(scratch, ignore_errors=True)


def main() -> None:
    which = set(sys.argv[1:]) or {
        "gsearch", "gstore", "hll", "curated_drop"
    }
    spark = get_session("scale-addendum-r10")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for name, fn in (
        ("gsearch", spot_gsearch),
        ("gstore", spot_gstore),
        ("hll", spot_hll),
        ("curated_drop", spot_curated_drop),
    ):
        if name in which:
            fn(spark)


if __name__ == "__main__":
    main()
