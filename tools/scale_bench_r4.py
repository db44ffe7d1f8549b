"""Second-decade scaling run for the r4 operator families → one JSON.

Times the round-4 registry queries at sf0.1 / sf1.0 / sf10 (generated
by tools/scale_testdata.py) and, for SemDeDup, adds the k-SCALED point
at sf10: the paper's premise is that centroid count grows with corpus
size so cluster sizes stay bounded — the fixed-k8 artifact codebook is
expected to go quadratic at 100× data, and the k-scaled run is the
production answer. Output: BENCH_sf10_r4.json in the r3 artifact shape.

Usage: python tools/scale_bench_r4.py  (expects /tmp/sfscale/{sf1.0,sf10})
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blinkit_etl_pipeline_spark.plans import all_queries  # noqa: E402
from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1.0": "/tmp/sfscale/sf1.0",
    "sf10": "/tmp/sfscale/sf10",
}

QUERIES = [
    "ns_pack_sequences",
    "ns_sketch_cms_heavy",
    "ns_sketch_hll_cumulative",
    "ns_text_gopher",
    "ns_media_jpeg",
    "ns_events_funnel",
    "ns_events_moving_avg",
    "ns_merge_upsert",
    "ns_dedup_semantic",
]

SEMANTIC_KSCALED = {"sf10": 64}  # centroids for the k-scaled point


def _run(df) -> tuple[int, float]:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    return int(df.count()), round(wall, 2)


def main() -> None:
    spark = get_session("scale-bench-r4")
    queries = all_queries()
    out: dict = {
        "metric": "r4_family_scaling",
        "unit": "sec",
        "sfs": list(SFS),
        "queries": {},
        "note": (
            "single timed run per point after one warm pass of the plan; "
            "ns_dedup_semantic@sf10 uses the fixed k=8 artifact codebook "
            "(documented quadratic-within-cluster tail) AND a k-scaled "
            "codebook trained on the sf10 corpus (the production answer)"
        ),
    }
    for name in QUERIES:
        fn = queries[name]
        rec = {}
        for sf, path in SFS.items():
            if not os.path.isdir(path):
                continue
            df = fn(spark, path)
            rows, sec = _run(df)
            rec[sf] = {"rows": rows, "sec": sec}
            print(f"[{name}] {sf}: rows={rows} sec={sec}", flush=True)
        out["queries"][name] = rec

    # k-scaled SemDeDup at sf10
    from blinkit_etl_pipeline_spark.operators import vector

    for sf, k in SEMANTIC_KSCALED.items():
        path = SFS[sf]
        if not os.path.isdir(path):
            continue
        emb = spark.read.parquet(f"{path}/embeddings.parquet")
        t0 = time.perf_counter()
        codebook = vector.kmeans_codebook(emb, k=k, iters=3)
        train_sec = round(time.perf_counter() - t0, 2)
        df = vector.semantic_dedup(emb, codebook, threshold=0.3)
        rows, sec = _run(df)
        out["queries"].setdefault("ns_dedup_semantic_kscaled", {})[sf] = {
            "rows": rows,
            "sec": sec,
            "k": k,
            "train_sec": train_sec,
        }
        print(
            f"[ns_dedup_semantic_kscaled] {sf}: k={k} rows={rows} "
            f"sec={sec} (+{train_sec}s training)",
            flush=True,
        )

    with open("BENCH_sf10_r4.json", "w") as f:
        json.dump(out, f, indent=1)
    print("BENCH_sf10_r4.json written")


if __name__ == "__main__":
    main()
