"""Bisect the r6→r7 common-query bench drift (VERDICT r7 task #2).

Hypothesis under test: the 1.25× drift on the 25 queries present in
both rounds is SESSION pressure (124 queries' accumulated JVM/codegen/
GC state in one bench session), not plan changes. Experiment: run the
exact bench protocol (same warmup, same warm pass, same median-of-3,
same clearCache cadence) on ONLY those 25 queries in a fresh session.
Compare per-query medians against the same queries' medians inside the
full-registry bench run taken in the same machine window
(BENCH_local_last.json): small-session ≈ full-session per query ⇒ the
drift is machine-window noise between rounds (the documented 1.25-2×
uniform multiplier), NOT session size; small-session markedly faster
⇒ session pressure is real and bench.py needs per-family resets.

Usage: python tools/drift_bisect_r8.py   (run ALONE, after bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blinkit_etl_pipeline_spark.plans import all_queries  # noqa: E402
from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

# the 25 queries common to BENCH_r06 and BENCH_r07 (both rounds'
# headline sets)
COMMON = [
    "sales_fact", "customer_metrics", "enriched_feedback",
    "customer_satisfaction", "campaign_roi", "delivery_partner",
    "inventory_reconciliation", "inventory_discrepancies",
    "inventory_and_revenue", "ns_dedup_exact", "ns_dedup_minhash_lsh",
    "ns_dedup_simhash", "ns_ann_cosine_topk", "ns_ann_lsh_topk",
    "ns_text_stats", "ns_events_sessionize", "ns_media_features",
    "ns_media_gif", "ns_text_chunks", "ns_text_bm25", "ns_mix_sources",
    "ns_ann_pq_topk", "ns_ann_ivfpq_topk", "ns_text_chunk_dedup",
    "ns_hybrid_rrf_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("drift-bisect-r8")
    from bench import _warmup

    _warmup(spark, sf_dir)
    queries = all_queries()
    names = [n for n in COMMON if n in queries]
    for name in names:  # warm pass, bench.py protocol
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    samples: dict[str, list[float]] = {}
    for name in names:
        samples[name] = []
        for _ in range(3):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    timings = {n: round(sorted(s)[1], 3) for n, s in samples.items()}
    out = {
        "metric": "drift_bisect_common25",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
    }
    print(json.dumps(out, separators=(",", ":")))
    try:
        full = json.load(open("BENCH_local_last.json"))["queries"]
        ratio = {
            n: round(full[n] / timings[n], 2)
            for n in timings
            if n in full and timings[n] > 0
        }
        tot_full = sum(full[n] for n in timings if n in full)
        print(
            json.dumps(
                {
                    "full_session_total_common25": round(tot_full, 3),
                    "small_session_total": out["value"],
                    "full_over_small": round(tot_full / out["value"], 3),
                    "per_query_full_over_small": ratio,
                },
                separators=(",", ":"),
            )
        )
    except Exception as e:  # no prior full-bench artifact beside us
        print(f"(no BENCH_local_last.json comparison: {e})")


if __name__ == "__main__":
    main()
