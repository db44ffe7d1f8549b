"""Benchmark runner — driver contract.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the ``noop`` sink (full pipeline runs, no
result materialization on the driver) so timings measure the plan, not
``collect()`` serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from blinkit_etl_pipeline_spark.plans import all_queries  # noqa: E402
from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

HEADLINE = [
    "sales_fact",
    "customer_metrics",
    "enriched_feedback",
    "customer_satisfaction",
    "campaign_roi",
    "delivery_partner",
    "inventory_reconciliation",
    "inventory_discrepancies",
    "inventory_and_revenue",
    # north-star training-data ops (scale path variants)
    "ns_dedup_exact",
    "ns_dedup_minhash_lsh",
    "ns_dedup_simhash",
    "ns_ann_cosine_topk",
    "ns_ann_lsh_topk",
    "ns_text_stats",
    "ns_events_sessionize",
    "ns_media_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session("blinkit-bench")

    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]
    # extend with any registered north-star headline ops
    names += [n for n in queries if n.startswith("ns_") and n.endswith("_bench")]

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
