"""Same-session A/B: walk-family serving with and without the
bounded_plan (AQE-off) construction bracket in graph_search_rounds,
interleaved ABAB to cancel window drift. Usage:
python tools/ab_walk_r14.py [reps] [query ...]
"""
from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blinkit_etl_pipeline_spark.operators import bounded  # noqa: E402
from blinkit_etl_pipeline_spark.plans import all_queries  # noqa: E402
from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402
from blinkit_etl_pipeline_spark.sources.testdata import register_blinkit  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

real_bracket = bounded.bounded_plan


@contextmanager
def noop_bracket(spark):
    yield


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or [
        "ns_ann_graph_topk",
        "ns_ann_graph_sq8_topk",
        "ns_ann_graph_filtered",
    ]
    queries = all_queries()
    spark = get_session("ab-walk-r14")
    register_blinkit(spark, SF)
    spark.sql("SELECT count(*) FROM lineitem WHERE l_quantity > 0").collect()
    for name in names:
        q = queries[name]
        # warm (fixture build + JIT)
        q(spark, SF).write.format("noop").mode("overwrite").save()
        res = {"bracket": [], "nobracket": []}
        for _ in range(reps):
            for tag, br in (
                ("bracket", real_bracket),
                ("nobracket", noop_bracket),
            ):
                bounded.bounded_plan = br
                tracker = spark.sparkContext.statusTracker()
                j0 = len(tracker.getJobIdsForGroup(None) or [])
                t0 = time.perf_counter()
                q(spark, SF).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                j1 = len(tracker.getJobIdsForGroup(None) or [])
                res[tag].append((dt, j1 - j0))
                print(f"{name} {tag:10s} {dt:6.3f}s jobs={j1 - j0}", flush=True)
        bounded.bounded_plan = real_bracket
        for tag, rows in res.items():
            med = sorted(r[0] for r in rows)[len(rows) // 2]
            print(f"{name} median {tag:10s} {med:.3f}s jobs={rows[0][1]}")
    spark.stop()


if __name__ == "__main__":
    main()
