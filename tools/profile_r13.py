"""r13 optimization profiling: split per-query wall into DataFrame
CONSTRUCTION (Python/py4j plan building, incl. fixture memo hits) vs
EXECUTION (noop write: analysis + optimization + jobs).

Run AFTER a warm pass so fixtures are built, mirroring bench.py's
steady state:  python tools/profile_r13.py [names...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blinkit_etl_pipeline_spark.plans import all_queries  # noqa: E402
from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    queries = all_queries()
    names = sys.argv[1:]
    if not names:
        print("usage: profile_r13.py query [query...]")
        return
    spark = get_session("profile-r13")
    # steady-state warmup (bench parity)
    from blinkit_etl_pipeline_spark.sources.testdata import register_blinkit

    register_blinkit(spark, SF)
    spark.sql("SELECT count(*) FROM lineitem WHERE l_quantity > 0").collect()

    for name in names:
        # warm pass (fixture build + JIT), untimed breakdown shown too
        for tag in ("warm", "t1", "t2", "t3"):
            t0 = time.perf_counter()
            df = queries[name](spark, SF)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name}:{tag}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            tracker = spark.sparkContext.statusTracker()
            print(
                f"{name:36s} {tag:4s} construct={t1 - t0:7.3f}s "
                f"execute={t2 - t1:7.3f}s jobs_so_far={len(tracker.getJobIdsForGroup(None) or [])}",
                flush=True,
            )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
