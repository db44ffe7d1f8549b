"""Scale rows for the iterative family (VERDICT r7 task #3):
``ns_graph_pagerank`` and ``ns_cluster_kmeans`` at sf0.1 / sf1.0 /
sf10, plus the incremental-PageRank delta path vs its bootstrap at
the same scales — wall + result rows for the PLANS.md linearity
table.

Timing starts at QUERY CONSTRUCTION (the r7 scale-tool rule): both
operators run driver-round-trip training/probe jobs before returning
their frame, and those jobs ARE the cost being measured. The final
`.count()` forces the last plan.

Usage: python tools/scale_iterative_r8.py   (expects /tmp/sfscale/*)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from blinkit_etl_pipeline_spark.operators import graph  # noqa: E402
from blinkit_etl_pipeline_spark.plans import northstar as NS  # noqa: E402
from blinkit_etl_pipeline_spark.plans.registry import all_queries  # noqa: E402
from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1.0": "/tmp/sfscale/sf1.0",
    "sf10": "/tmp/sfscale/sf10",
}


def _edges(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
        )
        .distinct()
    )
    return pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def main() -> None:
    spark = get_session("scale-iterative-r8")
    qs = all_queries()
    out: dict[str, dict] = {}
    for sf, d in SFS.items():
        if not os.path.isdir(d):
            continue
        for name in ("ns_graph_pagerank", "ns_cluster_kmeans"):
            t0 = time.time()
            n = qs[name](spark, d).count()
            out.setdefault(name, {})[sf] = {
                "sec": round(time.time() - t0, 3), "rows": n
            }
            print(name, sf, out[name][sf], flush=True)
            spark.catalog.clearCache()
        # incremental pagerank: bootstrap (state capture) vs one
        # small-churn delta batch (~2% of srcs), both at full depth 8
        e = _edges(spark, d).persist()
        t0 = time.time()
        state, n_nodes = graph.pagerank_state(e, iterations=8)
        state = state.persist()
        state.count()
        boot = round(time.time() - t0, 3)
        churn = e.filter(F.expr("(src div 2) % 50 = 1 AND src % 2 = 0"))
        delta = churn.withColumn(
            "__sign", F.lit(1).cast("long")
        )  # duplicate-copy insert: node set fixed, outdegs change
        t0 = time.time()
        ranks, _ds = graph.pagerank_delta(e, state, n_nodes, delta, 8)
        nr = ranks.count()
        dt = round(time.time() - t0, 3)
        out.setdefault("pagerank_incr", {})[sf] = {
            "bootstrap_sec": boot,
            "delta_sec": dt,
            "rows": nr,
            "delta_edges": delta.count(),
        }
        print("pagerank_incr", sf, out["pagerank_incr"][sf], flush=True)
        state.unpersist()
        e.unpersist()
        spark.catalog.clearCache()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
