"""Demonstrate the incremental-PageRank delta-path win on its target
graph class (VERDICT r8 task #1).

The bench's order graph is dense-bipartite: one churned customer
reaches most suppliers in a hop, so the affected set saturates in ~2
rounds and the delta path honestly costs ~1.5x a full rerun
(PLANS.md r8). The class the operator exists for is the opposite —
bounded degree, localized churn (web/citation shape): influence
spreads additively along locality, so the affected set stays a sliver
of the graph and every round's edge probe touches only that sliver.

Graph: ring lattice on N nodes, out-degree d (node i -> i+1..i+d mod
N; every node has out-edges, no dangling). Churn: C contiguous srcs
each delete their (i -> i+1) edge and insert (i -> i+d+1 mod N) —
localized rewiring, no new nodes, no emptied out-lists.

Measures, per scale: bootstrap (pagerank_state) wall, full-rerun
(pagerank on the new edge set) wall, delta (pagerank_delta) wall,
the per-round affected-set fraction, and the pre-flight changed-src
fraction that predicts which path wins.

Usage: python tools/scale_pagerank_incr_r9.py [N ...]  (default two
scales: 100_000 and 1_000_000 nodes at out-degree 8)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from blinkit_etl_pipeline_spark.operators import graph  # noqa: E402
from blinkit_etl_pipeline_spark.session import get_session  # noqa: E402

D = 8  # out-degree
ITERS = 8
CHURN_FRACTION = 0.001  # 0.1% of srcs rewire one edge


def ring_edges(spark, n: int, d: int = D):
    """(i, (i+j) mod n) for j in 1..d — distributed, no driver rows."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("src"),
            F.explode(
                F.array(*[F.lit(j) for j in range(1, d + 1)])
            ).alias("j"),
        )
        .select("src", ((F.col("src") + F.col("j")) % n).alias("dst"))
    )


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_session("scale-pagerank-incr-r9")
    for n_nodes in scales:
        c = max(1, int(n_nodes * CHURN_FRACTION))
        edges0 = ring_edges(spark, n_nodes).localCheckpoint(eager=True)
        # localized rewiring on srcs [0, c)
        churn_src = spark.range(c).select(F.col("id").alias("src"))
        dels = churn_src.select(
            "src", ((F.col("src") + 1) % n_nodes).alias("dst")
        ).withColumn("__sign", F.lit(-1).cast("long"))
        ins = churn_src.select(
            "src", ((F.col("src") + D + 1) % n_nodes).alias("dst")
        ).withColumn("__sign", F.lit(1).cast("long"))
        delta = dels.unionByName(ins).localCheckpoint(eager=True)
        e_new = (
            edges0.join(
                dels.select("src", "dst").withColumn("__del", F.lit(1)),
                ["src", "dst"],
                "left",
            )
            .filter(F.col("__del").isNull())
            .select("src", "dst")
            .unionByName(ins.select("src", "dst"))
            .localCheckpoint(eager=True)
        )

        t0 = time.perf_counter()
        state, n = graph.pagerank_state(edges0, ITERS)
        t_boot = time.perf_counter() - t0

        t0 = time.perf_counter()
        graph.pagerank(e_new, ITERS).write.format("noop").mode(
            "overwrite"
        ).save()
        t_rerun = time.perf_counter() - t0

        t0 = time.perf_counter()
        ranks, dstate = graph.pagerank_delta(
            edges0, state, n, delta, ITERS
        )
        ranks.write.format("noop").mode("overwrite").save()
        t_delta = time.perf_counter() - t0

        # affected-set growth: changed ∪ support of each round's Δs
        aff_final = (
            delta.select(F.col("src").alias("node"))
            .unionByName(dstate.select("node"))
            .distinct()
            .count()
        )
        print(
            f"RESULT n={n_nodes} edges={n_nodes * D} churn_srcs={c} "
            f"preflight_frac={c / n_nodes:.5f} "
            f"affected_nodes_final={aff_final} "
            f"aff_frac={aff_final / n_nodes:.5f} "
            f"boot={t_boot:.2f}s rerun={t_rerun:.2f}s delta={t_delta:.2f}s "
            f"delta_vs_rerun={t_delta / t_rerun:.2f}x "
            f"delta_vs_boot={t_delta / t_boot:.2f}x",
            flush=True,
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
