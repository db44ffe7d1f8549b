"""Iterative graph algorithms on DataFrames — PageRank in exact
integer arithmetic.

Web-graph centrality is a first-class signal in large-scale training
-data curation (OPIC/Harmonic centrality in Common Crawl, PageRank
features in quality classifiers), and PageRank is the canonical
"iterative algorithm on Spark" shape: per iteration, ONE shuffle
joining the rank vector to the edge list plus one node-keyed
aggregate. This module keeps every quantity an int64 so a DuckDB
oracle unrolling the same iterations reproduces the ranks BIT-EXACTLY
— no float summation-order ulps (the ln-quantization discipline of
functions/lm.py, applied to rank mass).

Arithmetic: ranks live on a ``RANK_SCALE`` integer lattice
(10^12 micro-rank units). With damping d = num/den:

- ``r_0(v)   = RANK_SCALE // N``
- ``contrib(u→v) = (num · r_i(u)) // (den · outdeg(u))``
- ``r_{i+1}(v) = ((den−num)·RANK_SCALE) // (den·N)
  + (num · danglingMass_i) // (den·N) + Σ_{u→v} contrib(u→v)``

Integer division truncates identically in Spark (``div``) and DuckDB
(``//``) for the non-negative operands used here. Truncation leaks
≤1 unit per edge per iteration — deterministic, identical in both
engines, and irrelevant at a 10^12 scale.

Scale shape (100 TB framing): the rank vector is node-count-sized,
never collected (only N itself — one long — reaches the driver); each
iteration is rank⋈edge equi-join + groupBy(dst) with map-side partial
aggregation, and the dangling mass is a one-row broadcast. When the
graph has no dangling nodes the recurrence reads the rank vector once
per iteration, so lineage stays LINEAR and the whole run is ONE
submitted plan of chained shuffles; with dangling nodes each
iteration reads it twice (contrib + dangling mass), so lineage is
truncated per iteration with ``localCheckpoint`` (the standard
iterative-DataFrame pattern — without it the logical plan grows as
references^iterations). On a cluster, pre-partitioning edges by
``src`` and reusing that partitioning for the rank join keeps each
iteration to a single rank-vector shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: integer rank lattice: 1.0 of PageRank mass = 10^12 units
RANK_SCALE = 10**12

#: damping factor 0.85 as an exact rational
DAMP_NUM = 85
DAMP_DEN = 100


def pagerank(
    edges: DataFrame,
    iterations: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact-integer PageRank over a directed edge list.

    ``edges`` must carry long-typed ``src``/``dst`` node ids (parallel
    edges count as parallel — pre-``distinct`` if unwanted). Dangling
    nodes' mass is redistributed uniformly each iteration (the
    standard stochastic-matrix completion). Returns ``(node, rank_q)``
    with ``rank_q`` the final int64 lattice rank.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    # N is the only value that ever reaches the driver (one long); the
    # closed-form integer bases below need it as a Python int
    n = nodes.count()
    outdeg = (
        e.groupBy("src").agg(F.count("*").cast("long").alias("d")).persist()
    )
    base = ((DAMP_DEN - DAMP_NUM) * RANK_SCALE) // (DAMP_DEN * n)
    ranks = nodes.select(
        "node", F.lit(RANK_SCALE // n).cast("long").alias("r")
    )
    # With no dangling nodes (one cheap anti-join probe, a bounded
    # boolean to the driver) every iteration reads the rank vector
    # exactly ONCE, so lineage stays LINEAR: submit one plan with
    # `iterations` chained shuffles and skip the per-iteration
    # materialization entirely — at small scale this removes
    # `iterations` job round-trips; at cluster scale it lets AQE plan
    # the whole chain.
    no_dangling = (
        nodes.join(
            e.select(F.col("src").alias("node")).distinct(),
            "node",
            "left_anti",
        )
        .limit(1)
        .count()
        == 0
    )
    if no_dangling:
        # With r_i(v) ≡ base + s_i(v), iterate on the received-mass
        # sums s alone: one (broadcastable, received-node-sized) join
        # plus one groupBy per iteration, against a once-persisted
        # (src, dst, outdeg) edge table. Iteration 1 is join-free —
        # the uniform r_0 is a literal.
        ew = (
            e.select(F.col("src").alias("node"), "dst")
            .join(outdeg.select(F.col("src").alias("node"), "d"), "node")
            .persist()
        )
        s = (
            ew.select(
                F.col("dst").alias("node"),
                F.expr(
                    f"({DAMP_NUM} * CAST({RANK_SCALE // n} AS BIGINT))"
                    f" div ({DAMP_DEN} * d)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        for _ in range(iterations - 1):
            # the received-mass vector is node-sized; AQE broadcasts
            # it into the persisted edge table when it fits (at
            # cluster scale co-partition ew by node once so each
            # round shuffles only the rank vector + the contrib agg)
            s = (
                ew.join(s, "node", "left")
                .select(
                    F.col("dst").alias("node"),
                    F.expr(
                        f"({DAMP_NUM} * (CAST({base} AS BIGINT)"
                        f" + coalesce(s, 0))) div ({DAMP_DEN} * d)"
                    ).alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").cast("long").alias("s"))
            )
        return nodes.join(s, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("s"), F.lit(0)))
            .cast("long")
            .alias("rank_q"),
        )
    for _ in range(iterations):
        joined = ranks.join(
            outdeg, ranks["node"] == outdeg["src"], "left"
        ).select(ranks["node"].alias("node"), "r", "d")
        contrib = (
            joined.filter(F.col("d").isNotNull())
            .alias("j")
            .join(e.alias("e"), F.col("j.node") == F.col("e.src"))
            .select(
                F.col("e.dst").alias("node"),
                F.expr(f"({DAMP_NUM} * r) div ({DAMP_DEN} * d)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        dang = joined.filter(F.col("d").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dm")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({DAMP_NUM} * dm) div ({DAMP_DEN} * {n})")
                    + F.coalesce(F.col("s"), F.lit(0))
                )
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.col("r").alias("rank_q"))
