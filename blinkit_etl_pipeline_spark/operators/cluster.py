"""Exact-integer distributed k-means (Lloyd's algorithm), value-
checkable cross-engine.

The general-clustering face of the codebook machinery in
``operators/vector.py`` (IVF/PQ train on floats and pin artifacts; see
``plans/codebook.py``): here every quantity lives on an integer
lattice so the DuckDB oracle can DERIVE the whole training run and
match bit-for-bit — the PageRank discipline (``operators/graph.py``)
applied to clustering:

- embeddings quantize to int64 (``ROUND(x·10^6)``),
- distances are exact integer sums of squares (≤ 64·(4·10^6)² ≪ 2^63),
- assignment ties break by ``(dist, cluster)`` lexicographic min,
- centroid update is integer TRUNCATING division ``sum div n`` —
  Spark ``div`` and DuckDB ``//`` both truncate toward zero, so the
  1e-6-grid centroids agree exactly; an emptied cluster keeps its
  previous centroid (deterministic in both engines).

Scale shape: per iteration ONE map pass (assignment against k·dim
broadcast literals — no join, no shuffle of the vectors) and ONE
k-row aggregate (64 per-dim SUMs fold map-side; the shuffle carries
k·partitions rows). Driver state is the k×dim centroid table per
round — the documented gauge-scale round-trip of
``vector.fps_codebook``; k and iters are fixed hyper-parameters, so
the whole run is O(iters) jobs regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: embedding lattice scale (matches operators/vector.py::QSCALE)
KM_QSCALE = 1000000.0


def _trunc_div(s: int, n: int) -> int:
    """Truncate-toward-zero integer division (Spark ``div``/DuckDB
    ``//`` semantics; Python's ``//`` floors, which differs for
    negative sums)."""
    q = abs(s) // n
    return q if s >= 0 else -q


def _qcol(emb_col) -> F.Column:
    return F.transform(
        emb_col,
        lambda v: F.round(v.cast("double") * F.lit(KM_QSCALE), 0).cast(
            "long"
        ),
    )


def _width_guard(arr: F.Column, dim: int) -> F.Column:
    """Fail loudly on EVERY row whose embedding width disagrees with
    ``dim`` (the vector._sq8_width_guard contract): a ragged vector
    elsewhere than the first k would otherwise NULL its zip_with
    distances, and structs with NULL d sort FIRST under array_min —
    the row would be silently assigned cluster 0 with NULL dist_q and
    its out-of-range dims would drop out of the centroid sums."""
    return F.when(F.size(arr) == F.lit(dim), arr).otherwise(
        F.raise_error(
            F.concat(
                F.lit("kmeans_exact: embedding width "),
                F.size(arr).cast("string"),
                F.lit(f" != dim {dim}"),
            )
        )
    )


def _dist_sql(ecol: str, centroid: list[int]) -> str:
    """SQL text of the exact integer squared distance ``Σ(eᵢ−cᵢ)²``
    — semantically identical to the former Column-API construction
    (``aggregate(zip_with(...))`` over a long-literal array), rendered
    as ONE string so the whole round's expression reaches the JVM in a
    single py4j call instead of ~dim·k round trips (r13: building the
    8×64-literal Column tree cost ~2 s of DRIVER time per round — more
    than the jobs it described)."""
    arr = ",".join(f"{int(x)}L" for x in centroid)
    return (
        f"aggregate(zip_with({ecol}, array({arr}),"
        " (a, b) -> (a - b) * (a - b)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def _assign(eq: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """(vec_id, e, cluster, dist_q): lexicographic (dist, j) argmin
    against broadcast centroid literals — one map pass, no shuffle.
    The argmin expression is rendered as one SQL string (see
    :func:`_dist_sql`); struct field order (d, j) keeps the
    tie-break lexicographic on (dist, cluster)."""
    structs = ",".join(
        f"named_struct('d', {_dist_sql('e', c)}, 'j', CAST({j} AS BIGINT))"
        for j, c in enumerate(centroids)
    )
    best = F.expr(f"array_min(array({structs}))")
    return eq.select(
        "vec_id",
        "e",
        best["j"].alias("cluster"),
        best["d"].alias("dist_q"),
    )


def kmeans_exact(
    emb: DataFrame, k: int = 8, iters: int = 3, dim: int = 64
) -> DataFrame:
    """Run ``iters`` Lloyd rounds from the deterministic first-k-by-
    vec_id init; return the final assignment ``(vec_id, cluster,
    dist_q)``. Everything exact-integer (module doc).

    ``eq`` is persisted across the training actions (each round is a
    separate job, so without it every round re-scans the source —
    iters+2 full passes; measured ~neutral at sf10 on local SSD but
    it is the difference between 2 and 5 source scans, which is real
    IO at the 100 TB framing). It is unpersisted before returning:
    the caller's single action on the result performs the one honest
    final scan."""
    eq = emb.select(
        "vec_id",
        _width_guard(_qcol(F.col("embedding")), dim).alias("e"),
    ).persist()
    init = eq.orderBy("vec_id").limit(k).collect()
    if len(init) < k:
        raise ValueError(f"kmeans_exact: need at least k={k} vectors")
    centroids = [list(r["e"]) for r in init]
    for _ in range(iters):
        assigned = _assign(eq, centroids)
        # per-dim sums as ONE array-of-aggregates expression (e[i] is
        # 0-based, = element_at(e, i+1)): a single py4j call per round
        # instead of `dim` Column constructions
        sums_arr = ",".join(f"sum(e[{i}])" for i in range(dim))
        sums = (
            assigned.groupBy("cluster")
            .agg(
                F.count("*").alias("n"),
                F.expr(f"array({sums_arr})").alias("sums"),
            )
            .collect()
        )
        new = list(centroids)  # emptied cluster keeps previous centroid
        for r in sums:
            j = int(r["cluster"])
            n = int(r["n"])
            new[j] = [_trunc_div(int(s), n) for s in r["sums"]]
        centroids = new
    out = _assign(eq, centroids).select("vec_id", "cluster", "dist_q")
    eq.unpersist(blocking=False)
    return out
