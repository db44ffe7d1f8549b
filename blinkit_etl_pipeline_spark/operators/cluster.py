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


def _dist(ecol, centroid: list[int]) -> F.Column:
    arr = F.array(*[F.lit(int(x)).cast("long") for x in centroid])
    return F.aggregate(
        F.zip_with(ecol, arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(eq: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """(vec_id, e, cluster, dist_q): lexicographic (dist, j) argmin
    against broadcast centroid literals — one map pass, no shuffle."""
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _dist(F.col("e"), c).alias("d"),
                    F.lit(j).cast("long").alias("j"),
                )
                for j, c in enumerate(centroids)
            ]
        )
    )
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
        sums = (
            assigned.groupBy("cluster")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.element_at("e", i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new = list(centroids)  # emptied cluster keeps previous centroid
        for r in sums:
            j = int(r["cluster"])
            n = int(r["n"])
            new[j] = [_trunc_div(int(r[f"s{i}"]), n) for i in range(dim)]
        centroids = new
    out = _assign(eq, centroids).select("vec_id", "cluster", "dist_q")
    eq.unpersist(blocking=False)
    return out
