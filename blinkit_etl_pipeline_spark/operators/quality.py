"""Approximation-quality measurement: recall of approximate operators
against their exact baselines (north-star surface).

The engine ships approximate ANN (sign-LSH, IVF) and approximate dedup
(MinHash-LSH, bucketed embedding near-dup) whose *determinism* is
oracle-proven; these operators quantify their *quality*, so the
approximate path is never deployed blind. Both are pure DataFrame
compositions (joins + aggregates over the candidate outputs), so they
inherit the scale posture of the operators they measure: the recall
join keys are (query_id, neighbor_id) / (doc_a, doc_b) id pairs — tiny
rows, broadcastable sides at any corpus size where the top-k output
itself fits a report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topk_recall(truth: DataFrame, approx: DataFrame, k: int, label: str) -> DataFrame:
    """Per-query recall@k of ``approx`` vs exact ``truth``.

    Both inputs are top-k frames with (query_id, neighbor_id) columns
    (extra columns ignored). Queries the approximate path missed
    entirely surface with recall 0, not as absent rows.
    """
    t = truth.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    hits = (
        t.join(a, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("bigint").alias("hits"))
    )
    qs = t.select("query_id").distinct()
    return qs.join(hits, "query_id", "left").select(
        F.lit(label).alias("method"),
        "query_id",
        F.coalesce(F.col("hits"), F.lit(0).cast("bigint")).alias("hits"),
        F.round(
            F.coalesce(F.col("hits"), F.lit(0)).cast("double") / F.lit(k), 6
        ).alias("recall_at_k"),
    )


def pair_recall(
    truth: DataFrame, found: DataFrame, keys: tuple[str, str], label: str
) -> DataFrame:
    """One-row recall/precision summary of a candidate-pair generator
    vs its exact ground truth (both framed as (key_a, key_b) pairs)."""
    ka, kb = keys
    t = truth.select(ka, kb)
    f = found.select(ka, kb)
    n_true = t.agg(F.count("*").cast("bigint").alias("n_true"))
    n_found = f.agg(F.count("*").cast("bigint").alias("n_found"))
    n_hits = (
        t.join(f, [ka, kb]).agg(F.count("*").cast("bigint").alias("n_hits"))
    )
    return (
        n_true.crossJoin(n_found)
        .crossJoin(n_hits)
        .select(
            F.lit(label).alias("method"),
            "n_true",
            "n_found",
            "n_hits",
            F.round(
                F.col("n_hits").cast("double")
                / F.greatest(F.col("n_true"), F.lit(1)).cast("double"),
                6,
            ).alias("recall"),
            F.round(
                F.col("n_hits").cast("double")
                / F.greatest(F.col("n_found"), F.lit(1)).cast("double"),
                6,
            ).alias("precision"),
        )
    )
