"""Key-distribution profiling: the diagnostic that decides join
strategy at scale.

Not reference surface (the reference joins blind — SURVEY.md §2.4);
north-star operational tooling: before shuffling 100 TB on a key, you
profile it. The output feeds directly into this repo's skew machinery:
``skew_ratio`` ≫ 1 on the top keys ⇒ pick ``joins.salted_join`` (its
``hot_threshold`` comes straight from ``key_count``) or rely on AQE's
skew split (asserted in ``tests/test_scale.py``); a flat profile ⇒
plain hash join is fine.

Cost shape: one partial-aggregated groupBy (the shuffle carries
(key, partial-count) pairs, never rows), a scalar aggregate broadcast
back, and a TakeOrderedAndProject for the top-N — no global sort, no
second scan of the input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(
    df: DataFrame, keys: Sequence[str], top_n: int = 20
) -> DataFrame:
    """Top-``top_n`` heaviest key groups with share + skew ratio.

    ``share`` = key_count / total_rows; ``skew_ratio`` = key_count ·
    n_distinct_keys / total_rows (1.0 ⇔ perfectly uniform; the factor a
    hot key's shuffle partition is overweight by). Deterministic order:
    count descending, then keys ascending — ties at the cutoff are
    engine-stable.
    """
    keys = list(keys)
    counts = df.groupBy(*keys).agg(
        F.count("*").cast("bigint").alias("key_count")
    )
    stats = counts.agg(
        F.sum("key_count").cast("bigint").alias("__total"),
        F.count("*").cast("bigint").alias("__n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            *keys,
            "key_count",
            F.round(F.col("key_count") / F.col("__total"), 6).alias("share"),
            F.round(
                (F.col("key_count") * F.col("__n_keys")) / F.col("__total"), 6
            ).alias("skew_ratio"),
        )
        .orderBy(
            F.col("key_count").desc(), *[F.col(k).asc() for k in keys]
        )
        .limit(top_n)
    )
