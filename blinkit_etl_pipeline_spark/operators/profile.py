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


def table_stats(
    df: DataFrame,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """ANALYZE-style per-column profile in ONE scan: row count, null
    count/fraction, distinct estimate (the module's deterministic HLL,
    not engine-private approx_count_distinct), and min/max rendered as
    strings so one tall frame covers heterogeneous column types.

    Output: (column, n_rows, n_nulls, null_frac, distinct_est,
    min_value, max_value) — the stats a planner, a data-quality gate,
    or a partition-strategy choice reads first. Everything partial-
    aggregates map-side; the shuffle carries per-column scalars + HLL
    registers (≤ 512 rows per column), never data.
    """
    from .sketch import hll_distinct

    cols = list(columns) if columns is not None else list(df.columns)
    aggs = [F.count("*").cast("bigint").alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nulls_{c}")
        )
        # min/max on the NATIVE type, cast to string afterwards —
        # casting first would make numeric min/max lexicographic
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)

    tall = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__nulls_{c}").alias("n_nulls"),
                        F.col(f"__min_{c}").alias("min_value"),
                        F.col(f"__max_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*")

    # ALL columns' HLLs from ONE additional scan: stack (column, value)
    # pairs row-wise, then a single register aggregate grouped by
    # column — a per-column loop would re-scan the table |cols| times.
    # Values hash via their string form, which is what hll_registers
    # does anyway, so the registers are identical to per-column runs.
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("__v"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*").filter(F.col("__v").isNotNull())
    hll = hll_distinct(stacked, ["column"], "__v").select(
        "column", F.col("hll_estimate").alias("distinct_est")
    )

    return tall.join(hll, "column", "left").select(
        "column",
        "n_rows",
        "n_nulls",
        F.round(F.col("n_nulls") / F.col("n_rows"), 6).alias("null_frac"),
        # all-null columns have no HLL group: distinct count is 0
        F.coalesce(F.col("distinct_est"), F.lit(0.0)).alias("distinct_est"),
        "min_value",
        "max_value",
    )


def drift_psi(buckets: DataFrame) -> DataFrame:
    """Population Stability Index per feature between a reference and
    a current corpus slice — the drift monitor data pipelines run
    between crawl snapshots before retraining (PSI ≳ 0.25 = major
    shift, the classic credit-scoring rule of thumb).

    Input: ``(feature, bucket, is_cur, cnt)`` — pre-bucketed counts
    for both slices (categorical values, integer log-length bands,
    hashed-token buckets ...). For each feature, over the UNION of its
    observed buckets with add-one smoothing (so one-sided buckets
    stay finite):

    ``psi = Σ_b (p_b − q_b) · ln(p_b / q_b)``,
    ``p`` current, ``q`` reference.

    Each bucket term is int64-quantized (×10^9) before the sum — the
    repo's exact-integer float discipline — so ``psi_q`` is
    bit-stable. Scale shape: one hash aggregate to fold the slices,
    one feature-sized broadcast of totals; buckets are bounded by
    construction (hash/band spaces), so the whole frame is
    model-sized, never corpus-sized.

    Returns ``(feature, n_buckets, psi_q, psi, drifted)``.
    """
    folded = buckets.groupBy("feature", "bucket").agg(
        F.sum(F.when(F.col("is_cur"), F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("c_cur"),
        F.sum(F.when(~F.col("is_cur"), F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("c_ref"),
    )
    tot = folded.groupBy("feature").agg(
        F.sum("c_cur").cast("double").alias("t_cur"),
        F.sum("c_ref").cast("double").alias("t_ref"),
        F.count("*").cast("double").alias("b"),
    )
    p = (F.col("c_cur") + F.lit(1.0)) / (F.col("t_cur") + F.col("b"))
    q = (F.col("c_ref") + F.lit(1.0)) / (F.col("t_ref") + F.col("b"))
    terms = folded.join(F.broadcast(tot), "feature").select(
        "feature",
        F.round((p - q) * (F.log(p) - F.log(q)) * F.lit(1e9), 0)
        .cast("long")
        .alias("term_q"),
    )
    return terms.groupBy("feature").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum("term_q").cast("long").alias("psi_q"),
        F.round(F.sum("term_q") / F.lit(1e9), 6).alias("psi"),
        (F.sum("term_q") > F.lit(int(0.25 * 1e9))).alias("drifted"),
    )


def numeric_quantiles(
    df: DataFrame,
    columns: Sequence[str],
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Per-column quantile profile for the numeric columns — the
    planner/quality stat :func:`table_stats` stops short of, computed
    the way that function computes its HLLs: ALL columns in one pass,
    never a per-column loop. Delegates to
    ``sketch.histogram_quantiles_multi`` (two source scans total for
    any column count; the r8 generalization of the ns_customer_rfm
    plan fix), so adding the tenth profiled column costs the same
    scans as the first.

    Output: (column, q, quantile_estimate) — tall, like the profiler's
    other frames.
    """
    from .sketch import histogram_quantiles_multi

    out = histogram_quantiles_multi(
        df.withColumn("_g", F.lit(0)), ["_g"], list(columns), quantiles
    )
    return out.select(
        F.col("measure").alias("column"), "q", "quantile_estimate"
    )
