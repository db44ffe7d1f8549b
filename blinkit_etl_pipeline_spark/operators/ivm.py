"""Incremental view maintenance (IVM) — delta partial-aggregates for
materialized curated tables.

The reference pipeline recomputes every ``curated_*`` aggregate from
the full base tables on each run (see the Glue jobs it schedules:
`/root/reference/code-files/01_sales_revenue_etl.py` writes curated
parquet wholesale). At 100 TB that is the one shape you cannot ship:
a day's refresh must cost ∝ the day's DELTA, not ∝ history. This
module implements the classic solution — self-maintainable
sum/count aggregates maintained from signed deltas (inserts +1,
deletes −1), the delta-propagation core of DBSP/Materialize and of
Spark's own streaming state-store aggregation, expressed here as
plain DataFrame partials a snapshot store can persist:

- :func:`delta_partials` — fold one signed batch to per-key partial
  sums (batch-delta-sized, the ONLY thing a refresh computes).
- :func:`merge_partials` — merge any union of partials to the current
  view (associative + commutative, so batch boundaries and order
  never matter — the property the oracle check pins).

Float discipline: money/quantity measures must be int64-quantized
BEFORE the partial sums (``ROUND(x·100)`` cents lattice — the
HLL/BM25/LM precedent) so partial-merge order is provably irrelevant:
integer sums are exact whatever the batch split. A deleted row's
partial is the exact negation of its insert partial, so a key whose
rows are all deleted folds to count 0 (dropped by merge, like a
Materialize retraction emptying a group).

The persisted-store lifecycle (idempotent batch redelivery, CAS
appends, fold compaction) lives in ``operators/incremental.py``
(:func:`ingest_agg_deltas` / :func:`read_agg_store` /
:func:`compact_agg_store`); this module is the pure algebra.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: partial-count column: signed row count per key (Σ sign)
COUNT_COL = "__pcount"


def delta_partials(
    batch: DataFrame,
    keys: list[str],
    sums: Mapping[str, Column],
    sign: Column | None = None,
) -> DataFrame:
    """Fold one signed delta batch into per-key partial sums.

    ``sums`` maps output column → int64-quantized measure expression
    (quantize BEFORE calling — see module doc). ``sign`` is +1/-1 per
    row (default: a ``__sign`` column, else all-inserts). Output:
    ``keys + [<sum cols>..., __pcount]`` — one row per key present in
    the batch, regardless of history size.
    """
    if sign is None:
        sign = (
            F.col("__sign")
            if "__sign" in batch.columns
            else F.lit(1)
        )
    sign = sign.cast("long")
    aggs = [
        F.sum(sign * expr.cast("long")).cast("long").alias(name)
        for name, expr in sums.items()
    ]
    aggs.append(F.sum(sign).cast("long").alias(COUNT_COL))
    return batch.groupBy(*keys).agg(*aggs)


def merge_partials(
    partials: DataFrame, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """Merge partial rows (any union of :func:`delta_partials`
    outputs) into the current view: Σ per key, dropping keys whose
    live row count reached zero (fully-retracted groups). Associative
    and commutative by integer-sum construction."""
    merged = partials.groupBy(*keys).agg(
        *[F.sum(c).cast("long").alias(c) for c in sum_cols],
        F.sum(COUNT_COL).cast("long").alias(COUNT_COL),
    )
    return merged.filter(F.col(COUNT_COL) != 0)
