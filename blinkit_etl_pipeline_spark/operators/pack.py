"""Sequence packing: concat-and-chunk documents into fixed token
budgets — the last step before a training corpus becomes model input.

The core primitive is an EXACT GLOBAL RUNNING SUM, built the scalable
way instead of a single global window (which would sort the corpus on
one reducer-chain): classic two-phase distributed prefix sum —

1. range-partition + sort by the order key, materialize once
   (``localCheckpoint``) so every pass sees the identical partitioning;
2. per-partition totals via a map-side-combined aggregate — ONE tiny
   row per partition crosses the wire;
3. exclusive prefix over those totals on the driver (O(#partitions)
   state), shipped back as a literal map keyed by partition id;
4. per-partition local cumsum inside ``mapInPandas`` (generator state
   carries across Arrow batches within a partition — zero extra
   shuffle) plus the broadcast offset.

Packing semantics (`pack_sequences`): documents are concatenated in
order and split at every ``budget`` tokens — a document may straddle a
boundary (GPT-style packing; the training loader masks across the
seam). ``seq_id`` = which sequence the document STARTS in,
``offset_in_seq`` = its start position there. Deterministic given the
order column, independent of partition count — the DuckDB oracle
replays it with a plain window cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    num_ranges: int = 8,
    out_col: str = "running_total",
) -> DataFrame:
    """Exact inclusive running sum of ``value_col`` in ``order_col``
    order, without a global sort bottleneck (see module docstring).
    ``value_col`` must be integral; the sum is computed in int64.
    """
    ranged = (
        df.repartitionByRange(num_ranges, F.col(order_col))
        .sortWithinPartitions(order_col)
        .localCheckpoint(eager=True)
    )
    totals = (
        ranged.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(F.sum(value_col).cast("bigint").alias("__psum"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += int(row["__psum"])
    if offsets:
        offset_map = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
    else:  # empty input: no partitions reported totals
        offset_map = F.create_map(F.lit(-1), F.lit(0).cast("bigint"))
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in with_pid.schema.fields
    ) + f", __local {('bigint')}"

    def local_cumsum(batches):
        run = 0
        for pdf in batches:
            vals = pdf[value_col].to_numpy(dtype="int64")
            cum = vals.cumsum() + run
            if len(cum):
                run = int(cum[-1])
            pdf = pdf.copy()
            pdf["__local"] = cum
            yield pdf

    local = with_pid.mapInPandas(local_cumsum, schema=out_schema)
    return local.withColumn(
        out_col,
        F.col("__local")
        + F.coalesce(
            F.element_at(offset_map, F.col("__pid")), F.lit(0)
        ).cast("bigint"),
    ).drop("__pid", "__local")


def pack_sequences(
    docs: DataFrame,
    budget: int,
    *,
    order_col: str = "doc_id",
    text: str = "text",
    num_ranges: int = 8,
) -> DataFrame:
    """Assign each document its packed position: (doc_id, n_tokens,
    cum_tokens, seq_id, offset_in_seq) under concat-and-chunk packing
    at ``budget`` tokens per sequence."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    sized = docs.select(
        F.col(order_col),
        # NULL text counts 0 tokens — unguarded, legacy size(NULL) = -1
        # would silently corrupt the running sum for every later doc
        F.when(F.col(text).isNull(), F.lit(0))
        .otherwise(F.size(tokens(F.col(text))))
        .cast("bigint")
        .alias("n_tokens"),
    )
    ps = global_prefix_sum(
        sized,
        order_col,
        "n_tokens",
        num_ranges=num_ranges,
        out_col="cum_tokens",
    )
    # pure integer arithmetic end-to-end: `div` is bigint integer
    # division (floor for the non-negative starts here), exact at any
    # cumulative token count — float `/` + floor would drift past 2^53
    budget = int(budget)
    return ps.select(
        order_col,
        "n_tokens",
        "cum_tokens",
        F.expr(f"(cum_tokens - n_tokens) div {budget}")
        .cast("bigint")
        .alias("seq_id"),
        F.expr(f"(cum_tokens - n_tokens) % {budget}")
        .cast("bigint")
        .alias("offset_in_seq"),
    )
