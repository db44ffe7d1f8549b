"""Streaming bottom-k quantile-sketch maintenance: event file drops →
persisted per-day sketches → quantiles-to-date on demand.

The streaming twin of ``operators/sketch.py::bkq_cumulative_quantiles``
(same layering as ``anomaly_ingest``): each micro-batch folds to ≤ k
candidate rows per day (``bkq_sketch`` — WindowGroupLimit map-side,
work ∝ batch) and appends under the CAS commit protocol; reads fold
the candidates with the LOSSLESS bottom-k merge, so the streamed
answer equals the batch answer for ANY arrival order and any batch
split — the merge-losslessness property, now end-to-end through the
store. Checkpoint delivers each file once; the h-guard absorbs
byte-copied redeliveries; ``compact_bkq_store`` bounds row growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators import incremental
from .file_source import run_available_now


def run_bkq_ingest(
    stream_df: DataFrame,
    checkpoint_dir: str,
    store_table: str,
    *,
    date_col: str = "day",
    id_col: str = "event_id",
    value_col: str = "value",
    k: int | None = None,
    timeout_sec: int = 300,
) -> StreamingQuery:
    """Drain available event files into the bkq sketch store; returns
    after ``Trigger.AvailableNow`` completes."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        incremental.ingest_bkq_sketch(
            batch_df.sparkSession,
            store_table,
            batch_df,
            date_col,
            id_col,
            value_col,
            k=k,
        )

    return run_available_now(
        stream_df, checkpoint_dir, process, timeout_sec=timeout_sec
    )


def quantiles_from_store(
    spark: SparkSession, store_table: str, quantiles=(0.5, 0.9)
) -> DataFrame:
    """Current quantiles-to-date from the maintained sketches."""
    return incremental.bkq_store_cumulative_quantiles(
        spark, store_table, quantiles
    )
