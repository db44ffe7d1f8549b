"""Streaming EWMA rate-anomaly maintenance: event feed → incrementally
maintained hourly counts (the agg store) → flags on demand.

The streaming twin of ``operators/events.py::ewma_anomaly``: each
micro-batch folds to per-(event_type, hour) count partials — work ∝
batch, never ∝ history — appended to the persisted aggregate store
with the store family's batch-grained idempotent redelivery. Flags
recompute from the store on read: the hourly table is (types × hours)
rows, so the EWMA window pass costs nothing at any corpus size, and
because counts fold ADDITIVELY the streamed flags equal the batch
answer for ANY arrival order (contrast scd_ingest.py's in-order
contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import incremental
from ..operators.events import ewma_flags
from .file_source import run_available_now

_KEYS = ["event_type", "hour"]


def run_ewma_ingest(
    stream_df: DataFrame,
    checkpoint_dir: str,
    store_table: str,
    *,
    timeout_sec: int = 300,
) -> StreamingQuery:
    """Drain available event files into the hourly-count store;
    returns after ``Trigger.AvailableNow`` completes."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        deltas = batch_df.select(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        incremental.ingest_agg_deltas(
            batch_df.sparkSession,
            store_table,
            deltas,
            _KEYS,
            {"n": F.lit(1).cast("long")},
            batch_id=f"epoch-{batch_id}",
        )

    return run_available_now(
        stream_df, checkpoint_dir, process, timeout_sec=timeout_sec
    )


def ewma_flags_from_store(
    spark: SparkSession, store_table: str
) -> DataFrame:
    """Current anomaly flags from the maintained hourly counts —
    merge-on-read of the store (keys × batches rows) + the bounded
    EWMA window pass."""
    hourly = incremental.read_agg_store(spark, store_table, _KEYS, ["n"])
    return ewma_flags(hourly.select("event_type", "hour", "n"))
