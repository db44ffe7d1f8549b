"""Streaming retraction ingest: a takedown feed → store tombstones.

Right-to-be-forgotten requests arrive as a FEED in production (legal
queue, abuse pipeline), not as ad-hoc calls; this is the foreachBatch
twin of :func:`operators.incremental.retract_docs` with the same
safety layering as every other ingest here: the checkpoint delivers
each file exactly once, and retraction itself is idempotent (an id
already tombstoned appends nothing), so crash-redelivery is a no-op.
Applies to any index store format — the tombstone sidecar is shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators import incremental
from .file_source import run_available_now


def run_retract_ingest(
    stream_ids: DataFrame,
    checkpoint_dir: str,
    store_table: str,
    *,
    id_col: str = "doc_id",
    timeout_sec: int = 300,
) -> StreamingQuery:
    """Drain available takedown files (one ``id_col`` column) into the
    store's tombstone table; returns after ``Trigger.AvailableNow``."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        incremental.retract_docs(
            batch_df.sparkSession, store_table, batch_df, id_col=id_col
        )

    return run_available_now(
        stream_ids, checkpoint_dir, process, timeout_sec=timeout_sec
    )
