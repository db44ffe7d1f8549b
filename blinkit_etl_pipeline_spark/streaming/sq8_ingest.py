"""Streaming SQ8-code ingest: file drops → persisted byte-code store.

The streaming twin of the SQ8 tier (``operators/vector.py::sq8_topk``)
— same layering as ``pq_ingest``: each dropped embedding file encodes
to byte-per-dimension codes against the store's PINNED quantizer
(first batch trains it — or the caller ships one — and the table
properties freeze it; later out-of-range values clamp, the FAISS
stored-quantizer behavior) and appends under the CAS commit protocol.
Checkpoint delivers each file exactly once; the vec_id guard absorbs
byte-copied redeliveries; the store auto-compacts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators import incremental
from .file_source import run_available_now


def run_sq8_ingest(
    stream_emb: DataFrame,
    checkpoint_dir: str,
    store_table: str,
    *,
    stats=None,
    timeout_sec: int = 300,
) -> StreamingQuery:
    """Drain available embedding files into the SQ8 code store; returns
    after ``Trigger.AvailableNow`` completes."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        incremental.ingest_sq8_codes(
            batch_df.sparkSession, store_table, batch_df, stats=stats
        )

    return run_available_now(
        stream_emb, checkpoint_dir, process, timeout_sec=timeout_sec
    )
