"""Streaming PQ-code ingest: file drops → persisted ANN code store.

The streaming twin of the PQ tier (``operators/vector.py::pq_adc_topk``)
for a corpus that ARRIVES rather than sits: each dropped embedding file
encodes to 8-byte PQ codes against the shipped codebook and appends to
a snapshot code store, so ANN queries (``vector.pq_store_adc_topk``)
run against codes only — query latency depends on corpus CARDINALITY,
never on how many raw-vector bytes streamed through, and the raw
embeddings can be discarded after encode (the store is the index).

Safety layering mirrors ``lsh_ingest``: the checkpoint delivers each
FILE exactly once across runs; the store's vec_id guard turns a
byte-copied redelivery into a no-op; the snapshot store auto-compacts
(bounded file count at any batch count) and appends atomically under
the CAS commit protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators import incremental
from .file_source import run_available_now


def run_pq_ingest(
    stream_emb: DataFrame,
    checkpoint_dir: str,
    store_table: str,
    codebook,
    *,
    dim: int = 64,
    timeout_sec: int = 300,
) -> StreamingQuery:
    """Drain available embedding files into the PQ code store; returns
    after ``Trigger.AvailableNow`` completes."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        incremental.ingest_pq_codes(
            batch_df.sparkSession, store_table, batch_df, codebook, dim=dim
        )

    return run_available_now(
        stream_emb, checkpoint_dir, process, timeout_sec=timeout_sec
    )
