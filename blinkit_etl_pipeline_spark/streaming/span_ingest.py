"""Streaming span-window index ingest: file drops → persisted rolling
window store + per-batch duplicated-span report.

Fourth member of the streaming index family (``lsh_ingest`` signatures,
``pq_ingest`` ANN codes, ``bm25_ingest`` postings) — and the first
added after the shared store lifecycle, so it is nothing but the
foreachBatch plumbing around :func:`incremental.
ingest_and_find_dup_spans`. Each dropped file's documents are checked
for verbatim k-token spans against EVERYTHING ingested so far (and
within the batch), duplicated spans stream to ``on_spans`` before the
append commits (crash-safe sink ordering, see the operator docstring),
and the corpus text can be discarded after ingest — history lives as
24-byte window rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators import incremental
from .file_source import run_available_now


def run_span_ingest(
    stream_docs: DataFrame,
    checkpoint_dir: str,
    store_table: str,
    *,
    k: int = 10,
    on_spans=None,
    timeout_sec: int = 300,
) -> StreamingQuery:
    """Drain available document files into the span-window store;
    returns after ``Trigger.AvailableNow`` completes."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        incremental.ingest_and_find_dup_spans(
            batch_df.sparkSession, store_table, batch_df,
            k=k, on_spans=on_spans,
        )

    return run_available_now(
        stream_docs, checkpoint_dir, process, timeout_sec=timeout_sec
    )
