"""Streaming BM25 index ingest: file drops → persisted postings store.

Third member of the streaming index family (``lsh_ingest`` signatures,
``pq_ingest`` ANN codes): each dropped document file tokenizes once
into (token, tf, dl) postings and appends atomically to a snapshot
store. Retrieval (``functions.text.bm25_store_topk``) runs from the
store alone — corpus text can be discarded after ingest, df/N/avgdl
always cover the full ingested history, and the checkpoint + doc_id
guard give the same exactly-once layering as the sibling ingests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators import incremental
from .file_source import run_available_now


def run_bm25_ingest(
    stream_docs: DataFrame,
    checkpoint_dir: str,
    store_table: str,
    *,
    timeout_sec: int = 300,
) -> StreamingQuery:
    """Drain available document files into the postings store; returns
    after ``Trigger.AvailableNow`` completes."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        incremental.ingest_bm25_postings(
            batch_df.sparkSession, store_table, batch_df
        )

    return run_available_now(
        stream_docs, checkpoint_dir, process, timeout_sec=timeout_sec
    )


def run_collocation_ingest(
    stream_docs: DataFrame,
    checkpoint_dir: str,
    postings_store: str,
    bigram_store: str,
    *,
    timeout_sec: int = 300,
) -> StreamingQuery:
    """Drain available document files into BOTH text indexes — the
    unigram postings store (BM25 retrieval + TF-IDF keywords) and the
    bigram store (PMI collocations) — from one drop stream. Each store
    keeps its own doc-grained guard, so a crash between the two
    ingests replays safely: the already-committed store skips the
    batch, the other catches up."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        incremental.ingest_bm25_postings(sess, postings_store, batch_df)
        incremental.ingest_bigram_postings(sess, bigram_store, batch_df)

    return run_available_now(
        stream_docs, checkpoint_dir, process, timeout_sec=timeout_sec
    )
