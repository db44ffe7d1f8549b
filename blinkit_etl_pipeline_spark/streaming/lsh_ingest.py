"""Streaming incremental near-dup ingest: file drops → signature store.

Composes three of the engine's own pieces into the production dedup
ingestion loop (the streaming twin of ``operators/incremental.py``):

- the checkpointed file source delivers each dropped file exactly once
  across runs (``streaming/file_source.py``);
- every micro-batch band-joins against the PERSISTED MinHash-LSH
  signature store and appends its own signatures as a new store
  version (``operators/incremental.py``);
- detected pairs append to a parquet log, so downstream consumers see
  a monotone stream of (doc_a, doc_b, bands_matched, batch_id).

Crash/redelivery safety is layered: the checkpoint prevents REPLAYED
FILES, and the store's doc_id guard turns any batch that slips through
twice (e.g. a copied drop file) into a no-op — the same
exactly-once-by-content contract as ``streaming/dedup.py``, here for
whole batches against all of history. The pair log is written BEFORE
the store append (via ``on_pairs``) into a per-batch partition with
overwrite semantics: a crash between log and append redelivers the
batch, recomputes identical pairs (the store is unchanged), and
overwrites the same partition — never losing and never duplicating a
pair. The reverse order would lose a batch's pairs forever if the
process died between the append and the log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators import incremental
from .file_source import run_available_now


def run_lsh_ingest(
    stream_docs: DataFrame,
    checkpoint_dir: str,
    store_table: str,
    pairs_log: str,
    *,
    n: int = 3,
    min_bands: int = 1,
    timeout_sec: int = 300,
) -> StreamingQuery:
    """Drain available document files through the incremental LSH
    ingest; returns after ``Trigger.AvailableNow`` completes."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession

        def sink(pairs: DataFrame) -> None:
            # idempotent per-batch hive partition: a redelivered batch
            # overwrites ITS OWN directory with identical content (the
            # batch_id column comes back from the directory name)
            pairs.write.mode("overwrite").parquet(
                f"{pairs_log}/batch_id={batch_id}"
            )

        incremental.ingest_and_find_dups(
            spark, store_table, batch_df, n=n, min_bands=min_bands,
            on_pairs=sink,
        )

    return run_available_now(
        stream_docs, checkpoint_dir, process, timeout_sec=timeout_sec
    )
