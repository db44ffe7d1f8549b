"""Streaming k-NN graph ingest: embedding file drops → the persisted
vector + candidate-edge stores (r10 — the graph member of the
streaming index family: lsh/pq/sq8/bm25/bigram).

Each dropped embedding file buckets once, scores only pairs with a
new side against the colliding buckets' stored vectors (file-pruned by
the ``tb`` cluster key), folds candidates to ≤k per node, and appends
atomically. The live graph is ``incremental.knn_graph_from_store`` at
any moment and equals the batch ``vector.knn_graph(everything, iters=0)``
for any arrival order — the top-k merge semilattice (pytest).
Exactly-once layering: file-source checkpoint + the vector store's
vec_id guard (a replayed drop appends nothing; a crash between the
edge and vector commits re-appends identical-cosine edges that the
read-side (u, v) dedup absorbs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators import incremental
from .file_source import run_available_now


def run_knn_ingest(
    stream_emb: DataFrame,
    checkpoint_dir: str,
    vec_store: str,
    graph_store: str,
    *,
    k: int = 5,
    nbits: int = 4,
    ntables: int = 8,
    dim: int = 64,
    timeout_sec: int = 300,
) -> StreamingQuery:
    """Drain available embedding files into the graph stores; returns
    after ``Trigger.AvailableNow`` completes."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        incremental.ingest_knn_graph(
            batch_df.sparkSession,
            vec_store,
            graph_store,
            batch_df,
            k=k,
            nbits=nbits,
            ntables=ntables,
            dim=dim,
        )

    return run_available_now(
        stream_emb, checkpoint_dir, process, timeout_sec=timeout_sec
    )
