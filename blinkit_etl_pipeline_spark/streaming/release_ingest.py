"""Streaming corpus-release maintainer: file drops → the versioned
release's three stores (r12, VERDICT r11 #5).

The release capstone (``operators/release.py``) composes three index
stores — curation attributes, unigram postings (NB features +
vocabulary), bigram postings (perplexity-LM features) — and until now
only had batch ingest. This twin drains document file drops through
ONE checkpointed stream into all three, mirroring the sibling ingests
(``bm25_ingest.run_collocation_ingest``): each store keeps its own
doc_id redelivery guard, so exactly-once layering holds under any
arrival order, micro-batch split, re-delivery, or crash between the
three appends (the already-committed stores skip the replayed batch,
the others catch up). A :func:`release_read
<..operators.release.release_read>` after the stream drains equals
the batch read over the union of all dropped files — pytest mirrors
``tests/test_release.py`` through file drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators import release
from .file_source import run_available_now


def run_release_ingest(
    stream_docs: DataFrame,
    checkpoint_dir: str,
    root: str,
    *,
    timeout_sec: int = 300,
) -> StreamingQuery:
    """Drain available document files into the release's attribute +
    unigram + bigram stores under one checkpoint; returns after
    ``Trigger.AvailableNow`` completes. Publishing stays an explicit
    act (``release.publish_release``) — a training corpus version is
    pinned deliberately, not per micro-batch."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        release.ingest_release(batch_df.sparkSession, root, batch_df)

    return run_available_now(
        stream_docs, checkpoint_dir, process, timeout_sec=timeout_sec
    )
