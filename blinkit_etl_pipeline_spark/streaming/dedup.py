"""Streaming deduplication: exactly-once ingestion over at-least-once
delivery (north-star training-data surface).

File drops, queue redeliveries, and task retries all re-present rows;
the canonical streaming fix is key-dedup with WATERMARKED state:
``dropDuplicatesWithinWatermark`` keeps each key's fingerprint only
until the watermark passes it, so state is O(keys-per-watermark-window),
not O(stream) — the property that lets the operator run forever at
100 TB/day. (Plain streaming ``dropDuplicates`` would accrete unbounded
state; it is correct only for bounded replays.)

Two spellings:

- :func:`dedup_by_key` — identity dedup (event_id, message id): the
  ingestion exactly-once guard.
- :func:`dedup_by_content` — content dedup (md5 of a payload column):
  the streaming arm of the batch exact-dedup operator
  (operators/dedup.py::exact_dedup_groups); near-dup LSH variants stay
  batch (their candidate joins need the full corpus).

Batch analogue for testing: output rows must equal the batch
``dropDuplicates`` over the union of all deliveries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "2 hours"


def dedup_by_key(
    stream: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Exactly-once ingestion: drop redelivered rows by identity key.

    A duplicate arriving within ``watermark`` of the original's event
    time is dropped; later than that it would be emitted again — the
    standard bounded-state contract (pick the watermark ≥ the maximum
    redelivery lag of the upstream system).
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def dedup_by_content(
    stream: DataFrame,
    content_col: str,
    ts_col: str = "ts",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Content-hash streaming dedup: one survivor per distinct payload.

    Fingerprint = ``md5(content)`` — the same identity the batch
    ``exact_dedup_groups`` groups on, so a corpus ingested through this
    operator matches a batch dedup of the same files. State carries the
    32-char hash per in-window key, never the payload.
    """
    return (
        stream.withColumn("__content_hash", F.md5(F.col(content_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__content_hash"])
        .drop("__content_hash")
    )
