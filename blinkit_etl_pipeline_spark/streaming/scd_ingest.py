"""Streaming SCD Type-2 maintenance: change-event feed → the
hive-bucketed dimension on disk.

The streaming twin of ``operators/scd.py::scd2_apply_partitioned``:
each micro-batch rewrites only the key-buckets it touches; the
dimension is readable by any batch session at every epoch boundary.

Exactly-once story: the file-source checkpoint deduplicates inputs,
and the fold itself is redelivery-idempotent BY CONSTRUCTION — a
replayed epoch's observations compress into the versions they already
created (scd2_apply doc), so a crash between the partition writes and
the checkpoint commit cannot double-apply. Single-apply durability is
covered too: each touched bucket commits through the staged-rename
swap (scd2_apply_partitioned + _heal_bucket_swaps), so a crash in the
middle of ONE bucket's rewrite can no longer lose that bucket's
history — the live dir is never deleted before its replacement is
fully written, and the next call rolls any interrupted swap forward.
Out-of-order arrivals are
handled exactly (a late change splits the interval it lands in), so no
watermark is needed — the dimension is always the full-history answer
over everything ingested so far.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators import scd
from .file_source import run_available_now


def run_scd2_ingest(
    stream_df: DataFrame,
    checkpoint_dir: str,
    dim_path: str,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
    *,
    n_buckets: int = 64,
    timeout_sec: int = 300,
) -> StreamingQuery:
    """Drain available change files into the SCD2 dimension at
    ``dim_path``; returns after ``Trigger.AvailableNow`` completes."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        scd.scd2_apply_partitioned(
            batch_df.sparkSession,
            dim_path,
            batch_df,
            key,
            attr,
            ts,
            tiebreak,
            n_buckets=n_buckets,
        )

    return run_available_now(
        stream_df, checkpoint_dir, process, timeout_sec=timeout_sec
    )
