"""Streaming SCD Type-2 maintenance: change-event feed → the
bucketed MVCC dimension store.

The streaming twin of ``operators/scd.py::scd2_apply_snapshot`` (r10:
upgraded from the staged-rename ``scd2_apply_partitioned`` — streamed
appliers now get the same reader isolation the batch path gained in
r9): each micro-batch commits ``untouched buckets' files (by
reference) + touched buckets' fresh files`` as ONE CAS manifest
version, so a concurrent reader never sees a bucket absent — it sees
the pre-commit version until the commit lands, and can pin any
historical version (time travel). The dimension is readable by any
batch session at every epoch boundary via
``operators/snapshot.read_snapshot``.

Exactly-once story: the file-source checkpoint deduplicates inputs,
and the fold itself is redelivery-idempotent BY CONSTRUCTION — a
replayed epoch's observations compress into the versions they already
created (scd2_apply doc), so a crash between the store commit and the
checkpoint commit cannot double-apply. Single-apply durability is the
manifest CAS itself: a crash mid-apply leaves only unreferenced data
files (cleaned by ``snapshot.expire_orphans``), never a partially
swapped bucket. Out-of-order arrivals are handled exactly (a late
change splits the interval it lands in), so no watermark is needed —
the dimension is always the full-history answer over everything
ingested so far.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators import scd, snapshot
from .file_source import run_available_now


def run_scd2_ingest(
    stream_df: DataFrame,
    checkpoint_dir: str,
    dim_table: str,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
    *,
    n_buckets: int = 64,
    timeout_sec: int = 300,
) -> StreamingQuery:
    """Drain available change files into the SCD2 dimension store at
    ``dim_table``; returns after ``Trigger.AvailableNow`` completes.
    The live dimension is :func:`read_dim` at any moment."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        scd.scd2_apply_snapshot(
            batch_df.sparkSession,
            dim_table,
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


def read_dim(
    spark: SparkSession, dim_table: str, version: int | None = None
) -> DataFrame:
    """The maintained dimension at the latest (or a pinned) version —
    a manifest resolve + immutable file scan, safe under concurrent
    streamed applies."""
    return snapshot.read_snapshot(spark, dim_table, version)
