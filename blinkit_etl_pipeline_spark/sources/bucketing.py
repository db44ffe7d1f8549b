"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §4.4 note).

At 100 TB the repeated fact⋈fact joins (e.g. order_items ⋈ orders every
run) each shuffle both sides on the join key. Bucketing pre-partitions
the stored table by that key: both sides bucketed ×N on the key join
with ZERO exchange — the sort-merge join reads co-located buckets.

Spark only honors bucket metadata through the session catalog
(``saveAsTable``), not plain-path parquet: ``spark.read.parquet`` of the
same files would lose bucketing. The bucket count is a layout decision:
pick so each bucket ≈ 100-200 MB at target scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    *,
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) catalog table."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read back with bucket metadata intact (catalog read)."""
    return spark.table(table)
