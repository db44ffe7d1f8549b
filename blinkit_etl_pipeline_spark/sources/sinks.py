"""Sinks: partitioned snappy-parquet writers (SURVEY.md §2.1 S5/S6).

Scale note (SURVEY.md §4.4): the reference writes
``partitionBy("year","month","day")`` straight from the upstream
partitioning — at 100 TB every task writes a file into every date
partition (small-file explosion). We repartition by the partition
columns first so each output partition is written by few tasks; AQE
coalescing keeps the shuffle cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("year", "month", "day"),
    *,
    mode: str = "overwrite",
    compression: str = "snappy",
    repartition_first: bool = True,
) -> None:
    """S5: partitioned parquet sink (reference 01:96-101, 03:117-122)."""
    if repartition_first and partition_cols:
        df = df.repartition(*partition_cols)
    (
        df.write.mode(mode)
        .partitionBy(*partition_cols)
        .format("parquet")
        .option("compression", compression)
        .save(path)
    )


def write_curated(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """S6: unpartitioned curated sink (reference 03:143-146).

    Curated aggregates are small; coalesce to one file for cheap reads.
    """
    df.coalesce(1).write.mode(mode).format("parquet").save(path)
