"""Sinks: partitioned snappy-parquet writers (SURVEY.md §2.1 S5/S6).

Scale notes (SURVEY.md §4.4):

- The reference writes ``partitionBy("year","month","day")`` straight
  from the upstream partitioning — at 100 TB every task writes a file
  into every date partition (small-file explosion). We repartition by
  the partition columns first so each output partition is written by
  few tasks; AQE coalescing keeps the shuffle cheap.
- ``maxRecordsPerFile`` bounds the other direction: after the
  repartition a hot date lands in ONE task, and without a cap that task
  writes one huge file (no read parallelism, giant row groups). The cap
  rolls files at a fixed record count, so output file sizes are bounded
  on both ends.
- ``sort_cols``: sorting rows *within* each output task clusters values
  so parquet row-group min/max statistics become selective — a reader
  filtering on the sort key skips whole row groups instead of scanning
  everything. Costs one in-memory sort per task at write time, pays on
  every subsequent read.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

#: Default file-roll cap. At ~100 bytes/row this bounds files to
#: ~500 MB before compression — large enough for scan efficiency,
#: small enough for read parallelism and retry granularity.
DEFAULT_MAX_RECORDS_PER_FILE = 5_000_000


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("year", "month", "day"),
    *,
    mode: str = "overwrite",
    compression: str = "snappy",
    repartition_first: bool = True,
    max_records_per_file: int | None = DEFAULT_MAX_RECORDS_PER_FILE,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """S5: partitioned parquet sink (reference 01:96-101, 03:117-122)."""
    if repartition_first and partition_cols:
        df = df.repartition(*partition_cols)
    if sort_cols:
        # prefix with the partition columns: FileFormatWriter requires
        # task rows ordered by partition cols and would otherwise insert
        # its own (unstable) sort, destroying the sort_cols clustering
        df = df.sortWithinPartitions(*partition_cols, *sort_cols)
    writer = (
        df.write.mode(mode)
        .partitionBy(*partition_cols)
        .format("parquet")
        .option("compression", compression)
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(int(max_records_per_file)))
    writer.save(path)


def write_curated(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """S6: unpartitioned curated sink (reference 03:143-146).

    Curated aggregates are small; coalesce to one file for cheap reads.
    """
    df.coalesce(1).write.mode(mode).format("parquet").save(path)
