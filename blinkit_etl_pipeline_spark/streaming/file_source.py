"""Structured-Streaming file source: the reference's event-driven
incremental contract, Spark-first (SURVEY.md §2.10).

The reference reacts to S3 ``ObjectCreated`` events: Lambda routes each
new CSV to ETL jobs. Spark's file stream source reproduces exactly that
contract natively — new-file detection, per-batch processing, and
exactly-once via checkpointed file tracking — with
``foreachBatch`` + ``Trigger.AvailableNow``:

- ``Trigger.AvailableNow`` drains all currently-available files then
  stops: the batch-scheduler mode (a cron'd run processes only files
  that arrived since the last checkpoint — Glue-bookmark semantics, C5).
- ``foreachBatch`` hands each micro-batch to a normal batch function, so
  the per-pipeline logic is shared verbatim with the batch runner.
- The checkpoint directory *is* the bookmark state; deleting it
  reprocesses from scratch (the reference's crawler-rebuild analogue).

At scale: ``maxFilesPerTrigger`` bounds micro-batch size;
``latestFirst`` drains backlogs newest-first when freshness matters.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def stream_files(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    fmt: str = "csv",
    header: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source streaming DataFrame (csv or parquet directory)."""
    reader = spark.readStream.schema(schema).format(fmt)
    if fmt == "csv":
        reader = reader.option("header", str(header).lower())
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    process_batch: Callable[[DataFrame, int], None],
    *,
    timeout_sec: int = 300,
) -> StreamingQuery:
    """Drain all available files through ``process_batch``, then stop.

    Exactly-once per file across invocations via the checkpoint.
    """
    q = (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()  # don't leak a straggler query into the session
    return q


def stream_to_memory(
    agg_df: DataFrame,
    table_name: str,
    checkpoint_dir: str,
    *,
    output_mode: str = "complete",
    timeout_sec: int = 300,
) -> StreamingQuery:
    """Run a streaming aggregate into an in-memory table (smoke/driver
    checks; real deployments use a parquet/Delta sink)."""
    q = (
        agg_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()  # don't leak a straggler query into the session
    return q
