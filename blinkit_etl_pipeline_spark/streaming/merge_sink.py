"""Streaming CDC apply: micro-batched MERGE into a partitioned table.

Composes the streaming file source (exactly-once via checkpoint) with
the batch MERGE operators (`operators/merge.py`): each micro-batch of
change rows is applied with ``merge_into_partitioned`` — replacements,
keyed deletes and inserts, rewriting ONLY the partitions the batch
touches. This is the continuous-ingestion shape of a 100 TB curated
layer: the stream is small (a CDC feed), the table is huge, and each
trigger's cost is bounded by the touched-partition slice.

Semantics notes:

- **Exactly-once across restarts** comes from the file-source
  checkpoint (a replayed batch re-applies the same MERGE; MERGE is
  idempotent for replace/delete, and insert keys are replaced rather
  than duplicated on re-apply, so a replay converges to the same
  table — the idempotence property is unit-tested in
  ``tests/test_properties.py``).
- **Within-batch ordering**: pass ``version_col`` so a batch that
  carries several changes for one key applies the newest; ACROSS
  batches, later triggers win by construction (they merge over the
  table the earlier ones produced).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators import merge as merge_ops
from .file_source import run_available_now


def stream_merge_into_partitioned(
    changes_stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    keys: Sequence[str],
    partition_cols: Sequence[str],
    *,
    delete_col: str | None = None,
    version_col: str | None = None,
    timeout_sec: int = 300,
) -> StreamingQuery:
    """Drain all available change files and MERGE each micro-batch into
    the partitioned table at ``table_path``. Returns the finished
    query; the checkpoint makes re-invocations process only new files.
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        merge_ops.merge_into_partitioned(
            spark,
            table_path,
            batch_df,
            keys,
            partition_cols,
            delete_col=delete_col,
            version_col=version_col,
        )

    return run_available_now(
        changes_stream, checkpoint_dir, apply_batch, timeout_sec=timeout_sec
    )
