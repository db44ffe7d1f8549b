"""Custom stateful streaming operator via ``applyInPandasWithState``.

Native windows (streaming/windows.py) cover time-bucketed and
gap-session aggregation; this module is the escape hatch for state
machines Spark has no built-in for — running per-key accumulators,
custom eviction, cross-batch counters. The pattern:

- ``groupBy(key)`` partitions the stream; each key's state lives on one
  executor, sharded by the shuffle — state scales horizontally with the
  cluster, never through the driver.
- The update function sees Arrow-batched pandas frames (vectorized, not
  row-at-a-time) plus a ``GroupState`` handle; state is a plain tuple,
  checkpointed with the query for exactly-once recovery.
- A processing-time timeout evicts idle keys, bounding state size —
  without it, a 100 TB keyspace would accrete unbounded executor state.

Batch analogue for testing: the final emission per key must equal the
batch ``groupBy(key).agg(count, sum)`` over the same files.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, sum_value double, batches_seen bigint"
)
STATE_SCHEMA = "n bigint, s double, batches bigint"


def running_user_totals(
    events_stream: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user running (count, sum(value)) across micro-batches.

    Emits one row per user per micro-batch in which the user appears,
    carrying the cumulative totals so far — the streaming analogue of a
    continuously-updated user profile table.

    ``idle_timeout_ms`` arms processing-time idle-key eviction — for
    **continuously-running** queries only. A drain-and-stop
    (``Trigger.AvailableNow``) query must leave it off: with a
    processing-time timeout armed, Spark keeps the query alive to fire
    pending timeouts, so the "drain then terminate" run never
    terminates on its own (measured: 300 s wait-out vs 10 s drain).
    """

    def update(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle-key eviction: emit nothing, drop the state
            state.remove()
            return
        n, s, batches = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += int(len(pdf))
            s += float(pdf["value"].sum())
        batches += 1
        state.update((n, s, batches))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [round(s, 2)],
                "batches_seen": [batches],
            }
        )

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )
