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


FUNNEL_OUTPUT_SCHEMA = "user_id bigint, funnel_depth int, events_seen bigint"
FUNNEL_STATE_SCHEMA = "t0 timestamp, t1 timestamp, t2 timestamp, n bigint"


def streaming_funnel_depth(events_stream: DataFrame) -> DataFrame:
    """Streaming twin of ``operators.events.funnel``: per-user funnel
    depth maintained incrementally.

    State per user is just the three first-timestamps (view, click,
    purchase) — O(1) per key, merged monotonically (min) as events
    arrive in any order across micro-batches, so late/out-of-order
    delivery converges to the same depths as the batch operator. Emits
    the user's current depth each micro-batch they appear in; the LAST
    emission per user equals the batch funnel depth over the union of
    all delivered events (asserted in tests/test_streaming.py).
    """
    from ..operators.events import FUNNEL_STEPS

    def update(key, pdfs, state: GroupState):
        if state.exists:
            *firsts, seen = state.get
            firsts = list(firsts)
        else:
            firsts, seen = [None] * 3, 0
        for pdf in pdfs:
            seen += int(len(pdf))
            for i, step in enumerate(FUNNEL_STEPS):
                ts = pdf.loc[pdf["event_type"] == step, "ts"]
                if len(ts):
                    t = ts.min()
                    if firsts[i] is None or t < firsts[i]:
                        firsts[i] = t
        state.update((*firsts, seen))
        depth = 0
        for i in range(len(FUNNEL_STEPS)):
            ok = firsts[i] is not None and (
                i == 0 or (firsts[i - 1] is not None and firsts[i] > firsts[i - 1])
            )
            if not ok:
                break
            depth += 1
        # events_seen is monotone, so the row with the max value per
        # user is the converged (all-events-delivered) depth
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "funnel_depth": [depth],
                "events_seen": [seen],
            }
        )

    return (
        events_stream.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
