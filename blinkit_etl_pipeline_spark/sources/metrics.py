"""Observation metrics: the reference's ``df.count()`` log lines without
the extra scans (SURVEY.md §2.1 S8, §4.2).

The reference counts every input eagerly for logging — each count is a
full extra job over the data. ``DataFrame.observe`` attaches aggregate
metrics to the plan itself: they are collected as a side effect of the
action that was going to run anyway (the sink write), costing zero
additional passes — the only S8 semantics that survive 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_row_count(df: DataFrame, name: str) -> tuple[DataFrame, Observation]:
    """Attach a row-count observation; read ``obs.get`` after any action."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs


def get_count(obs: Observation) -> int:
    """Row count recorded by the first action on the observed plan."""
    return int(obs.get["rows"])
