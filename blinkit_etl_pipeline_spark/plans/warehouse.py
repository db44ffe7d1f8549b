"""Warehouse-modeling and sketch-set query surfaces (r7 second wave).

Same contract as :mod:`northstar`: ``QUERIES`` maps name -> Spark
callable, ``ORACLES`` maps name -> DuckDB SQL over the pre-registered
testdata views; column names/aliases match pairwise so the driver's
sorted-column value hash compares exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import register_base

QUERIES: dict = {}
ORACLES: dict = {}


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return register_base(spark, sf_dir)["events"]


# ---------------------------------------------------------------------------
# SCD Type-2 dimension build (ns_scd2_user_state)
# ---------------------------------------------------------------------------


def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history of each user's observed state (the event
    feed's ``event_type`` as the tracked attribute): consecutive
    same-state observations compress, each surviving change opens a
    half-open ``[valid_from, valid_to)`` version. One shuffle on
    user_id; see operators/scd.py."""
    from ..operators import scd

    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    return scd.scd2_build(ev, "user_id", "event_type", "ts", "event_id")


QUERIES["ns_scd2_user_state"] = q_scd2_user_state

ORACLES["ns_scd2_user_state"] = """WITH ord AS (
  SELECT user_id, event_type AS state, ts, event_id,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev
  FROM events),
chg AS (
  SELECT user_id, state, ts, event_id FROM ord
  WHERE prev IS NULL OR state <> prev)
SELECT user_id, state, ts AS valid_from,
  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
    AS BIGINT) AS version,
  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
    AS is_current
FROM chg"""
