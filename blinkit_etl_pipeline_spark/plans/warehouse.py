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


# ---------------------------------------------------------------------------
# KMV theta-sketch set intersection (ns_sketch_kmv_overlap)
# ---------------------------------------------------------------------------


def q_sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between every pair of event types via KMV
    (k-minimum-values) theta sketches — distinct-set INTERSECTION
    estimates, the question HLL registers cannot answer. Exact
    intersection rides along as the error gauge. See
    operators/sketch.py::kmv_overlap."""
    from ..operators import sketch

    ev = _events(spark, sf_dir)
    out = sketch.kmv_overlap(ev, "event_type", "user_id")
    return out.orderBy("type_a", "type_b")


QUERIES["ns_sketch_kmv_overlap"] = q_sketch_kmv_overlap

_KMV_K = 256
_KMV_SPACE = 1 << 48
_KMV_EST = (
    f"CASE WHEN n < {_KMV_K} THEN n "
    f"ELSE ({_KMV_K - 1} * {_KMV_SPACE}) // mx END"
)

ORACLES["ns_sketch_kmv_overlap"] = f"""WITH dv AS (
  SELECT DISTINCT event_type AS g,
    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
  FROM events),
sk AS (
  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS r
  FROM dv QUALIFY r <= {_KMV_K}),
per AS (SELECT g, count(*) AS n, max(h) AS mx FROM sk GROUP BY g),
est_g AS (SELECT g, CAST({_KMV_EST} AS BIGINT) AS est FROM per),
pairs AS (
  SELECT a.g AS ga, b.g AS gb FROM per a, per b WHERE a.g < b.g),
u AS (
  SELECT ga, gb, h, max(fa) AS fa, max(fb) AS fb FROM (
    SELECT pairs.ga, pairs.gb, sk.h, 1 AS fa, 0 AS fb
    FROM pairs JOIN sk ON sk.g = pairs.ga
    UNION ALL
    SELECT pairs.ga, pairs.gb, sk.h, 0 AS fa, 1 AS fb
    FROM pairs JOIN sk ON sk.g = pairs.gb)
  GROUP BY ga, gb, h),
kept AS (
  SELECT ga, gb, h, fa, fb,
    row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS r
  FROM u QUALIFY r <= {_KMV_K}),
stats AS (
  SELECT ga, gb, count(*) AS n, max(h) AS mx,
    SUM(CASE WHEN fa = 1 AND fb = 1 THEN 1 ELSE 0 END) AS rho
  FROM kept GROUP BY ga, gb),
pair_est AS (
  SELECT ga, gb, CAST({_KMV_EST} AS BIGINT) AS est_union,
    CAST(CASE WHEN n < {_KMV_K} THEN rho
      ELSE rho * ((({_KMV_K - 1} * {_KMV_SPACE}) // mx) // {_KMV_K}) END
      AS BIGINT) AS est_inter
  FROM stats),
dvx AS (SELECT DISTINCT event_type AS g, user_id AS v FROM events),
exact AS (
  SELECT a.g AS ga, b.g AS gb, CAST(count(*) AS BIGINT) AS exact_inter
  FROM dvx a JOIN dvx b ON a.v = b.v AND a.g < b.g
  GROUP BY a.g, b.g)
SELECT pair_est.ga AS type_a, pair_est.gb AS type_b,
  ea.est AS est_a, eb.est AS est_b, est_union, est_inter,
  COALESCE(exact.exact_inter, 0) AS exact_inter
FROM pair_est
JOIN est_g ea ON ea.g = pair_est.ga
JOIN est_g eb ON eb.g = pair_est.gb
LEFT JOIN exact ON exact.ga = pair_est.ga AND exact.gb = pair_est.gb
ORDER BY type_a, type_b"""
