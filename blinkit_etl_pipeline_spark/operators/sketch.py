"""Approximate-aggregate sketches, cross-engine deterministic.

At 100 TB, exact ``COUNT(DISTINCT)`` and exact percentiles are the two
aggregates whose shuffle cost explodes (full key shuffle / global sort).
The standard scale answers are sketches — HyperLogLog and histogram /
t-digest — but Spark's built-ins (``approx_count_distinct``,
``percentile_approx``) are engine-private: no other engine reproduces
their merge order, so they can't be value-checked by the DuckDB oracle.

These implementations rebuild the sketches from **explicit expressions
on the cross-engine h32 hash** (functions/text.py), so Spark and DuckDB
compute bit-identical registers and therefore identical estimates:

- :func:`hll_distinct` — HyperLogLog with p=9 (512 registers):
  ``bucket = h32 >> 23``, ``rank = 24 - bitlength(h32 & (2^23-1))``.
  Register maxes are a plain (group, bucket) hash aggregate — partial
  map-side, shuffle carries ≤ 512 rows per group, never the values.
  The harmonic sum is a sum of dyadic rationals ≥ 2^-24 over ≤ 512
  terms, which double arithmetic represents *exactly*, so the estimate
  is addition-order-independent — safe to hash-compare across engines.
- :func:`histogram_quantiles` — fixed-bin (256) equi-width histogram
  per group with linear interpolation inside the target bin. Two
  aggregates + one ≤256-row window per group; no global sort at any
  scale. Bin selection is integer cumulative-count arithmetic.

Reference parity note: the reference has no approximate aggregates
(SURVEY.md §2.6 "not present" row); this is north-star scale surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import h32

HLL_P = 9
HLL_M = 1 << HLL_P  # 512 registers
HLL_REM_BITS = 32 - HLL_P  # 23
HLL_REM_MOD = 1 << HLL_REM_BITS
# standard alpha_m for m >= 128; spelled as the same literal expression
# in the oracle SQL so both engines evaluate the identical double
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

QUANTILE_BINS = 256


def hll_registers(df: DataFrame, group_cols: Sequence[str], value_col: str) -> DataFrame:
    """(group, bucket) -> max rank — the HLL register table."""
    h = h32(F.col(value_col).cast("string"))
    bucket = F.floor(h / F.lit(float(HLL_REM_MOD))).cast("int")
    w = (h % HLL_REM_MOD).cast("long")
    rank = (
        F.when(w == 0, F.lit(HLL_REM_BITS + 1))
        .otherwise(F.lit(HLL_REM_BITS + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("m_rank"))
    )


def hll_distinct(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate of ``value_col``.

    Output: group cols + ``hll_buckets_used`` + ``hll_estimate``
    (rounded to 2). Includes the standard linear-counting small-range
    correction (raw estimate ≤ 2.5m with empty registers present).
    """
    regs = hll_registers(df, group_cols, value_col)
    return hll_estimate_from_registers(regs, group_cols)


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Estimate from a (group, bucket, m_rank) register table — shared
    by the one-shot path and any MERGED register table (union + max):
    HLL registers are a semilattice, so daily/partition sketches merge
    with a plain groupBy-max before estimating here."""
    per_group = regs.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("hll_buckets_used"),
        F.sum(F.pow(F.lit(0.5), F.col("m_rank"))).alias("_hsum"),
    )
    m = F.lit(float(HLL_M))
    zeros = m - F.col("hll_buckets_used")
    harmonic = F.col("_hsum") + zeros  # empty registers contribute 2^0 = 1
    raw = F.lit(HLL_ALPHA) * m * m / harmonic
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0), m * F.log(m / zeros)
    ).otherwise(raw)
    return per_group.select(
        *group_cols,
        "hll_buckets_used",
        F.round(est, 2).alias("hll_estimate"),
    )


def hll_distinct_sql(
    table: str, group_cols: Sequence[str], value_col: str
) -> str:
    """DuckDB oracle for :func:`hll_distinct` — same registers, same math."""
    g = ", ".join(group_cols)
    return f"""
WITH regs AS (
  SELECT {g}, bucket, MAX(rank) AS m_rank FROM (
    SELECT {g},
      CAST(floor(h / {float(HLL_REM_MOD)}) AS INT) AS bucket,
      CAST(CASE WHEN h % {HLL_REM_MOD} = 0 THEN {HLL_REM_BITS + 1}
           ELSE {HLL_REM_BITS + 1} - length(bin(h % {HLL_REM_MOD})) END AS INT) AS rank
    FROM (
      SELECT {g},
        ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM {table}
    )
  ) GROUP BY {g}, bucket
), per_group AS (
  SELECT {g},
    CAST(COUNT(*) AS BIGINT) AS hll_buckets_used,
    SUM(pow(0.5, m_rank)) AS hsum
  FROM regs GROUP BY {g}
)
SELECT {g}, hll_buckets_used,
  ROUND(CASE WHEN (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
                  / (hsum + ({HLL_M}.0 - hll_buckets_used)) <= 2.5 * {HLL_M}.0
              AND {HLL_M}.0 - hll_buckets_used > 0
         THEN {HLL_M}.0 * ln({HLL_M}.0 / ({HLL_M}.0 - hll_buckets_used))
         ELSE (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
                  / (hsum + ({HLL_M}.0 - hll_buckets_used)) END, 2) AS hll_estimate
FROM per_group
""".strip()


def histogram_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    quantiles: Sequence[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Per-group approximate quantiles via a fixed 256-bin histogram.

    Output: group cols + ``q`` + ``quantile_estimate`` (rounded to 4).
    Estimate = left bin edge + linear interpolation by the position of
    the target count inside the bin — deterministic integer cumulative
    arithmetic; the only doubles are the exact min/max and one division.
    """
    stats = df.groupBy(*group_cols).agg(
        F.min(value_col).alias("_lo"),
        F.max(value_col).alias("_hi"),
        F.count(value_col).cast("bigint").alias("_n"),
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(QUANTILE_BINS))
    binned = (
        df.join(F.broadcast(stats), list(group_cols))
        .withColumn(
            "bin",
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
                F.least(
                    F.floor((F.col(value_col) - F.col("_lo")) / width),
                    F.lit(QUANTILE_BINS - 1),
                )
            ).cast("int"),
        )
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    w = Window.partitionBy(*group_cols).orderBy("bin")
    cum = binned.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "prev_cum", F.col("cum") - F.col("cnt")
    )
    qdf = F.broadcast(
        cum.sparkSession.createDataFrame(
            [(float(q),) for q in quantiles], "q double"
        )
    )
    hit = (
        cum.join(F.broadcast(stats), list(group_cols))
        .crossJoin(qdf)
        .withColumn("target", F.ceil(F.col("q") * F.col("_n")).cast("bigint"))
        .filter((F.col("cum") >= F.col("target")) & (F.col("prev_cum") < F.col("target")))
    )
    est = F.col("_lo") + ((F.col("_hi") - F.col("_lo")) / F.lit(float(QUANTILE_BINS))) * (
        F.col("bin")
        + (F.col("target") - F.col("prev_cum")) / F.col("cnt")
    )
    return hit.select(
        *group_cols,
        "q",
        F.round(est, 4).alias("quantile_estimate"),
    )


def histogram_quantiles_sql(
    table: str,
    group_cols: Sequence[str],
    value_col: str,
    quantiles: Sequence[float] = (0.5, 0.95, 0.99),
) -> str:
    """DuckDB oracle for :func:`histogram_quantiles`."""
    g = ", ".join(group_cols)
    qvals = ", ".join(f"({float(q)})" for q in quantiles)
    b = QUANTILE_BINS
    return f"""
WITH stats AS (
  SELECT {g}, MIN({value_col}) AS lo, MAX({value_col}) AS hi,
         CAST(COUNT({value_col}) AS BIGINT) AS n
  FROM {table} GROUP BY {g}
), binned AS (
  SELECT t.{g}, CAST(CASE WHEN s.hi = s.lo THEN 0 ELSE
      least(floor(({value_col} - s.lo) / ((s.hi - s.lo) / {b}.0)), {b - 1})
    END AS INT) AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM {table} t JOIN stats s USING ({g})
  GROUP BY t.{g}, 2
), cum AS (
  SELECT {g}, bin, cnt,
    SUM(cnt) OVER (PARTITION BY {g} ORDER BY bin) AS cum,
    SUM(cnt) OVER (PARTITION BY {g} ORDER BY bin) - cnt AS prev_cum
  FROM binned
)
SELECT c.{g}, q.q,
  ROUND(s.lo + ((s.hi - s.lo) / {b}.0) *
        (c.bin + (CAST(ceil(q.q * s.n) AS BIGINT) - c.prev_cum) * 1.0 / c.cnt),
        4) AS quantile_estimate
FROM cum c
JOIN stats s USING ({g})
CROSS JOIN (VALUES {qvals}) AS q(q)
WHERE c.cum >= CAST(ceil(q.q * s.n) AS BIGINT)
  AND c.prev_cum < CAST(ceil(q.q * s.n) AS BIGINT)
""".strip()


# ----------------------------------------------------------------------
# Count-Min sketch (heavy hitters)
# ----------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 256  # counters per row


def _cms_cell(seed, value: "F.Column") -> "F.Column":
    """Counter index for (seed, value): cross-engine h32 of
    ``'<seed>|<value>'`` mod width."""
    return F.pmod(
        h32(F.concat(seed.cast("string"), F.lit("|"), value.cast("string"))),
        F.lit(CMS_W),
    ).cast("int")


def cms_cells(df: DataFrame, value_col: str) -> DataFrame:
    """The sketch itself: (seed, cell) → counter. A CMS is d×w integers
    TOTAL (here 4×256) regardless of input size: the explode emits
    (seed, cell) pairs that partial-aggregation collapses map-side, so
    the shuffle carries at most d·w rows per task — this is why CMS is
    the 100 TB answer for frequency estimation, like HLL for distincts.
    """
    seed = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("seed")
    pairs = df.select(F.col(value_col).alias("__v")).select(seed, "__v")
    return (
        pairs.select(
            "seed", _cms_cell(F.col("seed"), F.col("__v")).alias("cell")
        )
        .groupBy("seed", "cell")
        .agg(F.count("*").cast("bigint").alias("counter"))
    )


def cms_heavy_hitters(df: DataFrame, value_col: str, k: int = 20) -> DataFrame:
    """Top-``k`` values by CMS-estimated frequency, with the exact count
    and the (always ≥ 0) overestimate beside it — the error evidence.

    The probe side joins each distinct value's d cells against the
    sketch; the sketch is ≤ d·w rows, so that join is a broadcast.
    Deterministic order: estimate desc, then value asc.
    """
    cells = cms_cells(df, value_col)
    exact = df.groupBy(F.col(value_col).alias("value")).agg(
        F.count("*").cast("bigint").alias("exact_count")
    )
    seed = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("seed")
    probes = exact.select("value", "exact_count", seed).select(
        "value",
        "exact_count",
        "seed",
        _cms_cell(F.col("seed"), F.col("value")).alias("cell"),
    )
    est = (
        probes.join(F.broadcast(cells), ["seed", "cell"])
        .groupBy("value", "exact_count")
        .agg(F.min("counter").cast("bigint").alias("cms_estimate"))
    )
    return (
        est.select(
            "value",
            "cms_estimate",
            "exact_count",
            (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy(F.col("cms_estimate").desc(), F.col("value").asc())
        .limit(k)
    )


def hll_cumulative_distinct(
    df: DataFrame, date_col: str, value_col: str
) -> DataFrame:
    """Cumulative distinct-to-date via SKETCH MERGE — the production
    pattern for "unique users through day D" without re-scanning
    history: per-day register tables (bounded: ≤ 512 rows/day whatever
    the volume) merge by register max into every later day, then the
    standard estimate runs per day. The ≤-join and the merge touch only
    sketch rows, never data — history stays cold.

    Output: (date, hll_buckets_used, hll_estimate, exact_distinct) —
    the exact side (first-appearance counting, also one aggregate)
    ships alongside as the error evidence.
    """
    daily_regs = hll_registers(df, [date_col], value_col)
    days = df.select(date_col).distinct()
    merged = (
        daily_regs.withColumnRenamed(date_col, "__reg_day")
        .join(days, F.col("__reg_day") <= F.col(date_col))
        .groupBy(date_col, "bucket")
        .agg(F.max("m_rank").alias("m_rank"))
    )
    est = hll_estimate_from_registers(merged, [date_col])

    firsts = df.groupBy(value_col).agg(F.min(date_col).alias("__first_day"))
    exact = (
        firsts.join(days, F.col("__first_day") <= F.col(date_col))
        .groupBy(date_col)
        .agg(F.count("*").cast("bigint").alias("exact_distinct"))
    )
    return est.join(exact, date_col).select(
        date_col, "hll_buckets_used", "hll_estimate", "exact_distinct"
    )


def cms_probe(cells: DataFrame, items: DataFrame, value_col: str) -> DataFrame:
    """Production-path CMS lookup: estimate frequencies for a SMALL
    item list against a prebuilt sketch — no exact counts, no groupBy
    over the corpus. ``cells`` is :func:`cms_cells` output (≤ d·w rows,
    broadcast); ``items`` carries ``value_col``. This is the spelling a
    100 TB deployment uses (the heavy-hitters QA query keeps exact
    counts beside the estimates as error evidence — affordable only
    because its exact side is itself one aggregate)."""
    seed = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("seed")
    probes = items.select(F.col(value_col).alias("value")).select(
        "value", seed
    ).select(
        "value", "seed", _cms_cell(F.col("seed"), F.col("value")).alias("cell")
    )
    return (
        probes.join(F.broadcast(cells), ["seed", "cell"], "left")
        .groupBy("value")
        .agg(
            F.min(F.coalesce(F.col("counter"), F.lit(0)))
            .cast("bigint")
            .alias("cms_estimate")
        )
    )
