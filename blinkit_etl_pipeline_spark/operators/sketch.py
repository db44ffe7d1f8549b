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

from ..functions.text import h32, h48

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
    # drop NULL values before binning (same rationale as the multi-
    # measure twin: a NULL bin inflates cumulative counts, and the
    # two engines order NULL bins differently)
    binned = (
        df.filter(F.col(value_col).isNotNull())
        .join(F.broadcast(stats), list(group_cols))
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


def histogram_quantiles_multi(
    df: DataFrame,
    group_cols: Sequence[str],
    measures: Sequence[str],
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """N-measure histogram quantiles in ONE pass over ``df`` — the
    multi-measure twin of :func:`histogram_quantiles` for consumers
    that need cutpoints on several columns of the SAME frame (RFM's
    recency/frequency/monetary, profiling dashboards): calling the
    single-measure sketch per column re-scans and re-shuffles the
    source once per measure (the r7 ``ns_customer_rfm`` plan paid 18
    exchanges that way); here the measures unpivot to
    ``(group, measure, value)`` rows *inside the scan*, so the source
    is read twice total (stats, then binning) regardless of N, and
    every aggregate is partial map-side.

    Values are cast to double before bucketing (the unpivot array
    needs one type); for integral measures below 2^53 this is exact,
    so estimates match the per-measure sketch bit-for-bit.

    Output: group cols + ``measure`` + ``q`` + ``quantile_estimate``
    (rounded 4), one row per (group, measure, quantile).
    """
    mv = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(m).alias("measure"),
                    F.col(m).cast("double").alias("v"),
                )
                for m in measures
            ]
        )
    ).alias("mv")
    # NULL measures carry no quantile information and would otherwise
    # form a NULL bin that inflates every real bin's cumulative count
    # (Spark windows sort NULLS FIRST, DuckDB NULLS LAST — a silent
    # cross-engine divergence; r8 review finding)
    unp = (
        df.select(*group_cols, mv)
        .select(*group_cols, "mv.measure", "mv.v")
        .filter(F.col("v").isNotNull())
    )
    keys = [*group_cols, "measure"]
    stats = unp.groupBy(*keys).agg(
        F.min("v").alias("_lo"),
        F.max("v").alias("_hi"),
        F.count("v").cast("bigint").alias("_n"),
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(QUANTILE_BINS))
    binned = (
        unp.join(F.broadcast(stats), keys)
        .withColumn(
            "bin",
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor((F.col("v") - F.col("_lo")) / width),
                    F.lit(QUANTILE_BINS - 1),
                )
            )
            .cast("int"),
        )
        .groupBy(*keys, "bin")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    w = Window.partitionBy(*keys).orderBy("bin")
    cum = binned.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "prev_cum", F.col("cum") - F.col("cnt")
    )
    qdf = F.broadcast(
        cum.sparkSession.createDataFrame(
            [(float(q),) for q in quantiles], "q double"
        )
    )
    hit = (
        cum.join(F.broadcast(stats), keys)
        .crossJoin(qdf)
        .withColumn(
            "target", F.ceil(F.col("q") * F.col("_n")).cast("bigint")
        )
        .filter(
            (F.col("cum") >= F.col("target"))
            & (F.col("prev_cum") < F.col("target"))
        )
    )
    est = F.col("_lo") + (
        (F.col("_hi") - F.col("_lo")) / F.lit(float(QUANTILE_BINS))
    ) * (
        F.col("bin")
        + (F.col("target") - F.col("prev_cum")) / F.col("cnt")
    )
    return hit.select(
        *keys,
        "q",
        F.round(est, 4).alias("quantile_estimate"),
    )


def histogram_quantiles_multi_sql(
    table: str,
    group_cols: Sequence[str],
    measures: Sequence[str],
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
) -> str:
    """DuckDB oracle for :func:`histogram_quantiles_multi` — the same
    unpivot (UNION ALL of casted measures) through the single-measure
    histogram math."""
    g = ", ".join(group_cols)
    qvals = ", ".join(f"({float(q)})" for q in quantiles)
    b = QUANTILE_BINS
    unp = " UNION ALL ".join(
        f"SELECT {g}, '{m}' AS measure, CAST({m} AS DOUBLE) AS v"
        f" FROM {table} WHERE {m} IS NOT NULL"
        for m in measures
    )
    return f"""
WITH unp AS ({unp}),
stats AS (
  SELECT {g}, measure, MIN(v) AS lo, MAX(v) AS hi,
         CAST(COUNT(v) AS BIGINT) AS n
  FROM unp GROUP BY {g}, measure
), binned AS (
  SELECT t.{g}, t.measure, CAST(CASE WHEN s.hi = s.lo THEN 0 ELSE
      least(floor((t.v - s.lo) / ((s.hi - s.lo) / {b}.0)), {b - 1})
    END AS INT) AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM unp t JOIN stats s USING ({g}, measure)
  GROUP BY ALL
), cum AS (
  SELECT {g}, measure, bin, cnt,
    SUM(cnt) OVER (PARTITION BY {g}, measure ORDER BY bin) AS cum,
    SUM(cnt) OVER (PARTITION BY {g}, measure ORDER BY bin) - cnt
      AS prev_cum
  FROM binned
)
SELECT c.{g}, c.measure, q.q,
  ROUND(s.lo + ((s.hi - s.lo) / {b}.0) *
        (c.bin + (CAST(ceil(q.q * s.n) AS BIGINT) - c.prev_cum) * 1.0
         / c.cnt),
        4) AS quantile_estimate
FROM cum c
JOIN stats s USING ({g}, measure)
CROSS JOIN (VALUES {qvals}) AS q(q)
WHERE c.cum >= CAST(ceil(q.q * s.n) AS BIGINT)
  AND c.prev_cum < CAST(ceil(q.q * s.n) AS BIGINT)
""".strip()


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
  WHERE t.{value_col} IS NOT NULL
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


def cms_cells(
    df: DataFrame, value_col: str, sign_col: str | None = None
) -> DataFrame:
    """The sketch itself: (seed, cell) → counter. A CMS is d×w integers
    TOTAL (here 4×256) regardless of input size: the explode emits
    (seed, cell) pairs that partial-aggregation collapses map-side, so
    the shuffle carries at most d·w rows per task — this is why CMS is
    the 100 TB answer for frequency estimation, like HLL for distincts.

    ``sign_col`` (+1/−1 per row) turns the fold into a SIGNED counter
    sum: counters are linear in the input multiset, so exact deletions
    retract cleanly — the property the incremental CMS store
    (``incremental.ingest_cms_cells``) builds on, and one HLL's max
    registers cannot offer.
    """
    seed = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("seed")
    sign = (
        F.col(sign_col).cast("long")
        if sign_col is not None
        else F.lit(1).cast("long")
    )
    pairs = df.select(
        F.col(value_col).alias("__v"), sign.alias("__s")
    ).select(seed, "__v", "__s")
    return (
        pairs.select(
            "seed",
            _cms_cell(F.col("seed"), F.col("__v")).alias("cell"),
            "__s",
        )
        .groupBy("seed", "cell")
        .agg(F.sum("__s").cast("bigint").alias("counter"))
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


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch: MERGEABLE quantiles (the operation the
# fixed-bin histogram cannot answer without re-scanning history)
# ---------------------------------------------------------------------------

#: sample size — empirical-quantile error ~ sqrt(q(1-q)/k) w.h.p.
#: (k=512 → ±2.2% rank error at the median)
BKQ_K = 512


def bkq_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    value_col: str,
    k: int = BKQ_K,
    *,
    hash_cols: Sequence[str] | None = None,
    assert_unique_ids: bool = False,
) -> DataFrame:
    """Per-group bottom-k quantile sketch: the ``k`` rows whose 48-bit
    row-identity hashes are smallest, as ``(group..., h, v)``.

    Hashing the ROW ID (not the value) makes the kept rows a uniform
    random sample of the group, so the sample's empirical quantiles
    estimate the group's — and, unlike KLL / t-digest (whose
    compactions are order-dependent, so two engines — or two merge
    orders — produce different summaries), bottom-k is a pure
    semilattice: ``sketch(A ∪ B) = bottomk(sketch(A) ∪ sketch(B))``
    EXACTLY, for any split of the rows. That losslessness is what lets
    per-day/per-partition sketches compose without re-scanning history
    (:func:`bkq_cumulative_quantiles`) while staying value-checkable
    by the DuckDB oracle (the deterministic-mergeable trade: a KLL
    sketch of the same k has tighter worst-case rank error, but no
    deterministic lossless merge).

    Scale shape: the ``row_number() <= k`` filter compiles to
    ``WindowGroupLimit`` (map-side partial top-k, the
    :func:`kmv_sketch` property) — the shuffle carries O(k · groups)
    rows regardless of corpus size. NULL values are excluded (a NULL
    carries no quantile information; the sample stays uniform over
    non-NULL rows). Ordering is total (``h`` then ``v``) so hash
    collisions cannot make the kept set nondeterministic.

    ``id_col`` must identify rows uniquely within the sketched frame —
    duplicated ids share ONE hash, so their rows enter or miss the
    bottom-k as a correlated BLOCK (cluster sampling on a single
    draw): one low hash floods the sample with every copy, one high
    hash drops them all, either way the sample is no longer uniform
    over rows. ``assert_unique_ids=True`` enforces this loudly: one extra
    count-vs-count-distinct probe over the frame (a corpus scan — the
    reason it is opt-in) raises :class:`ValueError` instead of
    silently skewing quantiles. ``hash_cols`` overrides the identity
    the row hash is taken over (default ``[id_col]``) — the
    cumulative/store paths pass ``(date, id)`` so per-day draws stay
    independent when the same entity id legitimately recurs on later
    days (an id-only hash would keep the SAME low-hash entities every
    day, clustering the sample by entity instead of uniform over rows).
    """
    cols = list(hash_cols) if hash_cols is not None else [id_col]
    if len(cols) == 1:
        ident = F.col(cols[0]).cast("string")
    else:
        # chr(31) joint — F.concat (not concat_ws) so a NULL component
        # NULLs the hash instead of silently collapsing identities
        parts: list = []
        for i, c in enumerate(cols):
            if i:
                parts.append(F.lit("\x1f"))
            parts.append(F.col(c).cast("string"))
        ident = F.concat(*parts)
    base = df.select(
        *group_cols,
        h48(ident).alias("h"),
        F.col(value_col).cast("double").alias("v"),
    ).filter(F.col("v").isNotNull())
    if assert_unique_ids:
        # distinct over the raw identity string, not h, so a 48-bit
        # hash collision can never false-positive the guard
        probe = (
            df.filter(F.col(value_col).cast("double").isNotNull())
            .agg(
                F.count("*").alias("n"),
                F.count_distinct(ident).alias("nd"),
            )
            .collect()[0]
        )
        if probe["n"] != probe["nd"]:
            raise ValueError(
                f"bkq_sketch: hash identity {cols} is not unique over "
                f"the sketched rows ({probe['n']} rows, {probe['nd']} "
                "distinct identities) — duplicated ids share one hash "
                "and enter the bottom-k as a correlated block, biasing "
                "the quantile sample"
            )
    w = Window.partitionBy(*group_cols).orderBy("h", "v")
    return (
        base.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .drop("r")
    )


def bkq_merge(
    sketches: DataFrame, group_cols: Sequence[str], k: int = BKQ_K
) -> DataFrame:
    """Fold a union of bottom-k sketches (over DISJOINT row sets —
    days, partitions, sources) back to one sketch per group: keep the
    k smallest ``h`` again. Lossless: the result equals the sketch of
    the concatenated raw data (bottom-k of a union is the bottom-k of
    the sides' bottom-ks), pinned by the merge property test."""
    w = Window.partitionBy(*group_cols).orderBy("h", "v")
    return (
        sketches.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .drop("r")
    )


def bkq_quantiles(
    sk: DataFrame,
    group_cols: Sequence[str],
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Empirical quantiles of a bottom-k sketch: per group, the value
    at rank ``ceil(q·n)`` of the ≤ k sampled values (exact-integer
    rank arithmetic; groups smaller than k are sampled exactly, so
    their estimate IS the true quantile_disc). Output: group cols +
    ``q`` + ``n_sample`` + ``quantile_estimate`` (ROUND 6)."""
    wv = Window.partitionBy(*group_cols).orderBy("v", "h")
    ranked = sk.withColumn("vr", F.row_number().over(wv))
    cnt = sk.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n_sample")
    )
    qdf = F.broadcast(
        sk.sparkSession.createDataFrame(
            [(float(q),) for q in quantiles], "q double"
        )
    )
    return (
        ranked.join(F.broadcast(cnt), list(group_cols))
        .crossJoin(qdf)
        .filter(
            F.col("vr")
            == F.ceil(F.col("q") * F.col("n_sample")).cast("bigint")
        )
        .select(
            *group_cols,
            "q",
            "n_sample",
            F.round(F.col("v"), 6).alias("quantile_estimate"),
        )
    )


def bkq_prefix_merge(
    daily: DataFrame,
    date_col: str,
    days: DataFrame,
    k: int = BKQ_K,
    *,
    join_threshold: int = 128,
) -> DataFrame:
    """Prefix-merged sketches: for every day D in ``days``, the
    bottom-k merge of all ``daily`` sketch rows with day ≤ D — as a
    **log-depth Hillis–Steele scan** over day indices instead of the
    naive (day, later-day) ≤-join. The ≤-join materializes O(k·D²)
    sketch rows (≈1.7 B at a decade of daily partitions, k=512); the
    scan shuffles O(k·D) rows per round for ⌈log₂ D⌉ rounds —
    O(k·D·log D) total, each round one WindowGroupLimit-shaped merge.

    Correctness invariant: entering round j (step = 2^j), ``cur(i)``
    holds the merged sketch of days (i−2^j, i] (truncated at 0); the
    round unions in ``cur(i−2^j)`` covering (i−2^{j+1}, i−2^j] —
    always DISJOINT adjacent blocks, so the multiset union never
    double-counts a row and the lossless bottom-k semilattice merge
    applies exactly. After ⌈log₂ D⌉ rounds every prefix is complete.

    The day→index map is a D-row driver collect (model-sized — days of
    history, the cutpoint-row convention), broadcast back; no global
    window. ``days`` supplies the output day set — a day with no
    sketch rows of its own (all-NULL values) still gets the prefix of
    earlier days, matching the ≤-join semantics. Each round
    localCheckpoints (the iterative-operator convention) so the final
    job is one bounded stage, not ⌈log₂ D⌉ chained window lineages.
    """
    spark = daily.sparkSession
    out_days = [r[0] for r in days.distinct().orderBy(date_col).collect()]
    if len(out_days) <= join_threshold:
        # HYBRID (r9 bench respot finding: the scan REGRESSED the
        # ~30-day bench query 0.95→3.1 s): at small day counts the
        # O(k·D²) ≤-join is a few hundred thousand rows in one stage —
        # cheaper than the scan's ⌈log₄D⌉ stage barriers plus a second
        # driver collect. The scan takes over where the join explodes
        # (365 days: 5.3 s vs 31.3 s; 3650: 8.8 s vs DNF).
        return bkq_merge(
            daily.withColumnRenamed(date_col, "__sk_day").join(
                days.distinct(), F.col("__sk_day") <= F.col(date_col)
            ).drop("__sk_day"),
            [date_col],
            k,
        ).select(date_col, "h", "v")
    # index domain = requested days ∪ the sketch's own days, so a
    # sketch row whose day is absent from `days` still folds into
    # every LATER requested prefix (≤-join semantics; an inner join on
    # the requested set alone silently dropped such history — r9
    # review). Output is restricted to the requested set at the end.
    sk_days = [r[0] for r in daily.select(date_col).distinct().collect()]
    day_vals = sorted(set(out_days) | set(sk_days))
    d_count = len(day_vals)
    if d_count == 0:
        return daily.select(date_col, "h", "v")
    idx = F.broadcast(
        spark.createDataFrame(
            [(v, i + 1) for i, v in enumerate(day_vals)],
            days.select(F.col(date_col)).withColumn(
                "__di", F.lit(1)
            ).schema,
        )
    )
    out_set = set(out_days)
    idx_out = F.broadcast(
        spark.createDataFrame(
            [
                (v, i + 1)
                for i, v in enumerate(day_vals)
                if v in out_set
            ],
            days.select(F.col(date_col)).withColumn(
                "__di", F.lit(1)
            ).schema,
        )
    )
    cur = daily.join(idx, date_col).select(
        F.col("__di"), F.col("h"), F.col("v")
    )
    # arity-4 scan: each round unions shifts at step, 2·step, 3·step —
    # coverage (i−s, i] → (i−4s, i], still disjoint adjacent blocks, so
    # the lossless-merge invariant is untouched while the round count
    # halves vs binary (rounds, not rows, dominate the wall: each
    # round is an AQE stage-job barrier over ≤ k·D tiny rows)
    step = 1
    while step < d_count:
        branches = [cur]
        for m in (1, 2, 3):
            if m * step < d_count:
                branches.append(
                    cur.withColumn(
                        "__di", F.col("__di") + F.lit(m * step)
                    ).filter(F.col("__di") <= F.lit(d_count))
                )
        u = branches[0]
        for b in branches[1:]:
            u = u.unionByName(b)
        cur = bkq_merge(u, ["__di"], k).localCheckpoint(eager=False)
        step *= 4
    return cur.join(idx_out, "__di").select(date_col, "h", "v")


def bkq_cumulative_quantiles(
    df: DataFrame,
    date_col: str,
    id_col: str,
    value_col: str,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    k: int = BKQ_K,
) -> DataFrame:
    """Quantiles-to-date via SKETCH MERGE — the
    :func:`hll_cumulative_distinct` pattern for order statistics:
    per-day bottom-k sketches (bounded: ≤ k rows/day whatever the
    volume) fold into every later day with the log-depth
    :func:`bkq_prefix_merge` scan, then :func:`bkq_quantiles` runs per
    day. History stays cold — day D's update touches O(k·log D) sketch
    rows beyond its own, never the raw data.

    Row identity hashes **(day, id)** — not id alone — so an entity id
    recurring on later days draws an independent hash each day; an
    id-only hash would keep the SAME low-hash entities' rows every
    day, clustering the cumulative sample by entity and biasing the
    quantile estimates whenever values are entity-correlated. (The
    per-group :func:`bkq_sketch` default is unchanged: there the
    caller's id contract is uniqueness within the frame.)
    """
    daily = bkq_sketch(
        df, [date_col], id_col, value_col, k, hash_cols=(date_col, id_col)
    )
    days = df.select(date_col).distinct()
    merged = bkq_prefix_merge(daily, date_col, days, k)
    return bkq_quantiles(merged, [date_col], quantiles)


def bkq_quantiles_sql(
    table: str,
    group_cols: Sequence[str],
    id_col: str,
    value_col: str,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    k: int = BKQ_K,
) -> str:
    """DuckDB oracle for ``bkq_quantiles(bkq_sketch(...))`` — same
    hash, same total order, same rank arithmetic."""
    g = ", ".join(group_cols)
    qvals = ", ".join(f"({float(q)})" for q in quantiles)
    return f"""
WITH base AS (
  SELECT {g},
    ('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 12))::BIGINT AS h,
    CAST({value_col} AS DOUBLE) AS v
  FROM {table} WHERE {value_col} IS NOT NULL
), sk AS (
  SELECT {g}, h, v FROM (
    SELECT {g}, h, v,
      row_number() OVER (PARTITION BY {g} ORDER BY h, v) AS r
    FROM base) WHERE r <= {k}
), ranked AS (
  SELECT {g}, h, v,
    row_number() OVER (PARTITION BY {g} ORDER BY v, h) AS vr,
    CAST(COUNT(*) OVER (PARTITION BY {g}) AS BIGINT) AS n_sample
  FROM sk
)
SELECT {g}, q.q, n_sample, ROUND(v, 6) AS quantile_estimate
FROM ranked CROSS JOIN (VALUES {qvals}) AS q(q)
WHERE vr = CAST(ceil(q.q * n_sample) AS BIGINT)
""".strip()


def bkq_cumulative_quantiles_sql(
    table: str,
    date_col: str,
    id_col: str,
    value_col: str,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    k: int = BKQ_K,
) -> str:
    """DuckDB oracle for :func:`bkq_cumulative_quantiles` — mirrors
    the (day, id) hash identity (chr(31)-joined) and, being the
    correctness SPEC only, keeps the naive ≤-join the Spark side
    replaced with the log-depth prefix scan (same result by the
    lossless-merge property)."""
    qvals = ", ".join(f"({float(q)})" for q in quantiles)
    return f"""
WITH base AS (
  SELECT {date_col},
    ('0x' || substr(md5(CAST({date_col} AS VARCHAR) || chr(31)
      || CAST({id_col} AS VARCHAR)), 1, 12))::BIGINT AS h,
    CAST({value_col} AS DOUBLE) AS v
  FROM {table} WHERE {value_col} IS NOT NULL
), daily AS (
  SELECT {date_col}, h, v FROM (
    SELECT {date_col}, h, v,
      row_number() OVER (PARTITION BY {date_col} ORDER BY h, v) AS r
    FROM base) WHERE r <= {k}
), days AS (SELECT DISTINCT {date_col} FROM {table}),
merged AS (
  SELECT {date_col}, h, v FROM (
    SELECT d.{date_col}, s.h, s.v,
      row_number() OVER (PARTITION BY d.{date_col} ORDER BY s.h, s.v) AS r
    FROM daily s JOIN days d ON s.{date_col} <= d.{date_col}) t({date_col}, h, v, r)
  WHERE r <= {k}
), ranked AS (
  SELECT {date_col}, v,
    row_number() OVER (PARTITION BY {date_col} ORDER BY v, h) AS vr,
    CAST(COUNT(*) OVER (PARTITION BY {date_col}) AS BIGINT) AS n_sample
  FROM merged
)
SELECT {date_col}, q.q, n_sample, ROUND(v, 6) AS quantile_estimate
FROM ranked CROSS JOIN (VALUES {qvals}) AS q(q)
WHERE vr = CAST(ceil(q.q * n_sample) AS BIGINT)
""".strip()


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) theta sketches: distinct counts AND set
# intersections — the operation HLL registers cannot answer
# ---------------------------------------------------------------------------

#: sketch size — ~6.5% relative error on distinct estimates (1/sqrt(k-1))
KMV_K = 256

#: hash-space size for the 48-bit md5-prefix hash (12 hex chars)
KMV_SPACE = 1 << 48


def kmv_sketch(
    df: DataFrame, group_col: str, value_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest distinct 48-bit hashes
    of ``value_col``, as rows ``(g, h, r)`` with ``r`` the ascending
    rank. The ``rank <= k`` filter over the window compiles to
    ``WindowGroupLimit`` (Spark 3.5+): each map task keeps only its
    local top-k, so the shuffle carries O(k · groups) rows no matter
    the corpus size — the sketch property, visible in the plan."""
    dv = df.select(
        F.col(group_col).alias("g"),
        h48(F.col(value_col).cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("g").orderBy("h")
    return dv.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)


def kmv_overlap(
    df: DataFrame, group_col: str, value_col: str, k: int = KMV_K
) -> DataFrame:
    """Pairwise distinct-set overlap between every two groups, from KMV
    sketches — the theta-sketch intersection (audience overlap, cross-
    source contamination mass) that inclusion-exclusion over HLL cannot
    give reliably.

    Estimators (all exact integer arithmetic, ``div`` truncation —
    DuckDB ``//`` agrees on non-negative operands):

    - ``est(g)   = n_g``                          if the sketch is exact
      (fewer than k distinct values), else ``(k-1)·2^48 div max_h``.
    - union sketch of a pair = k smallest of the two sketches' hash
      union (valid because each side holds ALL its hashes ≤ its own
      theta, and the union's theta is ≤ either side's).
    - ``est_inter = rho`` when the union sketch is exact, else
      ``rho · (est_union div k)`` where ``rho`` counts kept union
      hashes present in BOTH sides (the grouped product is computed
      divided-first to stay in int64 for any theta).

    ``exact_inter`` (one distinct + one self equi-join on the value)
    rides along as the error gauge, the pattern of the HLL/CMS queries.
    Returns ``(type_a, type_b, est_a, est_b, est_union, est_inter,
    exact_inter)`` for every ``type_a < type_b``.

    Scale shape: sketches are O(k·groups) rows after WindowGroupLimit;
    every pair computation is over ≤ 2k rows per pair. The exact gauge
    is the only corpus-sized leg (equi-join on value), and it is
    severable — a production run drops it.
    """
    est_expr = (
        f"CASE WHEN n < {k} THEN n "
        f"ELSE ({k - 1} * {KMV_SPACE}) div mx END"
    )
    sk = kmv_sketch(df, group_col, value_col, k)
    per = sk.groupBy("g").agg(
        F.count("*").alias("n"), F.max("h").alias("mx")
    )
    est_g = per.select("g", F.expr(est_expr).cast("long").alias("est"))
    pairs = (
        per.select(F.col("g").alias("ga"))
        .crossJoin(F.broadcast(per.select(F.col("g").alias("gb"))))
        .filter(F.col("ga") < F.col("gb"))
    )
    a = sk.select(F.col("g").alias("ga"), "h")
    b = sk.select(F.col("g").alias("gb"), "h")
    u = (
        pairs.join(a, "ga")
        .select("ga", "gb", "h", F.lit(1).alias("fa"), F.lit(0).alias("fb"))
        .unionByName(
            pairs.join(b, "gb").select(
                "ga", "gb", "h", F.lit(0).alias("fa"), F.lit(1).alias("fb")
            )
        )
        .groupBy("ga", "gb", "h")
        .agg(F.max("fa").alias("fa"), F.max("fb").alias("fb"))
    )
    wu = Window.partitionBy("ga", "gb").orderBy("h")
    kept = u.withColumn("r", F.row_number().over(wu)).filter(
        F.col("r") <= k
    )
    stats = kept.groupBy("ga", "gb").agg(
        F.count("*").alias("n"),
        F.max("h").alias("mx"),
        F.sum(
            F.when((F.col("fa") == 1) & (F.col("fb") == 1), 1).otherwise(0)
        ).alias("rho"),
    )
    pair_est = stats.select(
        "ga",
        "gb",
        F.expr(est_expr).cast("long").alias("est_union"),
        F.expr(
            f"CASE WHEN n < {k} THEN rho "
            f"ELSE rho * ((({k - 1} * {KMV_SPACE}) div mx) div {k}) END"
        )
        .cast("long")
        .alias("est_inter"),
    )
    dv = df.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).distinct()
    exact = (
        dv.select(F.col("g").alias("ga"), "v")
        .join(dv.select(F.col("g").alias("gb"), "v"), "v")
        .filter(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count("*").cast("long").alias("exact_inter"))
    )
    return (
        pair_est.join(
            est_g.select(
                F.col("g").alias("ga"), F.col("est").alias("est_a")
            ),
            "ga",
        )
        .join(
            est_g.select(
                F.col("g").alias("gb"), F.col("est").alias("est_b")
            ),
            "gb",
        )
        .join(exact, ["ga", "gb"], "left")
        .select(
            F.col("ga").alias("type_a"),
            F.col("gb").alias("type_b"),
            "est_a",
            "est_b",
            "est_union",
            "est_inter",
            F.coalesce("exact_inter", F.lit(0)).cast("long").alias(
                "exact_inter"
            ),
        )
    )
