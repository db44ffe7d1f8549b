"""Declarative data-quality verification — the Deequ/Great-
Expectations surface, Spark-first.

The reference pipeline validates nothing (its Glue jobs assume clean
inputs — SURVEY.md §4); at 100 TB, unchecked assumptions are how a
bad crawl day silently poisons a curated table. This module runs a
CONSTRAINT SUITE in as few passes as the constraint mix allows:

- row-local constraints (completeness, value ranges, accepted sets,
  regex shape) fold into ONE aggregate over the table — conditional
  counts, map-side partials, zero extra scans per constraint;
- ``unique`` needs its own key-grouped aggregate (the shuffle is the
  price of the question);
- ``references`` (foreign-key inclusion) is one left-anti join
  against the (usually broadcastable) referenced key set.

Each constraint yields ``(constraint, column, violations, total,
ratio, passed)`` — counts exact int64, ratio ROUND(·,6) — so the
verdict frame is oracle-checkable and diffable between runs (the
Deequ "metrics repository" idea collapses to a tiny DataFrame a
snapshot store can version).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One declarative expectation. ``kind`` ∈ {complete, in_range,
    in_set, matches, unique, references, quantile}."""

    kind: str
    column: str
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    pattern: str | None = None
    ref: DataFrame | None = field(default=None, compare=False)
    ref_col: str | None = None
    q: float | None = None


def complete(column: str) -> Constraint:
    return Constraint("complete", column)


def in_range(column: str, lo: float, hi: float) -> Constraint:
    return Constraint("in_range", column, lo=lo, hi=hi)


def in_set(column: str, *values) -> Constraint:
    return Constraint("in_set", column, values=tuple(values))


def matches(column: str, pattern: str) -> Constraint:
    return Constraint("matches", column, pattern=pattern)


def unique(column: str) -> Constraint:
    return Constraint("unique", column)


def references(column: str, ref: DataFrame, ref_col: str) -> Constraint:
    return Constraint("references", column, ref=ref, ref_col=ref_col)


def has_quantile(column: str, q: float, lo: float, hi: float) -> Constraint:
    """Deequ-style distribution expectation: the ``q``-quantile of
    ``column`` (histogram-sketch estimate — the suite's scale answer,
    never a global sort) must land in ``[lo, hi]``. A drifted data
    day moves quantiles long before it breaks row-local ranges."""
    return Constraint("quantile", column, lo=lo, hi=hi, q=q)


def _violation(c: Constraint) -> Column:
    col = F.col(c.column)
    if c.kind == "complete":
        return col.isNull()
    if c.kind == "in_range":
        return col.isNull() | (col < F.lit(c.lo)) | (col > F.lit(c.hi))
    if c.kind == "in_set":
        return col.isNull() | ~col.isin(list(c.values))
    if c.kind == "matches":
        return col.isNull() | ~col.rlike(c.pattern)
    raise ValueError(f"not a row-local constraint: {c.kind}")


def verify(spark: SparkSession, df: DataFrame, constraints) -> DataFrame:
    """Run the suite; one verdict row per constraint.

    Pass shape: all row-local constraints share a single aggregate
    over ``df``; each ``unique`` adds one distinct-key aggregate; each
    ``references`` adds one anti-join count; ALL ``quantile``
    constraints together add the two histogram-sketch scans of
    ``profile.numeric_quantiles`` (the multi-measure one-pass sketch —
    the tenth quantile check costs the same scans as the first).
    Results are unioned as one-row frames (constraint-count-sized —
    never data-sized). A quantile verdict row reports
    ``violations``/``total`` as 1/1 or 0/1 (the constraint judges one
    statistic, not rows); its constraint label carries the q
    (``quantile_0.5``).
    """
    constraints = list(constraints)
    frames: list[DataFrame] = []
    local = [
        c
        for c in constraints
        if c.kind in ("complete", "in_range", "in_set", "matches")
    ]
    if local:
        aggs = [F.count("*").cast("long").alias("__total")]
        for i, c in enumerate(local):
            aggs.append(
                F.sum(F.when(_violation(c), 1).otherwise(0))
                .cast("long")
                .alias(f"__v{i}")
            )
        row = df.agg(*aggs)
        # unpivot the ONE aggregate row with stack() — selecting each
        # constraint as its own frame would duplicate the whole-table
        # scan once per constraint (caught by the plan audit: 10 scans
        # for 8 constraints before this)
        parts = []
        for i, c in enumerate(local):
            parts += [f"'{c.kind}'", f"'{c.column}'", f"__v{i}"]
        frames.append(
            row.selectExpr(
                f"stack({len(local)}, {', '.join(parts)})"
                " AS (constraint, column, violations)",
                "__total AS total",
            )
        )
    for c in constraints:
        if c.kind == "unique":
            dup = (
                df.groupBy(c.column)
                .agg(F.count("*").cast("long").alias("__n"))
                .agg(
                    F.coalesce(
                        F.sum(
                            F.when(
                                F.col("__n") > 1, F.col("__n")
                            ).otherwise(0)
                        ),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias("violations"),
                    F.sum("__n").cast("long").alias("total"),
                )
            )
            frames.append(
                dup.select(
                    F.lit("unique").alias("constraint"),
                    F.lit(c.column).alias("column"),
                    "violations",
                    "total",
                )
            )
        elif c.kind == "references":
            keys = c.ref.select(
                F.col(c.ref_col).alias(c.column)
            ).distinct()
            orphans = df.join(F.broadcast(keys), c.column, "left_anti")
            both = df.agg(
                F.count("*").cast("long").alias("total")
            ).crossJoin(
                orphans.agg(
                    F.count("*").cast("long").alias("violations")
                )
            )
            frames.append(
                both.select(
                    F.lit("references").alias("constraint"),
                    F.lit(c.column).alias("column"),
                    "violations",
                    "total",
                )
            )
    qc = [c for c in constraints if c.kind == "quantile"]
    if qc:
        from .profile import numeric_quantiles

        cols = sorted({c.column for c in qc})
        qs = sorted({float(c.q) for c in qc})
        prof = numeric_quantiles(df, cols, qs)
        spec = spark.createDataFrame(
            [
                (
                    f"quantile_{c.q}",
                    c.column,
                    float(c.q),
                    float(c.lo),
                    float(c.hi),
                )
                for c in qc
            ],
            "constraint string, column string, q double, lo double,"
            " hi double",
        )
        est = F.col("quantile_estimate")
        frames.append(
            spec.join(prof, ["column", "q"], "left").select(
                "constraint",
                "column",
                F.when(
                    est.isNull() | (est < F.col("lo")) | (est > F.col("hi")),
                    1,
                )
                .otherwise(0)
                .cast("long")
                .alias("violations"),
                F.lit(1).cast("long").alias("total"),
            )
        )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out.select(
        "constraint",
        "column",
        "violations",
        "total",
        F.round(F.col("violations") / F.col("total"), 6).alias("ratio"),
        (F.col("violations") == 0).alias("passed"),
    )
