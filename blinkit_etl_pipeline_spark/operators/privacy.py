"""Privacy guards for training-data release: k-anonymity over
quasi-identifiers.

Complements the PII scrubbing in ``functions/text.py`` (which masks
direct identifiers): quasi-identifier COMBINATIONS can re-identify even
with direct identifiers removed, and the standard gate is k-anonymity —
every released combination must cover at least ``k`` individuals.

Scale shape: the profile is one partial-aggregated groupBy over the
quasi columns (shuffle carries (combo, partial count), bounded by
distinct combos, not rows). Enforcement re-joins the combo counts —
broadcast when the combo table is small (the usual case: quasi columns
are low-cardinality by definition), so the fact side never shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_profile(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Per quasi-identifier combination: group size and whether it
    meets the ``k`` threshold. Deterministic order is left to the
    caller (the combos are a set)."""
    quasi_cols = list(quasi_cols)
    return df.groupBy(*quasi_cols).agg(
        F.count("*").cast("bigint").alias("group_size"),
    ).select(
        *quasi_cols,
        "group_size",
        (F.col("group_size") >= k).alias("k_anonymous"),
    )


def suppress_small_groups(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Drop every row whose quasi-identifier combination covers fewer
    than ``k`` rows (suppression — the simplest k-anonymity
    enforcement). The unsafe-combo set is broadcast; the input is
    filtered map-side via a broadcast anti join."""
    quasi_cols = list(quasi_cols)
    unsafe = (
        k_anonymity_profile(df, quasi_cols, k)
        .filter(~F.col("k_anonymous"))
        .select(*quasi_cols)
    )
    return df.join(F.broadcast(unsafe), quasi_cols, "left_anti")
