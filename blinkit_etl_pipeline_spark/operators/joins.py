"""Join operators (SURVEY.md §2.4 J1-J6).

Scale posture: dimension sides (products, customers, the 5-row rating
dim) get explicit ``F.broadcast`` hints — at 100 TB the fact side never
shuffles for these joins. The full-outer reconciliation join cannot
broadcast (illegal for full-outer); it shuffles on the compound key and
relies on AQE skew-splitting (session.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fact_join(fact: DataFrame, *dims_on: tuple[DataFrame, str | Sequence[str]]) -> DataFrame:
    """J1: chained inner equi-joins building a fact table (01:70-72)."""
    out = fact
    for dim, on in dims_on:
        out = out.join(dim, on=on, how="inner")
    return out


def enrich_left(df: DataFrame, dim: DataFrame, on, *, broadcast: bool = True) -> DataFrame:
    """J2/J3/J5: left-outer enrichment; dim side broadcast by default."""
    d = F.broadcast(dim) if broadcast else dim
    return df.join(d, on=on, how="left")


def full_outer_coalesce_keys(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    *,
    left_alias: str = "old",
    right_alias: str = "new",
) -> DataFrame:
    """J4: full-outer join on a compound key, then coalesce the key pairs.

    Mirrors the inventory reconciliation (05:66-80): every non-key column
    of each side is exposed as ``{alias}_{col}``; keys are coalesced back
    to single columns. Broadcast is illegal for full-outer → sort-merge
    join on the compound key; AQE handles skewed hot keys.
    """
    l = left.alias(left_alias)
    r = right.alias(right_alias)
    cond = None
    for k in keys:
        c = F.col(f"{left_alias}.{k}") == F.col(f"{right_alias}.{k}")
        cond = c if cond is None else (cond & c)
    joined = l.join(r, cond, "full_outer")

    cols = [
        F.coalesce(F.col(f"{left_alias}.{k}"), F.col(f"{right_alias}.{k}")).alias(k)
        for k in keys
    ]
    for side, alias in ((left, left_alias), (right, right_alias)):
        for c in side.columns:
            if c not in keys:
                cols.append(F.col(f"{alias}.{c}").alias(f"{alias}_{c}"))
    return joined.select(*cols)
