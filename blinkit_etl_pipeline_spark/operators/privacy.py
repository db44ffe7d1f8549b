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


# ---------------------------------------------------------------------------
# Differentially-private aggregate release (Laplace mechanism,
# hash-derived noise so both engines draw the identical sample)
# ---------------------------------------------------------------------------

#: hash-space size for the 48-bit uniform behind the Laplace draw
DP_SPACE = 1 << 48

#: noise quantization scale (the ln-quantization discipline of
#: functions/lm.py — every noise value is an exact int64)
DP_SCALE = 1000000


def _lnq(col) -> F.Column:
    """ROUND(ln(col)·10^6) as int64 — col is an exact-integer double."""
    return F.round(F.log(col.cast("double")) * F.lit(float(DP_SCALE)), 0).cast(
        "long"
    )


def _laplace_q(seed_col, b: int) -> F.Column:
    """Quantized Laplace(b) draw keyed by a string column (integer b).

    Inverse-CDF on a hash-derived uniform, arranged so every ``ln`` is
    of an EXACT INTEGER (cross-engine bit-identical up to the absorbed
    ulp): with ``v = h48(seed)+1`` and ``N = 2^48+2``, the uniform is
    ``u = v/N`` in (0,1) exclusive, and

        noise = -b · sign(u-½) · ln(1 - 2|u-½|)
              = -b · sign(2v-N) · (ln(N - |2v-N|) - ln(N))

    Both ``ln`` arguments are integers in [2, 2^48+2] (< 2^53, exact
    as doubles). Returned pre-multiplied by 10^6 (int64)."""
    from ..functions.text import h48

    v = h48(seed_col) + F.lit(1)
    n = F.lit(DP_SPACE + 2).cast("long")
    d = F.lit(2).cast("long") * v - n
    sign = F.when(d > 0, F.lit(-1)).when(d < 0, F.lit(1)).otherwise(F.lit(0))
    m = n - F.abs(d)
    return (sign * F.lit(b) * (_lnq(m) - _lnq(n))).cast("long")


def dp_release(
    df: DataFrame,
    group_cols: Sequence[str],
    clip_col: str,
    clip_bound: int,
    eps_inv: int = 1,
    seed: str = "dp-v1",
) -> DataFrame:
    """ε-DP release of per-group counts and a clipped sum (Laplace
    mechanism): ``dp_n`` gets Laplace(1/ε) noise (count sensitivity 1),
    i.e. Laplace(eps_inv),
    ``dp_sum`` gets Laplace(clip_bound/ε) after clipping each
    contribution to ``[0, clip_bound]`` (bounding the sum's
    sensitivity — the standard clip-then-noise recipe).

    Noise is keyed by ``(seed, group, metric)`` through the 48-bit
    md5-prefix hash: deterministic for the oracle, yet unpredictable
    without the seed — swap the seed column for a true RNG in a
    production deployment (one-line change; the mechanism and its
    calibration are what this operator pins down).

    ε = 1/eps_inv (integer ``eps_inv``, so both noise scales
    b = eps_inv and b = clip_bound·eps_inv stay integers and the whole
    draw is exact int64 — no cross-engine division-rounding seam).
    Returns (group..., n, dp_n, dp_sum) with the noised values rounded
    to 6 decimals (exact multiples of 10^-6 by construction).

    Scale shape: one partial-aggregated groupBy; noise is a map-side
    expression on the (small) released table. The true ``n`` column is
    evidence for tests/gauges — a real release drops it.
    """
    group_cols = list(group_cols)
    agg = df.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.least(
                F.greatest(F.col(clip_col).cast("long"), F.lit(0)),
                F.lit(clip_bound),
            )
        )
        .cast("long")
        .alias("clipped_sum"),
    )
    # NULL-safe, collision-free group key: NULL encodes as \x00 and a
    # real value as \x01+value, so (NULL,'x') and ('x',NULL) never
    # share a noise draw and NULL groups don't silently drop out of
    # the concat (concat_ws skips NULLs; the oracle's || would null
    # the whole key) — r7 review finding
    def _part(c: str) -> F.Column:
        col = F.col(c).cast("string")
        return F.when(col.isNull(), F.lit("\x00")).otherwise(
            F.concat(F.lit("\x01"), col)
        )

    gkey = F.concat_ws(
        "\x1f", F.lit(seed), *[_part(c) for c in group_cols]
    )
    noise_n = _laplace_q(F.concat(gkey, F.lit("\x1fn")), eps_inv)
    noise_s = _laplace_q(
        F.concat(gkey, F.lit("\x1fs")), clip_bound * eps_inv
    )
    return agg.select(
        *group_cols,
        "n",
        F.round(
            (F.col("n") * DP_SCALE + noise_n).cast("double")
            / F.lit(float(DP_SCALE)),
            6,
        ).alias("dp_n"),
        F.round(
            (F.col("clipped_sum") * DP_SCALE + noise_s).cast("double")
            / F.lit(float(DP_SCALE)),
            6,
        ).alias("dp_sum"),
    )
