"""Derivation operators: KPI/CASE column builders (SURVEY.md §2.2 P2/P10/P11).

All derivations are built-in Column expressions — they stay inside
whole-stage codegen; no UDFs anywhere (the reference is UDF-free too,
SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --- sales (reference 01:75-89) ----------------------------------------

def with_line_total(df: DataFrame) -> DataFrame:
    """``line_total = quantity * unit_price`` (01:76-78)."""
    return df.withColumn("line_total", F.col("quantity") * F.col("unit_price"))


def with_profit_margin(df: DataFrame) -> DataFrame:
    """Profit formula exactly as written in the reference (01:80-83).

    ``(price - (price * (1 - margin/100))) * quantity`` — algebraically
    ``price * margin/100 * quantity``, but kept as written so the float
    op sequence matches the documented semantics (SURVEY.md §2.13.4).
    """
    price, margin, qty = F.col("price"), F.col("margin_percentage"), F.col("quantity")
    return df.withColumn(
        "profit_margin", (price - (price * (F.lit(1) - margin / F.lit(100)))) * qty
    )


def with_date_parts(df: DataFrame, ts_col: str, *, day: bool = True) -> DataFrame:
    """F3: partition-grain year/month[/day] ints (01:87-89)."""
    out = df.withColumn("year", F.year(ts_col)).withColumn("month", F.month(ts_col))
    if day:
        out = out.withColumn("day", F.dayofmonth(ts_col))
    return out


# --- feedback (reference 03:81-96) -------------------------------------

POSITIVE_WORDS = ("positive", "good", "excellent")
NEGATIVE_WORDS = ("negative", "bad", "poor")
NEUTRAL_WORDS = ("neutral", "average", "okay")


def with_sentiment_normalized(df: DataFrame, col: str = "sentiment") -> DataFrame:
    """P8/P10: normalize free-text sentiment into
    Positive/Negative/Neutral/Unknown (sets + fallback from 03:81-87)."""
    low = F.lower(F.col(col))
    return df.withColumn(
        "sentiment_normalized",
        F.when(low.isin(*POSITIVE_WORDS), "Positive")
        .when(low.isin(*NEGATIVE_WORDS), "Negative")
        .when(low.isin(*NEUTRAL_WORDS), "Neutral")
        .otherwise("Unknown"),
    )


def with_sentiment_score(df: DataFrame, col: str = "sentiment_normalized") -> DataFrame:
    """P10: Positive→1, Neutral→0, Negative→-1, Unknown→0 (03:90-96)."""
    s = F.col(col)
    return df.withColumn(
        "sentiment_score",
        F.when(s == "Positive", 1).when(s == "Neutral", 0).when(s == "Negative", -1).otherwise(0),
    )


# --- marketing KPIs (reference 04:57-95) -------------------------------

def with_marketing_kpis(df: DataFrame) -> DataFrame:
    """The seven guarded per-campaign-day KPIs (04:57-95).

    Each division is guarded with ``when`` (never a UDF) so the whole
    block stays codegen-able; guard yields 0.0 on zero denominators.
    """
    imp, clk = F.col("impressions"), F.col("clicks")
    conv, spend = F.col("conversions"), F.col("spend")
    rev = F.col("revenue_generated")
    zero = F.lit(0.0)

    def guarded(denom, expr):
        return F.when(denom > 0, expr).otherwise(zero)

    out = (
        df.withColumn("ctr", guarded(imp, clk / imp * 100))
        .withColumn("conversion_rate", guarded(clk, conv / clk * 100))
        .withColumn("cpc", guarded(clk, spend / clk))
        .withColumn("cpa", guarded(conv, spend / conv))
        .withColumn("roas_calculated", guarded(spend, rev / spend))
        .withColumn("roi_percentage", guarded(spend, (rev - spend) / spend * 100))
    )
    return out.withColumn(
        "effectiveness_score",
        (F.col("conversion_rate") * 0.4)
        + (F.col("roas_calculated") * 10 * 0.4)
        + (F.col("ctr") * 0.2),
    )


# --- inventory reconciliation (reference 05:82-107) --------------------

def with_inventory_variances(df: DataFrame) -> DataFrame:
    """Variances over coalesced old/new quantities (05:82-84)."""
    return (
        df.withColumn(
            "stock_variance",
            F.coalesce(F.col("new_stock_received"), F.lit(0))
            - F.coalesce(F.col("old_stock_received"), F.lit(0)),
        )
        .withColumn(
            "damaged_variance",
            F.coalesce(F.col("new_damaged_stock"), F.lit(0))
            - F.coalesce(F.col("old_damaged_stock"), F.lit(0)),
        )
    )


def with_discrepancy_flags(df: DataFrame) -> DataFrame:
    """has_discrepancy + discrepancy_type (05:85-90)."""
    sv, dv = F.col("stock_variance"), F.col("damaged_variance")
    return (
        df.withColumn(
            "has_discrepancy", F.when((sv != 0) | (dv != 0), 1).otherwise(0)
        )
        .withColumn(
            "discrepancy_type",
            F.when((sv != 0) & (dv != 0), "Both Stock and Damaged Mismatch")
            .when(sv != 0, "Stock Mismatch")
            .when(dv != 0, "Damaged Stock Mismatch")
            .otherwise("No Discrepancy"),
        )
    )


# Severity bands only stock_variance — damaged_variance deliberately
# never affects severity, and rows without any discrepancy still band as
# "Low", both reproducing the reference as-is (05:91-95, SURVEY.md
# §2.13.5). Ordinal rank encodes Critical>High>Medium>Low for the IA5
# ``max_severity`` aggregate (no lexicographic accident).
SEVERITY_RANK = {"Low": 1, "Medium": 2, "High": 3, "Critical": 4}


def with_severity(df: DataFrame) -> DataFrame:
    asv = F.abs(F.col("stock_variance"))
    return df.withColumn(
        "severity",
        F.when(asv > 100, "Critical")
        .when(asv > 50, "High")
        .when(asv > 10, "Medium")
        .otherwise("Low"),
    ).withColumn(
        "severity_rank",
        F.when(F.col("severity") == "Critical", 4)
        .when(F.col("severity") == "High", 3)
        .when(F.col("severity") == "Medium", 2)
        .otherwise(1),
    )


def with_financial_impact(df: DataFrame) -> DataFrame:
    """``financial_impact = abs(stock_variance) * coalesce(price, 0)`` (05:107)."""
    return df.withColumn(
        "financial_impact",
        F.abs(F.col("stock_variance")) * F.coalesce(F.col("price"), F.lit(0.0)),
    )
