"""Marketing ROI pipeline (reference ``04_marketing_roi_etl.py``).

Composite-key dedup → timestamp parse → seven guarded KPI derivations
(all codegen-able ``when`` expressions, no UDFs) → partition cols.
Parity map: dedup 04:47-49; parse 04:50; KPIs 04:57-95; parts 04:102-105.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import clean, derive


def marketing_kpis(marketing: DataFrame) -> DataFrame:
    mk = clean.require_not_null(marketing, "campaign_id", "date")
    mk = clean.dedup(mk, ["campaign_id", "date"])
    mk = clean.parse_timestamp(mk, "date")
    mk = derive.with_marketing_kpis(mk)
    return derive.with_date_parts(mk, "date", day=False)
