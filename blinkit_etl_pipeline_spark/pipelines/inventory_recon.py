"""Inventory reconciliation pipeline (reference
``05_inventory_reconciliation_etl.py``).

Old-vs-new snapshot reconciliation: dedup each snapshot on
``(product_id, date)`` → full-outer join on the compound key (broadcast
illegal → sort-merge; AQE splits skewed hot products) → coalesced
variances → discrepancy/severity bands → product enrichment → financial
impact.

Parity map: dedup 05:53-64; full-outer join + coalesce 05:66-80;
variances 05:82-84; flags 05:85-90; severity 05:91-95 (stock-only, as
written — SURVEY.md §2.13.5); enrich 05:97-106; impact 05:107.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import clean, derive, joins

RECON_COLUMNS = [
    "product_id",
    "date",
    "old_stock_received",
    "old_damaged_stock",
    "new_stock_received",
    "new_damaged_stock",
    "stock_variance",
    "damaged_variance",
    "has_discrepancy",
    "discrepancy_type",
    "severity",
    "severity_rank",
    "product_name",
    "category",
    "price",
    "financial_impact",
]


def reconcile(
    inventory_old: DataFrame, inventory_new: DataFrame, products: DataFrame
) -> DataFrame:
    keys = ["product_id", "date"]
    old = clean.dedup(clean.require_not_null(inventory_old, *keys), keys)
    new = clean.dedup(clean.require_not_null(inventory_new, *keys), keys)

    recon = joins.full_outer_coalesce_keys(old, new, keys)
    recon = derive.with_inventory_variances(recon)
    recon = derive.with_discrepancy_flags(recon)
    recon = derive.with_severity(recon)

    dim = products.select("product_id", "product_name", "category", "price")
    recon = joins.enrich_left(recon, dim, "product_id")
    recon = derive.with_financial_impact(recon)
    return recon.select(*RECON_COLUMNS)
