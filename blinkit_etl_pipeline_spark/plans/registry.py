"""Central query registry: name -> Spark callable, name -> oracle SQL.

The driver contract (``__spark_entry__.py``) re-exports these. Queries
without an oracle entry (genuinely non-SQL-expressible ops: LSH dedup,
streaming, iterative) get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import parity

QueryFn = Callable[[SparkSession, str], DataFrame]

# The driver samples a subset of the registry per round, preferring
# earlier entries (insertion order).  Round 6 ordering (VERDICT r5 task #1):
# new r6 queries first (never driver-checked), then every existing query
# oldest-driver-green-row-first, so the r6 sample re-attests the ~37 rows
# whose newest CORRECTNESS evidence predates the r5 code.  Generated from
# the union of CORRECTNESS_r01–r05.json (newest round per query, then name).
PRIORITY = [
    # --- r6 additions, never driver-checked ---
    "ns_ann_ivfpq_topk",
    "ns_ann_ivfpq_recall",
    "ns_text_chunk_dedup",
    "ns_dedup_semantic_fps",
    "ns_hybrid_rrf_topk",
    "ns_ann_ivfpq_residual_topk",
    "ns_ann_ivfpq_residual_recall",
    "ns_corpus_card",
    "ns_ann_ivfpq_curve",
    # --- stalest existing rows (newest driver row r1–r3) ---
    "ns_sketch_hll_users",  # r1
    "ns_sketch_value_quantiles",  # r1
    "ns_asof_attribution",  # r2
    "ns_events_sessionize",  # r2
    "ns_media_features",  # r2
    "ns_media_frame_sample",  # r2
    "ns_media_resize",  # r2
    "ns_range_click_window",  # r2
    "ns_decontam_overlap",  # r3
    "ns_events_hourly",  # r3
    "ns_events_json_kv",  # r3
    "ns_events_sliding",  # r3
    "ns_pii_scrub",  # r3
    "ns_pipeline_curation",  # r3
    "ns_sample_quality_weighted",  # r3
    "ns_sample_stratified",  # r3
    "ns_split_hash",  # r3
    "ns_text_repetition",  # r3
    "ns_text_vocab",  # r3
    # --- newest driver row r4 ---
    "ns_ann_ivf_balance",
    "ns_ann_ivf_curve",
    "ns_ann_ivf_trained",
    "ns_ann_recall",
    "ns_dedup_recall",
    "ns_dedup_semantic",
    "ns_dedup_semantic_recall",
    "ns_merge_upsert",
    "ns_pack_sequences",
    "ns_privacy_k_anon",
    "ns_profile_key_skew",
    "ns_profile_table_stats",
    "ns_sketch_cms_heavy",
    "ns_text_bpe_pairs",
    "ns_text_fingerprint",
    "ns_text_gopher",
    "ns_text_langid",
    "ns_text_stats",
    # --- newest driver row r5 (refresh as sample budget allows) ---
    "sales_fact",
    "enriched_feedback",
    "marketing_kpis",
    "inventory_reconciliation",
    "customer_metrics",
    "customer_satisfaction",
    "campaign_roi",
    "delivery_partner",
    "inventory_and_revenue",
    "inventory_discrepancies",
]


def _prioritized(items: dict) -> dict:
    front = {k: items[k] for k in PRIORITY if k in items}
    front.update({k: v for k, v in items.items() if k not in front})
    return front


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    out.update(parity.QUERIES)
    try:
        from . import northstar

        out.update(northstar.QUERIES)
    except ImportError:
        pass
    return _prioritized(out)


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(parity.ORACLES)
    try:
        from . import northstar

        out.update(northstar.ORACLES)
    except ImportError:
        pass
    return _prioritized(out)
