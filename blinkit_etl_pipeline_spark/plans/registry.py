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


# The driver samples ~50 registry queries per round, preferring earlier
# entries (insertion order). GENERATED — do not hand-edit; rerun
# `python tools/gen_priority.py --apply` after adding queries or when a
# new CORRECTNESS_r*.json lands (VERDICT r12 task #2). Ordering:
# never-driver-green queries first (registry insertion order), then
# every attested query oldest-driver-green-round-first, alphabetical
# within a round, from the union of all CORRECTNESS_r*.json.
PRIORITY = [
    # --- never driver-green ---
    "ns_ann_graph_filtered",
    "ns_ann_graph_filtered_recall",
    "ns_ann_graph_published",
    "ns_ann_graph_filtered_curve",
    "ns_incr_release_cached",
    "ns_ann_graph_filtered_pub",
    "ns_ann_graph_filtered_autotune",
    "ns_incr_release_drift",
    "ns_ann_mmr_topk",
    "ns_ann_mmr_diversity",
    "ns_select_facility",
    # --- newest green r5 ---
    "ns_dedup_minhash_lsh",
    "ns_dedup_ngram_jaccard",
    "ns_dedup_simhash",
    "ns_events_cohorts",
    "ns_events_funnel",
    "ns_events_moving_avg",
    "ns_media_adpcm",
    "ns_media_audio_fp_dedup",
    "ns_media_gif",
    "ns_media_jpeg",
    "ns_media_phash_dedup",
    "ns_media_png",
    "ns_media_resize_exec",
    "ns_media_video_frames",
    "ns_mix_sources",
    "ns_mix_temperature",
    "ns_sketch_hll_cumulative",
    "ns_text_bm25",
    "ns_text_chunks",
    "product_inventory_discrepancies",
    "revenue_by_category",
    "revenue_cube",
    "revenue_rollup",
    "sentiment_pivot",
    "top_products_per_category",
    # --- newest green r6 ---
    "enriched_feedback",
    "inventory_reconciliation",
    "marketing_kpis",
    "ns_ann_ivf_balance",
    "ns_ann_ivf_curve",
    "ns_ann_ivf_trained",
    "ns_ann_ivfpq_curve",
    "ns_ann_ivfpq_recall",
    "ns_ann_ivfpq_residual_recall",
    "ns_ann_ivfpq_residual_topk",
    "ns_ann_ivfpq_topk",
    "ns_ann_recall",
    "ns_asof_attribution",
    "ns_corpus_card",
    "ns_decontam_overlap",
    "ns_dedup_recall",
    "ns_dedup_semantic",
    "ns_dedup_semantic_fps",
    "ns_dedup_semantic_recall",
    "ns_events_hourly",
    "ns_events_json_kv",
    "ns_events_sessionize",
    "ns_events_sliding",
    "ns_media_features",
    "ns_media_frame_sample",
    "ns_media_resize",
    "ns_merge_upsert",
    "ns_pack_sequences",
    "ns_pii_scrub",
    "ns_pipeline_curation",
    "ns_privacy_k_anon",
    "ns_profile_key_skew",
    "ns_profile_table_stats",
    "ns_range_click_window",
    "ns_sample_quality_weighted",
    "ns_sample_stratified",
    "ns_sketch_cms_heavy",
    "ns_sketch_hll_users",
    "ns_sketch_value_quantiles",
    "ns_split_hash",
    "ns_text_bpe_pairs",
    "ns_text_chunk_dedup",
    "ns_text_fingerprint",
    "ns_text_gopher",
    "ns_text_langid",
    "ns_text_repetition",
    "ns_text_stats",
    "ns_text_vocab",
    "sales_fact",
    # --- newest green r7 ---
    "ns_ann_pq_topk",
    "ns_dedup_embedding",
    "ns_dedup_exact",
    "ns_dedup_groups",
    "ns_dedup_jaccard_prefix",
    # --- newest green r8 ---
    "inventory_discrepancies",
    "ns_ann_cosine_topk",
    "ns_ann_ivf_topk",
    "ns_ann_lsh_topk",
    "ns_ann_pq_recall",
    # --- newest green r9 ---
    "area_feedback_metrics",
    "campaign_performance",
    "campaign_roi",
    "category_inventory_impact",
    "customer_metrics",
    "customer_order_presence",
    "customer_satisfaction",
    "delay_setops",
    "delivery_partner",
    "delivery_partner_performance",
    "inventory_and_revenue",
    "ns_ann_sq8_recall",
    "ns_decontam_chunks",
    "ns_dedup_keep_best",
    "ns_dedup_spans",
    "ns_hybrid_rrf_recall",
    "ns_hybrid_rrf_topk",
    "ns_shuffle_shards",
    "ns_triplet_mine",
    # --- newest green r10 ---
    "ns_ann_sq8_topk",
    "ns_corpus_drift",
    "ns_data_quality",
    "ns_lm_perplexity",
    "ns_pipeline_curation_model",
    "ns_quality_nb",
    "ns_text_hash_embed_ann",
    # --- newest green r12 ---
    "ns_ann_graph_curve",
    "ns_ann_graph_external",
    "ns_ann_graph_recall",
    "ns_ann_graph_sq8_recall",
    "ns_ann_graph_sq8_topk",
    "ns_ann_graph_topk",
    "ns_basket_lift",
    "ns_cluster_kmeans",
    "ns_customer_rfm",
    "ns_dedup_edit_distance",
    "ns_events_ewma_anomaly",
    "ns_graph_pagerank",
    "ns_graph_pagerank_incr",
    "ns_incr_area_feedback",
    "ns_incr_campaign_summary",
    "ns_incr_category_impact",
    "ns_incr_category_revenue",
    "ns_incr_cms_probe",
    "ns_incr_curated_cdc",
    "ns_incr_delivery_partner",
    "ns_incr_drift",
    "ns_incr_hll_cumulative",
    "ns_incr_hll_users",
    "ns_incr_product_discrepancies",
    "ns_incr_release",
    "ns_incr_release_cdc",
    "ns_incr_revenue",
    "ns_incr_sales_revenue",
    "ns_knn_backfill",
    "ns_knn_graph",
    "ns_knn_graph_recall",
    "ns_knn_graph_store",
    "ns_lm_kn_perplexity",
    "ns_privacy_dp_release",
    "ns_profile_numeric_quantiles",
    "ns_quality_quantiles",
    "ns_scd2_changes",
    "ns_scd2_pit_enrich",
    "ns_scd2_user_state",
    "ns_select_dsir",
    "ns_sketch_bkq_cumulative",
    "ns_sketch_bkq_quantiles",
    "ns_sketch_kmv_overlap",
    "ns_sketch_quantiles_multi",
    "ns_snapshot_diff",
    "ns_takedown_audit",
    "ns_text_collocations_probe",
    "ns_text_keywords",
    "ns_text_pmi",
    "ns_triplet_mine_knn",
]


def _prioritized(items: dict) -> dict:
    front = {k: items[k] for k in PRIORITY if k in items}
    front.update({k: v for k, v in items.items() if k not in front})
    return front


# NOTE: northstar and warehouse import in SEPARATE guarded blocks so a
# failure loading one cannot silently drop the other's queries from
# the registry (r7 review finding); the guard exists only for
# environments missing numpy/pandas (the Arrow kernels northstar
# pulls in), which the driver environment always has.


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    out.update(parity.QUERIES)
    try:
        from . import northstar

        out.update(northstar.QUERIES)
    except ImportError:
        pass
    try:
        from . import warehouse

        out.update(warehouse.QUERIES)
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
    try:
        from . import warehouse

        out.update(warehouse.ORACLES)
    except ImportError:
        pass
    return _prioritized(out)
