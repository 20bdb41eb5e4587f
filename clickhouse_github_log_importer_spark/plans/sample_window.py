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

``SAMPLED_PRIOR`` is no longer hand-synced on faith:
``sampled_from_artifacts()`` re-derives it from the committed
``CORRECTNESS_r0*.json`` files and a pytest contract
(tests/test_sample_window.py) pins the frozenset to that derivation, so
a missed sync or a typo fails the suite instead of silently burning a
driver-verification slot.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

_LOG = logging.getLogger(__name__)

# union of CORRECTNESS_r01..r10 keys: entries with >=1 driver-green row
# (pinned against sampled_from_artifacts() by tests/test_sample_window.py)
SAMPLED_PRIOR: frozenset[str] = frozenset(
    {
        "bpe_merge_table_incremental", "sequence_count_adjacent_timed",
        "bpe_merge_table", "bpe_token_counts", "embedding_covariance",
        "embedding_pca_power", "embedding_pca_projection",
        "funnel_time_to_convert", "holt_linear_forecast",
        "sequence_count_adjacent", "sequence_match_adjacent",
        "zipf_fit_words",
        "anova_value_by_type", "bitmap_state_rollup",
        "categorical_information_value", "feature_corr_matrix",
        "gopher_rules_report", "hourly_series_decomposition",
        "hourly_sparkbar_by_type", "lang_id_confusion",
        "logistic_regression_irls", "score_auc", "score_calibration_curve",
        "sequence_count_timed", "sequence_match_events",
        "sequence_match_min_gap", "sequence_next_node",
        "sequence_next_node_matrix", "session_window_counts",
        "source_overlap_matrix", "tfidf_doc_keywords",
        "time_decayed_user_stats", "top_k_weighted_types_daily",
        "topk_state_rollup", "user_decayed_day_checkpoints",
        "user_value_derivative_profile", "value_equidepth_histogram",
        "window_funnel_strict_order",
        "ann_cosine_topk", "ann_ivf_lists", "ann_ivf_topk",
        "ann_ivfpq_recall_report", "ann_ivfpq_topk", "ann_lsh_buckets",
        "ann_lsh_topk", "ann_pq_code_histogram", "ann_pq_topk",
        "ann_recall_report", "approx_distinct_users",
        "approx_value_percentiles", "bitmap_audience_overlap",
        "bitwise_user_masks", "bloom_contamination_report",
        "bm25_keyword_search", "bounded_distinct_by_type",
        "categorical_association_suite", "chunk_dup_rate", "cluster_keepers",
        "cms_state_rollup", "coactivity_clustering", "coactivity_degrees",
        "coactivity_triangles", "concurrent_event_counts",
        "concurrent_event_counts_linear", "conditional_aggregates_by_type",
        "corpus_mixture_weights", "corpus_quality_summary",
        "cramers_v_type_band", "cross_modal_near_dups", "curation_funnel",
        "daily_event_type_pivot", "daily_running_totals",
        "daily_value_array_ops", "dataset_split_summary",
        "decontamination_report", "dedup_clusters", "dedup_exact",
        "dedup_last_write_wins", "dedup_minhash_lsh", "dedup_rate_by_source",
        "doc_chunk_plan", "doc_fingerprints", "doc_repetition_profile",
        "doc_token_rarity", "docs_hash_sample", "dsir_importance_weights",
        "dup_span_report", "edit_distance_near_pairs", "ema_user_value",
        "embedding_near_dup_pairs", "epoch_shuffle_sample",
        "event_funnel_conversion", "event_rank_profile",
        "event_type_transitions", "events_limit_by", "events_per_type",
        "gap_filled_hourly_counts", "grouping_sets_volume",
        "heavy_hitters_cms", "hour_entropy_by_type", "hourly_autocorrelation",
        "hourly_event_counts", "hourly_outliers_tukey",
        "hourly_period_strength", "hybrid_rrf_search",
        "inter_event_gap_profile", "interpolated_hourly_values",
        "kmeans_centroids", "kmeans_cluster_profile", "kmv_set_operations",
        "kolmogorov_smirnov_values", "lang_id", "lttb_downsample_hourly",
        "mann_whitney_u_values", "max_concurrent_intervals",
        "minhash_estimate_report", "missing_hours", "most_used_prop",
        "most_used_word", "multimodal_audio_features", "multimodal_features",
        "multimodal_frame_sample", "multimodal_image_features",
        "nation_customer_rollup", "ngram_jaccard_pairs", "ngram_lm_fluency",
        "order_priority_counts", "order_status_cube", "pagerank_user_item",
        "pii_scan", "platform_union_counts", "purchase_attribution",
        "purchase_attribution_windowed", "q10_returned_items",
        "q11_important_parts", "q12_priority_shipping",
        "q13_customer_distribution", "q14_promo_share", "q15_top_suppliers",
        "q16_supplier_diversity", "q17_small_quantity_revenue",
        "q18_large_orders", "q19_bracket_revenue", "q1_pricing_summary",
        "q20_excess_suppliers", "q21_sole_blame_suppliers",
        "q22_idle_customers", "q2_min_cost_supplier", "q3_shipping_priority",
        "q4_late_shipments", "q5_region_volume", "q6_forecast_revenue",
        "q7_nation_trade_volume", "q8_market_share", "q9_product_profit",
        "quantile_state_rollup", "record_count", "region_nation_rollup",
        "retention_cohorts", "retention_conditions", "semantic_dedup_keepers",
        "sequence_count_compiled", "sequence_match_compiled",
        "sequence_match_pattern", "sequence_packing_plan",
        "sequence_pair_count", "simhash_signatures", "sliding_window_counts",
        "source_capped_sample", "spearman_value_hour", "student_ttest_values",
        "sum_map_by_day", "text_quality", "token_fertility_by_lang",
        "token_stats", "top_brands_by_revenue", "top_events_per_user",
        "top_users_by_value", "tumbling_window_counts", "uniq_kmv_sketch",
        "uniq_state_rollup", "user_activity", "user_activity_gini",
        "user_bounding_ratio", "user_delta_sum", "user_first_events",
        "user_interval_coverage", "user_moving_sum_arrays", "user_sessions",
        "user_sessions_native", "user_trailing_7d_value", "user_watermarks",
        "users_not_customers", "value_histogram", "value_hour_correlation",
        "value_hour_regression", "value_moments_by_type",
        "value_multiple_regression", "value_percentiles",
        "vocab_growth_curve", "weighted_median_price", "welch_ttest_values",
        "window_funnel_levels", "window_funnel_levels_inclusive",
        "window_funnel_strict_dedup",
        # r11 additions
        "sequence_count_timed_backtracking", "stream_adjacency_count_fold",
        "stream_funnel_cascade_fold", "stream_time_decay_fold",
        # r12 additions
        "sequence_match_events_backtracking", "stream_backtracking_count_fold",
        "stream_cms_fold", "stream_kmv_fold", "stream_lww_dedup_fold",
        "stream_match_events_fold", "stream_quantile_fold",
    }
)

# round-13 window: (a) user_activity (entry() names it), (b) every entry
# whose plan changes this optimization round (none brand-new — r13 adds
# no features), (c) re-verification filler ordered by OLDEST
# latest-green driver evidence: the full 25-entry r8-evidence block
# (the oldest tail after r12 held full cumulative coverage), then the
# r9-evidence block in registration order (fills to 50).
DRIVER_SAMPLE: tuple[str, ...] = (
    "user_activity",
    # --- r8-evidence block (oldest latest-green), registration order ---
    "q21_sole_blame_suppliers",
    "sequence_next_node",
    "window_funnel_strict_order",
    "hourly_sparkbar_by_type",
    "value_equidepth_histogram",
    "categorical_information_value",
    "bitmap_state_rollup",
    "topk_state_rollup",
    "hourly_series_decomposition",
    "feature_corr_matrix",
    "sequence_match_min_gap",
    "score_auc",
    "score_calibration_curve",
    "tfidf_doc_keywords",
    "gopher_rules_report",
    "source_overlap_matrix",
    "lang_id_confusion",
    "sequence_next_node_matrix",
    "time_decayed_user_stats",
    "session_window_counts",
    "logistic_regression_irls",
    "user_decayed_day_checkpoints",
    "sequence_match_events",
    "user_value_derivative_profile",
    "top_k_weighted_types_daily",
    # --- r9-evidence block, registration order (fills to 50) ---
    "record_count",
    "events_per_type",
    "most_used_prop",
    "most_used_word",
    "missing_hours",
    "user_watermarks",
    "dedup_last_write_wins",
    "top_users_by_value",
    "users_not_customers",
    "hourly_event_counts",
    "top_brands_by_revenue",
    "nation_customer_rollup",
    "order_priority_counts",
    "top_events_per_user",
    "daily_running_totals",
    "dedup_exact",
    "dedup_minhash_lsh",
    "simhash_signatures",
    "ngram_jaccard_pairs",
    "ann_cosine_topk",
    "ann_lsh_buckets",
    "ann_ivf_lists",
    "ann_ivf_topk",
    "ann_lsh_topk",
)



def sampled_from_artifacts(repo_root: str | Path | None = None) -> frozenset[str]:
    """Union of keys across all committed CORRECTNESS_r0*.json artifacts
    — the ground truth SAMPLED_PRIOR must equal. Pinned by pytest so the
    hand-maintained frozenset can never drift from the artifacts."""
    root = Path(repo_root) if repo_root else Path(__file__).resolve().parents[2]
    names: set[str] = set()
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            names.update(json.loads(path.read_text()).keys())
        except (OSError, json.JSONDecodeError) as exc:  # corrupt artifact
            raise ValueError(f"unreadable correctness artifact {path}") from exc
    return frozenset(names)


def ordered_names(registry_names) -> list[str]:
    """Registry names with the driver-sample window first (in window
    order), everything else after in registration order. Window names
    missing from the registry are skipped rather than erroring so a
    partial build still exposes a full surface — but skipped names are
    logged loudly, because each one silently forfeits a
    driver-verification slot to an already-sampled entry."""
    names = list(registry_names)
    present = set(names)
    head = [n for n in DRIVER_SAMPLE if n in present]
    skipped = [n for n in DRIVER_SAMPLE if n not in present]
    if skipped:
        _LOG.warning(
            "driver-sample window names missing from registry "
            "(rename/typo forfeits a verification slot): %s", skipped
        )
    head_set = set(head)
    return head + [n for n in names if n not in head_set]
