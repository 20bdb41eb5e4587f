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

# union of CORRECTNESS_r01..r06 keys: entries with >=1 driver-green row
# (pinned against sampled_from_artifacts() by tests/test_sample_window.py)
SAMPLED_PRIOR: frozenset[str] = frozenset(
    {
        "ann_cosine_topk", "ann_ivf_lists", "ann_ivf_topk",
        "ann_ivfpq_recall_report", "ann_ivfpq_topk", "ann_lsh_buckets",
        "ann_lsh_topk", "ann_pq_code_histogram", "ann_pq_topk",
        "ann_recall_report", "approx_distinct_users",
        "approx_value_percentiles", "bloom_contamination_report",
        "bm25_keyword_search", "chunk_dup_rate", "cluster_keepers",
        "coactivity_clustering", "coactivity_triangles",
        "concurrent_event_counts", "concurrent_event_counts_linear",
        "corpus_mixture_weights", "corpus_quality_summary",
        "cross_modal_near_dups", "curation_funnel",
        "daily_event_type_pivot", "daily_running_totals",
        "dataset_split_summary", "decontamination_report",
        "dedup_clusters", "dedup_exact", "dedup_last_write_wins",
        "dedup_minhash_lsh", "dedup_rate_by_source", "doc_chunk_plan",
        "doc_fingerprints", "doc_repetition_profile", "doc_token_rarity",
        "docs_hash_sample", "dsir_importance_weights", "dup_span_report",
        "edit_distance_near_pairs", "ema_user_value",
        "embedding_near_dup_pairs", "epoch_shuffle_sample",
        "event_rank_profile", "events_per_type",
        "gap_filled_hourly_counts", "heavy_hitters_cms",
        "hourly_event_counts", "hybrid_rrf_search", "kmeans_centroids",
        "kmeans_cluster_profile", "lang_id", "minhash_estimate_report",
        "missing_hours", "most_used_prop", "most_used_word",
        "multimodal_audio_features", "multimodal_features",
        "multimodal_frame_sample", "multimodal_image_features",
        "nation_customer_rollup", "ngram_jaccard_pairs",
        "ngram_lm_fluency", "order_priority_counts", "order_status_cube",
        "pagerank_user_item", "pii_scan", "platform_union_counts",
        "purchase_attribution", "q10_returned_items",
        "q11_important_parts", "q12_priority_shipping",
        "q13_customer_distribution", "q14_promo_share",
        "q15_top_suppliers", "q16_supplier_diversity",
        "q17_small_quantity_revenue", "q18_large_orders",
        "q19_bracket_revenue", "q1_pricing_summary",
        "q20_excess_suppliers", "q21_sole_blame_suppliers",
        "q22_idle_customers", "q2_min_cost_supplier",
        "q3_shipping_priority", "q4_late_shipments", "q5_region_volume",
        "q6_forecast_revenue", "q7_nation_trade_volume",
        "q8_market_share", "q9_product_profit", "quantile_state_rollup",
        "record_count", "region_nation_rollup", "semantic_dedup_keepers",
        "sequence_match_pattern", "sequence_packing_plan",
        "simhash_signatures", "sliding_window_counts",
        "source_capped_sample", "text_quality", "token_fertility_by_lang",
        "token_stats", "top_brands_by_revenue", "top_events_per_user",
        "top_users_by_value", "tumbling_window_counts", "user_activity",
        "user_first_events", "user_moving_sum_arrays", "user_sessions",
        "user_trailing_7d_value", "user_watermarks",
        "users_not_customers", "value_histogram", "value_percentiles",
        "vocab_growth_curve",
    }
)

# round-7 window: user_activity (entry() names it) + 49 never-sampled
# entries — the r5/r6 statistics, state-rollup, ML-eval, funnel-mode
# and text-audit additions in registration order, with this round's
# TWO BRAND-NEW entries (window_funnel_strict_dedup,
# sequence_match_compiled — the driver must see new plans immediately)
# taking the slots of sequence_next_node and hourly_sparkbar_by_type.
# daily_value_array_ops stays: its plan changed this round (HOF
# lambda-variable binding). Never-sampled entries remaining for the r8
# window: the 13 after daily_value_array_ops in registration order
# (value_equidepth_histogram .. lang_id_confusion, incl. score_auc and
# its siblings) plus sequence_next_node, hourly_sparkbar_by_type and
# window_funnel_strict_order, deferred to make room for the three
# brand-new r7 entries; tests derive the exact set from the artifacts
# rather than trusting this comment.
DRIVER_SAMPLE: tuple[str, ...] = (
    "user_activity",
    # --- never driver-sampled, registration order ---
    "cms_state_rollup",
    "coactivity_degrees",
    "retention_cohorts",
    "event_funnel_conversion",
    "window_funnel_levels",
    "event_type_transitions",
    "user_activity_gini",
    "uniq_kmv_sketch",
    "retention_conditions",
    "kmv_set_operations",
    "max_concurrent_intervals",
    "user_interval_coverage",
    "sequence_pair_count",
    "sum_map_by_day",
    "inter_event_gap_profile",
    "user_delta_sum",
    "weighted_median_price",
    "bitmap_audience_overlap",
    "interpolated_hourly_values",
    "bounded_distinct_by_type",
    "value_hour_correlation",
    "welch_ttest_values",
    "student_ttest_values",
    "mann_whitney_u_values",
    "kolmogorov_smirnov_values",
    "cramers_v_type_band",
    "lttb_downsample_hourly",
    "uniq_state_rollup",
    "events_limit_by",
    "purchase_attribution_windowed",
    "user_bounding_ratio",
    "window_funnel_levels_inclusive",
    "conditional_aggregates_by_type",
    "spearman_value_hour",
    "categorical_association_suite",
    "value_moments_by_type",
    "value_hour_regression",
    "bitwise_user_masks",
    "hour_entropy_by_type",
    "hourly_autocorrelation",
    "hourly_outliers_tukey",
    "hourly_period_strength",
    "user_sessions_native",
    "value_multiple_regression",
    "grouping_sets_volume",
    "daily_value_array_ops",
    # --- brand new this round: the driver must see them immediately ---
    "window_funnel_strict_dedup",
    "sequence_match_compiled",
    "sequence_count_compiled",
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
