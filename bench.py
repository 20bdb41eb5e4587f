#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed with a count()-style full materialization (collect
on the final, already-small result) after a warm-up of the input parquet
footers. Timings are per-query wall clock.
"""

from __future__ import annotations

import json
import os
import time

HEADLINE = [
    "record_count",
    "events_per_type",
    "most_used_prop",
    "most_used_word",
    "user_activity",
    "missing_hours",
    "user_watermarks",
    "dedup_last_write_wins",
    "top_users_by_value",
    "hourly_event_counts",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q12_priority_shipping",
    "q14_promo_share",
    "q18_large_orders",
    "q19_bracket_revenue",
    "top_brands_by_revenue",
    "nation_customer_rollup",
    "order_priority_counts",
    "top_events_per_user",
    "daily_running_totals",
    "region_nation_rollup",
    "dedup_exact",
    "dedup_minhash_lsh",
    "simhash_signatures",
    "ann_cosine_topk",
    "ann_lsh_buckets",
    "lang_id",
    "text_quality",
    "token_stats",
    "doc_fingerprints",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from clickhouse_github_log_importer_spark.plans.queries import REGISTRY
    from clickhouse_github_log_importer_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footer reads, not counted
    REGISTRY["record_count"].spark(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in REGISTRY:
            continue
        t0 = time.monotonic()
        REGISTRY[name].spark(spark, sf_dir).collect()
        timings[name] = round(time.monotonic() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
