"""Incremental rollup maintenance: partition-scoped upsert must touch only
the delta's hours, match a full recompute, and be idempotent."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators.rollup import (
    hourly_rollup,
    read_rollup,
    upsert_hourly_rollup,
)

T0 = dt.datetime(2024, 3, 1, 10, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(seconds=s), et, v) for u, s, et, v in rows],
        "user_id long, ts timestamp, event_type string, value double",
    )


def _snapshot(spark, path):
    return {
        (r["hour_key"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in read_rollup(spark, path).collect()
    }


def test_upsert_replaces_only_touched_hours(spark, tmp_path):
    path = str(tmp_path / "rollup")
    # initial load: hours 10 and 11
    first = _ev(
        spark,
        [
            (1, 0, "click", 1.0),
            (1, 60, "click", 2.0),
            (2, 3700, "view", 3.0),
        ],
    )
    upsert_hourly_rollup(first, path)
    base = _snapshot(spark, path)
    assert base[(2024030110, "click")] == (2, 3.0)
    assert base[(2024030111, "view")] == (1, 3.0)

    hour10_files = set(os.listdir(os.path.join(path, "hour_key=2024030110")))

    # delta: a corrected FULL hour 11 (one more event) — hour 10 untouched
    delta = _ev(spark, [(2, 3700, "view", 3.0), (3, 3800, "view", 5.0)])
    upsert_hourly_rollup(delta, path)
    after = _snapshot(spark, path)
    assert after[(2024030110, "click")] == (2, 3.0)  # preserved
    assert after[(2024030111, "view")] == (2, 8.0)  # replaced
    # hour 10's physical files were not rewritten
    assert set(os.listdir(os.path.join(path, "hour_key=2024030110"))) == hour10_files

    # the maintained table equals a from-scratch recompute of all raw data
    full = _ev(
        spark,
        [
            (1, 0, "click", 1.0),
            (1, 60, "click", 2.0),
            (2, 3700, "view", 3.0),
            (3, 3800, "view", 5.0),
        ],
    )
    expect = {
        (r["hour_key"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in hourly_rollup(full).collect()
    }
    assert after == expect


def test_upsert_idempotent(spark, tmp_path):
    path = str(tmp_path / "rollup")
    delta = _ev(spark, [(1, 0, "click", 1.5), (1, 10, "view", 2.5)])
    upsert_hourly_rollup(delta, path)
    once = _snapshot(spark, path)
    upsert_hourly_rollup(delta, path)
    assert _snapshot(spark, path) == once


def test_rollup_reads_prune_on_hour_key(spark, tmp_path):
    path = str(tmp_path / "rollup")
    upsert_hourly_rollup(
        _ev(spark, [(1, 0, "click", 1.0), (2, 3700, "view", 2.0)]), path
    )
    df = read_rollup(spark, path).filter(F.col("hour_key") == 2024030110)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at the source, not post-scan
    assert "PartitionFilters: [isnotnull(hour_key" in plan
    assert df.count() == 1


def test_uniq_state_merge_equals_direct_day_sketch(spark):
    # the -State/-Merge soundness property: the day estimate computed by
    # merging hour states must equal a direct KMV sketch over the day's
    # raw hashes — k smallest of a union of per-hour k-smallest IS the
    # day's k smallest
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from clickhouse_github_log_importer_spark.functions.hashing import (
        md5_hash64,
    )
    from clickhouse_github_log_importer_spark.plans.queries import (
        _KMV_K as K,
        _TWO60,
        REGISTRY,
        t,
    )

    sf = "/root/testdata/sf0.001"
    rolled = {
        r["day_id"]: r["kmv_estimate"]
        for r in REGISTRY["uniq_state_rollup"].spark(spark, sf).collect()
    }
    ev = t(spark, sf, "events")
    direct_rows = (
        ev.select(
            F.expr("ts_us div 86400000000").alias("day_id"),
            md5_hash64(F.col("user_id").cast("string")).alias("h"),
        )
        .distinct()
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("day_id").orderBy("h")),
        )
        .filter(F.col("_rn") <= K)
        .groupBy("day_id")
        .agg(
            F.max(F.when(F.col("_rn") == K, F.col("h"))).alias("hk"),
            F.count("*").alias("nk"),
        )
        .collect()
    )
    direct = {
        r["day_id"]: (
            int(r["nk"])
            if r["nk"] < K
            else int(round((K - 1) * _TWO60 / r["hk"]))
        )
        for r in direct_rows
    }
    assert rolled == direct
