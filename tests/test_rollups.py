"""Incremental rollup maintenance == full recompute, for any batch split."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators.rollups import (
    aggregate_batch,
    read_rollup,
    update_rollup,
)

US = 1_000_000


def _ev(spark, rows):
    df = spark.createDataFrame(rows, "event_id long, ts_us long, user_id long, event_type string, value double")
    return df.withColumn("ts", F.timestamp_micros("ts_us"))


DAY1 = 1_700_000_000 * US  # within one calendar day
DAY2 = DAY1 + 86_400 * US


def test_incremental_equals_full_recompute(spark, tmp_path):
    rollup = str(tmp_path / "rollup")
    b1 = [(1, DAY1, 1, "click", 1.0), (2, DAY1 + US, 1, "view", 2.0)]
    b2 = [(3, DAY1 + 2 * US, 2, "click", 3.0), (4, DAY2, 2, "click", 4.0)]
    b3 = [(5, DAY2 + US, 3, "view", 5.0)]

    touched = update_rollup(spark, rollup, _ev(spark, b1))
    assert len(touched) == 1
    touched = update_rollup(spark, rollup, _ev(spark, b2))
    assert len(touched) == 2  # spans both days
    update_rollup(spark, rollup, _ev(spark, b3))

    incremental = {
        (r["day"], r["event_type"]): (r["n_events"], r["sum_value"], r["first_ts_us"], r["last_ts_us"])
        for r in read_rollup(spark, rollup).collect()
    }
    full = {
        (r["day"], r["event_type"]): (r["n_events"], round(r["sum_value"], 2), r["first_ts_us"], r["last_ts_us"])
        for r in aggregate_batch(_ev(spark, b1 + b2 + b3)).collect()
    }
    assert incremental == full
    # spot semantics: day1 clicks merged across batches 1+2
    day1 = [v for (d, t), v in incremental.items() if t == "click" and v[0] == 2]
    assert day1 and day1[0][1] == 4.0  # 1.0 + 3.0


def test_untouched_partitions_preserved(spark, tmp_path):
    rollup = str(tmp_path / "rollup")
    update_rollup(spark, rollup, _ev(spark, [(1, DAY1, 1, "click", 1.0)]))
    before = read_rollup(spark, rollup).collect()
    # a batch touching only day 2 must not rewrite day 1
    update_rollup(spark, rollup, _ev(spark, [(2, DAY2, 1, "view", 9.0)]))
    after = {(r["day"], r["event_type"]): r["n_events"] for r in read_rollup(spark, rollup).collect()}
    assert after[(before[0]["day"], "click")] == 1
    assert len(after) == 2
