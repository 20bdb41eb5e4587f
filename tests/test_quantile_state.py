"""Mergeable quantile state (operators/quantile_state.py): the
-State/-Merge contract — merging partial states must be indistinguishable
from computing directly on the raw rows, under any regrouping."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators.quantile_state import (
    histogram_state,
    merge_state,
    quantiles_from_state,
)
from clickhouse_github_log_importer_spark.plans.queries import t


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_equals_direct(spark, sf_smoke):
    # hourly states merged to day == day state built straight from raw
    ev = t(spark, sf_smoke, "events").select(
        F.expr("ts_us div 86400000000").alias("day_id"),
        F.expr("ts_us div 3600000000").alias("hour_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    hourly = histogram_state(ev, ["day_id", "hour_id"], "cents")
    via_merge = quantiles_from_state(
        merge_state(hourly, ["day_id"], "cents"), ["day_id"], "cents"
    )
    direct = quantiles_from_state(
        histogram_state(ev, ["day_id"], "cents"), ["day_id"], "cents"
    )
    assert _rows(via_merge) == _rows(direct)


def test_merge_associative_regrouping(spark, sf_smoke):
    # hour -> (day, hour parity) -> day must equal hour -> day: the merge
    # is associative, so ANY intermediate rollup grain yields the same
    # day state (the mergetree.py fold contract, for quantile states)
    ev = t(spark, sf_smoke, "events").select(
        F.expr("ts_us div 86400000000").alias("day_id"),
        F.expr("ts_us div 3600000000").alias("hour_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    hourly = histogram_state(ev, ["day_id", "hour_id"], "cents")
    one_step = merge_state(hourly, ["day_id"], "cents")
    half = merge_state(
        hourly.withColumn("par", F.col("hour_id") % 2),
        ["day_id", "par"],
        "cents",
    )
    two_step = merge_state(half, ["day_id"], "cents")
    assert _rows(one_step) == _rows(two_step)


def test_quantile_exact_low_semantics(spark):
    # quantileExactLow index rule on a tiny known state: values
    # [10, 20, 30, 40] -> n=4, idx = (n-1)*num div den (0-based), so
    # p25 -> idx 0 -> 10, p50 -> idx 1 -> 20, p75 -> idx 2 -> 30; with
    # duplicate weight the cumulative pick must respect counts
    df = spark.createDataFrame(
        [("k", 10), ("k", 20), ("k", 30), ("k", 40),
         ("w", 10), ("w", 10), ("w", 10), ("w", 99)],
        "g string, v long",
    )
    q = quantiles_from_state(
        histogram_state(df, ["g"], "v"), ["g"], "v"
    )
    got = {r["g"]: (r["n_events"], r["p25"], r["p50"], r["p75"]) for r in q.collect()}
    assert got["k"] == (4, 10, 20, 30)
    # w: sorted [10,10,10,99]; idx25=0 ->10, idx50=1 ->10, idx75=2 ->10
    assert got["w"] == (4, 10, 10, 10)
