"""Incremental materialized-rollup maintenance.

A 100 TB pipeline never recomputes its dashboard aggregates from raw
history: each ingest batch updates a day-partitioned rollup table by
touching ONLY the day partitions present in the batch. This module is the
generic form of the pattern the reference approximates with its
status-document roll-up (A10) — but as a maintained analytic table.

Correctness invariant (tested): after any sequence of batches,
``rollup table == full recompute over all batches``. Mergeability is the
requirement: counts and sums merge by re-aggregation; min/max likewise.
(Averages must be stored as sum+count; distinct counts need sketches.)

Cost model: per batch = aggregate(batch) + read(affected day partitions)
+ re-aggregate + dynamic-partition overwrite of those days. Nothing
scans the historical table beyond the touched days.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_KEYS = ("day", "event_type")


def aggregate_batch(batch: DataFrame) -> DataFrame:
    """events batch -> per-(day, type) mergeable partials."""
    return batch.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("ts_us").alias("first_ts_us"),
        F.max("ts_us").alias("last_ts_us"),
    )


def _merge(parts: DataFrame) -> DataFrame:
    return parts.groupBy(*ROLLUP_KEYS).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("first_ts_us").alias("first_ts_us"),
        F.max("last_ts_us").alias("last_ts_us"),
    )


def update_rollup(spark: SparkSession, rollup_path: str, batch: DataFrame) -> list[str]:
    """Merge one batch into the rollup table; returns the touched days.

    Reads only the affected day partitions (partition pruning), merges,
    and dynamically overwrites exactly those partitions.
    """
    partials = aggregate_batch(batch)
    days = [r["day"] for r in partials.select("day").distinct().collect()]
    if not days:
        return []
    if os.path.exists(rollup_path):
        existing = (
            spark.read.parquet(rollup_path)
            .withColumn("day", F.date_format("day", "yyyy-MM-dd"))
            .filter(F.col("day").isin(days))
        )
        merged = _merge(existing.unionByName(partials))
    else:
        merged = _merge(partials)
    (
        merged.repartition("day")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(rollup_path)
    )
    return sorted(days)


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    df = spark.read.parquet(rollup_path)
    # partition-directory inference types 'yyyy-MM-dd' values as DATE;
    # normalize back to the string key the aggregates use
    return df.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
        "first_ts_us", "last_ts_us",
    )
