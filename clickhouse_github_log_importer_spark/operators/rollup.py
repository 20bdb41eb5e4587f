"""Incrementally-maintained time-bucket rollups (hypertable-style).

ClickHouse deployments pair a raw MergeTree table with AggregatingMergeTree
materialized views; TimescaleDB calls the same idea a continuous aggregate
over hypertable chunks. The Spark-first analog is a parquet table
partitioned by the time bucket, maintained with DYNAMIC partition
overwrite: an incoming delta recomputes ONLY the buckets it touches and
atomically replaces those partitions — untouched history is never
rewritten or even read.

Scale shape: maintenance cost is O(delta + touched buckets), independent
of table history. Re-running the same delta is idempotent (the overwrite
replaces a partition with identical content). The delta must carry every
event of the buckets it covers (the natural case for hourly ingest: each
ingested file IS a whole hour — reference `app/service/file_processor.ts`
hourly units); for corrections, feed the full affected hours back through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Per (hour bucket, event_type) counts and value sums.

    ``hour_key`` is a sortable yyyyMMddHH long — the partition column of
    the maintained table (24-26 partitions/day: coarse enough for the
    small-files problem, fine enough for partition pruning).
    """
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyyMMddHH")
            .cast("long")
            .alias("hour_key"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def upsert_hourly_rollup(delta: DataFrame, path: str) -> None:
    """Merge a delta's hours into the rollup table at ``path``.

    Dynamic partition overwrite: only the ``hour_key`` partitions present
    in the delta's aggregation output are replaced; all other partitions
    are untouched (no read, no rewrite). Idempotent under re-runs of the
    same delta.
    """
    (
        hourly_rollup(delta)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("hour_key")
        .parquet(path)
    )


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """The maintained rollup as a DataFrame (hour_key pruning applies to
    any filter on the partition column)."""
    return spark.read.parquet(path)
