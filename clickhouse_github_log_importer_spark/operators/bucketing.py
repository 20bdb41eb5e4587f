"""Bucketed (co-located) joins: pre-shuffle once, join forever free.

At 100 TB the dominant recurring cost of fact-fact joins (events history
self-joins, lineitem/orders) is the shuffle. Hive-style bucketing spends
one shuffle at WRITE time (``bucketBy(n, key)`` + ``sortBy``) and then
every equi-join or aggregation on the bucket key plans with NO Exchange on
the bucketed side(s) — the scan is already hash-distributed. This is the
Spark analog of the reference's ClickHouse ORDER BY clustering, taken one
step further (ClickHouse clusters within parts; buckets co-locate across
the whole table).

Requires a metastore-backed table (``saveAsTable``); plain parquet paths
cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted managed table.

    ``n_buckets`` sizes the unit of join parallelism forever after —
    choose ~ (table size / 256 MB) at the target scale; both sides of a
    co-located join must use the same count.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str, on: list[str]) -> DataFrame:
    """Join two same-bucketed tables on the bucket key; with matching
    bucket specs Catalyst plans SortMergeJoin with zero Exchange."""
    l, r = spark.table(left), spark.table(right)
    return l.join(r, on)
