"""Bucketed co-located joins and month-partition pruning — the two
write-time layout choices that pay off at every subsequent query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators.bucketing import (
    bucketed_join_ready,
    write_bucketed,
)


def _explain(df) -> str:
    qe = df._jdf.queryExecution()
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # tables land in ./spark-warehouse (gitignored); dropped at test end
    import shutil

    for tbl in ("bucketed_a", "bucketed_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"spark-warehouse/{tbl}", ignore_errors=True)
    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bucketed_a", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(b, "bucketed_b", ["k"], n_buckets=8, sort_cols=["k"])
    # force the fact-fact (non-broadcast) path this layout exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join_ready(spark, "bucketed_a", "bucketed_b", ["k"])
        plan = _explain(joined)
        # co-located: SortMergeJoin with no shuffle on either side
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan.split("\n\n")[0]
        assert joined.count() == 10_000
        # and aggregation on the bucket key is exchange-free too
        agg = spark.table("bucketed_a").groupBy("k").agg(F.sum("va").alias("s"))
        assert "Exchange" not in _explain(agg).split("\n\n")[0]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bucketed_a")
        spark.sql("DROP TABLE IF EXISTS bucketed_b")


def test_month_partition_pruning(spark, tmp_path):
    from tests.fixtures import events, write_gz

    from clickhouse_github_log_importer_spark.operators.parsers import (
        project_events,
        read_raw,
    )

    src = str(tmp_path / "x.json.gz")
    write_gz(src, events(), corrupt_lines=0)
    table = str(tmp_path / "tbl")
    project_events(read_raw(spark, src)).write.partitionBy("created_month").parquet(
        table
    )
    df = spark.read.parquet(table).filter(F.col("created_month") == 201501)
    plan = _explain(df)
    # partition filter reaches the scan: only the January directory is read
    assert "PartitionFilters" in plan
    assert df.count() == 11  # 12 rows total, 1 in 201502
