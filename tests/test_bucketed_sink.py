"""write_bucketed_table: the catalog must record the bucket layout and
downstream plans on the bucket key must run WITHOUT an exchange — the
whole point of paying the write-side shuffle once."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.sources.sinks import (
    write_bucketed_table,
)


@pytest.fixture
def bucketed_pair(spark, tmp_path):
    ev = spark.range(0, 10_000).select(
        (F.col("id") % 500).alias("user_id"),
        F.col("id").alias("event_id"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    names = []
    for suffix in ("a", "b"):
        t = f"bkt_{suffix}_{uuid.uuid4().hex[:8]}"
        write_bucketed_table(
            ev,
            t,
            bucket_cols=("user_id",),
            n_buckets=8,
            sort_cols=("user_id", "event_id"),
            path=str(tmp_path / t),
        )
        names.append(t)
    yield names
    for t in names:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        da = spark.table(a).groupBy("user_id").agg(F.sum("value").alias("va"))
        db = spark.table(b).groupBy("user_id").agg(F.count("*").alias("nb"))
        j = da.join(db, "user_id")
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert j.count() == 500
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    a, _ = bucketed_pair
    agg = spark.table(a).groupBy("user_id").agg(F.sum("value").alias("v"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 500


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark, bucketed_pair, tmp_path):
    # contract documentation in executable form: a 4-bucket table joined
    # to an 8-bucket table cannot elide both exchanges
    a, _ = bucketed_pair
    t4 = f"bkt_m_{uuid.uuid4().hex[:8]}"
    write_bucketed_table(
        spark.table(a),
        t4,
        bucket_cols=("user_id",),
        n_buckets=4,
        path=str(tmp_path / t4),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(a)
            .groupBy("user_id")
            .count()
            .join(spark.table(t4).groupBy("user_id").count(), "user_id")
        )
        assert "Exchange" in _plan(j)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {t4}")
