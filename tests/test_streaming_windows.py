"""Streaming-mode smoke tests for the windowed aggregation surface: the
SAME operator that the DuckDB oracle verifies in batch mode must produce
identical windows under readStream + watermark."""

from __future__ import annotations

from datetime import datetime

import pytest

from clickhouse_github_log_importer_spark.streaming.windows import (
    windowed_event_counts,
)

ROWS = [
    (1, "click", datetime(2022, 1, 1, 10, 5), 1.5),
    (2, "click", datetime(2022, 1, 1, 10, 40), 2.0),
    (3, "view", datetime(2022, 1, 1, 10, 55), 0.5),
    (4, "click", datetime(2022, 1, 1, 11, 10), 3.25),
    (5, "view", datetime(2022, 1, 1, 12, 1), 1.0),
]
DDL = "user_id long, event_type string, ts timestamp, value double"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def src_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("win_src"))
    spark.createDataFrame(ROWS, DDL).coalesce(1).write.mode("overwrite").parquet(d)
    return d


def _stream_result(spark, src_dir, **kwargs):
    stream = (
        spark.readStream.schema(DDL).parquet(src_dir)
    )
    out = windowed_event_counts(stream, watermark="10 minutes", **kwargs)
    name = f"win_smoke_{abs(hash(tuple(sorted(kwargs.items())))) % 10**8}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_streaming_matches_batch(spark, src_dir):
    batch = windowed_event_counts(spark.read.parquet(src_dir), window="1 hour")
    streamed = _stream_result(spark, src_dir, window="1 hour")
    assert _rows(streamed) == _rows(batch)
    # sanity: the 10:00 window aggregates the three 10:xx events
    row = next(
        r for r in batch.collect()
        if r["window_start"] == "2022-01-01 10:00:00" and r["event_type"] == "click"
    )
    assert row["n_events"] == 2 and row["total_value"] == 3.5


def test_sliding_streaming_matches_batch(spark, src_dir):
    kwargs = {"window": "1 hour", "slide": "30 minutes"}
    batch = windowed_event_counts(spark.read.parquet(src_dir), **kwargs)
    streamed = _stream_result(spark, src_dir, **kwargs)
    assert _rows(streamed) == _rows(batch)
    # each event belongs to exactly window/slide = 2 windows
    assert batch.agg({"n_events": "sum"}).collect()[0][0] == 2 * len(ROWS)


# --- streaming dedup (bounded-state ReplacingMergeTree twin) --------------

DUP_ROWS = [
    (1, "click", datetime(2022, 1, 1, 10, 5), 1.5),
    (1, "click", datetime(2022, 1, 1, 10, 6), 1.5),   # duplicate key
    (2, "view", datetime(2022, 1, 1, 10, 7), 2.0),
    (2, "view", datetime(2022, 1, 1, 10, 8), 2.0),    # duplicate key
    (3, "click", datetime(2022, 1, 1, 10, 9), 0.5),
]


@pytest.fixture(scope="module")
def dup_src_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dedup_src"))
    spark.createDataFrame(DUP_ROWS, DDL).coalesce(1).write.mode("overwrite").parquet(d)
    return d


def test_streaming_dedup_matches_batch_keys(spark, dup_src_dir):
    from clickhouse_github_log_importer_spark.streaming.dedup_stream import (
        dedup_events_stream,
    )

    batch = dedup_events_stream(
        spark.read.parquet(dup_src_dir), key_cols=("user_id",)
    )
    assert sorted(r["user_id"] for r in batch.collect()) == [1, 2, 3]

    stream = spark.readStream.schema(DDL).parquet(dup_src_dir)
    out = dedup_events_stream(
        stream, key_cols=("user_id",), watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_smoke")
    assert sorted(r["user_id"] for r in got.collect()) == [1, 2, 3]
