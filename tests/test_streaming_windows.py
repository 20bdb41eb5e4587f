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


# --- session windows (third window kind: gap-merged, watermark-closed) ----

SESS_ROWS = [
    # user 1: two sessions split by a >= 30 min gap
    (1, "click", datetime(2022, 1, 1, 10, 0), 1.0),
    (1, "view", datetime(2022, 1, 1, 10, 20), 2.0),
    (1, "click", datetime(2022, 1, 1, 11, 30), 4.0),
    # user 2: one session; second event exactly 29 min later (in-gap)
    (2, "view", datetime(2022, 1, 1, 10, 0), 0.5),
    (2, "view", datetime(2022, 1, 1, 10, 29), 0.25),
    # user 3: boundary pin — exactly gap apart => still ONE session
    (3, "click", datetime(2022, 1, 1, 10, 0), 1.0),
    (3, "click", datetime(2022, 1, 1, 10, 30), 1.0),
]
FLUSH_ROW = [(9, "click", datetime(2022, 1, 2, 12, 0), 0.0)]


def test_session_windows_batch_semantics(spark):
    from clickhouse_github_log_importer_spark.streaming.windows import (
        sessionized_event_counts,
    )

    df = spark.createDataFrame(SESS_ROWS, DDL)
    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], r["total_value"]
        )
        for r in sessionized_event_counts(df, gap="30 minutes").collect()
    }
    assert got == {
        (1, "2022-01-01 10:00:00"): ("2022-01-01 10:50:00", 2, 3.0),
        (1, "2022-01-01 11:30:00"): ("2022-01-01 12:00:00", 1, 4.0),
        (2, "2022-01-01 10:00:00"): ("2022-01-01 10:59:00", 2, 0.75),
        # closed merge boundary: exactly-gap events DO merge
        (3, "2022-01-01 10:00:00"): ("2022-01-01 11:00:00", 2, 2.0),
    }


def test_session_windows_streaming_matches_batch(spark, tmp_path):
    from clickhouse_github_log_importer_spark.streaming.windows import (
        sessionized_event_counts,
    )

    d = str(tmp_path / "sess_src")
    spark.createDataFrame(SESS_ROWS, DDL).coalesce(1).write.parquet(d)
    # later file advances the watermark past every real session's end
    spark.createDataFrame(FLUSH_ROW, DDL).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    stream = (
        spark.readStream.schema(DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = sessionized_event_counts(
        stream, gap="30 minutes", watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.table("sess_smoke").filter("user_id != 9")
    batch = sessionized_event_counts(
        spark.createDataFrame(SESS_ROWS, DDL), gap="30 minutes"
    )
    assert _rows(streamed) == _rows(batch)


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
