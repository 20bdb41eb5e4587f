"""Sessionization: batch semantics + custom stateful streaming operator."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators.sessions import (
    sessionize,
    sessionize_streaming,
)

US = 1_000_000
BASE = 1_700_000_000 * US  # epoch micros


def _events(spark):
    rows = [
        # user 1: two sessions (gap > 30 min between idx 1 and 2)
        (1, BASE + 0 * US, 1.0),
        (1, BASE + 60 * US, 2.0),
        (1, BASE + 3700 * US, 3.0),
        (1, BASE + 3760 * US, 4.0),
        # user 2: one session
        (2, BASE + 10 * US, 5.0),
    ]
    return spark.createDataFrame(rows, "user_id long, ts_us long, value double")


def test_sessionize_batch(spark):
    out = sessionize(_events(spark), gap_minutes=30)
    sessions = sorted(
        (r["user_id"], r["session_start_us"], r["n_events"], r["total_value"])
        for r in out.collect()
    )
    assert sessions == [
        (1, BASE, 2, 3.0),
        (1, BASE + 3700 * US, 2, 7.0),
        (2, BASE + 10 * US, 1, 5.0),
    ]


def test_sessionize_streaming_stateful(spark, tmp_path):
    # two micro-batches via file source; sessions must close on gap and
    # on watermark-driven state timeout
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    def write_batch(name, rows, mtime_offset):
        lines = "\n".join(f"{u},{ts},{v}" for u, ts, v in rows)
        path = os.path.join(in_dir, name)
        with open(path, "w") as f:
            f.write(lines + "\n")
        # the file source orders batches by modification time — pin it so
        # batch 1 really precedes batch 2 (same-second writes can flip)
        m = time.time() + mtime_offset
        os.utime(path, (m, m))

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def iso(sec):
        return (t0 + dt.timedelta(seconds=sec)).strftime("%Y-%m-%d %H:%M:%S")

    write_batch("b1.csv", [(1, iso(0), 1.0), (1, iso(60), 2.0)], -120)
    # second batch: an event far past the gap closes user 1's session and
    # advances the watermark so the timeout can flush
    write_batch("b2.csv", [(1, iso(7200), 3.0), (2, iso(7300), 4.0)], 0)

    raw = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .csv(in_dir)
    )
    withwm = raw.withWatermark("ts", "10 minutes")
    sessions = sessionize_streaming(withwm, gap_minutes=30)
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir).collect()
    closed = {
        (r["user_id"], r["n_events"], r["total_value"]) for r in got
    }
    # user 1's first session (2 events, value 3.0) must have been emitted
    # when the post-gap event arrived
    assert (1, 2, 3.0) in closed
