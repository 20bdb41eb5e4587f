"""lww_dedup_stream: ReplacingMergeTree(ver) streaming twin — per key
the max-(version, tiebreak) row must emit exactly once after the
watermark passes, out-of-order versions across micro-batches must not
matter, and batch mode must equal the stream and a direct python fold."""

from __future__ import annotations

import datetime as dt
import os
import time

from clickhouse_github_log_importer_spark.streaming.dedup_stream import (
    lww_dedup_stream,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _iso(sec):
    return (T0 + dt.timedelta(seconds=sec)).strftime("%Y-%m-%d %H:%M:%S")


ROWS_B1 = [
    # key A: v2 arrives FIRST, v1 second (out of order) -> keep v2
    ("A", 2, 10, _iso(0)),
    ("A", 1, 11, _iso(5)),
    # key B: single row
    ("B", 7, 20, _iso(3)),
]
ROWS_B2 = [
    # key A: an even newer version in a later micro-batch
    ("A", 3, 12, _iso(20)),
    # key C: equal versions -> tiebreak picks max id
    ("C", 5, 31, _iso(10)),
    ("C", 5, 30, _iso(12)),
]
EXPECT = {"A": (3, 12, 3), "B": (7, 20, 1), "C": (5, 31, 2)}


def _write_batch(in_dir, name, rows, mtime_offset):
    lines = "\n".join(f"{k},{v},{tb},{ts}" for k, v, tb, ts in rows)
    path = os.path.join(in_dir, name)
    with open(path, "w") as f:
        f.write(lines + "\n")
    m = time.time() + mtime_offset
    os.utime(path, (m, m))


def test_stream_emits_lww_winner_once(spark, tmp_path):
    in_dir, out_dir, ckpt = (
        str(tmp_path / d) for d in ("in", "out", "ckpt")
    )
    os.makedirs(in_dir)
    _write_batch(in_dir, "b1.csv", ROWS_B1, -120)
    _write_batch(in_dir, "b2.csv", ROWS_B2, -60)
    # flush: advance the watermark past every event above
    _write_batch(in_dir, "b3.csv", [("Z", 1, 1, _iso(900))], 0)

    raw = (
        spark.readStream.schema(
            "event_id string, from_api long, id long, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .csv(in_dir)
    )
    out = lww_dedup_stream(raw, watermark="1 minute")
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.read.parquet(out_dir).collect()
    got = {
        r["key"]: (r["version"], r["tiebreak"], r["n_dups"])
        for r in rows
        if r["key"] != "Z"
    }
    assert len([r for r in rows if r["key"] != "Z"]) == 3  # exactly once
    assert got == EXPECT


def test_batch_twin_matches_python_fold(spark):
    sdf = spark.createDataFrame(
        ROWS_B1 + ROWS_B2, "event_id string, from_api long, id long, ts string"
    ).selectExpr("event_id", "from_api", "id", "CAST(ts AS TIMESTAMP) AS ts")
    got = {
        r["key"]: (r["version"], r["tiebreak"], r["n_dups"])
        for r in lww_dedup_stream(sdf).collect()
    }
    assert got == EXPECT


def test_out_of_order_duplicate_never_rearms_timer_backward(spark, tmp_path):
    # review r8 regression: key D's newest event (200 s) arrives FIRST;
    # a later batch brings an OLDER in-horizon duplicate (150 s). With a
    # batch-local timer the 150 s row pulled the timeout before 200 s,
    # so the winner emitted prematurely (watermark 170 s < 200 s) and a
    # follow-up duplicate (190 s) produced a SECOND winner row. With
    # last_ms carried in state, all four D rows collapse to ONE row.
    in_dir, out_dir, ckpt = (
        str(tmp_path / d) for d in ("in", "out", "ckpt")
    )
    os.makedirs(in_dir)
    _write_batch(
        in_dir,
        "b1.csv",
        [("D", 4, 40, _iso(200)), ("E", 1, 1, _iso(200))],
        -240,
    )
    _write_batch(in_dir, "b2.csv", [("D", 2, 41, _iso(150))], -180)
    # watermark after b3 = 230 - 60 = 170 s: past the buggy 150 s timer,
    # NOT past D's true latest event (200 s)
    _write_batch(in_dir, "b3.csv", [("E", 1, 2, _iso(230))], -120)
    _write_batch(in_dir, "b4.csv", [("D", 3, 42, _iso(190))], -60)
    _write_batch(in_dir, "b5.csv", [("Z", 1, 1, _iso(900))], 0)

    raw = (
        spark.readStream.schema(
            "event_id string, from_api long, id long, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .csv(in_dir)
    )
    q = (
        lww_dedup_stream(raw, watermark="1 minute")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    d_rows = [
        r for r in spark.read.parquet(out_dir).collect() if r["key"] == "D"
    ]
    assert len(d_rows) == 1, d_rows  # exactly one winner row
    assert (
        d_rows[0]["version"],
        d_rows[0]["tiebreak"],
        d_rows[0]["n_dups"],
    ) == (4, 40, 3)
