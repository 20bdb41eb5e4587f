"""Streaming funnel: completion records must match the batch operator's
stage times for users that convert (exact within the watermark — emission
waits until the watermark passes the purchase), late-but-within-watermark
prerequisite stages arriving in later micro-batches must still count,
a user emits at most one conversion record, and unconverted users emit
nothing."""

from __future__ import annotations

import datetime as dt
import os
import time

from clickhouse_github_log_importer_spark.streaming.funnel_stream import (
    funnel_streaming,
)


def test_funnel_streaming_matches_batch_semantics(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def iso(sec):
        return (t0 + dt.timedelta(seconds=sec)).strftime("%Y-%m-%d %H:%M:%S")

    def us(sec):
        return int((t0 + dt.timedelta(seconds=sec)).timestamp() * 1_000_000)

    def write_batch(name, rows, mtime_offset):
        lines = "\n".join(f"{u},{ts},{et}" for u, ts, et in rows)
        path = os.path.join(in_dir, name)
        with open(path, "w") as f:
            f.write(lines + "\n")
        m = time.time() + mtime_offset
        os.utime(path, (m, m))

    # user 1 converts across batches: signup in b1, click+purchase in b2.
    #   the out-of-order click at iso(5) (BEFORE the signup) must not count.
    # user 2 clicks before signing up -> never completes -> no emission.
    # user 3 converts within one batch, strictly ordered.
    # user 4 is the ADVICE scenario: purchase and click arrive FIRST (b1),
    #   the prerequisite signup arrives in a LATER batch (b2) but with an
    #   EARLIER event time — buffering must recover the conversion.
    # user 5 completes two full sequences -> exactly ONE emitted record
    #   (the earliest funnel), matching the batch twin's one-row-per-user.
    write_batch(
        "b1.csv",
        [
            (1, iso(5), "click"),
            (1, iso(10), "signup"),
            (2, iso(0), "click"),
            (2, iso(20), "signup"),
            (3, iso(0), "signup"),
            (3, iso(1), "click"),
            (3, iso(2), "purchase"),
            (4, iso(50), "purchase"),
            (4, iso(30), "click"),
            (5, iso(0), "signup"),
            (5, iso(1), "click"),
            (5, iso(2), "purchase"),
        ],
        -120,
    )
    write_batch(
        "b2.csv",
        [
            (1, iso(30), "click"),
            (1, iso(40), "purchase"),
            (2, iso(30), "purchase"),  # no valid click yet -> ignored
            (4, iso(20), "signup"),  # late prerequisite, within watermark
            (5, iso(100), "signup"),  # second full sequence for user 5
            (5, iso(101), "click"),
            (5, iso(102), "purchase"),
        ],
        -60,
    )
    # flush batch: a lone far-future event advances the watermark past
    # every purchase above so all completed funnels finalize and emit
    write_batch("b3.csv", [(99, iso(800), "signup")], 0)

    raw = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .csv(in_dir)
    )
    out = funnel_streaming(raw.withWatermark("ts", "1 minute"))
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
    assert len(rows) == len({r["user_id"] for r in rows})  # one record/user
    got = {
        r["user_id"]: (r["signup_us"], r["click_us"], r["purchase_us"])
        for r in rows
    }
    assert got == {
        1: (us(10), us(30), us(40)),
        3: (us(0), us(1), us(2)),
        4: (us(20), us(30), us(50)),
        5: (us(0), us(1), us(2)),
    }
