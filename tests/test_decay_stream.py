"""time_decayed_user_stats_stream: the exponentialTimeDecayed* streaming
twin — O(1) telescoped per-user state must emit exactly once per quiet
user, equal the batch twin AND the registry entry, and out-of-order
events must not change the result (the update is order-free by
construction)."""

from __future__ import annotations

import datetime as dt
import math
import os
import time

from clickhouse_github_log_importer_spark.streaming.decay_stream import (
    time_decayed_user_stats_stream,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
TAU = 21_600_000_000


def _iso(sec):
    return (T0 + dt.timedelta(seconds=sec)).strftime("%Y-%m-%d %H:%M:%S")


# (user_id, ts_sec, value) — u1's rows arrive OUT OF ORDER; u2 single
ROWS_B1 = [(1, 7200, 0.5), (2, 100, 2.0)]
ROWS_B2 = [(1, 0, 1.0), (1, 3600, 4.0)]  # both EARLIER than u1's 7200


def _expect():
    out = {}
    for uid, evs in (
        (1, [(0, 1.0), (3600, 4.0), (7200, 0.5)]),
        (2, [(100, 2.0)]),
    ):
        anchor = max(t for t, _ in evs) * 1_000_000
        ws = [math.exp((t * 1_000_000 - anchor) / TAU) for t, _ in evs]
        wv = [w * v for w, (_, v) in zip(ws, evs)]
        out[uid] = (
            len(evs),
            round(sum(ws), 6),
            round(sum(wv), 6),
            round(sum(wv) / sum(ws), 6),
            round(max(wv), 6),
        )
    return out


def _write_batch(in_dir, name, rows, mtime_offset):
    lines = "\n".join(f"{u},{v},{_iso(t)}" for u, t, v in rows)
    path = os.path.join(in_dir, name)
    with open(path, "w") as f:
        f.write(lines + "\n")
    m = time.time() + mtime_offset
    os.utime(path, (m, m))


def _row_tuple(r):
    return (
        r["n_events"],
        round(r["decayed_count"], 6),
        round(r["decayed_value_sum"], 6),
        round(r["decayed_value_avg"], 6),
        round(r["decayed_value_max"], 6),
    )


def test_stream_emits_once_and_matches_direct_math(spark, tmp_path):
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(in_dir)
    _write_batch(in_dir, "b1.csv", ROWS_B1, -120)
    _write_batch(in_dir, "b2.csv", ROWS_B2, -60)
    # flush: advance the watermark past every event above
    _write_batch(in_dir, "b3.csv", [(99, 90000, 1.0)], 0)

    raw = (
        spark.readStream.schema("user_id long, value double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .csv(in_dir)
    )
    q = (
        time_decayed_user_stats_stream(raw, watermark="1 minute")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = [
        r for r in spark.read.parquet(out_dir).collect() if r["user_id"] != 99
    ]
    assert len(rows) == 2  # exactly once per user
    got = {r["user_id"]: _row_tuple(r) for r in rows}
    want = _expect()
    for uid, exp in want.items():
        g = got[uid]
        assert g[0] == exp[0]
        for a, b in zip(g[1:], exp[1:]):
            assert abs(a - b) < 1e-6, (uid, g, exp)


def test_batch_twin_matches_registry_entry(spark, sf_smoke):
    from clickhouse_github_log_importer_spark.plans.queries import (
        REGISTRY,
        t,
    )

    ev = t(spark, sf_smoke, "events")
    lib = {
        r["user_id"]: _row_tuple(r)
        for r in time_decayed_user_stats_stream(ev).collect()
    }
    reg = {
        r["user_id"]: _row_tuple(r)
        for r in REGISTRY["time_decayed_user_stats"]
        .spark(spark, sf_smoke)
        .collect()
    }
    assert lib.keys() == reg.keys() and lib
    for uid in reg:
        assert lib[uid][0] == reg[uid][0]
        for a, b in zip(lib[uid][1:], reg[uid][1:]):
            assert abs(a - b) < 1e-6, uid
