"""Streaming backtracking-count twin (streaming/backtracking_stream.py):
the watermark-final incremental fold must reproduce the CH-exact batch
``sequence_count(matcher='backtracking')`` counts exactly — on real
corpus data via the pure core under chunked watermarks, and end-to-end
through applyInPandasWithState."""

from __future__ import annotations

import datetime as dt
import random

from clickhouse_github_log_importer_spark.streaming.backtracking_stream import (
    compile_bt,
    fold_final,
    sequence_count_backtracking_streaming,
)

CONDS = ("signup", "click", "purchase", "view")
T0 = dt.datetime(2024, 3, 1, 10, 0, 0)


def _core_counts(spark, sf, pattern, n_chunks=4):
    """All declared events per user through the pure incremental core,
    fed in n_chunks watermark steps, flushed at the end."""
    from pyspark.sql import functions as F

    from clickhouse_github_log_importer_spark.plans.queries import t

    tcodes, gaps, sym = compile_bt(pattern, CONDS)
    rows = (
        t(spark, sf, "events")
        .filter(F.col("event_type").isin(*set(CONDS)))
        .select("user_id", "ts_us", "event_id", "event_type")
        .collect()
    )
    per_user: dict[int, list] = {}
    lo, hi = None, None
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(
            (int(r["ts_us"]), int(r["event_id"]), sym[r["event_type"]])
        )
        lo = r["ts_us"] if lo is None else min(lo, r["ts_us"])
        hi = r["ts_us"] if hi is None else max(hi, r["ts_us"])
    wms = [
        lo + (hi - lo) * (i + 1) // n_chunks for i in range(n_chunks - 1)
    ]
    out = {}
    for u, evs in per_user.items():
        cnt, buf = 0, evs
        for wm in wms:
            new, buf = fold_final(buf, tcodes, gaps, wm)
            cnt += new
        new, buf = fold_final(buf, tcodes, gaps, None)
        cnt += new
        if cnt >= 1:
            out[u] = cnt
    return out


def test_core_matches_batch_backtracking(spark, sf_smoke):
    from clickhouse_github_log_importer_spark.operators.sequence_backtracking import (
        sequence_count_backtracking_users,
    )
    from clickhouse_github_log_importer_spark.plans.queries import (
        _SEQ_COUNT_BT_PATTERNS,
    )

    hit = 0
    for pat in _SEQ_COUNT_BT_PATTERNS:
        batch = {
            r["user_id"]: r["seq_count"]
            for r in sequence_count_backtracking_users(
                spark, sf_smoke, pat, CONDS
            ).collect()
        }
        assert _core_counts(spark, sf_smoke, pat) == batch, pat
        hit += len(batch)
    assert hit  # the corpus must exercise real counts


def test_streaming_counts_equal_batch(spark, tmp_path):
    import os
    import time

    from pyspark.sql import functions as F

    from clickhouse_github_log_importer_spark.operators.sequence_backtracking import (
        sequence_count_backtracking_users,
    )

    DDL = "user_id long, ts timestamp, event_type string, event_id long"
    rng = random.Random(47)
    rows, eid = [], 0
    for u in range(1, 20):
        for _ in range(rng.randrange(3, 14)):
            eid += 1
            rows.append(
                (
                    u,
                    T0 + dt.timedelta(minutes=rng.randrange(0, 600)),
                    rng.choice(CONDS + ("error",)),
                    eid,
                )
            )
    flush = [(999, T0 + dt.timedelta(days=400), "error", 10**6)]
    # an 'adj' + '<' pattern: the finality gate genuinely defers here
    pattern = "(?2)(?t<7200)(?3)"

    d = str(tmp_path / "bt_src")
    os.makedirs(d)
    for i, part in enumerate((rows[::2], rows[1::2], flush)):
        path = os.path.join(d, f"b{i}.parquet")
        spark.createDataFrame(part, DDL).coalesce(1).write.parquet(path)
        m = time.time() - 120 + 60 * i
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (m, m))

    stream = (
        spark.readStream.schema(DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = sequence_count_backtracking_streaming(
        stream.withWatermark("ts", "5 minutes"), pattern, CONDS
    )
    q = (
        out.writeStream.format("memory")
        .queryName("bt_stream_pin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got: dict[int, int] = {}
    for r in spark.table("bt_stream_pin").collect():
        got[r["user_id"]] = max(got.get(r["user_id"], 0), r["seq_count"])

    ev = spark.createDataFrame(rows, DDL).select(
        "user_id",
        (F.unix_timestamp("ts") * 1_000_000).alias("ts_us"),
        "event_id",
        "event_type",
    )
    batch = {
        r["user_id"]: r["seq_count"]
        for r in sequence_count_backtracking_users(
            spark, None, pattern, CONDS, events=ev
        ).collect()
    }
    assert got == batch
    assert batch  # fixture must exercise real counts


def test_streaming_adj_pattern_equal_batch(spark, tmp_path):
    """Bare-adjacency pattern end-to-end: the trailing-position 'adj'
    deferral must resolve once the next declared event (or eviction)
    decides it."""
    import os
    import time

    from pyspark.sql import functions as F

    from clickhouse_github_log_importer_spark.operators.sequence_backtracking import (
        sequence_count_backtracking_users,
    )

    DDL = "user_id long, ts timestamp, event_type string, event_id long"
    rng = random.Random(48)
    rows, eid = [], 0
    for u in range(1, 16):
        for _ in range(rng.randrange(2, 10)):
            eid += 1
            rows.append(
                (
                    u,
                    T0 + dt.timedelta(minutes=rng.randrange(0, 300)),
                    rng.choice(CONDS),
                    eid,
                )
            )
    flush = [(999, T0 + dt.timedelta(days=400), "view", 10**6)]
    pattern = "(?1)(?2)"

    d = str(tmp_path / "bt_adj_src")
    os.makedirs(d)
    for i, part in enumerate((rows[::2], rows[1::2], flush)):
        path = os.path.join(d, f"b{i}.parquet")
        spark.createDataFrame(part, DDL).coalesce(1).write.parquet(path)
        m = time.time() - 120 + 60 * i
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (m, m))

    stream = (
        spark.readStream.schema(DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = sequence_count_backtracking_streaming(
        stream.withWatermark("ts", "5 minutes"), pattern, CONDS
    )
    q = (
        out.writeStream.format("memory")
        .queryName("bt_adj_stream_pin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got: dict[int, int] = {}
    for r in spark.table("bt_adj_stream_pin").collect():
        got[r["user_id"]] = max(got.get(r["user_id"], 0), r["seq_count"])

    ev = spark.createDataFrame(rows, DDL).select(
        "user_id",
        (F.unix_timestamp("ts") * 1_000_000).alias("ts_us"),
        "event_id",
        "event_type",
    )
    batch = {
        r["user_id"]: r["seq_count"]
        for r in sequence_count_backtracking_users(
            spark, None, pattern, CONDS, events=ev
        ).collect()
    }
    assert got == batch
    assert batch


def test_match_twin_divergence_pins_core():
    """sequence_match existence under the streaming backtracking core:
    fold_final (chunked + flushed) must report count>=1 exactly where
    the batch backtracking matcher matches, on the pinned
    greedy-vs-backtracking divergence fixtures — the greedy streams
    would say NO MATCH on every one of these."""
    from tests.test_sequence_backtracking import DIVERGENCE_PINS, M, SYM

    from clickhouse_github_log_importer_spark.operators.sequence_backtracking import (
        compile_backtracking,
    )
    from clickhouse_github_log_importer_spark.streaming.backtracking_stream import (
        fold_final,
    )

    CONDS4 = ("A", "B", "C", "D")
    for pat, et, ts_s, _greedy, bt_want in DIVERGENCE_PINS:
        types, gaps = compile_backtracking(pat, CONDS4, "existence")
        tcodes = tuple(SYM[t] for t in types)
        evs = [
            (t_ * M, i, SYM[e]) for i, (e, t_) in enumerate(zip(et, ts_s))
        ]
        hi = max(t_ for t_, _, _ in evs)
        cnt, buf = 0, evs
        for wm in (hi // 2, hi + 1):
            new, buf = fold_final(buf, tcodes, gaps, wm)
            cnt += new
        new, buf = fold_final(buf, tcodes, gaps, None)
        cnt += new
        assert (cnt >= 1) == (bt_want >= 1), (pat, et, ts_s, cnt)


def test_match_twin_streaming_end_to_end(spark, tmp_path):
    """sequence_match_backtracking_streaming emits exactly one
    (user_id, true) row per matching user, none for non-matchers."""
    import os
    import time

    from clickhouse_github_log_importer_spark.streaming.backtracking_stream import (
        sequence_match_backtracking_streaming,
    )

    DDL = "user_id long, ts timestamp, event_type string, event_id long"
    # user 1: the pinned '<' divergence shape (greedy 0, backtracking 1)
    # user 2: no match; user 3: two full matches -> still ONE row
    rows = [
        (1, T0 + dt.timedelta(seconds=0), "signup", 1),
        (1, T0 + dt.timedelta(seconds=2), "signup", 2),
        (1, T0 + dt.timedelta(seconds=10), "click", 3),
        (2, T0 + dt.timedelta(seconds=1), "signup", 4),
        (3, T0 + dt.timedelta(seconds=0), "signup", 5),
        (3, T0 + dt.timedelta(seconds=3), "click", 6),
        (3, T0 + dt.timedelta(seconds=6), "signup", 7),
        (3, T0 + dt.timedelta(seconds=9), "click", 8),
    ]
    flush = [(999, T0 + dt.timedelta(days=400), "view", 10**6)]
    pattern = "(?1)(?t<10)(?2)"

    d = str(tmp_path / "bt_match_src")
    os.makedirs(d)
    for i, part in enumerate((rows[::2], rows[1::2], flush)):
        path = os.path.join(d, f"b{i}.parquet")
        spark.createDataFrame(part, DDL).coalesce(1).write.parquet(path)
        m = time.time() - 120 + 60 * i
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (m, m))

    stream = (
        spark.readStream.schema(DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = sequence_match_backtracking_streaming(
        stream.withWatermark("ts", "5 minutes"), pattern, CONDS
    )
    q = (
        out.writeStream.format("memory")
        .queryName("bt_match_pin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["matched"])
        for r in spark.table("bt_match_pin").collect()
    )
    assert got == [(1, True), (3, True)]
