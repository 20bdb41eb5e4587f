"""Streaming adjacency twin (streaming/adjacency_stream.py): the O(L)
incremental DP must equal the batch position DP
(_sequence_match_adjacent_users) — same declared-invisibility, bare-edge
adjacency, '.*', and timed-edge semantics — exactly once per user within
the watermark."""

from __future__ import annotations

import datetime as dt
import itertools
import random

from clickhouse_github_log_importer_spark.streaming.adjacency_stream import (
    advance_adjacency,
    compile_adjacency,
    fresh_vec,
    sequence_match_adjacent_streaming,
)

CONDS = ("signup", "click", "purchase", "view")
T0 = dt.datetime(2024, 3, 1, 10, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _us(minutes):
    return int(_ts(minutes).timestamp()) * 1_000_000


def _core_match(pattern, events, conds=CONDS):
    types, edges, adjacent = compile_adjacency(pattern, conds)
    ev = sorted(
        (t, e) for t, e in events if e in set(conds)
    )
    _, m = advance_adjacency(
        fresh_vec(len(types)), ev, types, edges, adjacent
    )
    return m is not None


def _brute_match(pattern, events, conds=CONDS):
    """Exponential reference: try every strictly-position-increasing
    assignment of pattern steps to declared events, checking adjacency
    and time constraints exactly as the batch docstring defines them."""
    from clickhouse_github_log_importer_spark.plans.queries import (
        _parse_seq_pattern,
    )

    steps, edges, adjacent = _parse_seq_pattern(
        pattern, with_adjacency=True
    )
    types = [conds[i - 1] for i in steps]
    ev = sorted((t, e) for t, e in events if e in set(conds))
    n, L = len(ev), len(types)
    for pos in itertools.combinations(range(n), L):
        ok = all(ev[pos[k]][1] == types[k] for k in range(L))
        if not ok:
            continue
        for k in range(1, L):
            if adjacent[k - 1] and pos[k] != pos[k - 1] + 1:
                ok = False
                break
            e = edges[k - 1]
            if e is not None:
                gap = ev[pos[k]][0] - ev[pos[k - 1]][0]
                op, T = e
                if not (
                    gap < T
                    if op == "<"
                    else gap <= T
                    if op == "<="
                    else gap > T
                    if op == ">"
                    else gap >= T
                    if op == ">="
                    # batch '==' pin: exact offset, T = 0 never matches
                    else (gap == T and T > 0)
                ):
                    ok = False
                    break
        if ok:
            return True
    return False


def test_core_matches_bruteforce_fuzz():
    rng = random.Random(1031)
    patterns = [
        "(?1)(?2)",
        "(?1).*(?2)",
        "(?2)(?3)(?2)",
        "(?1)(?t<3600)(?2)",
        "(?1)(?t>600)(?2)(?3)",
        "(?1)(?t<=1200)(?2).*(?3)",
        "(?2)(?2)",
        "(?1)(?t>=900).*(?2)(?3)",
    ]
    S = 1_000_000
    for trial in range(150):
        events = [
            (
                rng.randrange(0, 4000) * S,
                rng.choice(CONDS + ("error",)),
            )
            for _ in range(rng.randrange(1, 14))
        ]
        for pat in patterns:
            assert _core_match(pat, events) == _brute_match(pat, events), (
                pat,
                sorted(events),
            )


def test_core_matches_bruteforce_fuzz_exact_offset():
    """r11: '==' edges via the pruned predecessor deque — timestamps
    drawn on a coarse 600 s grid so exact offsets actually occur (a
    fine-grained draw would leave the edge vacuously unmatched)."""
    rng = random.Random(1033)
    patterns = [
        "(?1)(?t==600)(?2)",
        "(?1)(?t==1200)(?2)(?3)",
        "(?2)(?t==600)(?2).*(?3)",
        "(?1)(?t==0)(?2)",  # the batch's static never-qualifies pin
        "(?1)(?t<1800)(?2)(?t==600)(?3)",
    ]
    S = 1_000_000
    for trial in range(200):
        events = [
            (
                rng.randrange(0, 7) * 600 * S,
                rng.choice(CONDS + ("error",)),
            )
            for _ in range(rng.randrange(1, 14))
        ]
        for pat in patterns:
            assert _core_match(pat, events) == _brute_match(pat, events), (
                pat,
                sorted(events),
            )


def test_core_never_chains_event_with_itself():
    # one click must not satisfy (?2)(?2) (distinct positions required)
    assert not _core_match("(?2)(?2)", [(0, "click")])
    assert _core_match("(?2)(?2)", [(0, "click"), (1, "click")])


def test_timed_edge_uses_extremal_predecessor():
    S = 1_000_000
    # '<' must judge against the LATEST qualified signup: first signup
    # too old, second inside the bound
    ev = [(0, "signup"), (7000 * S, "signup"), (7200 * S, "click")]
    assert _core_match("(?1)(?t<3600)(?2)", ev)
    # '>' against the EARLIEST
    ev = [(0, "signup"), (3000 * S, "signup"), (3600 * S + 1, "click")]
    assert _core_match("(?1)(?t>3600)(?2)", ev)
    assert not _core_match(
        "(?1)(?t>3600)(?2)", [(3000 * S, "signup"), (3600 * S, "click")]
    )


def test_exact_offset_deque_prunes_and_matches():
    S = 1_000_000
    types, edges, adjacent = compile_adjacency(
        "(?1)(?t==600)(?2)", CONDS
    )
    # many signups, then a click exactly 600 s after the LAST one: the
    # deque must still hold that predecessor while entries older than
    # ts - T are pruned away
    ev = [(i * 600 * S, "signup") for i in range(50)]
    ev.append((50 * 600 * S, "click"))
    vec, m = advance_adjacency(fresh_vec(len(types)), ev, types,
                               edges, adjacent)
    assert m == 50 * 600 * S
    # pruning bound: after the run, the feeder deque holds only entries
    # within one T-window of the last processed event
    assert all(t >= 49 * 600 * S for t in vec[4][0])
    assert len(vec[4][0]) <= 2
    # off-grid offset never matches
    assert not _core_match(
        "(?1)(?t==600)(?2)", [(0, "signup"), (599 * S, "click")]
    )
    # (?t==0) is the batch's static never-qualifies pin
    assert not _core_match(
        "(?1)(?t==0)(?2)", [(0, "signup"), (0, "click")]
    )


def _stream_batch_pin(spark, tmp_path, pattern, rows, name):
    import os
    import time

    from clickhouse_github_log_importer_spark.plans.queries import (
        _sequence_match_adjacent_users,
    )
    from pyspark.sql import functions as F

    DDL = "user_id long, ts timestamp, event_type string, event_id long"
    flush = [(999, _ts(100000), "error", 10**6)]  # watermark advancer
    d = str(tmp_path / f"{name}_src")
    os.makedirs(d)
    batches = [rows[::2], rows[1::2], flush]
    for i, part in enumerate(batches):
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
    out = sequence_match_adjacent_streaming(
        stream.withWatermark("ts", "5 minutes"), pattern, CONDS
    )
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["user_id"] for r in spark.table(name).collect()}

    ev = spark.createDataFrame(rows, DDL).select(
        "user_id",
        (F.unix_timestamp("ts") * 1_000_000).alias("ts_us"),
        "event_id",
        "event_type",
    )
    batch = {
        r["user_id"]
        for r in _sequence_match_adjacent_users(
            spark, None, pattern, conds=CONDS, events=ev
        ).collect()
    }
    assert got == batch
    assert batch  # the fixture must actually exercise matches


def test_streaming_equals_batch_exact_offset(spark, tmp_path):
    # r11: '==' edge end-to-end through applyInPandasWithState — the
    # minute grid guarantees exact 600 s offsets occur
    rng = random.Random(31)
    rows, eid = [], 0
    for u in range(1, 30):
        for _ in range(rng.randrange(2, 12)):
            eid += 1
            rows.append(
                (
                    u,
                    _ts(rng.randrange(0, 30) * 10),
                    rng.choice(CONDS + ("error",)),
                    eid,
                )
            )
    _stream_batch_pin(
        spark, tmp_path, "(?1)(?t==600)(?2)", rows, "adj_eq_pin"
    )


def test_streaming_equals_batch_on_fixture(spark, tmp_path):
    import os
    import time

    from clickhouse_github_log_importer_spark.plans.queries import (
        _sequence_match_adjacent_users,
    )
    from pyspark.sql import functions as F

    DDL = "user_id long, ts timestamp, event_type string, event_id long"
    rng = random.Random(7)
    rows = []
    eid = 0
    for u in range(1, 25):
        for _ in range(rng.randrange(2, 12)):
            eid += 1
            rows.append(
                (
                    u,
                    _ts(rng.randrange(0, 300)),
                    rng.choice(CONDS + ("error",)),
                    eid,
                )
            )
    flush = [(999, _ts(100000), "error", 10**6)]  # watermark advancer

    pattern = "(?1)(?t<7200)(?2)(?3)"
    d = str(tmp_path / "adj_src")
    os.makedirs(d)
    batches = [rows[::2], rows[1::2], flush]
    for i, part in enumerate(batches):
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
    out = sequence_match_adjacent_streaming(
        stream.withWatermark("ts", "5 minutes"), pattern, CONDS
    )
    q = (
        out.writeStream.format("memory")
        .queryName("adj_stream_pin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["user_id"] for r in spark.table("adj_stream_pin").collect()
    }

    ev = spark.createDataFrame(rows, DDL).select(
        "user_id",
        (F.unix_timestamp("ts") * 1_000_000).alias("ts_us"),
        "event_id",
        "event_type",
    )
    batch = {
        r["user_id"]
        for r in _sequence_match_adjacent_users(
            spark, None, pattern, conds=CONDS, events=ev
        ).collect()
    }
    assert got == batch
    assert batch  # the fixture must actually exercise matches
