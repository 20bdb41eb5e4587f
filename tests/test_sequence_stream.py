"""match_events_streaming: the streaming sequenceMatchEvents twin must
emit each user's FIRST (click, purchase-within-bound) match with its
witness exactly once, count a qualifying click that arrives in a LATER
micro-batch than its purchase (out-of-order within the watermark), pin
the same-timestamp kind rule (click at tp qualifies), and stay silent
for unmatched users."""

from __future__ import annotations

import datetime as dt

from clickhouse_github_log_importer_spark.streaming.sequence_stream import (
    decide_first_match,
    match_events_streaming,
)

T0 = dt.datetime(2024, 3, 1, 10, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _us(minutes):
    return int(_ts(minutes).timestamp()) * 1_000_000


BOUND_US = 3_600_000_000  # 1 hour

# file 1: purchases land first; nothing later than 10:20 so the
# watermark stays behind every undecided purchase
F1 = [
    (1, _ts(0), "click", 1),
    (1, _ts(20), "purchase", 2),
    (2, _ts(10), "purchase", 10),
    (3, _ts(10), "purchase", 20),
    (4, _ts(10), "purchase", 30),
]
# file 2: the late-but-in-watermark click for user 2; user 4's second
# purchase (the first decides no-match); user 5's same-ts tie pin;
# user 3's click comes after its purchase (never qualifies)
F2 = [
    (2, _ts(5), "click", 11),
    (4, _ts(40), "click", 31),
    (4, _ts(50), "purchase", 32),
    (5, _ts(60), "click", 40),
    (5, _ts(60), "purchase", 41),
    (3, _ts(150), "click", 21),
]
F3 = [(9, _ts(600), "click", 99)]  # flush: advance the watermark

EXPECT = {
    1: (_us(0), 1, _us(20), 2),
    2: (_us(5), 11, _us(10), 10),
    4: (_us(40), 31, _us(50), 32),
    5: (_us(60), 40, _us(60), 41),
}
DDL = "user_id long, ts timestamp, event_type string, event_id long"


def test_decision_core_brute_force():
    clicks = [(_us(0), 1), (_us(5), 11)]
    purchases = [(_us(10), 10), (_us(20), 2)]
    m, und = decide_first_match(clicks, purchases, wm_ms=10**15, bound_us=BOUND_US)
    # first purchase in (ts, event_id) order wins; witness = latest click
    assert m == (_us(5), 11, _us(10), 10)
    assert und == []
    # watermark behind both purchases: nothing decided
    m, und = decide_first_match(clicks, purchases, wm_ms=0, bound_us=BOUND_US)
    assert m is None and len(und) == 2


def test_same_ts_click_qualifies():
    m, _ = decide_first_match(
        [(_us(60), 40)], [(_us(60), 41)], wm_ms=10**15, bound_us=BOUND_US
    )
    assert m == (_us(60), 40, _us(60), 41)


def test_streaming_first_match_witnesses(spark, tmp_path):
    import os
    import time

    d = str(tmp_path / "seq_src")
    os.makedirs(d)
    for i, rows in enumerate((F1, F2, F3)):
        path = os.path.join(d, f"b{i}.parquet")
        spark.createDataFrame(rows, DDL).coalesce(1).write.parquet(path)
        m = time.time() - 120 + 60 * i
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (m, m))

    stream = (
        spark.readStream.schema(DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = match_events_streaming(
        stream.withWatermark("ts", "10 minutes"), bound_us=BOUND_US
    )
    q = (
        out.writeStream.format("memory")
        .queryName("seq_match_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["user_id"]: (
            r["click_ts_us"],
            r["click_event_id"],
            r["purchase_ts_us"],
            r["purchase_event_id"],
        )
        for r in spark.table("seq_match_smoke").collect()
    }
    assert got == EXPECT  # u3 absent (click after purchase), u9 flush-only


def test_streaming_equals_batch_operator(spark):
    # the README claim, executable: the streaming extractor over the
    # full (in-watermark) event set equals the batch plan on the same
    # rows — same bound, same tie rules, same witness choice. The flush
    # user is excluded: its session is still open when the stream ends.
    from pyspark.sql import functions as F

    from clickhouse_github_log_importer_spark.plans.queries import (
        match_events_frame,
    )

    all_rows = F1 + F2 + F3
    ev = spark.createDataFrame(all_rows, DDL).select(
        "user_id",
        (F.unix_timestamp("ts") * 1_000_000).alias("ts_us"),
        "event_id",
        "event_type",
    )
    batch = {
        r["user_id"]: (
            r["click_ts_us"],
            r["click_event_id"],
            r["purchase_ts_us"],
            r["purchase_event_id"],
        )
        for r in match_events_frame(ev, bound_us=BOUND_US).collect()
    }
    assert batch == EXPECT
