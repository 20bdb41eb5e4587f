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


# --- _cascade pruning-invariant fuzz (moved here from the driver entry's
# hot loop in r12: the stream_funnel_cascade_fold kernel now batches the
# no-op spans and runs ONE end-of-stream cascade per user; THIS test is
# where the per-event invariant lives) ---------------------------------


def _brute(su, cks, pus):
    """Unpruned reference: earliest valid cascade over FULL buffers."""
    ck = min((c for c in cks if su is not None and c > su), default=None)
    pu = min((p for p in pus if ck is not None and p > ck), default=None)
    return ck, pu


def test_cascade_pruning_invariant_every_prefix_every_order():
    """After EVERY event, in ANY arrival order, the cascade over the
    PRUNED buffers equals the cascade over the full unpruned history —
    i.e. pruning never discards an entry that could still become the
    answer. This is the invariant the driver entry hash-verified
    per-event through r11; it is exhaustive-fuzzed here instead."""
    import itertools
    import random

    from clickhouse_github_log_importer_spark.streaming.funnel_stream import (
        _cascade,
    )

    rng = random.Random(0xF04E12)

    def run_stream(events):
        su, cks, pus = None, [], []
        full_c, full_p = [], []
        for kind, t_us in events:
            if kind == "s":
                if su is None or t_us < su:
                    su = t_us
            elif kind == "c":
                cks.append(t_us)
                full_c.append(t_us)
            else:
                pus.append(t_us)
                full_p.append(t_us)
            ck, pu, cks, pus = _cascade(su, cks, pus)
            assert (ck, pu) == _brute(su, full_c, full_p), (
                events, su, cks, pus, full_c, full_p,
            )
        return su, ck if events else None, pu if events else None

    # exhaustive over tiny streams: every multiset of <=5 events drawn
    # from 3 stage kinds x 4 timestamps, every arrival order (sampled
    # when the permutation space is large)
    kinds_ts = [(k, t) for k in "scp" for t in (10, 20, 30, 40)]
    for n in (1, 2, 3):
        for combo in itertools.combinations_with_replacement(kinds_ts, n):
            for perm in itertools.permutations(combo):
                run_stream(list(perm))
    # randomized larger streams, duplicate timestamps included
    for _ in range(400):
        n = rng.randint(4, 14)
        events = [
            (rng.choice("scp"), rng.choice(range(0, 100, 5)))
            for _ in range(n)
        ]
        run_stream(events)


def test_cascade_end_of_stream_equals_per_event_fold():
    """The r12 kernel shortcut — one cascade over the END-OF-STREAM
    pruned buffers — must emit exactly what the per-event fold emits,
    for ascending-(ts, tie) batch order (the order the kernel sees)."""
    import random

    from clickhouse_github_log_importer_spark.streaming.funnel_stream import (
        _cascade,
    )

    rng = random.Random(0xBEEF12)
    for _ in range(500):
        n = rng.randint(1, 16)
        events = sorted(
            (rng.choice(range(0, 120, 3)), rng.choice("scp"))
            for _ in range(n)
        )
        # per-event fold (the r11 kernel)
        su, cks, pus = None, [], []
        ck = pu = None
        for t_us, kind in events:
            if kind == "s" and (su is None or t_us < su):
                su = t_us
            elif kind == "c":
                cks.append(t_us)
            elif kind == "p":
                pus.append(t_us)
            ck, pu, cks, pus = _cascade(su, cks, pus)
        # end-of-stream single cascade over vectorized pruned buffers
        # (mirrors the kernel: su = min signup; clicks <= su + best
        # click; purchases <= best click + best purchase)
        sus = [t for t, k in events if k == "s"]
        su2 = min(sus) if sus else None
        all_c = [t for t, k in events if k == "c"]
        all_p = [t for t, k in events if k == "p"]
        best_c = min((c for c in all_c if su2 is not None and c > su2),
                     default=None)
        cb = [c for c in all_c if su2 is None or c <= su2]
        if best_c is not None:
            cb.append(best_c)
        best_p = min((p for p in all_p if best_c is not None and p > best_c),
                     default=None)
        pb = [p for p in all_p if best_c is None or p <= best_c]
        if best_p is not None:
            pb.append(best_p)
        ck2, pu2, _, _ = _cascade(su2, cb, pb)
        assert (su, ck, pu) == (su2, ck2, pu2), events
