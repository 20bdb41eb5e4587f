"""Semantic invariants for the behavioral-analytics and audit entries —
properties that must hold on ANY events/documents data, complementing the
exact DuckDB parity in test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.plans.queries import REGISTRY, t


def test_funnel_stages_monotonic(spark, sf_smoke):
    row = REGISTRY["event_funnel_conversion"].spark(spark, sf_smoke).first()
    assert row["n_signup"] >= row["n_click_after"] >= row["n_purchase_after"]
    assert row["n_purchase_after"] >= 0


def test_retention_week0_counts_every_cohort_user(spark, sf_smoke):
    # every user is active in their own cohort week, so the offset-0 cell
    # of each cohort equals the cohort's size, and offsets are never
    # negative
    ret = REGISTRY["retention_cohorts"].spark(spark, sf_smoke).collect()
    assert all(r["week_offset"] >= 0 for r in ret)
    week0 = {r["cohort_week"]: r["n_users"] for r in ret if r["week_offset"] == 0}
    ev = t(spark, sf_smoke, "events")
    firsts = (
        ev.groupBy("user_id")
        .agg(F.min("ts_us").alias("f"))
        .select(
            F.date_format(
                F.date_trunc("week", F.timestamp_micros("f")), "yyyy-MM-dd"
            ).alias("cw")
        )
        .groupBy("cw")
        .count()
        .collect()
    )
    assert week0 == {r["cw"]: r["count"] for r in firsts}


def test_transitions_conserve_event_count(spark, sf_smoke):
    # sum of transition counts == total events - number of users (each
    # user's event chain has len-1 transitions)
    tr = REGISTRY["event_type_transitions"].spark(spark, sf_smoke)
    total_transitions = tr.agg(F.sum("n")).first()[0]
    ev = t(spark, sf_smoke, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total_transitions == n_events - n_users


def _write_events(tmp_path, rows):
    # rows: (event_id, ts_us, user_id, event_type[, value])
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [float(r[4]) if len(r) > 4 else 1.0 for r in rows],
            "props": ["{}"] * len(rows),
        }
    )
    tbl = pa.Table.from_pandas(df, preserve_index=False).cast(
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_window_funnel_edge_semantics(spark, tmp_path):
    # Adversarial fixture for the r5 linear-fold rework, pinning the
    # strict-inequality chain semantics t1 < t2 < t3 <= t1 + W that the
    # oracle's greedy-min formulation defines:
    #  u1: signup(0) click(0) purchase(0)      -> all ties, level 1
    #  u2: signup(0) click(1) purchase(W)      -> exactly at window end, 3
    #  u3: signup(0) click(1) purchase(W+1)    -> purchase past window, 2
    #  u4: click(0) signup(1) purchase(2)      -> click precedes signup, 1
    #  u5: signup(0) click(W+1)                -> click past window, 1
    #  u6: signup(0) purchase(1) click(2)      -> wrong stage order, 2
    #       (click in window => level 2, but no purchase AFTER a click)
    #  u7: signup(0) click(W+1) signup(W)
    #       purchase(W+2)                      -> later signup rescues the
    #       chain (click at W+1 > W is within u7's second signup's window,
    #       purchase W+2 too): level 3 — the case a naive "first signup
    #       only" fold gets wrong
    #  u8: purchase(0) click(1)                -> no signup: excluded
    W = 24 * 3600 * 1000000
    rows = [
        (1, 0, 1, "signup"), (2, 0, 1, "click"), (3, 0, 1, "purchase"),
        (4, 0, 2, "signup"), (5, 1, 2, "click"), (6, W, 2, "purchase"),
        (7, 0, 3, "signup"), (8, 1, 3, "click"), (9, W + 1, 3, "purchase"),
        (10, 0, 4, "click"), (11, 1, 4, "signup"), (12, 2, 4, "purchase"),
        (13, 0, 5, "signup"), (14, W + 1, 5, "click"),
        (15, 0, 6, "signup"), (16, 1, 6, "purchase"), (17, 2, 6, "click"),
        (18, 0, 7, "signup"), (19, W + 1, 7, "click"), (20, W, 7, "signup"),
        (21, W + 2, 7, "purchase"),
        (22, 0, 8, "purchase"), (23, 1, 8, "click"),
    ]
    sf = _write_events(tmp_path, rows)
    got = {
        r["funnel_level"]: r["n_users"]
        for r in REGISTRY["window_funnel_levels"].spark(spark, sf).collect()
    }
    # u4 level 1? u4: click(0) signup(1) purchase(2): no click after the
    # signup, so level 1.  Expected: levels {1: u1,u4,u5 -> 3,
    # 2: u3,u6 -> 2, 3: u2,u7 -> 2}
    assert got == {1: 3, 2: 2, 3: 2}

    # and the DuckDB oracle agrees on the same fixture
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    odf = con.execute(REGISTRY["window_funnel_levels"].oracle).fetchdf()
    assert {
        int(r.funnel_level): int(r.n_users) for r in odf.itertuples()
    } == got


def test_recall_bounded_and_complete(spark, sf_smoke):
    rep = REGISTRY["ann_recall_report"].spark(spark, sf_smoke).collect()
    assert len(rep) == 8  # one row per query vector
    for r in rep:
        assert 0 <= r["n_matched"] <= 3
        assert abs(r["recall_at_3"] - round(r["n_matched"] / 3, 6)) < 1e-12


def test_dup_rate_consistent(spark, sf_smoke):
    rep = REGISTRY["dedup_rate_by_source"].spark(spark, sf_smoke).collect()
    assert rep  # documents always have at least one source
    for r in rep:
        assert 1 <= r["n_unique"] <= r["n_docs"]
        assert 0.0 <= r["dup_rate"] < 1.0


def test_ema_segmented_equals_flat_fold(spark, tmp_path):
    # The r6 affine segmented scan must equal the flat seeded left fold
    # acc = v1; acc = 0.25*v + 0.75*acc — on users whose histories span
    # several hour buckets, sit inside one bucket, or have one event.
    HOUR = 3600 * 1000000
    rows, eid = [], 0
    streams = {
        1: [(i * HOUR // 3, (i * 37 % 101) + 0.17) for i in range(10)],  # ~4 buckets
        2: [(i * 1000, (i * 53 % 89) + 0.41) for i in range(7)],         # one bucket
        3: [(5 * HOUR, 42.13)],                                          # single event
        4: [(i * 7 * HOUR, (i * 11 % 13) + 0.99) for i in range(6)],     # 1/bucket
    }
    for uid, evs in streams.items():
        for ts_us, val in evs:
            eid += 1
            rows.append((eid, ts_us, uid, "click", val))
    sf = _write_events(tmp_path, rows)
    got = {
        r["user_id"]: (r["n_events"], r["ema"])
        for r in REGISTRY["ema_user_value"].spark(spark, sf).collect()
    }
    for uid, evs in streams.items():
        acc = None
        for _, val in evs:
            v = round(val * 100)
            acc = float(v) if acc is None else 0.25 * v + 0.75 * acc
        n, ema = got[uid]
        assert n == len(evs)
        # `ema` is round(.,4); regrouped double arithmetic may also differ
        # in the last ulp from the flat fold — allow the half-step
        assert abs(ema - acc) <= 5.001e-5, (uid, ema, acc)

    # and the DuckDB oracle mirrors the segmentation bit-for-bit
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    odf = con.execute(REGISTRY["ema_user_value"].oracle).fetchdf()
    assert {
        int(r.user_id): (int(r.n_events), float(r.ema))
        for r in odf.itertuples()
    } == {int(u): (int(n), float(e)) for u, (n, e) in got.items()}


def test_moving_sum_cap_saturation(spark, tmp_path):
    # groupArrayMovingSum saturation contract (r6): positions past the
    # cap are dropped, `truncated` flags it, `n_events` stays the true
    # total — uniqUpTo-style honesty instead of an unbounded per-key
    # array.
    from clickhouse_github_log_importer_spark.plans.queries import (
        _moving_sum_arrays,
    )

    rows = [
        # user 1: 7 events, values 1..7 (cents 100..700)
        *[(i, i * 1000, 1, "click", float(i)) for i in range(1, 8)],
        # user 2: 2 events
        (10, 0, 2, "click", 5.0),
        (11, 1000, 2, "click", 6.0),
    ]
    sf = _write_events(tmp_path, rows)
    out = {
        r["user_id"]: r
        for r in _moving_sum_arrays(t(spark, sf, "events"), cap=3).collect()
    }
    u1 = out[1]
    assert (u1["n_events"], u1["truncated"]) == (7, True)
    assert u1["moving3_cents"] == "100,300,600"  # first 3 positions only
    u2 = out[2]
    assert (u2["n_events"], u2["truncated"]) == (2, False)
    assert u2["moving3_cents"] == "500,1100"


def test_sequence_match_edge_semantics(spark, tmp_path):
    # sequenceMatch('(?1)(?t<3600)(?2)(?3)') pinning, T = 3600 s:
    #  u1: signup(0) click(T-1) purchase(T)      -> matched (edge < T)
    #  u2: signup(0) click(T) purchase(T+1)      -> NOT matched (c-s == T)
    #  u3: signup(0) click(1) purchase(1)        -> NOT matched (purchase
    #      must be strictly after the click)
    #  u4: purchase(0) signup(1) click(2)        -> NOT matched (purchase
    #      precedes the chain)
    #  u5: signup(0) click(T+10) signup(T)
    #      purchase(T+20)                        -> matched: the LATER
    #      signup qualifies the click (latest-predecessor rule) — the
    #      case a first-signup-only fold gets wrong
    #  u6: click(0) purchase(1)                  -> no signup: excluded
    T = 3600 * 1000000
    rows = [
        (1, 0, 1, "signup"), (2, T - 1, 1, "click"), (3, T, 1, "purchase"),
        (4, 0, 2, "signup"), (5, T, 2, "click"), (6, T + 1, 2, "purchase"),
        (7, 0, 3, "signup"), (8, 1, 3, "click"), (9, 1, 3, "purchase"),
        (10, 0, 4, "purchase"), (11, 1, 4, "signup"), (12, 2, 4, "click"),
        (13, 0, 5, "signup"), (14, T + 10, 5, "click"),
        (15, T, 5, "signup"), (16, T + 20, 5, "purchase"),
        (17, 0, 6, "click"), (18, 1, 6, "purchase"),
    ]
    sf = _write_events(tmp_path, rows)
    row = REGISTRY["sequence_match_pattern"].spark(spark, sf).first()
    assert (row["n_matched"], row["n_signup_users"]) == (2, 5)

    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    odf = con.execute(REGISTRY["sequence_match_pattern"].oracle).fetchdf()
    assert (int(odf.n_matched[0]), int(odf.n_signup_users[0])) == (2, 5)


def test_sequence_match_min_gap_edge_semantics(spark, tmp_path):
    # sequenceMatch('(?1)(?t>3600)(?2)(?3)') pinning, T = 3600 s —
    # the MINIMUM-gap edge needs the EARLIEST signup, the dual of the
    # upper-bounded edge's latest-predecessor rule:
    #  u1: signup(0) click(T+1) purchase(T+2)   -> matched (gap > T)
    #  u2: signup(0) click(T) purchase(T+1)     -> NOT matched (gap == T)
    #  u3: signup(0) signup(T) click(T+10)
    #      purchase(T+20)                       -> matched via the FIRST
    #      signup (gap T+10 > T) even though the LATEST signup is only
    #      10 us before the click — the case a latest-signup fold (_gS)
    #      gets wrong
    #  u4: signup(T) click(T+10) purchase(T+20) -> NOT matched (only
    #      signup is 10 us before the click)
    #  u5: click(T+1) purchase(T+2)             -> no signup: excluded
    T = 3600 * 1000000
    rows = [
        (1, 0, 1, "signup"), (2, T + 1, 1, "click"),
        (3, T + 2, 1, "purchase"),
        (4, 0, 2, "signup"), (5, T, 2, "click"), (6, T + 1, 2, "purchase"),
        (7, 0, 3, "signup"), (8, T, 3, "signup"), (9, T + 10, 3, "click"),
        (10, T + 20, 3, "purchase"),
        (11, T, 4, "signup"), (12, T + 10, 4, "click"),
        (13, T + 20, 4, "purchase"),
        (14, T + 1, 5, "click"), (15, T + 2, 5, "purchase"),
    ]
    sf = _write_events(tmp_path, rows)
    row = REGISTRY["sequence_match_min_gap"].spark(spark, sf).first()
    assert (row["n_matched"], row["n_signup_users"]) == (2, 4)

    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    odf = con.execute(REGISTRY["sequence_match_min_gap"].oracle).fetchdf()
    assert (int(odf.n_matched[0]), int(odf.n_signup_users[0])) == (2, 4)


def test_information_value_degenerate_band_is_null(spark, tmp_path):
    # a band with zero positives (or zero negatives) has undefined WoE:
    # BOTH engines must emit NULL — DuckDB ln(0) raises OutOfRange
    # rather than returning -inf, so an unguarded oracle would crash
    # the parity harness instead of mismatching. Band = hour-of-day
    # div 6; label = value >= 50.00.
    H = 3600 * 1000000
    rows = [
        # band 0 (hours 0-5): positives and negatives -> defined WoE
        (1, 0 * H, 1, "click", 100.0), (2, 1 * H, 1, "view", 1.0),
        # band 1 (hours 6-11): only negatives -> NULL WoE
        (3, 6 * H, 2, "click", 1.0), (4, 7 * H, 2, "view", 2.0),
        # band 2 (hours 12-17): only positives -> NULL WoE
        (5, 12 * H, 3, "click", 99.0), (6, 13 * H, 3, "view", 88.0),
    ]
    sf = _write_events(tmp_path, rows)
    out = {
        r["band"]: (r["woe"], r["iv_term"])
        for r in REGISTRY["categorical_information_value"]
        .spark(spark, sf)
        .collect()
    }
    assert out[1] == (None, None) and out[2] == (None, None)
    assert out[0][0] is not None

    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    odf = (
        con.execute(REGISTRY["categorical_information_value"].oracle)
        .fetchdf()
        .set_index("band")
    )
    import math

    assert math.isnan(odf.loc[1].woe) and math.isnan(odf.loc[2].woe)
    assert not math.isnan(odf.loc[0].woe)


def test_window_funnel_strict_dedup_mode_semantics(spark, tmp_path):
    # The four-mode family pinned on one fixture: strict_dedup (per
    # ClickHouse windowFunnel.h's fold) interrupts at the level reached
    # when an event matching an ALREADY-SATISFIED step >= 2 repeats;
    # default mode re-chains through repeats. Cases:
    #  uA: signup(0) click(1) click(2) purchase(3) -> repeated click
    #      interrupts: dedup 2, default 3
    #  uB: signup(0) click(1) purchase(2)          -> clean chain: 3, 3
    #  uC: signup(0) click(1) signup(2) purchase(3)-> step-1 repeats only
    #      re-anchor, never interrupt: dedup 3, default 3
    #  uD: signup(0) click(1) click(1) purchase(2) -> equal-ts twin click
    #      still a repeat (processed before the later purchase):
    #      dedup 2, default 3
    #  uF: signup(0) purchase(1) click(2) purchase(3) -> pre-chain
    #      purchase is inert; purchase after c* completes: 3, 3
    #  uH: signup(0) click(W+1)                    -> click past window
    #      never chains: 1, 1
    W = 24 * 3600 * 1000000
    rows = [
        (1, 0, 1, "signup"), (2, 1, 1, "click"), (3, 2, 1, "click"),
        (4, 3, 1, "purchase"),
        (5, 0, 2, "signup"), (6, 1, 2, "click"), (7, 2, 2, "purchase"),
        (8, 0, 3, "signup"), (9, 1, 3, "click"), (10, 2, 3, "signup"),
        (11, 3, 3, "purchase"),
        (12, 0, 4, "signup"), (13, 1, 4, "click"), (14, 1, 4, "click"),
        (15, 2, 4, "purchase"),
        (16, 0, 6, "signup"), (17, 1, 6, "purchase"), (18, 2, 6, "click"),
        (19, 3, 6, "purchase"),
        (20, 0, 8, "signup"), (21, W + 1, 8, "click"),
    ]
    sf = _write_events(tmp_path, rows)
    dedup = {
        r["funnel_level"]: r["n_users"]
        for r in REGISTRY["window_funnel_strict_dedup"].spark(spark, sf).collect()
    }
    # uH:1 | uA,uD:2 | uB,uC,uF:3
    assert dedup == {1: 1, 2: 2, 3: 3}

    default = {
        r["funnel_level"]: r["n_users"]
        for r in REGISTRY["window_funnel_levels"].spark(spark, sf).collect()
    }
    # default mode re-chains through the repeats: only uH stays at 1
    assert default == {1: 1, 3: 5}

    # and the DuckDB oracle agrees with the Spark plan on the fixture
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    odf = con.execute(
        REGISTRY["window_funnel_strict_dedup"].oracle
    ).fetchdf()
    assert {
        int(r.funnel_level): int(r.n_users) for r in odf.itertuples()
    } == dedup
