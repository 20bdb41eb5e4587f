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
    # rows: (event_id, ts_us, user_id, event_type)
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [1.0] * len(rows),
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
