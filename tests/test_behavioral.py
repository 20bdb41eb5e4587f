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
