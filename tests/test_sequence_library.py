"""Library dispatchers (operators/sequence.py): DataFrame-in forms of
sequence_match / sequence_count must equal the registry internals on
the same data, validate inputs loudly, and accept a raw `ts` timestamp
column (normalizing like every other events consumer)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators.sequence import (
    sequence_count,
    sequence_match,
)
from clickhouse_github_log_importer_spark.plans.queries import t


def _events(spark, sf_smoke):
    return t(spark, sf_smoke, "events")


def test_match_existence_equals_registry_internal(spark, sf_smoke):
    from clickhouse_github_log_importer_spark.plans.queries import (
        _sequence_match_users,
    )

    ev = _events(spark, sf_smoke)
    got = {
        r["user_id"]
        for r in sequence_match(
            ev, "(?1)(?t<3600)(?2)(?3)", ("signup", "click", "purchase")
        ).collect()
    }
    want = {
        r["user_id"]
        for r in _sequence_match_users(
            spark,
            sf_smoke,
            "(?1)(?t<3600)(?2)(?3)",
            conds=("signup", "click", "purchase"),
        ).collect()
    }
    assert got == want and want


def test_match_adjacency_equals_registry_internal(spark, sf_smoke):
    from clickhouse_github_log_importer_spark.plans.queries import (
        _SEQ_CONDS,
        _sequence_match_adjacent_users,
    )

    ev = _events(spark, sf_smoke)
    got = {
        r["user_id"]
        for r in sequence_match(
            ev, "(?1)(?2)", _SEQ_CONDS, semantics="adjacency"
        ).collect()
    }
    want = {
        r["user_id"]
        for r in _sequence_match_adjacent_users(
            spark, sf_smoke, "(?1)(?2)"
        ).collect()
    }
    assert got == want


def test_count_dispatches_timed_and_untimed(spark, sf_smoke):
    from clickhouse_github_log_importer_spark.plans.queries import (
        _sequence_count_timed_users,
        _sequence_count_users,
    )

    ev = _events(spark, sf_smoke)
    got_u = {
        (r["user_id"], r["seq_count"])
        for r in sequence_count(
            ev, "(?1)(?2)", ("signup", "click", "purchase")
        ).collect()
    }
    want_u = {
        (r["user_id"], r["seq_count"])
        for r in _sequence_count_users(
            spark, sf_smoke, "(?1)(?2)", conds=("signup", "click", "purchase")
        ).collect()
    }
    assert got_u == want_u and want_u
    got_t = {
        (r["user_id"], r["seq_count"])
        for r in sequence_count(
            ev, "(?1)(?t>43200)(?2)", ("signup", "click", "purchase")
        ).collect()
    }
    want_t = {
        (r["user_id"], r["seq_count"])
        for r in _sequence_count_timed_users(
            spark,
            sf_smoke,
            "(?1)(?t>43200)(?2)",
            conds=("signup", "click", "purchase"),
        ).collect()
    }
    assert got_t == want_t


def test_accepts_raw_ts_column(spark, sf_smoke):
    # a frame WITHOUT ts_us (raw parquet shape) normalizes internally
    raw = spark.read.parquet(f"{sf_smoke}/events.parquet")
    assert "ts_us" not in raw.columns
    out = sequence_match(raw, "(?1)(?2)", ("signup", "click"))
    assert out.count() > 0


def test_validation_errors(spark, sf_smoke):
    ev = _events(spark, sf_smoke)
    with pytest.raises(ValueError, match="unknown semantics"):
        sequence_match(ev, "(?1)(?2)", ("signup", "click"), semantics="regex")
    with pytest.raises(ValueError, match="ts_us"):
        sequence_match(
            ev.select("user_id", "event_type"), "(?1)", ("signup",)
        )
    with pytest.raises(ValueError, match="event_id"):
        sequence_count(
            ev.select("user_id", "event_type", "ts_us"), "(?1)", ("signup",)
        )
