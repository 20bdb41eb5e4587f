"""ClickHouse-EXACT sequenceMatch adjacency semantics
(plans/queries.py: _parse_seq_pattern(with_adjacency=True) /
_sequence_match_adjacent_users / sequence_match_adjacent).

The load-bearing pin is the canonical example from the ClickHouse docs
(sql-reference/aggregate-functions/parametric-functions#sequencematch):
rows (t=1,n=1), (t=2,n=3), (t=3,n=2) with conditions number=1,2 match
'(?1)(?2)' (the n=3 row is invisible — no declared condition), but
DECLARING number=3 as a third condition makes the same pattern fail
(the n=3 event now occupies the position between them) while
'(?1).*(?2)' still matches. The existence-semantics compiler
(_sequence_match_users) can't see this distinction; the adjacency
matcher exists for it."""

from __future__ import annotations

import pytest

from clickhouse_github_log_importer_spark.plans.queries import (
    REGISTRY,
    _parse_seq_pattern,
    _sequence_match_adjacent_users,
    _sequence_match_users,
)
from tests.test_behavioral import _write_events

S = 1_000_000  # pattern gap units are seconds; fixture ts are micros


def _adj_users(spark, sf, pattern, conds):
    return {
        r["user_id"]
        for r in _sequence_match_adjacent_users(
            spark, sf, pattern, conds=conds
        ).collect()
    }


def test_parse_adjacency_flags():
    steps, edges, adj = _parse_seq_pattern(
        "(?1)(?2).*(?3)(?t<60)(?4)", with_adjacency=True
    )
    assert steps == [1, 2, 3, 4]
    assert edges == [None, None, ("<", 60_000_000)]
    # bare edge adjacent; '.*' and time-constrained edges are not
    assert adj == [True, False, False]
    # two-value form unchanged for existing callers
    assert _parse_seq_pattern("(?1)(?2)") == ([1, 2], [None])


def test_clickhouse_docs_canonical_example(spark, tmp_path):
    # t=1: number=1   t=2: number=3   t=3: number=2
    rows = [(1, 1 * S, 1, "n1"), (2, 2 * S, 1, "n3"), (3, 3 * S, 1, "n2")]
    sf = _write_events(tmp_path, rows)
    # two declared conditions: the n3 event is invisible -> 1 (match)
    assert _adj_users(spark, sf, "(?1)(?2)", ("n1", "n2")) == {1}
    # three declared conditions: n3 now blocks adjacency -> 0
    assert _adj_users(spark, sf, "(?1)(?2)", ("n1", "n2", "n3")) == set()
    # '.*' restores the match under the same three conditions -> 1
    assert _adj_users(spark, sf, "(?1).*(?2)", ("n1", "n2", "n3")) == {1}


def test_adjacent_chain_and_bounded_edge(spark, tmp_path):
    conds = ("signup", "click", "purchase", "view")
    rows = [
        # u1: s c p v   -> '(?1)(?2)' adjacent MATCH; '(?2)(?3)(?4)' MATCH
        (1, 0, 1, "signup"), (2, 10 * S, 1, "click"),
        (3, 20 * S, 1, "purchase"), (4, 30 * S, 1, "view"),
        # u2: s v c -> view between signup and click blocks adjacency
        (5, 0, 2, "signup"), (6, 10 * S, 2, "view"),
        (7, 20 * S, 2, "click"),
        # u3: s ERROR c -> 'error' matches NO declared condition:
        # invisible, adjacency holds
        (8, 0, 3, "signup"), (9, 10 * S, 3, "error"),
        (10, 20 * S, 3, "click"),
        # u4: s ... p v with p 2 days after s: time-bounded free edge
        # (?t<86400) fails, unbounded '.*' succeeds
        (11, 0, 4, "signup"), (12, 2 * 86400 * S, 4, "purchase"),
        (13, 2 * 86400 * S + 10 * S, 4, "view"),
        # u5: s c p v with p 1 hour after s -> bounded edge holds AND
        # v adjacent after p
        (14, 0, 5, "signup"), (15, 10 * S, 5, "click"),
        (16, 3600 * S, 5, "purchase"), (17, 3700 * S, 5, "view"),
    ]
    sf = _write_events(tmp_path, rows)
    assert _adj_users(spark, sf, "(?1)(?2)", conds) == {1, 3, 5}
    assert _adj_users(spark, sf, "(?1).*(?2)", conds) == {1, 2, 3, 5}
    assert _adj_users(spark, sf, "(?2)(?3)(?4)", conds) == {1, 5}
    # u4's p-v is adjacent but the signup->p gap of 2 days fails the
    # (?t<86400) bound; unbounded '.*' admits it.
    assert _adj_users(spark, sf, "(?1)(?t<86400)(?3)(?4)", conds) == {1, 5}
    assert _adj_users(spark, sf, "(?1).*(?3)(?4)", conds) == {1, 4, 5}


def test_repeated_condition_needs_two_events(spark, tmp_path):
    conds = ("signup", "click")
    rows = [
        (1, 0, 1, "signup"), (2, 10 * S, 1, "signup"),   # adjacent ss
        (3, 0, 2, "signup"), (4, 10 * S, 2, "click"),
        (5, 20 * S, 2, "signup"),                        # s c s: blocked
    ]
    sf = _write_events(tmp_path, rows)
    assert _adj_users(spark, sf, "(?1)(?1)", conds) == {1}
    assert _adj_users(spark, sf, "(?1).*(?1)", conds) == {1, 2}


def test_dotstar_agrees_with_existence_compiler(spark, sf_smoke):
    # '(?1).*(?2)' under adjacency semantics == '(?1)(?2)' under the
    # existence compiler: both mean "a click strictly after a signup"
    adj = _adj_users(spark, sf_smoke, "(?1).*(?2)", ("signup", "click"))
    exist = {
        r["user_id"]
        for r in _sequence_match_users(
            spark, sf_smoke, "(?1)(?2)", conds=("signup", "click")
        ).collect()
    }
    assert adj == exist


def test_registry_entry_orders_counts(spark, sf_smoke):
    got = {
        r["pattern"]: r["n_matched"]
        for r in REGISTRY["sequence_match_adjacent"].spark(
            spark, sf_smoke
        ).collect()
    }
    # adjacency can only remove matches relative to '.*'
    assert got["(?1)(?2)"] <= got["(?1).*(?2)"]
    assert set(got) == {
        "(?1)(?2)", "(?1).*(?2)", "(?2)(?3)(?4)", "(?1)(?t<86400)(?3)(?4)"
    }


def test_out_of_range_condition_rejected(spark):
    with pytest.raises(ValueError, match="out of range"):
        _sequence_match_adjacent_users(
            spark, "/root/testdata/sf0.001", "(?5)(?1)"
        )
