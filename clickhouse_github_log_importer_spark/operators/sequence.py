"""Library-callable sequenceMatch / sequenceCount dispatchers.

The ClickHouse sequence family (reference: ClickHouse
docs/en/sql-reference/aggregate-functions/parametric-functions;
the log-importer delegates these to ClickHouse — e.g. funnel-style
dashboards over `app/queries` output tables) is implemented by
compilers living next to the query registry (plans/queries.py:
_sequence_match_users / _sequence_match_adjacent_users /
_sequence_count_users / _sequence_count_timed_users). A dataops user
shouldn't import private helpers from ``plans`` — this module is the
documented DataFrame-in/DataFrame-out surface, mirroring r8's
``operators.sessions.window_funnel(mode=)`` dispatcher.

Input contract (both functions): an events DataFrame with
``user_id`` (integral), ``event_type`` (string), and a time column —
either ``ts_us`` (bigint epoch-microseconds) or ``ts`` (timestamp /
epoch-nano bigint, normalized via plans.queries.normalize_events_ts).
``sequence_count`` additionally needs ``event_id`` (the pinned
same-timestamp tie-breaker). ``conds`` maps 1-based pattern condition
indexes to event types (disjoint by construction).

Semantics — each pinned in pytest and MIGRATION.md:

- ``semantics='existence'`` (default): every edge behaves like '.*';
  an intervening event never breaks a chain. One segmented
  running-extrema pass per edge.
- ``semantics='adjacency'``: ClickHouse-EXACT — a bare '(?1)(?2)' edge
  requires consecutive positions among declared-condition events;
  '.*' and time edges allow intervening events; undeclared-condition
  events are invisible. Position DP over the skew-safe ranked stream.
- ``sequence_count``: ClickHouse countAll RESTART semantics (greedy
  non-overlapping chains); time-bounded patterns dispatch to the timed
  automaton ('<' violation restarts, '>' violation waits) — under
  adjacency, to the timed-adjacency product automaton (r10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SEQUENCE_SEMANTICS = ("existence", "adjacency")


def _normalized(events: DataFrame) -> DataFrame:
    from ..plans.queries import normalize_events_ts

    if "ts_us" not in events.columns:
        events = normalize_events_ts(events)
    if "ts_us" not in events.columns:
        raise ValueError(
            "sequence operators need a 'ts_us' (epoch-us bigint) or "
            "'ts' (timestamp) column on the events frame"
        )
    return events


def sequence_match(
    events: DataFrame,
    pattern: str,
    conds: tuple[str, ...],
    semantics: str = "existence",
) -> DataFrame:
    """Users whose event stream matches a ClickHouse sequenceMatch
    ``pattern`` ('(?N)', '(?t<T)/(?t<=T)/(?t>T)/(?t>=T)/(?t==T)',
    '.*') under the chosen ``semantics``. Returns a DataFrame with one
    ``user_id`` row per matching user.

    >>> sequence_match(ev, "(?1)(?t<3600)(?2)", ("signup", "click"))
    >>> sequence_match(ev, "(?1)(?2)", ("signup", "click", "purchase"),
    ...                semantics="adjacency")
    """
    from ..plans.queries import (
        _sequence_match_adjacent_users,
        _sequence_match_users,
    )

    if semantics not in SEQUENCE_SEMANTICS:
        raise ValueError(
            f"unknown semantics {semantics!r}; one of {SEQUENCE_SEMANTICS}"
        )
    ev = _normalized(events)
    spark = events.sparkSession
    if semantics == "adjacency":
        return _sequence_match_adjacent_users(
            spark, None, pattern, conds=conds, events=ev
        )
    return _sequence_match_users(spark, None, pattern, conds=conds, events=ev)


def sequence_count(
    events: DataFrame,
    pattern: str,
    conds: tuple[str, ...],
    semantics: str = "existence",
    matcher: str = "greedy",
) -> DataFrame:
    """Per-user greedy non-overlapping match counts for ``pattern``
    under ClickHouse sequenceCount's restart semantics. Returns
    (user_id, seq_count) for users with count >= 1.

    ``matcher='backtracking'`` (r11) switches to ClickHouse's EXACT
    matcher semantics (AggregateFunctionSequenceMatch.h back_stack
    DFS = leftmost lexicographic assignment, O(n*k) via the
    can-complete DP in operators/sequence_backtracking.py) instead of
    the pinned greedy scan — use it when porting a funnel whose count
    must equal ClickHouse bit-for-bit on timed patterns (fuzz-pinned:
    the greedy scan never overcounts, but an upper-bound or '=='
    death can burn anchors backtracking would retry). Under
    ``matcher='backtracking'``, ``semantics`` picks the bare-edge
    reading: 'adjacency' is ClickHouse-exact (consecutive declared
    events), 'existence' keeps the repo's relaxed any-gap reading.

    ``semantics='existence'`` (default): every edge behaves like '.*'
    over the condition-filtered stream. Unconstrained patterns run the
    untimed FST-composition automaton; patterns with '<'/'<='/'>'/'>='
    edges dispatch to the timed automaton (pinned greedy rules: an
    upper-bound violation restarts at the violating event, a
    lower-bound violation waits for a later candidate).
    ``semantics='adjacency'``: the ClickHouse-exact reading — bare
    edges require consecutive positions among declared-condition
    events, '.*' and time edges separate words (KMP search DFA,
    non-overlapping leftmost); time-bounded patterns dispatch to the
    timed-adjacency PRODUCT automaton (r10: gates at the occurrence's
    true start, '<' restart / '>' wait / '==' exact).

    >>> sequence_count(ev, "(?1)(?3)", ("signup", "click", "purchase"))
    >>> sequence_count(ev, "(?1)(?t>3600)(?2)", ("signup", "click"))
    >>> sequence_count(ev, "(?1)(?t<3600)(?2)", ("signup", "click",
    ...                "view"), semantics="adjacency")
    """
    from ..plans.queries import (
        _parse_seq_pattern,
        _sequence_count_adjacent_timed_users,
        _sequence_count_adjacent_users,
        _sequence_count_timed_users,
        _sequence_count_users,
    )

    if semantics not in SEQUENCE_SEMANTICS:
        raise ValueError(
            f"unknown semantics {semantics!r}; one of {SEQUENCE_SEMANTICS}"
        )
    if matcher not in ("greedy", "backtracking"):
        raise ValueError(
            f"unknown matcher {matcher!r}; one of ('greedy', 'backtracking')"
        )
    _, edges = _parse_seq_pattern(pattern)
    timed = any(e is not None for e in edges)
    ev = _normalized(events)
    if "event_id" not in ev.columns:
        raise ValueError(
            "sequence_count needs an 'event_id' column (the pinned "
            "same-timestamp tie-breaker)"
        )
    spark = events.sparkSession
    if matcher == "backtracking":
        from .sequence_backtracking import sequence_count_backtracking_users

        return sequence_count_backtracking_users(
            spark,
            None,
            pattern,
            conds,
            events=ev,
            semantics="clickhouse" if semantics == "adjacency" else "existence",
        )
    if semantics == "adjacency":
        if timed:
            return _sequence_count_adjacent_timed_users(
                spark, None, pattern, conds=conds, events=ev
            )
        return _sequence_count_adjacent_users(
            spark, None, pattern, conds=conds, events=ev
        )
    if timed:
        return _sequence_count_timed_users(
            spark, None, pattern, conds=conds, events=ev
        )
    return _sequence_count_users(spark, None, pattern, conds=conds, events=ev)
