"""Third-implementation checks for the interval-sweep and sketch-set-op
queries: a pure-Python reference (independent of both the Spark plan and
the DuckDB oracle) over the sf0.001 parquet, plus the mergeability
property the KMV set operations rely on."""

from __future__ import annotations

import datetime as _dt
import hashlib

import pyarrow.parquet as pq

from clickhouse_github_log_importer_spark.plans.queries import (
    _IV_DUR_US,
    _KMV_K,
    _TWO60,
    REGISTRY,
)


def _events(sf_dir):
    tb = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "user_id", "ts"],
    ).to_pylist()
    epoch = _dt.datetime(1970, 1, 1)
    for r in tb:
        ts = r["ts"]
        # driver testdata is micro- or nano-resolution; normalize to micros.
        # Naive datetimes are UTC wall-clock (the session convention) — diff
        # against the naive epoch, never .timestamp() (local-TZ dependent).
        if isinstance(ts, _dt.datetime):
            d = ts.replace(tzinfo=None) - epoch
            r["ts_us"] = d.days * 86_400_000_000 + d.seconds * 1_000_000 + d.microseconds
        else:
            r["ts_us"] = int(ts) // 1000
    return tb


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_max_concurrent_intervals_matches_python_sweep(spark, sf_smoke):
    rows = _events(sf_smoke)
    # python sweep: +1 at start, -1 at end, (-1 before +1) at equal t
    want = {}
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, evs in by_type.items():
        deltas = [(e["ts_us"], 1, e["event_id"]) for e in evs] + [
            (e["ts_us"] + _IV_DUR_US, -1, e["event_id"]) for e in evs
        ]
        deltas.sort()
        c = best = 0
        at = None
        for t_, d, _ in deltas:
            c += d
            if c > best:
                best, at = c, t_
        want[et] = (best, at)
    got = {
        r["event_type"]: (r["max_concurrent"], r["first_peak_us"])
        for r in REGISTRY["max_concurrent_intervals"].spark(spark, sf_smoke).collect()
    }
    assert got == want


def test_user_interval_coverage_matches_python_merge(spark, sf_smoke):
    rows = _events(sf_smoke)
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["ts_us"])
    want = {}
    for u, starts in by_user.items():
        starts.sort()
        covered = 0
        cur_s = cur_e = None
        for s in starts:
            e = s + _IV_DUR_US
            if cur_e is None or s > cur_e:  # half-open: s == cur_e merges
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            covered += cur_e - cur_s
        want[u] = (len(starts), covered)
    got = {
        r["user_id"]: (r["n_intervals"], r["covered_us"])
        for r in REGISTRY["user_interval_coverage"].spark(spark, sf_smoke).collect()
    }
    assert got == want


def test_kmv_set_operations_matches_python_sketches(spark, sf_smoke):
    rows = _events(sf_smoke)
    a = {r["user_id"] for r in rows if r["event_type"] == "signup"}
    b = {r["user_id"] for r in rows if r["event_type"] == "purchase"}
    u = a | b

    def est(users: set[int]) -> float:
        hs = sorted({_h60(str(x)) for x in users})
        if len(hs) < _KMV_K:
            return float(len(hs))
        return round((_KMV_K - 1) * _TWO60 / hs[_KMV_K - 1])

    ea, eb, eu = est(a), est(b), est(u)
    inter = max(0.0, ea + eb - eu)
    row = REGISTRY["kmv_set_operations"].spark(spark, sf_smoke).collect()[0]
    assert row["est_a"] == int(ea) and row["est_b"] == int(eb)
    assert row["est_union"] == int(eu)
    assert row["est_intersection"] == int(inter)
    assert row["exact_a"] == len(a) and row["exact_b"] == len(b)
    assert row["exact_union"] == len(u)
    assert row["exact_intersection"] == len(a & b)
    # mergeability: the union sketch equals the k-smallest of the merged
    # per-set sketches (union of sketches, re-trimmed to k) — the property
    # that lets per-partition sketches combine without revisiting raw data
    sk_a = sorted({_h60(str(x)) for x in a})[: _KMV_K]
    sk_b = sorted({_h60(str(x)) for x in b})[: _KMV_K]
    merged = sorted(set(sk_a) | set(sk_b))[: _KMV_K]
    full = sorted({_h60(str(x)) for x in u})[: _KMV_K]
    assert merged == full


def test_sequence_pair_count_matches_greedy_automaton(spark, sf_smoke):
    # the parenthesis-matching closed form vs the literal greedy automaton
    # (scan in time order, match each purchase to an unmatched earlier
    # signup) — the semantics ClickHouse sequenceCount implements
    rows = _events(sf_smoke)
    by_user: dict[int, list] = {}
    for r in rows:
        if r["event_type"] in ("signup", "purchase"):
            by_user.setdefault(r["user_id"], []).append(r)
    want = {}
    for u, evs in by_user.items():
        evs.sort(
            key=lambda e: (
                e["ts_us"],
                0 if e["event_type"] == "signup" else 1,
                e["event_id"],
            )
        )
        open_signups = matched = n_a = n_b = 0
        for e in evs:
            if e["event_type"] == "signup":
                open_signups += 1
                n_a += 1
            else:
                n_b += 1
                if open_signups:
                    open_signups -= 1
                    matched += 1
        want[u] = (n_a, n_b, matched, matched >= 1)
    got = {
        r["user_id"]: (
            r["n_signups"],
            r["n_purchases"],
            r["seq_count"],
            r["has_match"],
        )
        for r in REGISTRY["sequence_pair_count"].spark(spark, sf_smoke).collect()
    }
    assert got == want
