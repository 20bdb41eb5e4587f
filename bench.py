#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

The printed line is kept COMPACT (< ~1.8 KB): the driver captures only the
last 2 KB of stdout, and with 92 registered queries a full per-query map
blows past that (round 3's artifact was truncated to unparseability).
The printed `queries` map therefore holds only the top-10 slowest; the
complete per-query map (and full error strings) is written to
BENCH_FULL.json beside this script.

If any query fails, `value` is null — a partial sum would read as a
speedup to any consumer that doesn't check `errors`; `queries_failed`
carries the count.

Each query is executed with a count()-style full materialization (collect
on the final, already-small result) after a warm-up of the input parquet
footers. Timings are per-query wall clock.
"""

from __future__ import annotations

import json
import os
import time

# every registered query is benched — new registry entries join the suite
# automatically, so a regression can never hide in an unbenched query
def headline_names() -> list[str]:
    from clickhouse_github_log_importer_spark.plans.queries import REGISTRY

    return sorted(REGISTRY)


# Benched and oracle-checked, but EXCLUDED from the headline `value`:
# queries whose OUTPUT volume is inherently super-linear in the input
# (they return pairs), so their wall time reflects result size, not plan
# quality — at a scale-up they would dominate the total and misread as a
# regression. Each ships a scale-safe counting alternative that IS in the
# headline (concurrent_event_counts -> concurrent_event_counts_linear).
NON_HEADLINE = {"concurrent_event_counts"}


def _synth_event(eid: int) -> dict:
    """One synthetic GH-Archive event (issue/push/watch-heavy mix)."""
    kind = eid % 10
    base = {
        "id": str(1_000_000 + eid),
        "actor": {"id": eid % 5000, "login": f"user{eid % 5000}"},
        "repo": {"id": eid % 2000, "name": f"org/repo{eid % 2000}"},
        "created_at": f"2015-01-{(eid % 27) + 1:02d}T12:00:00Z",
    }
    if kind < 3:
        base["type"] = "PushEvent"
        base["payload"] = {
            "push_id": eid, "size": 1, "distinct_size": 1,
            "ref": "refs/heads/main", "head": "abc",
            "commits": [{"author": {"name": "a", "email": "e"}, "message": "m"}],
        }
    elif kind < 6:
        base["type"] = "WatchEvent"
        base["payload"] = {"action": "started"}
    elif kind < 8:
        base["type"] = "IssuesEvent"
        base["payload"] = {
            "action": "opened",
            "issue": {"id": eid, "number": eid % 500, "title": "t",
                      "body": "b" * 50,
                      "user": {"id": 1, "login": "u", "type": "User"},
                      "comments": 0,
                      "labels": [{"name": "bug", "color": "red"}]},
        }
    else:
        base["type"] = "PullRequestEvent"
        base["payload"] = {
            "action": "closed",
            "pull_request": {"id": eid, "number": eid % 500,
                             "title": "t", "merged": True,
                             "commits": 2, "additions": 5, "deletions": 2,
                             "changed_files": 1,
                             "user": {"id": 1, "login": "u", "type": "User"},
                             "base": {"ref": "main"},
                             "head": {"ref": "fix"}},
        }
    return base


def _write_event_files(dirpath: str, rel_names: list[str], per_file: int) -> None:
    """Write synthetic NDJSON.gz hour files under ``dirpath``."""
    import gzip
    import json

    for fi, rel in enumerate(rel_names):
        path = os.path.join(dirpath, rel)
        os.makedirs(os.path.dirname(path) or dirpath, exist_ok=True)
        with gzip.open(path, "wt") as f:
            for i in range(per_file):
                f.write(json.dumps(_synth_event(fi * per_file + i)) + "\n")


def _cpu_ticks():
    """(total, steal) jiffies from /proc/stat — None where unreadable.
    Steal is the hypervisor running OTHER guests on our vCPUs: SCALE.md
    r10 proved this host takes 8-10% at times, which is exactly the
    ingest-spread confounder; embedding per-pass steal lets a reader
    attribute spread numerically instead of trusting prose (r10 verdict
    'What's wrong' #3)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except (OSError, ValueError):
        return None


def _steal_pct(before, after):
    """Steal share of all CPU ticks elapsed between two _cpu_ticks()."""
    if not before or not after or after[0] <= before[0]:
        return None
    return round(100.0 * (after[1] - before[1]) / (after[0] - before[0]), 2)


def bench_ingest(spark, n_events: int = 128_000, n_files: int = 32) -> dict:
    """GH-Archive ingest throughput: NDJSON.gz -> parse -> partitioned
    parquet, records/s. Comparable to the reference's published bulk
    import figure (~20.8k rec/s on 6 worker threads, README.md:65)."""
    import shutil
    import tempfile
    import time as _t

    from clickhouse_github_log_importer_spark.operators.parsers import (
        project_events,
        read_raw,
    )

    tmp = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        per_file = n_events // n_files
        _write_event_files(
            tmp, [f"2015-01-01-{fi}.json.gz" for fi in range(n_files)], per_file
        )
        out = os.path.join(tmp, "events_table")
        # run the job twice, report the faster: the first pass pays
        # whole-stage-codegen compilation + JIT across all executor
        # threads — a one-time cost a long-running cluster amortizes to
        # zero; the second pass is the steady-state batch cost
        elapsed = None
        for _ in range(2):
            t0 = _t.monotonic()
            events = project_events(read_raw(spark, os.path.join(tmp, "*.json.gz")))
            events.write.mode("overwrite").partitionBy("created_month").parquet(out)
            dt = _t.monotonic() - t0
            elapsed = dt if elapsed is None else min(elapsed, dt)
        return {
            "ingest_records": n_events,
            "ingest_sec": round(elapsed, 3),
            "ingest_records_per_sec": round(n_events / elapsed),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_lifecycle(spark, n_events: int = 64_000, n_files: int = 16) -> dict:
    """SURVEY 3.1's full pipeline tick timed as ONE unit: manifest ->
    existence/validity checks -> import (parse + partitioned parquet
    append) -> reconcile -> compaction check -> status write — i.e.
    update_log.ts:10-52's hourly cron body, downloads mocked by
    pre-staged hour files. The reference's only published number is bulk
    ingest throughput; this line makes the end-to-end loop comparable
    apples-to-apples across rounds."""
    import shutil
    import tempfile
    import time as _t

    from clickhouse_github_log_importer_spark.streaming.pipeline import (
        run_incremental,
    )

    per_file = n_events // n_files
    rels = [
        f"2015/01/01/2015-01-01-{h}.json.gz" for h in range(n_files)
    ]
    elapsed, status = None, {}
    for _ in range(2):  # min-of-2: strip one-off codegen/JIT like ingest
        tmp = tempfile.mkdtemp(prefix="lifecycle_bench_")
        try:
            data_dir = os.path.join(tmp, "data")
            _write_event_files(data_dir, rels, per_file)
            t0 = _t.monotonic()
            status = run_incremental(
                spark,
                os.path.join(tmp, "meta.json"),
                data_dir,
                os.path.join(tmp, "events_table"),
                expected_files=rels,
            )
            dt = _t.monotonic() - t0
            elapsed = dt if elapsed is None else min(elapsed, dt)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return {
        "lifecycle_files": n_files,
        "lifecycle_records": n_events,
        "lifecycle_sec": round(elapsed, 3),
        "lifecycle_records_per_sec": round(n_events / elapsed),
        "lifecycle_imported": status.get("imported"),
    }


def wait_for_idle_host(
    threshold: float | None = None, timeout_s: int = 600, poll_s: int = 15
) -> dict:
    """Refuse-and-retry load gate (r6 lesson: the round's two bench runs
    differed 16% purely on host load — 211 s idle vs 182 s at load1
    10.6 — making per-round comparison mush). Instead of warning and
    proceeding, block until load1 <= threshold so ONE canonical idle
    number exists per round; after timeout_s proceed anyway (a stuck
    gate must never zero the artifact) with the failure recorded in the
    returned telemetry. Set SPARK_GRAFT_BENCH_LOAD_GATE=0 to skip when
    iterating locally."""
    import sys
    import time as _t

    if os.environ.get("SPARK_GRAFT_BENCH_LOAD_GATE", "1") == "0":
        return {"load_gate": {"skipped": True}}

    # core-count-aware threshold (ADVICE r7): a fixed load1<=2 starves
    # the gate on a many-core host where a modest background task is
    # harmless — 10% of cores keeps the same "effectively idle" meaning
    # everywhere; SPARK_GRAFT_BENCH_LOAD_MAX overrides for odd hosts
    if threshold is None:
        env = os.environ.get("SPARK_GRAFT_BENCH_LOAD_MAX")
        threshold = (
            float(env)
            if env
            else max(2.0, 0.1 * (os.cpu_count() or 8))
        )

    # gate on load1 AND load5: a decaying load1 crosses the threshold
    # while background flush/page-cache churn from the just-finished job
    # is still active (measured: load1 1.8 / load5 6.8 at gate pass ->
    # 204.6 s vs 168.1 s on the same suite truly idle, a 22% phantom).
    # r9 tightened the load5 limit 2x -> 1.25x: a run admitted at
    # load1 1.6 / load5 5.1 (under the old 2x = 6.4 limit) right after
    # a 27-min pytest still measured 268 s vs the 190 s idle canonical
    # and a 136% ingest spread — load5 near the core-count tenth is the
    # contamination signal, not twice it
    def busy(l1: float, l5: float) -> bool:
        return l1 > threshold or l5 > 1.25 * threshold

    t0 = _t.monotonic()
    initial = os.getloadavg()
    l1, l5 = initial[0], initial[1]
    while busy(l1, l5) and _t.monotonic() - t0 < timeout_s:
        print(
            f"# bench load gate: host busy (load1={l1:.1f}, "
            f"load5={l5:.1f}; need <= {threshold}/{1.25 * threshold}) — "
            "waiting for idle...",
            file=sys.stderr,
        )
        _t.sleep(poll_s)
        l1, l5 = os.getloadavg()[:2]
    gate = {
        "threshold": threshold,
        "waited_s": round(_t.monotonic() - t0),
        # both ends of the wait: how busy the host was when the run was
        # requested, and what it had decayed to when timing started
        "load1_initial": round(initial[0], 1),
        "load5_initial": round(initial[1], 1),
        "load1_when_proceeding": round(l1, 1),
        "load5_when_proceeding": round(l5, 1),
        "passed": not busy(l1, l5),
    }
    if not gate["passed"]:
        print(
            f"# WARNING bench load gate TIMED OUT after {timeout_s}s "
            f"(load1={l1:.1f}, load5={l5:.1f}) — proceeding; timings "
            "will read 1.3-2x slow vs an idle host",
            file=sys.stderr,
        )
    return {"load_gate": gate}


def bench_refcheck(spark, sf_dir, runs: int = 3) -> dict:
    """Automated warm reference-workload check (r10; SCALE.md's manual
    contention-detection protocol folded into the artifact): the
    sequence_match_compiled entry, one discarded warm run then
    median-of-N. Best-known idle figure at sf0.1 is 9.2-9.5 s (r8/r9);
    a median ~2x that means EXTERNAL host contention invisible to guest
    loadavg (measured twice in r9: 19.3 s / 19.6 s on a 'quiet' guest),
    and every suite number in the same artifact is an upper bound, not
    a measurement. ~30 s cost; enabled by --refcheck or
    SPARK_GRAFT_BENCH_REFCHECK=1 (canonical runs), off for plain driver
    invocations."""
    from clickhouse_github_log_importer_spark.plans.queries import REGISTRY

    entry = REGISTRY["sequence_match_compiled"]
    entry.spark(spark, sf_dir).collect()  # discarded warm run
    ts: list[float] = []
    for _ in range(runs):
        t0 = time.monotonic()
        entry.spark(spark, sf_dir).collect()
        ts.append(round(time.monotonic() - t0, 3))
    ts.sort()
    return {
        "refcheck_query": "sequence_match_compiled",
        "refcheck_runs": ts,
        "refcheck_median_sec": ts[len(ts) // 2],
        "refcheck_best_known_sec": [9.2, 9.5],
    }


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--refcheck",
        action="store_true",
        default=os.environ.get("SPARK_GRAFT_BENCH_REFCHECK", "0") == "1",
        help="run the warm reference-workload contention check "
        "(median-of-3 sequence_match_compiled) before the suite and "
        "embed the result in the artifact",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # gate BEFORE the Spark session: our own JVM startup adds load
    gate = wait_for_idle_host()

    from clickhouse_github_log_importer_spark.plans.queries import REGISTRY
    from clickhouse_github_log_importer_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Every step below is error-isolated: one broken query (or a broken
    # warm-up / ingest) must never zero the whole bench artifact — the JSON
    # summary line is always emitted, with per-query `err` entries for
    # whatever failed.
    errors: dict[str, str] = {}

    # warm-up: JVM + parquet footers + Python UDF workers, not counted
    try:
        REGISTRY["record_count"].spark(spark, sf_dir).collect()
        spark.createDataFrame([(1,)], "x long").mapInPandas(
            lambda it: it, "x long"
        ).collect()
    except Exception as e:  # noqa: BLE001
        errors["_warmup"] = f"{type(e).__name__}: {e}"[:500]

    refcheck: dict = {}
    if args.refcheck:
        try:
            refcheck = bench_refcheck(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            errors["_refcheck"] = f"{type(e).__name__}: {e}"[:500]

    # host-noise telemetry: rounds 4-5 showed +-35% wall drift from a
    # loaded host reading as plan regressions; the load GATE above holds
    # the run until idle — this window records what actually happened
    loads = [os.getloadavg()[0]]

    # median-of-5 (r8, was 3): ingest throughput rode single-shot
    # variance across rounds (38.0k -> 27.9k rec/s on identical parser
    # code — pure host noise), and r7's median-of-3 still reported a
    # 17.2% spread; five runs tighten the median's own variance at the
    # cost of ~2 extra ingest passes, spread still reported alongside.
    # r9: one DISCARDED warm-up ingest first — the r8 canonical run's
    # 38.5% spread vs the driver's 12.7% traced to run 1 being a cold
    # outlier (gzip codec + shuffle paths first-touch); the query
    # warm-up above doesn't exercise the ingest write path.
    try:
        bench_ingest(spark, n_events=16_000, n_files=8)  # discarded
        runs = []
        for _ in range(5):
            c0 = _cpu_ticks()
            r = bench_ingest(spark)
            r["ingest_steal_pct"] = _steal_pct(c0, _cpu_ticks())
            runs.append(r)
        # per-run steal in RUN ORDER (the sorted list below loses it):
        # spread at steal < 2% is the write path; spread tracking steal
        # is the host
        steal_runs = [r["ingest_steal_pct"] for r in runs]
        runs.sort(key=lambda r: r["ingest_records_per_sec"])
        ingest = dict(runs[2])  # median run's records/sec + sec
        lo = runs[0]["ingest_records_per_sec"]
        hi = runs[-1]["ingest_records_per_sec"]
        ingest["ingest_rps_runs"] = [r["ingest_records_per_sec"] for r in runs]
        ingest["ingest_steal_pct_runs"] = steal_runs
        ingest["ingest_rps_spread_pct"] = round(
            100.0 * (hi - lo) / ingest["ingest_records_per_sec"], 1
        )
    except Exception as e:  # noqa: BLE001
        ingest = {}
        errors["_ingest"] = f"{type(e).__name__}: {e}"[:500]

    try:
        lifecycle = bench_lifecycle(spark)
    except Exception as e:  # noqa: BLE001
        lifecycle = {}
        errors["_lifecycle"] = f"{type(e).__name__}: {e}"[:500]

    # two passes, report the min per query: strips one-off plan-codegen /
    # JIT costs so the figure reflects steady-state execution (what a
    # long-running cluster sees)
    timings: dict[str, float] = {}
    # per-pass totals: min-of-2 conceals WHICH pass a contention burst
    # hit — a 2x spread between pass totals on identical code is the
    # external-host signature (SCALE.md r9 record), visible per artifact
    pass_totals: list[float] = []
    pass_steals: list[float | None] = []
    for _pass in range(2):
        pt = 0.0
        c0 = _cpu_ticks()
        for name in headline_names():
            if name in errors:
                continue  # failed on pass 1; don't pay the crash twice
            try:
                t0 = time.monotonic()
                REGISTRY[name].spark(spark, sf_dir).collect()
                dt = round(time.monotonic() - t0, 3)
                pt += dt
                if name not in timings or dt < timings[name]:
                    timings[name] = dt
            except Exception as e:  # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {e}"[:500]
        pass_totals.append(round(pt, 3))
        pass_steals.append(_steal_pct(c0, _cpu_ticks()))
        loads.append(os.getloadavg()[0])

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    headline_total = round(
        sum(v for k, v in timings.items() if k not in NON_HEADLINE), 3
    )
    # Full artifact -> sidecar file (complete per-query map + full errors).
    try:
        with open("/proc/uptime") as f:
            uptime_s = round(float(f.read().split()[0]))
    except OSError:
        uptime_s = None
    full = {
        "metric": "headline_queries_total_wall",
        "value": None if errors else headline_total,
        "total_timed": round(sum(timings.values()), 3),
        "excluded_from_value": sorted(NON_HEADLINE & set(timings)),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # noise telemetry: readers must discount a loaded-host run
        "host_load_1m": {
            "start": round(loads[0], 1),
            "min": round(min(loads), 1),
            "max": round(max(loads), 1),
        },
        "uptime_s": uptime_s,
        "pass_totals_sec": pass_totals,
        "pass_steal_pct": pass_steals,
        "benched_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        **gate,
        **refcheck,
        **ingest,
        **lifecycle,
    }
    if errors:
        full["errors"] = errors
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    sidecar = os.path.join(repo_dir, "BENCH_FULL.json")
    try:
        with open(sidecar, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
        # retention (r10): every run ALSO lands in bench_runs/ under a
        # timestamp, so choosing a canonical artifact never overwrites
        # the evidence of a better (or worse) run — the r9 best run was
        # lost exactly this way
        runs_dir = os.path.join(repo_dir, "bench_runs")
        os.makedirs(runs_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
        with open(
            os.path.join(runs_dir, f"BENCH_FULL.{stamp}.json"), "w"
        ) as f:
            json.dump(full, f, indent=1, sort_keys=True)
    except OSError as e:
        errors["_sidecar"] = f"{type(e).__name__}: {e}"[:200]

    # Printed line -> compact: top-10 slowest queries, error strings capped
    # hard, and a final byte-budget guard so the driver's 2 KB tail capture
    # always sees valid JSON with the headline `value` intact.
    top10 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    summary = {
        "metric": "headline_queries_total_wall",
        "value": None if errors else headline_total,
        "total_timed": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf_val,
        "queries_benched": len(timings),
        "queries_failed": len(errors),
        "queries": top10,
        "full": "BENCH_FULL.json",
        **ingest,
        "lifecycle_sec": lifecycle.get("lifecycle_sec"),
        "lifecycle_records_per_sec": lifecycle.get("lifecycle_records_per_sec"),
        "load1": round(loads[0], 1),
        "steal_max_pct": max(
            (s for s in pass_steals if s is not None), default=None
        ),
    }
    if refcheck:
        summary["refcheck_median_sec"] = refcheck["refcheck_median_sec"]
    if errors:
        summary["errors"] = {
            k: v[:80] for k, v in list(sorted(errors.items()))[:5]
        }
        if len(errors) > 5:
            summary["errors"]["_more"] = f"{len(errors) - 5} more, see sidecar"
    line = json.dumps(summary)
    while len(line.encode()) > 1800 and summary["queries"]:
        # drop the cheapest of the remaining top-N until the line fits
        drop = min(summary["queries"], key=summary["queries"].get)
        del summary["queries"][drop]
        line = json.dumps(summary)
    print(line, flush=True)


if __name__ == "__main__":
    main()
