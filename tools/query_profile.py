#!/usr/bin/env python
"""Per-query optimization profiler (r12, guide §1).

For each named registry entry: wall time (noop-style full materialize via
collect — results are driver-small by contract), number of Spark jobs the
query ran, and how much of the wall went to slice-quantile driver jobs
(`approxQuantile` inside operators.ranking.slice_expr) — the fixed
per-pass cost the segmented-scan family pays. Jobs are counted via the
status tracker; quantile time via a monkeypatch around
DataFrame.approxQuantile.

Usage: python tools/query_profile.py name [name ...] [--repeat N]
Writes rows to stdout; meant for iterating, not artifacts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--max-steal",
        type=float,
        default=None,
        help="retry each query (up to --repeat extra times) until a run "
        "lands under this steal%%; report the best CLEAN run, or the "
        "best dirty one flagged steal_dirty=true",
    )
    args = ap.parse_args()

    # Spark 4: the runtime class is pyspark.sql.classic.dataframe.DataFrame
    # (overrides the abstract base) — patch THAT, or the hook never fires
    from pyspark.sql.classic.dataframe import DataFrame

    from clickhouse_github_log_importer_spark.plans.queries import REGISTRY
    from clickhouse_github_log_importer_spark.session import get_spark

    spark = get_spark(app_name="query_profile")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    # instrument approxQuantile (slice_expr's driver job)
    q_state = {"n": 0, "sec": 0.0}
    orig_aq = DataFrame.approxQuantile

    def timed_aq(self, *a, **kw):
        t0 = time.monotonic()
        try:
            return orig_aq(self, *a, **kw)
        finally:
            q_state["n"] += 1
            q_state["sec"] += time.monotonic() - t0

    DataFrame.approxQuantile = timed_aq

    # warm-up
    REGISTRY["record_count"].spark(spark, args.sf_dir).collect()

    def ticks():
        with open("/proc/stat") as f:
            parts = [int(x) for x in f.readline().split()[1:]]
        return sum(parts), parts[7]

    for name in args.names:
        best = None  # best clean run if any, else best dirty run
        best_clean = None
        tries = args.repeat if args.max_steal is None else 2 * args.repeat
        runs = 0
        for _ in range(tries):
            runs += 1
            q_state["n"], q_state["sec"] = 0, 0.0
            c0 = ticks()
            t0 = time.monotonic()
            REGISTRY[name].spark(spark, args.sf_dir).collect()
            dt = time.monotonic() - t0
            c1 = ticks()
            row = {
                "name": name,
                "wall_sec": round(dt, 3),
                "aq_jobs": q_state["n"],
                "aq_sec": round(q_state["sec"], 3),
                "steal_pct": round(
                    100.0 * (c1[1] - c0[1]) / max(1, c1[0] - c0[0]), 2
                ),
            }
            if best is None or row["wall_sec"] < best["wall_sec"]:
                best = row
            clean = (
                args.max_steal is None or row["steal_pct"] <= args.max_steal
            )
            if clean and (
                best_clean is None
                or row["wall_sec"] < best_clean["wall_sec"]
            ):
                best_clean = row
            if args.max_steal is not None and not clean:
                time.sleep(15)  # contention bursts pass on this scale
            # gated mode: stop once we have a clean run AND the plain
            # repeat budget is spent (first run is always a warm-up)
            if (
                args.max_steal is not None
                and best_clean is not None
                and runs >= args.repeat
            ):
                break
        out = best_clean if best_clean is not None else best
        if args.max_steal is not None and best_clean is None:
            out = dict(out)
            out["steal_dirty"] = True
        print(json.dumps(out), flush=True)

    DataFrame.approxQuantile = orig_aq


if __name__ == "__main__":
    main()
