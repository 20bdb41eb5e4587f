#!/usr/bin/env python
"""Probe-stamp staleness check: every SCALE_PROBE.json row carries the
commit it was measured at; a row is STALE when the registry entry's
function body changed in a LATER commit (the measurement describes code
that no longer exists). Granularity is the entry's defining function
span traced with ``git log -L a,b:file`` — helper/operator-module edits
don't flag (the round protocol's "re-probe what you touched" covers
those; this gate catches the silent case of editing an entry and
keeping its fossil row).

Entries whose defining file has uncommitted modifications are skipped
(line spans shift in a dirty tree); the gate does its real work on a
committed tree — exactly the state the driver and judge test.

Usage: python tools/probe_staleness.py   (prints stale rows, exit 1 if any)
Library: stale_rows() -> list[(name, stamp, last_change)]
"""

from __future__ import annotations

import inspect
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=False
    ).stdout.strip()


def _commit_time(ref: str) -> int | None:
    out = _git("show", "-s", "--format=%ct", ref)
    return int(out.splitlines()[0]) if out else None


def stale_rows() -> list[tuple[str, str, str]]:
    from clickhouse_github_log_importer_spark.plans.queries import REGISTRY

    with open(os.path.join(REPO, "SCALE_PROBE.json")) as f:
        rows = json.load(f)["queries"]

    dirty = set(_git("diff", "--name-only", "HEAD").splitlines())
    stale: list[tuple[str, str, str]] = []
    time_cache: dict[str, int | None] = {}
    for name, row in rows.items():
        if name not in REGISTRY or "commit" not in row:
            continue
        fn = REGISTRY[name].spark
        code = getattr(fn, "__wrapped__", fn).__code__
        path = os.path.relpath(code.co_filename, REPO)
        if path.startswith("..") or path in dirty:
            continue
        try:
            lines, start = inspect.getsourcelines(fn)
        except OSError:
            continue
        end = start + len(lines) - 1
        out = _git(
            "log", "-1", "--format=%h %ct", "-s", f"-L{start},{end}:{path}"
        )
        if not out:
            continue
        last_hash, last_ct = out.split()
        stamp = row["commit"]
        if stamp not in time_cache:
            time_cache[stamp] = _commit_time(stamp)
        stamp_ct = time_cache[stamp]
        if stamp_ct is None:
            stale.append((name, stamp, f"unknown commit (last {last_hash})"))
        elif int(last_ct) > stamp_ct:
            stale.append((name, stamp, last_hash))
    return stale


if __name__ == "__main__":
    bad = stale_rows()
    for name, stamp, last in bad:
        print(f"STALE {name}: probed at {stamp}, code changed in {last}")
    print(f"{len(bad)} stale probe rows")
    sys.exit(1 if bad else 0)
