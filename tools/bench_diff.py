#!/usr/bin/env python
"""Cross-round per-query bench comparator.

The r6/r7 drift postmortems (SCALE.md) established the protocol: never
compare rounds by the headline total — registries grow and long-JVM
suite pressure moves individual rows — compare the COMMON query subset
per-query, and treat the common-subset ratio as the real cross-round
signal (r6's "+29% regression" was host noise; the r7 gated run put the
r5-common-subset ratio at 1.001). This tool makes that protocol a
one-liner instead of a hand-rolled analysis each round.

Usage:
  python tools/bench_diff.py OLD NEW [--top N]
where OLD/NEW are each either a path to a BENCH_FULL.json or a git ref
(the file is read as `git show REF:BENCH_FULL.json`). Prints the
common-subset totals and ratio, entries only in one side, and the top-N
per-query regressions and improvements.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(spec: str) -> dict[str, float]:
    """Query->seconds map from a file path or a git ref."""
    if os.path.exists(spec):
        with open(spec) as f:
            data = json.load(f)
    else:
        out = subprocess.run(
            ["git", "show", f"{spec}:BENCH_FULL.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        if out.returncode != 0:
            raise SystemExit(
                f"bench_diff: {spec!r} is neither a file nor a git ref "
                f"with BENCH_FULL.json ({out.stderr.strip()})"
            )
        data = json.loads(out.stdout)
    q = data.get("queries", data)
    return {k: float(v) for k, v in q.items() if isinstance(v, (int, float))}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=10)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    common = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))

    t_old = sum(old[k] for k in common)
    t_new = sum(new[k] for k in common)
    print(
        f"common subset: {len(common)} queries | "
        f"old {t_old:.1f}s new {t_new:.1f}s | "
        f"ratio {t_new / t_old:.3f}" if t_old else "no common queries"
    )
    if only_old:
        print(f"only in old ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        t_add = sum(new[k] for k in only_new)
        print(
            f"only in new ({len(only_new)}, {t_add:.1f}s): "
            f"{', '.join(only_new)}"
        )

    deltas = sorted(common, key=lambda k: new[k] - old[k])
    print(f"\ntop {args.top} regressions (delta s, old -> new):")
    for k in reversed(deltas[-args.top:]):
        d = new[k] - old[k]
        if d <= 0:
            break
        print(f"  {k:42s} +{d:6.2f}  {old[k]:7.2f} -> {new[k]:7.2f}")
    print(f"top {args.top} improvements:")
    for k in deltas[: args.top]:
        d = new[k] - old[k]
        if d >= 0:
            break
        print(f"  {k:42s} {d:7.2f}  {old[k]:7.2f} -> {new[k]:7.2f}")
    print(
        "\nprotocol reminder (SCALE.md): in-suite per-query drift under "
        "long-JVM pressure is NOT a regression until reproduced in an "
        "isolated fresh session."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
