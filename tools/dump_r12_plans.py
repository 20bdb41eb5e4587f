#!/usr/bin/env python
"""Dump `.explain("formatted")` for named registry entries to
plans/r12/<name>_<suffix>.txt — the optimization round's before/after
plan evidence. Run from any checkout; pass --outdir to aim at the main
repo's plans/r12 when dumping "before" plans from a worktree.

    python tools/dump_r12_plans.py --suffix before --outdir /root/repo/plans/r12 name...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    outdir = args.outdir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(outdir, exist_ok=True)

    from contextlib import redirect_stdout

    from clickhouse_github_log_importer_spark.plans.queries import REGISTRY
    from clickhouse_github_log_importer_spark.session import get_spark

    spark = get_spark(app_name="dump_r12_plans")
    spark.sparkContext.setLogLevel("ERROR")

    for name in args.names:
        df = REGISTRY[name].spark(spark, args.sf_dir)
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f, redirect_stdout(f):
            df.explain("formatted")
        print("wrote", path)


if __name__ == "__main__":
    main()
