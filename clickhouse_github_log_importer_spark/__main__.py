"""CLI: the reference is a deployable app (egg.js), so the engine ships
one too.

    python -m clickhouse_github_log_importer_spark ingest --data-dir D --table T --meta M
    python -m clickhouse_github_log_importer_spark serve --events PATH [--port P]
    python -m clickhouse_github_log_importer_spark query "SELECT ..." --events PATH
    python -m clickhouse_github_log_importer_spark schema
    python -m clickhouse_github_log_importer_spark status --meta M
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="clickhouse_github_log_importer_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("ingest", help="one incremental pipeline tick (T1-T7)")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--meta", required=True)
    p.add_argument("--download", action="store_true")
    p.add_argument("--lock", default=None)

    p = sub.add_parser("serve", help="HTTP query surface (SURVEY 2.11)")
    p.add_argument("--events", required=True, help="events parquet path")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--status", default=None)

    p = sub.add_parser("query", help="SQL passthrough with response envelope")
    p.add_argument("sql")
    p.add_argument("--events", required=True)

    p = sub.add_parser(
        "op", help="run any registered operator by name (use 'op --list')"
    )
    p.add_argument("name", nargs="?", default=None)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--limit", type=int, default=100)
    p.add_argument("--list", action="store_true", dest="list_ops")

    sub.add_parser("schema", help="db_schema introspection")

    p = sub.add_parser("status", help="pipeline status document")
    p.add_argument("--meta", required=True)

    args = ap.parse_args(argv)

    if args.cmd == "schema":  # no Spark needed
        from . import api

        print(json.dumps(api.db_schema()))
        return 0

    if args.cmd == "op" and args.list_ops:  # no Spark needed
        from .plans.queries import REGISTRY

        print(
            json.dumps(
                [
                    {"name": n, "tags": list(sp.tags)}
                    for n, sp in sorted(REGISTRY.items())
                ]
            )
        )
        return 0

    if args.cmd == "status":
        from .sources.manifest import Manifest
        from .streaming.pipeline import update_status

        m = Manifest(args.meta)
        print(json.dumps(update_status(m, args.meta + ".status.json")))
        return 0

    from .session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "ingest":
        from .streaming.pipeline import PipelineLock, run_incremental

        def tick():
            return run_incremental(
                spark, args.meta, args.data_dir, args.table, download=args.download
            )

        if args.lock:
            with PipelineLock(args.lock):
                status = tick()
        else:
            status = tick()
        print(json.dumps(status))
        return 0

    if args.cmd == "serve":
        from .api_server import serve

        srv = serve(
            spark,
            port=args.port,
            status_path=args.status,
            table_paths={"events": args.events},
        )
        print(f"serving on http://127.0.0.1:{srv.server_address[1]}", flush=True)
        try:
            import threading

            threading.Event().wait()
        except KeyboardInterrupt:
            srv.shutdown()
        return 0

    if args.cmd == "query":
        from . import api

        api.register_views(spark, {"events": args.events})
        print(json.dumps(api.query(spark, args.sql), default=str))
        return 0

    if args.cmd == "op":
        from . import api
        from .plans.queries import REGISTRY

        if args.name not in REGISTRY:
            print(json.dumps({"error": f"unknown op {args.name!r}"}))
            return 2
        df = REGISTRY[args.name].spark(spark, args.sf_dir).limit(args.limit)
        print(json.dumps({**api.envelope(df), "op": args.name}, default=str))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
