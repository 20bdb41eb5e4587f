"""HTTP query surface (SURVEY 2.11): the reference's endpoints as a tiny
stdlib server over the Spark engine.

Routes (``app/router.ts:6-8`` + the documented legacy surface,
``README.md:72-130``):

- ``GET  /query/db_schema``      -> [{key, type}] schema introspection
- ``GET  /status``               -> status.json contents
- ``POST /query``                -> SQL passthrough (form field ``query``,
  Content-Type application/x-www-form-urlencoded, like the reference);
  responds with the ClickhouseSelectResponse envelope
- ``GET  /query/record_count``   -> A1 sample endpoint
- ``GET  /query/most_used_label?topN=`` -> A3 sample endpoint
- ``GET  /query/repo_activity?topN=``   -> J1/A5 sample endpoint

The server is deliberately driver-local (the reference's egg app is a
single process too); production-grade serving would front the same
``api`` functions with any WSGI/ASGI stack. Sample endpoints run against
the registered ``events`` view mapped onto the synthetic schema.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

from . import api

SAMPLE_QUERIES = {
    # A1 (README.md:88)
    "record_count": lambda topn: "SELECT COUNT(*) AS count FROM events",
    # A3 analog (README.md:96-102)
    "most_used_label": lambda topn: f"""
        SELECT get_json_object(props, '$.k') AS label, COUNT(*) AS count
        FROM events WHERE event_type IN ('click', 'view')
        GROUP BY label ORDER BY count DESC, label ASC LIMIT {topn}
    """,
    # J1/A5 analog (README.md:109-129)
    "repo_activity": lambda topn: f"""
        SELECT user_id, round(sum(sqrt(score)), 2) AS activity FROM (
          SELECT user_id, to_date(ts) AS day,
                 count(IF(event_type = 'click', 1, NULL))
                 + 2 * count(IF(event_type = 'view', 1, NULL))
                 + 3 * count(IF(event_type = 'purchase', 1, NULL))
                 + 4 * count(IF(event_type = 'signup', 1, NULL))
                 + 5 * count(IF(event_type = 'error' AND value > 100, 1, NULL)) AS score
          FROM events GROUP BY user_id, to_date(ts)
          HAVING count(IF(event_type = 'click', 1, NULL)) > 0
        ) GROUP BY user_id ORDER BY activity DESC, user_id ASC LIMIT {topn}
    """,
}


def make_handler(spark: SparkSession, status_path: str | None):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, obj, code: int = 200) -> None:
            body = json.dumps(obj, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

        def do_GET(self) -> None:
            u = urlparse(self.path)
            q = parse_qs(u.query)
            topn = int(q.get("topN", ["20"])[0])
            if u.path == "/query/db_schema":
                self._json(api.db_schema())
            elif u.path == "/status":
                if status_path is None:
                    self._json({"error": "no status file configured"}, 404)
                else:
                    self._json(api.status(status_path))
            elif u.path.startswith("/query/"):
                name = u.path[len("/query/"):]
                if name not in SAMPLE_QUERIES:
                    self._json({"error": f"unknown endpoint {name}"}, 404)
                    return
                sql = SAMPLE_QUERIES[name](topn)
                try:
                    self._json({**api.query(spark, sql), "query": sql})
                except Exception as e:  # noqa: BLE001
                    self._json({"error": str(e)}, 400)
            elif u.path == "/ops":
                from .plans.queries import REGISTRY

                self._json(
                    {
                        "ops": [
                            {"name": n, "tags": list(s.tags)}
                            for n, s in sorted(REGISTRY.items())
                        ]
                    }
                )
            elif u.path.startswith("/op/"):
                # the whole registered operator surface over HTTP: every
                # query a reference user runs today, by name, with the
                # same envelope the POST /query facade returns
                from .plans.queries import REGISTRY

                name = u.path[len("/op/"):]
                if name not in REGISTRY:
                    self._json({"error": f"unknown op {name}"}, 404)
                    return
                sf_dir = q.get("sf_dir", ["/root/testdata/sf0.001"])[0]
                try:
                    # inside the try: a malformed ?limit=abc must produce
                    # the same JSON 400 envelope as any other bad input,
                    # not an unhandled traceback
                    limit = int(q.get("limit", ["100"])[0])
                    df = REGISTRY[name].spark(spark, sf_dir).limit(limit)
                    self._json(
                        {**api.envelope(df), "op": name, "sf_dir": sf_dir}
                    )
                except Exception as e:  # noqa: BLE001
                    self._json({"error": str(e)}, 400)
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self) -> None:
            if urlparse(self.path).path != "/query":
                self._json({"error": "not found"}, 404)
                return
            length = int(self.headers.get("Content-Length", "0"))
            form = parse_qs(self.rfile.read(length).decode())
            sql = form.get("query", [""])[0]
            if not sql:
                self._json({"error": "missing query"}, 400)
                return
            try:
                self._json(api.query(spark, sql))
            except Exception as e:  # noqa: BLE001
                self._json({"error": str(e)}, 400)

    return Handler


def serve(
    spark: SparkSession,
    port: int = 0,
    status_path: str | None = None,
    table_paths: dict[str, str] | None = None,
) -> ThreadingHTTPServer:
    """Start the server on a background thread; returns it (use
    ``server.server_address`` for the bound port, ``shutdown()`` to stop)."""
    if table_paths:
        from clickhouse_github_log_importer_spark.plans.queries import (
            normalize_events_ts,
        )

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        for name, path in table_paths.items():
            # type-adaptive ts handling (nanos-as-long or native timestamp):
            # SQL clients always see micro-precision `ts` + bigint `ts_us`
            df = normalize_events_ts(spark.read.parquet(path))
            df.createOrReplaceTempView(name)
    server = ThreadingHTTPServer(
        ("127.0.0.1", port), make_handler(spark, status_path)
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
