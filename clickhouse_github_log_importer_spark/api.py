"""Query facade: the reference's HTTP surface as a library API.

Endpoints re-expressed (``app/router.ts:6-8``, ``README.md:72-130``):

- ``db_schema()``    -> GET /query/db_schema  (schema introspection)
- ``status(path)``   -> GET /status           (pipeline status document)
- ``query(sql)``     -> POST /query           (SQL passthrough) returning
  the ClickHouse response envelope (``app/types.ts:8-15``): ``meta`` (name/
  type per column), ``data``, ``rows``, ``statistics {elapsed, rows_read,
  bytes_read}``. In the reference, ClickHouse executes the SQL; here
  Catalyst does (parse -> analyze -> optimize -> execute), and statistics
  come from the executed plan's metrics instead of a server header.
"""

from __future__ import annotations

import json
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from . import schema as _schema


def db_schema() -> list[dict[str, str]]:
    """GET /query/db_schema (app/controller/query.ts:7-14)."""
    return _schema.db_schema()


def status(status_path: str) -> dict[str, Any]:
    """GET /status (app/controller/status.ts:7-12)."""
    with open(status_path) as f:
        return json.load(f)


def _plan_metrics(df: DataFrame) -> dict[str, int]:
    """Pull rows_read / bytes_read from the executed plan's scan metrics.

    AQE wraps the tree in AdaptiveSparkPlanExec / QueryStageExec layers
    whose collectLeaves stops at stage boundaries — walk through them.
    """
    rows_read = bytes_read = 0
    try:
        stack = [df._jdf.queryExecution().executedPlan()]
        while stack:
            node = stack.pop()
            cls = node.getClass().getName()
            if cls.endswith("AdaptiveSparkPlanExec"):
                stack.append(node.executedPlan())
                continue
            if "QueryStageExec" in cls:
                stack.append(node.plan())
                continue
            if "FileSourceScanExec" in cls or "BatchScanExec" in cls:
                metrics = node.metrics()
                if metrics.contains("numOutputRows"):
                    rows_read += metrics.apply("numOutputRows").value()
                if metrics.contains("filesSize"):
                    bytes_read += metrics.apply("filesSize").value()
            it = node.children().iterator()
            while it.hasNext():
                stack.append(it.next())
    except Exception:
        pass  # metrics are best-effort; envelope stays well-formed
    return {"rows_read": int(rows_read), "bytes_read": int(bytes_read)}


def query(
    spark: SparkSession,
    sql: str,
    limit: int | None = None,
    args: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """POST /query passthrough with ClickhouseSelectResponse envelope.

    The reference streams JSONCompactEachRow from ClickHouse
    (``app/service/clickhouse.ts:23-42``); we run the SQL through Catalyst
    over the registered views and shape the same envelope. ``args`` binds
    named parameters (``:name`` placeholders) — the F20 ``{param:Type}``
    ClickHouse parameter analog, injection-safe.
    """
    t0 = time.monotonic()
    df = spark.sql(sql, args=args) if args else spark.sql(sql)
    if limit is not None:
        df = df.limit(limit)
    data = [list(r) for r in df.collect()]
    elapsed = time.monotonic() - t0
    meta = [
        {"name": f.name, "type": f.dataType.simpleString()} for f in df.schema.fields
    ]
    stats = _plan_metrics(df)
    return {
        "meta": meta,
        "data": data,
        "rows": len(data),
        "rows_before_limit_at_least": len(data),
        "statistics": {"elapsed": elapsed, **stats},
    }


def envelope(df) -> dict[str, Any]:
    """ClickhouseSelectResponse envelope for an already-built DataFrame
    plan (the GET /op/<name> registry surface — same shape as
    :func:`query`, without the SQL round-trip)."""
    t0 = time.monotonic()
    data = [list(r) for r in df.collect()]
    elapsed = time.monotonic() - t0
    meta = [
        {"name": f.name, "type": f.dataType.simpleString()}
        for f in df.schema.fields
    ]
    return {
        "meta": meta,
        "data": data,
        "rows": len(data),
        "rows_before_limit_at_least": len(data),
        "statistics": {"elapsed": elapsed, **_plan_metrics(df)},
    }


def register_views(spark: SparkSession, table_paths: dict[str, str]) -> None:
    """Register parquet tables as SQL views for the passthrough surface."""
    for name, path in table_paths.items():
        spark.read.parquet(path).createOrReplaceTempView(name)
