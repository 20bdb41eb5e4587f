"""SparkSession factory.

The reference stores all timestamps as UTC wall time (``app/parser.js:6-11``
formats with the UTC flag) and relies on ClickHouse server-side execution;
here Catalyst/Tungsten take that role. Session defaults:

- ``spark.sql.session.timeZone=UTC`` — timestamp parity (SURVEY P13/F10).
- AQE on (incl. skew-join handling) — runtime re-planning stands in for
  ClickHouse's adaptive merge/aggregation machinery and is what makes the
  same plans survive 100x data growth.
- Arrow enabled — every Python<->JVM exchange (the few pandas UDF paths)
  is Arrow-batched, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "clickhouse-github-log-importer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    On a real cluster ``master`` comes from the environment; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``. Shuffle partitions default to
    the core count locally; at cluster scale leave AQE coalescing to pick
    the effective number (we only set the initial/ceiling value).
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # GH event ids exceed 2^31; make sure implicit int types stay wide.
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        # Safety net only: IF a parquet column is TIMESTAMP(NANOS) it
        # surfaces as LongType epoch-nanos instead of erroring (Spark has no
        # nanosecond timestamp). No-op for MICROS/MILLIS columns — the
        # current testdata events.ts is MICROS and loads as timestamp_ntz.
        # All events loading is type-adaptive via
        # plans.queries.normalize_events_ts; never assume one resolution.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Keep broadcast threshold generous: every dimension table in the
        # model (region/nation/customer-sized dims, gitee_orgs_repos) is
        # broadcastable and must never shuffle the fact side.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if master is None and not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{DEFAULT_SHUFFLE_PARTITIONS}]")
    elif master is not None:
        builder = builder.master(master)
    builder = builder.config(
        "spark.sql.shuffle.partitions",
        str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
