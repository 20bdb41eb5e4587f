"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md 2 as (spark, sf_dir) callables;
``oracle_sql()`` gives the DuckDB-equivalent SQL per query (same column
names/aliases — the driver hash-compares values after sorting columns by
name).

The implementations live in ``clickhouse_github_log_importer_spark``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clickhouse_github_log_importer_spark.plans.queries import REGISTRY
from clickhouse_github_log_importer_spark.plans.sample_window import (
    ordered_names,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the J1/A5 weighted
    activity score (the reference's repo_activity, README.md:109-129)."""
    return REGISTRY["user_activity"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md 2, ordered so
    the driver's 50-entry correctness sample rotates through entries
    that lack a driver-green row (plans/sample_window.py)."""
    return {name: REGISTRY[name].spark for name in ordered_names(REGISTRY)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible)."""
    return {
        name: REGISTRY[name].oracle
        for name in ordered_names(REGISTRY)
        if REGISTRY[name].oracle is not None
    }
