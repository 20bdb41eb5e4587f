"""Local twin of the driver's t2 gate: every registered query must match
its DuckDB oracle exactly at sf0.001 (and sf0.01 when RUN_SF001=0)."""

from __future__ import annotations

import pytest

from clickhouse_github_log_importer_spark.plans.queries import REGISTRY
from clickhouse_github_log_importer_spark.plans.verify import (
    compare_query,
    duckdb_connection,
)


@pytest.fixture(scope="module")
def con(sf_smoke):
    return duckdb_connection(sf_smoke)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, sf_smoke, name):
    r = compare_query(spark, con, name, sf_smoke)
    assert r.ok, f"{name}: {r.detail}"
