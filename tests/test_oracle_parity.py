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


def test_no_hugeint_oracle_columns(con, sf_smoke):
    # The driver's value-hasher is type-tagged: a DuckDB HUGEINT (int128,
    # the default result type of SUM(<integer>)) hashes differently from
    # Spark's BIGINT even when every value is identical.  verify.py's
    # pandas canonicalization cannot see the difference, so this guard
    # DESCRIBEs every registered oracle and rejects HUGEINT output
    # columns outright — oracles must CAST(SUM(..) AS BIGINT).
    offenders = {}
    for name in sorted(REGISTRY):
        sql = REGISTRY[name].oracle
        if sql is None:
            continue
        cols = con.execute(f"DESCRIBE ({sql})").fetchall()
        bad = [(c[0], c[1]) for c in cols if "HUGEINT" in str(c[1]).upper()]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emitting HUGEINT columns (wrap in CAST(.. AS BIGINT)): "
        f"{offenders}"
    )


def test_hugeint_guard_catches_injected_sum(con):
    # Sanity: the guard's detection logic actually fires on a bare
    # integer SUM (DuckDB types it HUGEINT).
    cols = con.execute("DESCRIBE (SELECT SUM(1) AS s)").fetchall()
    assert any("HUGEINT" in str(c[1]).upper() for c in cols)


def test_approx_sketches_deterministic(spark, sf_smoke):
    # HLL++ and approx_percentile are hash/rank sketches with no RNG:
    # the same data must yield bit-identical estimates run-to-run (this
    # is what lets the bounded-error booleans be driver-hashable at all)
    from pyspark.sql import functions as F

    from clickhouse_github_log_importer_spark.plans.queries import t

    def once():
        return sorted(
            (r["event_type"], r["a"], tuple(r["p"]))
            for r in t(spark, sf_smoke, "events")
            .groupBy("event_type")
            .agg(
                F.approx_count_distinct("user_id", 0.05).alias("a"),
                F.expr("approx_percentile(value, array(0.5, 0.99), 10000)").alias("p"),
            )
            .collect()
        )

    assert once() == once()
