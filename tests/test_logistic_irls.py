"""logistic_regression_irls: the distributed IRLS fit must equal an
independent dense numpy IRLS on the same design matrix — same
iteration count, same start — to ~1e-8, and the moments/solve helpers
must be exact on a hand-checkable system."""

from __future__ import annotations

import numpy as np
import pytest

from clickhouse_github_log_importer_spark.operators.logistic import (
    _solve3,
    irls_fit,
)


def test_solve3_matches_numpy():
    rng = np.random.default_rng(7)
    A = rng.normal(size=(3, 3))
    A = A @ A.T + 3 * np.eye(3)  # SPD
    t = rng.normal(size=3)
    s = (A[0, 0], A[0, 1], A[0, 2], A[1, 1], A[1, 2], A[2, 2])
    got = np.array(_solve3(s, tuple(t)))
    want = np.linalg.solve(A, t)
    assert np.allclose(got, want, rtol=1e-12)


def _numpy_irls(X, y, iters=3):
    beta = np.zeros(3)
    for _ in range(iters):
        u = np.clip(X @ beta, -30.0, 30.0)  # the engines' saturation clamp
        p = 1.0 / (1.0 + np.exp(-u))
        w = p * (1.0 - p)
        z = u + (y - p) / w
        A = (X * w[:, None]).T @ X
        b = (X * w[:, None]).T @ z
        beta = np.linalg.solve(A, b)
    return beta


@pytest.fixture(scope="module")
def design(spark, sf_smoke):
    import duckdb

    rows = duckdb.sql(
        f"""
        SELECT ((epoch_us(ts) // 3600000000) % 24) / 24.0 AS x1,
               value / 100.0 AS x2,
               CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        FROM read_parquet('{sf_smoke}/events.parquet')
        """
    ).fetchnumpy()
    # duckdb returns masked arrays for nullable columns; densify
    x1 = np.asarray(rows["x1"], dtype=float)
    x2 = np.asarray(rows["x2"], dtype=float)
    y = np.asarray(rows["y"], dtype=float)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    return X, y


def test_distributed_irls_matches_dense_numpy(spark, design, sf_smoke):
    from clickhouse_github_log_importer_spark.plans.queries import t as _t
    from pyspark.sql import functions as F

    ev = _t(spark, sf_smoke, "events").select(
        (F.expr("(ts_us div 3600000000) % 24") / F.lit(24.0)).alias("x1"),
        (F.col("value") / F.lit(100.0)).alias("x2"),
        F.when(F.col("event_type") == "purchase", F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
    )
    beta, dev, npos = irls_fit(ev)
    X, y = design
    want = _numpy_irls(X, y)
    assert np.allclose(np.array(beta), want, rtol=1e-8, atol=1e-10)
    # deviance against the same final beta
    u = X @ want
    p = 1.0 / (1.0 + np.exp(-u))
    want_dev = -2.0 * np.sum(y * np.log(p) + (1 - y) * np.log(1 - p))
    assert abs(dev - want_dev) < 1e-6
    assert npos == int(np.sum(u > 0))
