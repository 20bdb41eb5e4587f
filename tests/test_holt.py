"""Holt linear-trend forecast entry: the Spark fold must equal a plain
Python run of the recurrence, and the forecast fan must be affine in h."""

from __future__ import annotations

from clickhouse_github_log_importer_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _holt(xs, alpha=0.5, beta=0.3):
    l, b = xs[0], xs[1] - xs[0]
    for x in xs[2:]:
        ln = alpha * x + (1 - alpha) * (l + b)
        b = beta * (ln - l) + (1 - beta) * b
        l = ln
    return l, b


def test_matches_python_recurrence(spark):
    from pyspark.sql import functions as F

    from clickhouse_github_log_importer_spark.plans.queries import t

    ev = t(spark, SF, "events")
    # rebuild the gap-filled series for one type, independently
    rows = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.expr("ts_us div 3600000000").alias("h"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    by_hour = {r["h"]: r["n"] for r in rows}
    lo, hi = min(by_hour), max(by_hour)
    xs = [float(by_hour.get(h, 0)) for h in range(lo, hi + 1)]
    l, b = _holt(xs)

    out = {
        r["h"]: r
        for r in REGISTRY["holt_linear_forecast"].spark(spark, SF).collect()
        if r["event_type"] == "click"
    }
    assert len(out) == 24
    assert out[1]["level"] == round(l, 6)
    assert out[1]["trend"] == round(b, 6)
    for h in (1, 12, 24):
        assert out[h]["forecast_n_events"] == round(l + h * b, 6)


def test_forecast_is_affine_in_h(spark):
    rows = REGISTRY["holt_linear_forecast"].spark(spark, SF).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["h"]] = r["forecast_n_events"]
    assert len(by_type) == 5
    for fc in by_type.values():
        step = fc[2] - fc[1]
        # constant slope across the fan (up to the 6 dp round)
        for h in range(2, 25):
            assert abs((fc[h] - fc[h - 1]) - step) < 2e-6
