"""Schema-drift canary for the events ``ts`` column.

Round 2 post-mortem: the testdata's parquet timestamp resolution drifted
from NANOS (read as bigint via ``nanosAsLong``) to MICROS (read as
``timestamp_ntz``), and a hard-coded ``ts div 1000`` in the shared events
loader took down every events-family query. This battery pins the
type-adaptive contract of ``normalize_events_ts`` / ``t()`` for each
physical encoding the driver has ever produced — plus the ones it could
plausibly produce next — so that class of bug cannot silently recur.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clickhouse_github_log_importer_spark.plans.queries import (
    normalize_events_ts,
    t,
)

# one known instant: 2024-01-02 03:04:05.678901 UTC
US = 1704164645678901


def _write_events(tmpdir: str, ts_array: pa.Array) -> str:
    sf_dir = os.path.join(tmpdir, "sf")
    os.makedirs(sf_dir, exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.5], pa.float64()),
            "props": pa.array(['{"k": 1}'], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


ENCODINGS = {
    # current driver output: TIMESTAMP(MICROS), no tz -> Spark timestamp_ntz
    "micros_ntz": pa.array([US], pa.timestamp("us")),
    # instant-typed micros -> Spark timestamp (tz-aware)
    "micros_utc": pa.array([US], pa.timestamp("us", tz="UTC")),
    # round-1-era: TIMESTAMP(NANOS) -> bigint epoch-ns via nanosAsLong
    "nanos": pa.array([US * 1000], pa.timestamp("ns")),
    # millis round-trips too (pa ints are unit-scaled: pass millis)
    "millis": pa.array([US // 1000], pa.timestamp("ms")),
}


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_events_ts_loader_handles_all_resolutions(spark, tmp_path, enc):
    sf_dir = _write_events(str(tmp_path), ENCODINGS[enc])
    df = t(spark, sf_dir, "events")
    dtypes = dict(df.dtypes)
    assert dtypes["ts_us"] == "bigint"
    assert dtypes["ts"] == "timestamp"
    row = df.select("ts_us", "ts").first()
    expect_us = US if enc != "millis" else (US // 1000) * 1000
    assert row["ts_us"] == expect_us
    # ts renders the same UTC wall clock in every encoding
    got = row["ts"].strftime("%Y-%m-%d %H:%M:%S")
    assert got == "2024-01-02 03:04:05"


def test_normalize_is_a_pure_projection(spark, tmp_path):
    # the derivation must stay shuffle-free whatever the input type
    sf_dir = _write_events(str(tmp_path), ENCODINGS["micros_ntz"])
    df = t(spark, sf_dir, "events")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_normalize_rejects_garbage_ts_type(spark):
    df = spark.createDataFrame([(1, "not-a-time")], "event_id long, ts string")
    with pytest.raises(TypeError, match="unsupported dtype"):
        normalize_events_ts(df)


def test_normalize_noop_without_ts(spark):
    df = spark.createDataFrame([(1,)], "event_id long")
    assert normalize_events_ts(df) is df


# ---------------------------------------------------------------------
# property: the loader contract holds for GENERATED instants across the
# whole resolution x tz-awareness matrix, not just the one pinned value —
# the next driver drift is caught by construction, not by a red round
# ---------------------------------------------------------------------

import datetime as _dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# 1970..2100, in microseconds — the range any plausible testdata generator
# emits; avoids int64-edge and pre-epoch render corner cases that the
# driver can't produce
_INSTANTS = st.lists(
    st.integers(min_value=0, max_value=4_102_444_800_000_000 - 1),
    min_size=1,
    max_size=8,
    unique=True,
)

_MATRIX = {
    "micros_ntz": ("us", None),
    "micros_utc": ("us", "UTC"),
    "millis_ntz": ("ms", None),
    "millis_utc": ("ms", "UTC"),
    "nanos_ntz": ("ns", None),
}


@pytest.mark.parametrize("enc", sorted(_MATRIX))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(instants=_INSTANTS)
def test_events_ts_loader_property(spark, tmp_path_factory, enc, instants):
    unit, tz = _MATRIX[enc]
    scale = {"us": 1, "ms": 1_000, "ns": 1}[unit]
    # millis can only represent ms-truncated instants; physical values are
    # unit-scaled integers
    vals = [(us // scale) * scale for us in instants]
    phys = [
        us // 1_000 if unit == "ms" else (us * 1_000 if unit == "ns" else us)
        for us in vals
    ]
    tmpdir = str(tmp_path_factory.mktemp("tsprop"))
    sf_dir = os.path.join(tmpdir, "sf")
    os.makedirs(sf_dir, exist_ok=True)
    n = len(vals)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(phys, pa.timestamp(unit, tz=tz)),
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([1.5] * n, pa.float64()),
            "props": pa.array(['{"k": 1}'] * n, pa.string()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))

    df = t(spark, sf_dir, "events")
    dtypes = dict(df.dtypes)
    assert dtypes["ts_us"] == "bigint" and dtypes["ts"] == "timestamp"
    rows = {r["event_id"]: r for r in df.select("event_id", "ts_us", "ts").collect()}
    for i, us in enumerate(vals):
        assert rows[i]["ts_us"] == us, enc
        want = _dt.datetime.fromtimestamp(
            us // 1_000_000, tz=_dt.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")
        assert rows[i]["ts"].strftime("%Y-%m-%d %H:%M:%S") == want, enc


# ---------------------------------------------------------------------
# embeddings drift: float32 vs float64 element type must not change any
# quantized value (quantized() casts through double before rounding)
# ---------------------------------------------------------------------


@pytest.mark.parametrize("elem", ["float", "double"])
def test_embedding_element_type_drift(spark, tmp_path, elem):
    from clickhouse_github_log_importer_spark.operators.similarity import (
        with_quantized_norm,
    )

    sf_dir = str(tmp_path / f"emb_{elem}")
    os.makedirs(sf_dir, exist_ok=True)
    rng = [0.125, -0.5, 0.0009765625, 1.0]  # exactly representable in f32
    arr = pa.array([rng], pa.list_(pa.float32() if elem == "float" else pa.float64()))
    table = pa.table({"vec_id": pa.array([1], pa.int64()), "embedding": arr})
    pq.write_table(table, os.path.join(sf_dir, "embeddings.parquet"))
    df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    row = with_quantized_norm(df).first()
    assert list(row["q"]) == [round(v * 1000) for v in rng]
    assert row["norm2"] == sum(round(v * 1000) ** 2 for v in rng)
