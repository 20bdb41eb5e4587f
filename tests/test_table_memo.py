"""The r12 table-plan memo in plans.queries.t().

``spark.read.parquet`` costs ~135 ms of single-threaded driver time per
call (file listing + footer schema inference); the memo hands the SAME
immutable DataFrame (logical plan) back for an unchanged (app, path,
mtime, size) key. These tests pin the three contract points: memo hit on
the same table, invalidation when the file changes, and the memoized
events frame still carrying the normalize_events_ts derivations.
"""

from __future__ import annotations

import os
import shutil

from clickhouse_github_log_importer_spark.plans.queries import (
    _TABLE_MEMO,
    t,
)

from .conftest import SF_SMOKE


def test_memo_hit_same_object(spark):
    a = t(spark, SF_SMOKE, "events")
    b = t(spark, SF_SMOKE, "events")
    assert a is b


def test_memoized_events_frame_is_normalized(spark):
    df = t(spark, SF_SMOKE, "events")
    assert "ts_us" in df.columns and "ts" in df.columns
    assert dict(df.dtypes)["ts_us"] == "bigint"


def test_memo_invalidates_on_file_change(spark, tmp_path):
    sf = str(tmp_path)
    shutil.copy(f"{SF_SMOKE}/events.parquet", f"{sf}/events.parquet")
    a = t(spark, sf, "events")
    # rewrite the file with a different mtime: the memo must miss
    os.utime(f"{sf}/events.parquet", ns=(1, 1))
    b = t(spark, sf, "events")
    assert a is not b
    # and the stale key must not accrete forever for this path: both
    # keys exist (bounded by distinct (path, stat) pairs seen)
    assert any(k[1].endswith("events.parquet") for k in _TABLE_MEMO)


def test_memo_results_recompute_from_parquet(spark, tmp_path):
    """The memo caches a PLAN, not results: a re-read after the file
    changes (new key) sees the new data."""
    sf = str(tmp_path)
    shutil.copy(f"{SF_SMOKE}/region.parquet", f"{sf}/region.parquet")
    n0 = t(spark, sf, "region").count()
    # swap in a different table file under the same name
    shutil.copy(f"{SF_SMOKE}/nation.parquet", f"{sf}/region.parquet")
    n1 = t(spark, sf, "region").count()
    assert n0 != n1
