"""Property-based tests (hypothesis) for the pure-python control plane."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_github_log_importer_spark.sources.gharchive import hourly_file_list
from clickhouse_github_log_importer_spark.sources.gitee import (
    RepoCursor,
    paginate_repo_events,
)
from clickhouse_github_log_importer_spark.sources.manifest import FileStatus, Manifest
from clickhouse_github_log_importer_spark.streaming.pipeline import key_for_path

_START = datetime(2015, 1, 1, tzinfo=timezone.utc)


@given(
    start_h=st.integers(min_value=0, max_value=20000),
    span_h=st.integers(min_value=0, max_value=2000),
)
@settings(max_examples=50, deadline=None)
def test_hourly_file_list_count_and_keys(start_h, span_h):
    start = _START + timedelta(hours=start_h)
    end = start + timedelta(hours=span_h)
    lst = hourly_file_list(start, end)
    # the reference's only unit-test invariant: count == hours in range
    assert len(lst) == span_h + 1
    # keys are strictly increasing and collision-free under F9 encoding
    keys = [key_for_path(p) for p in lst]
    assert all(a < b for a, b in zip(keys, keys[1:]))


@given(
    statuses=st.dictionaries(
        st.text(alphabet="abc/0123456789", min_size=1, max_size=20),
        st.sampled_from(list(FileStatus)),
        max_size=30,
    )
)
@settings(max_examples=50, deadline=None)
def test_manifest_roundtrip_any_state(tmp_path_factory, statuses):
    path = str(tmp_path_factory.mktemp("m") / "meta.json")
    m = Manifest(path)
    for k, v in statuses.items():
        m.set(k, v)
    m.save()
    m2 = Manifest(path)
    assert dict(m2.items()) == statuses
    assert sum(m2.stat().values()) == len(statuses)


@given(
    ids=st.lists(st.integers(min_value=1, max_value=10_000), min_size=0,
                 max_size=200, unique=True),
    max_id=st.integers(min_value=0, max_value=10_000),
    page=st.integers(min_value=1, max_value=7),
)
@settings(max_examples=80, deadline=None)
def test_cursor_never_duplicates_or_misses_new_events(ids, max_id, page):
    """T6 invariant: 'new'-stage ingestion sinks exactly the stored-max-id
    exceeders that the API exposes, each once, newest-first."""
    ordered = sorted(ids, reverse=True)

    def fetch(name, prev_id):
        pool = [i for i in ordered if prev_id < 0 or i < prev_id]
        return [{"id": i} for i in pool[:page]]

    got: list[int] = []
    cur = RepoCursor(
        name="r", created_at=datetime(2020, 1, 1), max_id=max_id,
        min_id=0, min_created_at=None,
    )
    paginate_repo_events(cur, fetch, lambda evs: got.extend(e["id"] for e in evs))
    if max_id > 0:
        expected = [i for i in ordered if i > max_id]
        # min_id=0 -> after hitting a known id the cursor breaks (nothing
        # older to backfill); everything newer arrived exactly once
        assert got == expected
    else:
        assert got == ordered  # first-ever import: full drain
    assert len(set(got)) == len(got)
