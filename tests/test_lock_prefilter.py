"""T2 pipeline lock, S1 injected-fetcher download, R6 substring prefilter."""

from __future__ import annotations

import os
import time

import pytest

from clickhouse_github_log_importer_spark.sources.gharchive import (
    download_missing,
    read_prefiltered_text,
)
from clickhouse_github_log_importer_spark.sources.manifest import FileStatus, Manifest
from clickhouse_github_log_importer_spark.streaming.pipeline import PipelineLock

from .fixtures import events, write_gz


def test_pipeline_lock_excludes_overlap(tmp_path):
    lock = str(tmp_path / "run.lock")
    with PipelineLock(lock):
        assert os.path.exists(lock)
        with pytest.raises(RuntimeError, match="already running"):
            with PipelineLock(lock):
                pass
    assert not os.path.exists(lock)  # released


def test_pipeline_lock_breaks_stale(tmp_path):
    lock = str(tmp_path / "run.lock")
    with open(lock, "w") as f:
        f.write("999999")
    os.utime(lock, (time.time() - 10_000, time.time() - 10_000))
    with PipelineLock(lock, stale_s=3600):
        assert os.path.exists(lock)  # stale lock broken, new one taken


def test_download_missing_with_fetcher(tmp_path):
    data_dir = str(tmp_path / "data")
    m = Manifest(str(tmp_path / "meta.json"))
    recent = time.strftime("%Y/%m/%d/%Y-%m-%d-5.json.gz", time.gmtime())
    old = "2015/01/01/2015-01-01-5.json.gz"
    m.ensure([recent, old])

    fetched = []

    def fetcher(url, dest):
        fetched.append(url)
        ok = "2015" not in url
        if ok:
            with open(dest, "wb") as f:
                f.write(b"data")
        else:
            with open(dest, "wb") as f:
                f.write(b"partial")  # simulates partial download before fail
        return ok

    download_missing(m, data_dir, fetcher=fetcher, max_age_days=30)
    # old file is age-gated (P19): never even attempted
    assert all("2015" not in u for u in fetched)
    assert m.get(recent) == FileStatus.Downloaded
    assert m.get(old) == FileStatus.NeedDownload
    # success left the file; a failed fetch would have been cleaned up
    assert os.path.exists(os.path.join(data_dir, recent))


def test_download_cleans_partial_on_failure(tmp_path):
    data_dir = str(tmp_path / "data")
    m = Manifest(str(tmp_path / "meta.json"))
    recent = time.strftime("%Y/%m/%d/%Y-%m-%d-6.json.gz", time.gmtime())
    m.ensure([recent])

    def fetcher(url, dest):
        with open(dest, "wb") as f:
            f.write(b"partial")
        return False

    download_missing(m, data_dir, fetcher=fetcher)
    assert m.get(recent) == FileStatus.NeedDownload
    assert not os.path.exists(os.path.join(data_dir, recent))  # partial removed


def test_substring_prefilter(spark, tmp_path):
    path = str(tmp_path / "x.json.gz")
    write_gz(path, events(), corrupt_lines=0)
    lines = read_prefiltered_text(
        spark, path, ["IssuesEvent", "PullRequestEvent"]
    )
    n = lines.count()
    # 100,101,102 IssuesEvent + 104 PullRequestEvent (the Review* type
    # names do NOT contain 'PullRequestEvent' as a substring)
    assert n == 4
    all_lines = spark.read.text(path).count()
    assert n < all_lines
