"""S10 retry/backoff executor tests (request_executor.ts:108-158 parity):
per-request maxAttempts/retryDelay, retryStrategy veto, proxy rotation
with poisoned-proxy eviction, and worker-level drain-and-retry passes."""

from __future__ import annotations

from datetime import datetime, timezone

from clickhouse_github_log_importer_spark.sources.gharchive import (
    download_missing,
    hourly_file_list,
)
from clickhouse_github_log_importer_spark.sources.manifest import (
    FileStatus,
    Manifest,
)
from clickhouse_github_log_importer_spark.sources.retry import (
    ProxyPool,
    RetryPolicy,
    call_with_retries,
    retrying_fetcher,
)


def _policy(attempts=3, delay=2.0, backoff=1.0):
    slept: list[float] = []
    p = RetryPolicy(
        max_attempts=attempts, delay_s=delay, backoff=backoff, sleep=slept.append
    )
    return p, slept


def test_transient_failure_recovers():
    p, slept = _policy(attempts=3)
    calls = []

    def flaky():
        calls.append(1)
        return len(calls) >= 3  # fails twice, then succeeds

    assert call_with_retries(flaky, p) is True
    assert len(calls) == 3
    assert slept == [2.0, 2.0]  # fixed retryDelay like requestretry


def test_permanent_failure_returns_falsy_after_max_attempts():
    p, slept = _policy(attempts=4)
    calls = []

    def dead():
        calls.append(1)
        raise ConnectionError("boom")

    assert call_with_retries(dead, p) is False  # resolves, never raises
    assert len(calls) == 4
    assert len(slept) == 3


def test_exponential_backoff_capped():
    p, slept = _policy(attempts=5, delay=1.0, backoff=10.0)
    p.max_delay_s = 50.0
    assert call_with_retries(lambda: False, p) is False
    assert slept == [1.0, 10.0, 50.0, 50.0]


def test_retry_on_veto_stops_immediately():
    # the retryStrategy hook: a 404 is permanent, don't burn attempts
    p, slept = _policy(attempts=5)
    calls = []

    def not_found():
        calls.append(1)
        return None  # e.g. a 404 mapped to "no result"

    out = call_with_retries(not_found, p, retry_on=lambda exc, res: False)
    assert out is None and len(calls) == 1 and slept == []


def test_proxy_rotation_evicts_poisoned():
    pool = ProxyPool(["p1", "p2", "p3"])
    p, _ = _policy(attempts=3)
    seen = []

    def fetch(url, proxy=None):
        seen.append(proxy)
        return proxy == "p3"  # p1/p2 are poisoned

    wrapped = retrying_fetcher(fetch, p, proxy_pool=pool)
    assert wrapped("http://x") is True
    assert seen == ["p1", "p2", "p3"]
    assert len(pool) == 1  # p1/p2 evicted


def test_proxy_pool_degrades_to_direct():
    pool = ProxyPool(["p1"])
    p, _ = _policy(attempts=2)

    def fetch(url, proxy=None):
        return proxy is None  # only direct succeeds

    wrapped = retrying_fetcher(fetch, p, proxy_pool=pool)
    assert wrapped("http://x") is True
    assert len(pool) == 0


def test_download_missing_retries_transient(tmp_path):
    m = Manifest(str(tmp_path / "meta.json"))
    start = datetime.now(timezone.utc).replace(hour=0)
    for key in hourly_file_list(start, start):
        m.set(key, FileStatus.NeedDownload)
    attempts: dict[str, int] = {}

    def fetcher(url, dest):
        attempts[url] = attempts.get(url, 0) + 1
        if attempts[url] < 3:
            return False
        with open(dest, "w") as f:
            f.write("x")
        return True

    p, slept = _policy(attempts=3)
    download_missing(m, str(tmp_path), fetcher=fetcher, retry_policy=p)
    assert all(n == 3 for n in attempts.values())
    assert not m.keys_with(FileStatus.NeedDownload)
    assert len(m.keys_with(FileStatus.Downloaded)) == len(attempts)


def test_download_missing_worker_passes_recover(tmp_path):
    # first drain fails everything; the second worker pass (after the
    # workerRetryInterval sleep) succeeds — the reference's while(retry <
    # workerRetry) { work(); waitFor(interval) } loop
    m = Manifest(str(tmp_path / "meta.json"))
    start = datetime.now(timezone.utc).replace(hour=0)
    keys = hourly_file_list(start, start)
    for key in keys:
        m.set(key, FileStatus.NeedDownload)
    state = {"pass_ok": False, "calls": 0}
    slept: list[float] = []
    p = RetryPolicy(max_attempts=1, sleep=slept.append)

    def fetcher(url, dest):
        state["calls"] += 1
        if not state["pass_ok"]:
            state["pass_ok"] = True  # everything after the 1st call works
            return False
        with open(dest, "w") as f:
            f.write("x")
        return True

    download_missing(
        m, str(tmp_path), fetcher=fetcher, retry_policy=p,
        worker_passes=3, worker_pass_interval_s=7.0,
    )
    assert not m.keys_with(FileStatus.NeedDownload)
    assert 7.0 in slept  # the inter-pass wait used the injectable clock


def test_gitee_pagination_retries_exceptions_only():
    from clickhouse_github_log_importer_spark.sources.gitee import (
        RepoCursor,
        paginate_repo_events,
    )

    pages = [[{"id": 5}, {"id": 4}], [{"id": 3}], []]
    state = {"i": 0, "failed": False}
    got: list[dict] = []

    def fetch_page(name, prev_id):
        if state["i"] == 1 and not state["failed"]:
            state["failed"] = True
            raise ConnectionError("transient")  # retried in place
        page = pages[state["i"]]
        state["i"] += 1
        return page

    p, slept = _policy(attempts=3, delay=1.0)
    cur = RepoCursor(name="o/r", created_at=datetime(2022, 1, 1))
    paginate_repo_events(cur, fetch_page, got.extend, retry_policy=p)
    assert [e["id"] for e in got] == [5, 4, 3]
    assert slept == [1.0]  # one transient retry
    # the empty page ended pagination WITHOUT burning retry attempts
    assert state["i"] == 3


def test_download_missing_permanent_failure_demotes_cleanly(tmp_path):
    m = Manifest(str(tmp_path / "meta.json"))
    start = datetime.now(timezone.utc).replace(hour=0)
    keys = hourly_file_list(start, start)
    for key in keys:
        m.set(key, FileStatus.NeedDownload)

    def fetcher(url, dest):
        with open(dest, "w") as f:
            f.write("partial")  # simulates a partial download
        return False

    p, _ = _policy(attempts=2)
    download_missing(
        m, str(tmp_path), fetcher=fetcher, retry_policy=p, worker_passes=2,
        worker_pass_interval_s=0.0,
    )
    # still NeedDownload for the next tick, partial files cleaned up
    assert set(m.keys_with(FileStatus.NeedDownload)) == set(keys)
    import os

    for key in keys:
        assert not os.path.exists(str(tmp_path / key))
