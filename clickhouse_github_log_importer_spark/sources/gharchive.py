"""GH Archive source: hourly-file enumeration, download, validation.

Reference pieces re-expressed:

- S2 path enumeration (``app/service/file_utils.ts:56-107``): every
  ``yyyy/MM/dd/yyyy-MM-dd-H.json.gz`` between start and end; hour is NOT
  zero-padded. The reference hand-rolls the calendar (incl. leap years);
  we use the standard library — same output, tested against the same
  "hours between" invariant as the reference's only unit test
  (``test/app/service/file_processor.test.ts``).
- S1 download (``app/downloader_worker.js:8-31``): ``wget -c`` per file in
  a small pool, partial file deleted on failure; order shuffled to spread
  load (``app/service/log_downloader.ts:33-42``). Driver-side by design —
  at cluster scale flip ``distributed=True`` to fan the fetch out as a
  Spark job (one task per file).
- P19 age cutoff: files older than 6 months never re-attempted
  (``app/service/log_downloader.ts:17-19``).
- T5 validity check (``app/checker_worker.js:8-51``): gunzip + per-line
  JSON parse; a corrupt file is deleted and demoted to NeedDownload.
"""

from __future__ import annotations

import gzip
import io
import json
import os
import random
import subprocess
import time
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime, timedelta, timezone

from .manifest import FileStatus, Manifest
from .retry import RetryPolicy, retrying_fetcher

BASE_URL = "https://data.gharchive.org"


def hourly_file_list(start: datetime, end: datetime | None = None) -> list[str]:
    """S2: relative paths for every hour in [start, end].

    ``getEndTime()`` in the reference is "now, floored to the hour"; the
    unit test asserts len == hours between start and end+1day.
    """
    if end is None:
        end = datetime.now(timezone.utc).replace(minute=0, second=0, microsecond=0)
    out = []
    cur = start.replace(minute=0, second=0, microsecond=0)
    while cur <= end:
        out.append(
            f"{cur.year}/{cur.month:02d}/{cur.day:02d}/"
            f"{cur.year}-{cur.month:02d}-{cur.day:02d}-{cur.hour}.json.gz"
        )
        cur += timedelta(hours=1)
    return out


def url_for(rel_path: str) -> str:
    """Relative manifest path -> GH Archive URL (flat namespace)."""
    return f"{BASE_URL}/{os.path.basename(rel_path)}"


def read_prefiltered_text(spark, paths, substrings: list[str]):
    """R6/P18: text-scan + substring prefilter before JSON parse
    (``app/service/log_neo4j_importer.ts:63`` skips lines not naming any
    interesting event type before paying JSON.parse).

    Returns the line frame filtered by an OR-of-contains rlike. With
    Spark's schema-pruned Jackson parse this is usually NOT faster than
    ``read_raw`` (measure per corpus); provided for parity and for
    pipelines that only want a small event subset.
    """
    from pyspark.sql import functions as F

    pattern = "|".join(substrings)
    return spark.read.text(paths).filter(F.col("value").rlike(pattern))


def check_existing(manifest: Manifest, data_dir: str) -> None:
    """logExistChecker (app/service/log_exist_checker.ts:8-19).

    Files present on disk but marked NeedDownload are promoted to
    Downloaded; files missing on disk but marked Downloaded/Verified are
    demoted to NeedDownload.
    """
    for key, status in list(manifest.items()):
        on_disk = os.path.exists(os.path.join(data_dir, key))
        if on_disk and status == FileStatus.NeedDownload:
            manifest.set(key, FileStatus.Downloaded)
        elif not on_disk and status in (FileStatus.Downloaded, FileStatus.Verified):
            manifest.set(key, FileStatus.NeedDownload)
    manifest.save()


def validate_file(path: str) -> bool:
    """T5: whole-file gunzip + per-line JSON parse (app/checker_worker.js)."""
    try:
        with gzip.open(path, "rt", encoding="utf-8", errors="strict") as f:
            for line in f:
                line = line.strip()
                if line:
                    json.loads(line)
        return True
    except Exception:
        return False


def check_validity(manifest: Manifest, data_dir: str) -> None:
    """Validate Downloaded files; corrupt -> delete + NeedDownload (T5)."""
    for key in manifest.keys_with(FileStatus.Downloaded):
        path = os.path.join(data_dir, key)
        if validate_file(path):
            manifest.set(key, FileStatus.Verified)
        else:
            try:
                os.remove(path)
            except OSError:
                pass
            manifest.set(key, FileStatus.NeedDownload)
    manifest.save()


def download_missing(
    manifest: Manifest,
    data_dir: str,
    workers: int = 3,
    timeout_s: int = 300,
    max_age_days: int = 183,
    fetcher=None,
    retry_policy: "RetryPolicy | None" = None,
    worker_passes: int = 1,
    worker_pass_interval_s: float = 10.0,
) -> None:
    """S1: fetch NeedDownload files (3-worker pool, 5-min timeout, shuffle).

    ``fetcher(url, dest) -> bool`` is injectable for tests / air-gapped
    runs; default shells out to wget -c like the reference.

    Transient-failure handling mirrors the reference's request executor
    (``request_executor.ts:108-158``) at both levels: ``retry_policy``
    retries each file in place with bounded backoff (maxAttempts /
    retryDelay), and ``worker_passes`` re-drains the still-missing queue
    after ``worker_pass_interval_s`` (workerRetry / workerRetryInterval)
    — so a CDN blip costs one delayed retry, while a permanently missing
    hour demotes cleanly and is retried next tick. The sleep is the
    policy's (injectable; tests run instantly).
    """
    now = datetime.now(timezone.utc)

    def too_old(key: str) -> bool:
        base = os.path.basename(key)  # yyyy-MM-dd-H.json.gz
        try:
            d = datetime.strptime("-".join(base.split("-")[:3]), "%Y-%m-%d")
            return (now - d.replace(tzinfo=timezone.utc)).days > max_age_days
        except ValueError:
            return False

    def fetch_once(url: str, dest: str) -> bool:
        if fetcher is not None:
            return bool(fetcher(url, dest))
        try:
            proc = subprocess.run(
                ["wget", "-c", "-q", "-O", dest, url], timeout=timeout_s
            )
            return proc.returncode == 0
        except Exception:
            return False

    do_fetch = (
        retrying_fetcher(fetch_once, retry_policy)
        if retry_policy is not None
        else fetch_once
    )

    def fetch(key: str) -> None:
        dest = os.path.join(data_dir, key)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        if do_fetch(url_for(key), dest):
            manifest.set(key, FileStatus.Downloaded)
        elif os.path.exists(dest):
            os.remove(dest)  # partial-file cleanup (downloader_worker.js:20-27)

    sleep = retry_policy.sleep if retry_policy is not None else time.sleep
    for p in range(max(1, worker_passes)):
        todo = [
            k for k in manifest.keys_with(FileStatus.NeedDownload) if not too_old(k)
        ]
        if not todo:
            break
        if p:
            sleep(worker_pass_interval_s)
        random.shuffle(todo)  # X5 load spreading (log_downloader.ts:33-42)
        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(fetch, todo))
    manifest.save()
