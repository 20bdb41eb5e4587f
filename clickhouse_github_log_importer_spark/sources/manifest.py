"""File-state manifest (S11/T3): the pipeline's exactly-once ledger.

Reference: ``meta.json`` maps relative file path -> ``FileStatus``
(``app/types.ts:1-6``; load/save ``app/service/file_utils.ts:10-45``), and
every stage of the hourly pipeline advances statuses
(``NeedDownload -> Downloaded -> Verified -> Imported``) with a persisted
write after each transition. This is driver-side control-plane state (a few
MB for a decade of hourly files) — deliberately NOT a distributed dataset.
"""

from __future__ import annotations

import json
import os
import tempfile
from collections import Counter
from enum import IntEnum


class FileStatus(IntEnum):
    """app/types.ts:1-6."""

    NeedDownload = 0
    Downloaded = 1
    Verified = 2
    Imported = 3


class Manifest:
    """meta.json load/mutate/save with atomic writes.

    ``prefix`` reproduces the per-sink keyspaces (``tugraph_``/``neo4j_``)
    of ``app/service/file_utils.ts:16-30``.
    """

    def __init__(self, path: str, prefix: str = ""):
        self.path = path
        self.prefix = prefix
        self._data: dict[str, int] = {}
        if os.path.exists(path):
            with open(path) as f:
                raw = json.load(f)
            self._data = {
                k[len(prefix):]: int(v)
                for k, v in raw.items()
                if k.startswith(prefix)
            }
            self._other = {k: v for k, v in raw.items() if not k.startswith(prefix)}
        else:
            self._other = {}

    def get(self, key: str, default: FileStatus = FileStatus.NeedDownload) -> FileStatus:
        return FileStatus(self._data.get(key, default))

    def set(self, key: str, status: FileStatus) -> None:
        self._data[key] = int(status)

    def items(self):
        return {k: FileStatus(v) for k, v in self._data.items()}.items()

    def keys_with(self, status: FileStatus) -> list[str]:
        return sorted(k for k, v in self._data.items() if v == int(status))

    def ensure(self, keys: list[str]) -> None:
        """Register newly-enumerated files as NeedDownload (T3 entry edge)."""
        for k in keys:
            self._data.setdefault(k, int(FileStatus.NeedDownload))

    def stat(self) -> dict[str, int]:
        """metaDataStat (app/service/file_utils.ts:47-54)."""
        return {FileStatus(k).name: v for k, v in Counter(self._data.values()).items()}

    def save(self) -> None:
        merged = {**self._other, **{self.prefix + k: v for k, v in self._data.items()}}
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(merged, f, sort_keys=True)
        os.replace(tmp, self.path)
