"""CacheScope / rotating_scope lifetime contracts (operators/cache.py).

The API server is a ThreadingHTTPServer, so rotating_scope must be
thread-safe: concurrent rotations of the same key may never lose a
scope (a lost scope's persisted frames would leak — the exact regression
the rotation exists to prevent)."""

from __future__ import annotations

import threading

from clickhouse_github_log_importer_spark.operators.cache import (
    CacheScope,
    rotating_scope,
)


class _FakeFrame:
    """DataFrame stand-in counting persist/unpersist pairs."""

    def __init__(self, cached: bool = False) -> None:
        self.persisted = 0
        self.unpersisted = 0
        self.is_cached = cached

    def persist(self):
        self.persisted += 1
        self.is_cached = True
        return self

    def unpersist(self, blocking=False):
        self.unpersisted += 1
        self.is_cached = False
        return self


def test_scope_unpersists_in_reverse_order():
    order = []

    class Tracker(_FakeFrame):
        def __init__(self, tag):
            super().__init__()
            self.tag = tag

        def unpersist(self, blocking=False):
            order.append(self.tag)
            return super().unpersist(blocking)

    with CacheScope() as scope:
        scope.persist(Tracker("a"))
        scope.persist(Tracker("b"))
    assert order == ["b", "a"]


def test_concurrent_rotation_never_leaks_a_scope():
    # N threads rotate the same key, each persisting one frame in the
    # scope it received. After the dust settles, every frame except the
    # final survivor's must have been unpersisted exactly once. Two
    # races are in scope: the dict pop/insert race (fixed by the
    # registry lock) and the HANDOUT race — a scope rotated out and
    # flushed between rotating_scope() returning it and persist() being
    # called on it, which orphans the frame unless CacheScope is closed
    # by unpersist_all (persist on a closed scope unpersists
    # immediately). A tiny switch interval forces the interleavings.
    import sys

    key = "test-rotation-race"
    frames: list[_FakeFrame] = []
    frames_lock = threading.Lock()
    barrier = threading.Barrier(8)

    def worker():
        barrier.wait()
        for _ in range(50):
            scope = rotating_scope(key)
            f = _FakeFrame()
            scope.persist(f)
            with frames_lock:
                frames.append(f)

    old_interval = sys.getswitchinterval()
    sys.setswitchinterval(1e-6)
    try:
        threads = [threading.Thread(target=worker) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        sys.setswitchinterval(old_interval)
    # final rotation flushes the last survivor
    rotating_scope(key)
    leaked = [f for f in frames if f.unpersisted == 0]
    double = [f for f in frames if f.unpersisted > 1]
    assert not leaked, f"{len(leaked)} persisted frames never unpersisted"
    assert not double, f"{len(double)} frames unpersisted more than once"


def test_ambient_entry_scope_bounds_scopeless_persists():
    # registry entries call persisting operators without threading a
    # scope; the register() wrapper installs an ambient rotating scope
    # so persist_in(None, df) registers there instead of leaking one
    # cached frame per invocation (r12: bench runs 2x216 entries in ONE
    # session — unbounded accretion thrashes the storage layer at scale)
    from clickhouse_github_log_importer_spark.operators.cache import (
        ambient_scope,
        entry_scope,
        persist_in,
    )

    assert ambient_scope() is None
    first = _FakeFrame()
    with entry_scope("entry:test-ambient"):
        assert ambient_scope() is not None
        persist_in(None, first)
    assert ambient_scope() is None
    assert first.persisted == 1 and first.unpersisted == 0  # action pending

    # next invocation of the same entry rotates: the previous call's
    # frame is unpersisted, the new one stays live
    second = _FakeFrame()
    with entry_scope("entry:test-ambient"):
        persist_in(None, second)
    assert first.unpersisted == 1
    assert second.unpersisted == 0

    # an explicit scope always wins over the ambient one
    third = _FakeFrame()
    with entry_scope("entry:test-ambient"):
        with CacheScope() as explicit:
            persist_in(explicit, third)
        assert third.unpersisted == 1  # explicit scope exit, not rotation

    # nesting restores the outer ambient scope (entry calling an
    # entry-wrapped function)
    with entry_scope("entry:outer"):
        outer = ambient_scope()
        with entry_scope("entry:inner"):
            assert ambient_scope() is not outer
        assert ambient_scope() is outer
    rotating_scope("entry:test-ambient")  # cleanup
    rotating_scope("entry:outer")
    rotating_scope("entry:inner")


def test_persist_in_leaves_foreign_cached_frames_alone():
    # r13: a frame someone else already persisted (a bounded cross-entry
    # memo like _COACT_EDGES) must NOT be re-registered into the
    # caller's rotating scope — that rotation would unpersist the
    # owner's cache out from under it on the entry's next invocation
    from clickhouse_github_log_importer_spark.operators.cache import (
        entry_scope,
        persist_in,
    )

    shared = _FakeFrame(cached=True)  # owned by a memo, already cached
    with entry_scope("entry:test-foreign"):
        out = persist_in(None, shared)
    assert out is shared
    assert shared.persisted == 0  # untouched
    # rotation must not unpersist the foreign frame
    with entry_scope("entry:test-foreign"):
        pass
    from clickhouse_github_log_importer_spark.operators.cache import (
        rotating_scope,
    )

    rotating_scope("entry:test-foreign")  # flush
    assert shared.unpersisted == 0
