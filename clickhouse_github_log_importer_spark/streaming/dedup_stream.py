"""Streaming dedup surface (SURVEY 2.9 upgrade path, T7's streaming twin).

The batch engine's ReplacingMergeTree semantics live in
``operators/dedup_replacing.py``; this is the same guarantee for the
Structured Streaming ingest: each key is emitted once, with state
bounded by the event-time watermark instead of growing with history.

One operator, two modes (the same batch/stream parity contract as
:mod:`.windows`): on a batch frame it is a plain ``dropDuplicates`` the
oracle can check; on a streaming frame it switches to
``dropDuplicatesWithinWatermark``, whose state store evicts keys older
than the watermark horizon — O(keys-in-horizon), not O(keys-ever-seen).
That eviction is exactly the trade the reference makes with
ReplacingMergeTree's eventual dedup: duplicates separated by more than
the horizon are not collapsed (re-imports of old hours go through the
batch compaction path instead, pipeline.maybe_compact).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_events_stream(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Emit each key once.

    Batch frames dedup globally (driver-verifiable); streaming frames
    dedup within the watermark horizon with bounded state. Kept-row
    choice is first-arrival in streaming (the state store's semantics);
    batch mode matches because the oracle keys carry no payload
    ambiguity — use ``dedup_replacing`` when a versioned
    last-write-wins pick is required.
    """
    keys = list(key_cols)
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


LWW_SCHEMA = (
    "key string, version long, tiebreak long, n_dups long"
)


def lww_fold(best, rows):
    """The streaming LWW state update's exact compare loop, extracted
    pure so the driver fold entry (plans/queries.stream_lww_dedup_fold)
    and the stateful ``update`` below run the SAME code: fold
    ``(version, tiebreak)`` pairs into ``best = (v, tb, n_dups)`` —
    keep the max (version, tiebreak) tuple, count every duplicate."""
    v, tb, n = best
    for _v, _tb in rows:
        cand = (int(_v), int(_tb))
        if v is None or cand > (v, tb):
            v, tb = cand
        n += 1
    return v, tb, n


def lww_dedup_stream(
    df: DataFrame,
    key_col: str = "event_id",
    version_col: str = "from_api",
    tiebreak_col: str = "id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """ReplacingMergeTree(ver) STREAMING twin: last-write-wins per key.

    :func:`dedup_events_stream` keeps the FIRST arrival (the state
    store's native semantics); this keeps the winning VERSION — per key
    the row with max (version, tiebreak) — which is what
    ReplacingMergeTree(ver) converges to and what the batch
    ``operators/dedup_replacing.replacing_dedup`` picks. Emission is
    exactly-once per quiet key: state holds only (best version, best
    tiebreak, dup count) — O(keys-in-horizon) — with an EVENT-TIME
    timeout one tick past the key's latest seen event, re-armed by each
    new duplicate; when the watermark passes it, the winner row emits
    (append mode) and the state evicts. Duplicates separated by more
    than the horizon re-emit (one row per horizon window) — the same
    eventual-dedup trade ReplacingMergeTree makes, with the batch
    compaction path (pipeline.maybe_compact) as the catch-all, and the
    reason the output carries identifiers (key, version, tiebreak)
    rather than a full payload: the caller joins winners back to the
    stored rows, so a re-emit is an idempotent upsert.

    Batch frames take the stateless twin: one map-side-combinable
    ``max(struct(version, tiebreak))`` + count per key — what lets the
    test pin stream == batch == a direct python fold.

    Output: (key string, version, tiebreak, n_dups).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    sel = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(version_col).cast("long").alias("_v"),
        F.col(tiebreak_col).cast("long").alias("_tb"),
        F.col(ts_col).alias("_ts"),
    )

    if not df.isStreaming:
        best = F.max(F.struct(F.col("_v"), F.col("_tb"))).alias("_best")
        return (
            sel.groupBy("key")
            .agg(best, F.count("*").cast("long").alias("n_dups"))
            .select(
                "key",
                F.col("_best._v").alias("version"),
                F.col("_best._tb").alias("tiebreak"),
                "n_dups",
            )
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        if state.hasTimedOut:
            v, tb, n, _lm = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "version": [v],
                    "tiebreak": [tb],
                    "n_dups": [n],
                }
            )
            return
        v, tb, n, last_ms = (
            state.get if state.exists else (None, None, 0, 0)
        )
        for pdf in pdfs:
            v, tb, n = lww_fold(
                (v, tb, n), zip(pdf["_v"], pdf["_tb"])
            )
            for _ts in pdf["_ts"]:
                # pandas Timestamp .value is ns since epoch -> ms
                last_ms = max(last_ms, int(_ts.value) // 1_000_000)
        state.update((v, tb, n, last_ms))
        # fire when the watermark passes the key's LATEST EVER event:
        # last_ms is carried in state, so an out-of-order in-horizon
        # duplicate can only re-arm the timer FORWARD, never backward
        # (review r8: a batch-local max let an older duplicate pull the
        # timer before the key's newest event — premature emission and
        # a duplicate winner row when another duplicate followed); must
        # also be strictly past the CURRENT watermark or Spark rejects
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_ms + 1, wm_ms + 1))
        yield pd.DataFrame(
            {
                "key": pd.Series([], dtype="str"),
                "version": pd.Series([], dtype="int64"),
                "tiebreak": pd.Series([], dtype="int64"),
                "n_dups": pd.Series([], dtype="int64"),
            }
        )

    return (
        sel.withWatermark("_ts", watermark)
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=LWW_SCHEMA,
            stateStructType="v long, tb long, n long, lm long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
