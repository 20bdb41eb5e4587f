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
