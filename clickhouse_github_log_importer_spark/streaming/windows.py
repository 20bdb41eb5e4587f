"""Windowed aggregation surface for the streaming ingest path (SURVEY 2.9).

One operator, two execution modes: :func:`windowed_event_counts` is a
plain ``groupBy(window(...))`` aggregation, so the SAME call works on a
batch frame (where the driver's DuckDB oracle can check it exactly) and
on a streaming frame (where Spark maintains the window state store and a
watermark bounds it). That batch/streaming parity is the point — the
reference has no streaming engine, so this is the additive upgrade path,
verified in batch and smoke-tested in streaming.

Scale shape: a tumbling window is one shuffle keyed by (window, group) —
identical to any grouped agg; partial aggregation happens map-side per
micro-batch. A sliding window multiplies state by window/slide (each
event belongs to that many windows); the watermark evicts windows older
than the lateness bound, so state is O(groups x windows-in-horizon), not
O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Per (window, event_type) counts and value totals.

    ``slide=None`` -> tumbling; otherwise sliding (an event lands in
    window/slide windows). ``watermark`` (streaming only) bounds state
    and lateness; leave None for batch frames. Output columns are
    formatted UTC strings so results hash identically across engines.
    """
    src = events
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window, slide) if slide is not None else F.window(ts_col, window)
    )
    return (
        src.groupBy(win.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format("win.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Per (user, session) counts/value totals via native session windows
    — the third window kind next to tumbling/sliding, same
    batch/streaming dual path.

    A session extends while consecutive events are <= ``gap`` apart —
    the merge test is against the session's closed end (last event +
    gap), so an event landing EXACTLY on the end extends the session
    (pinned by test_streaming_windows.py; the oracle's island boundary
    is strictly-greater-than-gap to match).
    In streaming mode the state store merges overlapping per-key session
    candidates at each micro-batch and the watermark closes sessions
    (append mode emits a session only once it can no longer grow) — the
    state is O(open sessions), bounded by the horizon. In batch mode the
    same expression compiles to one (user, session) shuffle, which is
    what the DuckDB gaps-and-islands oracle checks exactly
    (``session_window_counts``). The batch sessionizer family
    (operators/sessions.py) remains the mega-user-safe path for skewed
    BATCH workloads; this is the streaming-native surface.
    """
    src = events
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.session_window(ts_col, gap).alias("win"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("win.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
            "total_value",
        )
    )
