"""Streaming sequenceMatchEvents (stateful operator).

Twin of the batch ``sequence_match_events`` entry (plans/queries.py):
per user, the FIRST purchase with a qualifying click — a click
at-or-before it (the (ts, kind) strictness convention: a same-timestamp
click qualifies) and within the time bound — emitted WITH its witness,
the latest such click. Batch resolves this with one range-sliced
running-max pass; the streaming form keeps bounded per-user state via
``applyInPandasWithState`` (the funnel_stream template).

EXACT semantics within the watermark: a purchase is decided only once
the event-time watermark has passed it — at that point every click that
could qualify it (all at-or-before the purchase) has either arrived or
been dropped by the engine, so the emitted witness equals the batch
operator's row by construction. A qualifying click that arrives in a
LATER micro-batch than its purchase (out-of-order within the watermark)
therefore counts, exactly as in batch. Purchases are decided in
ascending (ts, event_id) order, so the emitted match is the FIRST one
even when a later purchase becomes decidable in the same batch.

Emission is at most ONE record per user (``done`` tombstone until the
idle timeout, then eviction — the funnel contract). State is bounded,
not O(events): undecided purchases live at most one watermark horizon
(decided ones drop immediately), and clicks prune to the time-bound
window behind the watermark (older ones can never be a witness for any
still-undecided purchase, whose timestamp is at least the watermark).
"""

from __future__ import annotations

from pyspark.sql import types as T

MATCH_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("click_ts_us", T.LongType()),
        T.StructField("click_event_id", T.LongType()),
        T.StructField("purchase_ts_us", T.LongType()),
        T.StructField("purchase_event_id", T.LongType()),
    ]
)


def decide_first_match(clicks, purchases, wm_ms, bound_us):
    """Pure decision core, shared with the pytest brute-force pin.

    ``clicks``/``purchases`` are (ts_us, event_id) lists. Returns
    (match | None, undecided_purchases): walks purchases in ascending
    order, decides every one the watermark has passed (match -> the
    latest qualifying click; no qualifying click -> dropped), and stops
    at the first purchase still inside the watermark.
    """
    match = None
    undecided = []
    for tp, ep in sorted(purchases):
        if match is not None:
            break
        if wm_ms <= tp // 1000:
            undecided.append((tp, ep))
            continue
        qual = [
            (tc, ec)
            for tc, ec in clicks
            if tc <= tp and tp - tc < bound_us
        ]
        if qual:
            tc, ec = max(qual)
            match = (tc, ec, tp, ep)
        # else: decided no-match purchase — drop (a future click would
        # carry ts >= watermark > purchase ts, so it can never qualify)
    return match, undecided


def match_events_streaming(
    events,
    bound_us: int = 86400000000,
    idle_timeout_minutes: int = 24 * 60,
):
    """Stateful streaming first-match witness extraction over
    (user_id long, ts timestamp, event_type string, event_id long) with
    a watermark already applied on ts.

    Emits (user_id, click_ts_us, click_event_id, purchase_ts_us,
    purchase_event_id) once per user when the watermark passes the first
    matching purchase; users without a match are evicted silently after
    ``idle_timeout_minutes`` of event-time inactivity.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    timeout_ms = idle_timeout_minutes * 60 * 1000

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        rows = []
        wm_ms = state.getCurrentWatermarkMs()

        def unpack():
            if state.exists:
                ck_t, ck_e, pu_t, pu_e, done = state.get
                return (
                    list(zip(ck_t, ck_e)),
                    list(zip(pu_t, pu_e)),
                    done,
                )
            return [], [], False

        def decide_and_store(clicks, purchases, last_us):
            m, undecided = decide_first_match(
                clicks, purchases, wm_ms, bound_us
            )
            if m is not None:
                rows.append((user_id, *m))
                state.update(([], [], [], [], True))
                state.setTimeoutTimestamp(
                    max(wm_ms, m[2] // 1000) + timeout_ms
                )
                return
            # clicks older than (watermark - bound) can never witness a
            # still-undecided purchase (its ts is >= the watermark)
            keep = [
                (tc, ec)
                for tc, ec in clicks
                if tc > wm_ms * 1000 - bound_us
            ]
            if not keep and not undecided:
                # nothing left that could ever match: evict immediately
                # (review r8: re-storing an all-empty state re-armed a
                # wm+1 timeout and burned one extra wakeup per
                # unmatched user)
                if state.exists:
                    state.remove()
                return
            state.update(
                (
                    [c[0] for c in keep],
                    [c[1] for c in keep],
                    [p[0] for p in undecided],
                    [p[1] for p in undecided],
                    False,
                )
            )
            # wake when the watermark passes the earliest undecided
            # purchase; otherwise plain idle eviction
            wake = (
                undecided[0][0] // 1000 + 1
                if undecided
                else last_us // 1000 + timeout_ms
            )
            state.setTimeoutTimestamp(max(wake, wm_ms + 1))

        if state.hasTimedOut:
            clicks, purchases, done = unpack()
            if done or (not purchases and not clicks):
                state.remove()
            else:
                # re-run the decision under the advanced watermark; if
                # nothing resolves, the state re-arms its own timeout.
                # last_us = the key's latest kept event time (ADVICE
                # r8: passing 0 made a click-only state compute wake =
                # epoch+timeout, clamp to wm+1, and re-wake on EVERY
                # watermark advance until the clicks aged out)
                last_us = max(
                    [tc for tc, _ in clicks] + [tp for tp, _ in purchases]
                )
                decide_and_store(clicks, purchases, last_us)
        else:
            clicks, purchases, done = unpack()
            last_us = 0
            for pdf in pdfs:
                ts_us = (
                    pd.to_datetime(pdf["ts"]).astype("int64") // 1000
                ).tolist()
                for t_us, et, eid in zip(
                    ts_us,
                    pdf["event_type"].tolist(),
                    pdf["event_id"].tolist(),
                ):
                    last_us = max(last_us, t_us)
                    if et == "click":
                        clicks.append((t_us, int(eid)))
                    elif et == "purchase":
                        purchases.append((t_us, int(eid)))
            if done:
                state.update(([], [], [], [], True))
                state.setTimeoutTimestamp(
                    max(wm_ms, last_us // 1000) + timeout_ms
                )
            else:
                decide_and_store(clicks, purchases, last_us)
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id",
                "click_ts_us",
                "click_event_id",
                "purchase_ts_us",
                "purchase_event_id",
            ],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=MATCH_SCHEMA,
        stateStructType=(
            "ck_t array<long>, ck_e array<long>, "
            "pu_t array<long>, pu_e array<long>, done boolean"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
