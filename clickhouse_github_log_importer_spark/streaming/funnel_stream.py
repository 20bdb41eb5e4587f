"""Streaming strict-order conversion funnel (stateful operator).

Twin of the batch ``event_funnel_conversion`` query (plans/queries.py):
per user, the earliest signup, the earliest click AFTER that signup, and
the earliest purchase AFTER that click. The batch form is three cascading
conditional window mins; the streaming form keeps bounded per-user state
in the state store via ``applyInPandasWithState`` (the custom-stateful
path of SURVEY 2.9, same template as
:func:`..operators.sessions.sessionize_streaming`).

EXACT semantics within the watermark: stage events are buffered in state
(pruned, see below) and a completed funnel is emitted only once the
event-time watermark has passed its purchase time — at that point no
event that could change any stage value (all strictly earlier than the
purchase) can still arrive, so the emitted record equals the batch
operator's row by construction. A prerequisite stage that arrives in a
LATER micro-batch than its dependent (late-but-within-watermark signup
under an already-seen click) therefore counts, exactly as in batch.
Events later than the watermark are dropped by the engine — the standard
streaming trade.

Emission is at most ONE record per user: after emitting, a ``done``
tombstone stays in state until the idle timeout, so a second
signup->click->purchase sequence does not emit again (the batch twin
reports one row per user — the earliest funnel). A user idle past the
timeout horizon is evicted entirely; a conversion after that would emit
anew — the unavoidable bounded-state trade, sized by the timeout.

State is bounded, not O(events): the min signup is a single long, and
the click/purchase buffers are pruned to entries that could still become
the answer as earlier stage events arrive (clicks at-or-before the
current signup plus the current best click; purchases at-or-before the
current best click plus the current best purchase). Typical state is a
few longs; the worst case is the user's pre-signup stage events inside
one watermark horizon, not their full history.
"""

from __future__ import annotations

from pyspark.sql import types as T

FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("signup_us", T.LongType()),
        T.StructField("click_us", T.LongType()),
        T.StructField("purchase_us", T.LongType()),
    ]
)

_STAGES = ("signup", "click", "purchase")


def _cascade(su, cks, pus):
    """Earliest valid (signup, click, purchase) cascade + pruned buffers.

    Pruning keeps exactly the entries that could still become the answer
    if yet-earlier events arrive (stage times only ever move earlier):
    clicks <= su may become valid when su moves down; anything later than
    the current best can never win again.
    """
    ck = min((c for c in cks if su is not None and c > su), default=None)
    pu = min((p for p in pus if ck is not None and p > ck), default=None)
    cks = sorted(
        {c for c in cks if (su is None or c <= su)}
        | ({ck} if ck is not None else set())
    )
    pus = sorted(
        {p for p in pus if (ck is None or p <= ck)}
        | ({pu} if pu is not None else set())
    )
    return ck, pu, cks, pus


def funnel_streaming(events, idle_timeout_minutes: int = 24 * 60):
    """Stateful streaming funnel over (user_id long, ts timestamp,
    event_type string) with a watermark already applied on ts.

    Emits (user_id, signup_us, click_us, purchase_us) once per user when
    the watermark passes the completed funnel's purchase time (exact
    batch-equal values); unconverted users are evicted without emission
    after ``idle_timeout_minutes`` of event-time inactivity.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    timeout_ms = idle_timeout_minutes * 60 * 1000

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        rows = []
        wm_ms = state.getCurrentWatermarkMs()

        def finalize(su, ck, pu):
            # keep a `done` tombstone until idle timeout so a second
            # completed sequence can't emit a second record
            rows.append((user_id, su, ck, pu))
            state.update((su, [], [], True))
            state.setTimeoutTimestamp(max(wm_ms, pu // 1000) + timeout_ms)

        if state.hasTimedOut:
            su, cks, pus, done = (
                state.get if state.exists else (None, [], [], False)
            )
            ck, pu, cks, pus = _cascade(su, list(cks), list(pus))
            if not done and pu is not None:
                # timeout was set at the purchase time: the watermark has
                # passed it, the funnel is final -> emit exactly once
                finalize(su, ck, pu)
            else:
                # idle unconverted user or expired tombstone: evict
                state.remove()
        else:
            su, cks, pus, done = (
                state.get if state.exists else (None, [], [], False)
            )
            cks, pus = list(cks), list(pus)
            last_us = 0
            for pdf in pdfs:
                ts_us = (pd.to_datetime(pdf["ts"]).astype("int64") // 1000).tolist()
                for t_us, et in zip(ts_us, pdf["event_type"].tolist()):
                    last_us = max(last_us, t_us)
                    if et == "signup" and (su is None or t_us < su):
                        su = t_us
                    elif et == "click":
                        cks.append(t_us)
                    elif et == "purchase":
                        pus.append(t_us)
            ck, pu, cks, pus = _cascade(su, cks, pus)
            if done:
                # already emitted: keep the tombstone, refresh its expiry
                state.update((su, [], [], True))
                state.setTimeoutTimestamp(max(wm_ms, last_us // 1000) + timeout_ms)
            elif pu is not None and wm_ms >= pu // 1000:
                finalize(su, ck, pu)
            else:
                state.update((su, cks, pus, False))
                # completed-but-not-final: wake when the watermark passes
                # the purchase; otherwise plain idle eviction
                wake = pu // 1000 + 1 if pu is not None else last_us // 1000 + timeout_ms
                state.setTimeoutTimestamp(max(wake, wm_ms + 1))
        yield pd.DataFrame(
            rows, columns=["user_id", "signup_us", "click_us", "purchase_us"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType="su long, cks array<long>, pus array<long>, done boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
