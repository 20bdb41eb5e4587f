"""Streaming strict-order conversion funnel (stateful operator).

Twin of the batch ``event_funnel_conversion`` query (plans/queries.py):
per user, the earliest signup, the earliest click AFTER that signup, and
the earliest purchase AFTER that click. The batch form is three cascading
conditional window mins; the streaming form keeps a 3-long state per user
in the state store via ``applyInPandasWithState`` (the custom-stateful
path of SURVEY 2.9, same template as
:func:`..operators.sessions.sessionize_streaming`) and emits ONE
conversion record when a user completes the purchase stage.

Semantics under reordering: stage times only ever move earlier, and the
strict-order invariants survive each monotone update (a signup moving
earlier can only widen the valid click set; a click moving earlier keeps
every recorded purchase valid because purchase > old click > new click).
Events later than the watermark tolerance are dropped by the engine —
the standard streaming trade; within tolerance the completed-funnel
records match the batch operator (pinned by
tests/test_funnel_stream.py).

State is O(3 longs) per active user and is REMOVED on conversion — the
state store holds only not-yet-converted users, with an event-time
timeout evicting users idle past the configured horizon. At 100 TB/day
event volume the state size tracks active-unconverted users, not events.
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


def funnel_streaming(events, idle_timeout_minutes: int = 24 * 60):
    """Stateful streaming funnel over (user_id long, ts timestamp,
    event_type string) with a watermark already applied on ts.

    Emits (user_id, signup_us, click_us, purchase_us) once per user at
    the moment the purchase stage completes; state is dropped on
    conversion and evicted (no emission) after ``idle_timeout_minutes``
    of event-time inactivity.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    timeout_ms = idle_timeout_minutes * 60 * 1000

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            # idle unconverted user: evict silently (a production variant
            # could emit partial-funnel records here)
            state.remove()
        else:
            su, ck, pu = state.get if state.exists else (None, None, None)
            evs: list[tuple[int, str]] = []
            for pdf in pdfs:
                ts_us = (pd.to_datetime(pdf["ts"]).astype("int64") // 1000).tolist()
                evs.extend(zip(ts_us, pdf["event_type"].tolist()))
            evs.sort()
            last_us = 0
            for t_us, et in evs:
                last_us = max(last_us, t_us)
                if et == "signup" and (su is None or t_us < su):
                    su = t_us
                elif et == "click" and su is not None and t_us > su and (
                    ck is None or t_us < ck
                ):
                    ck = t_us
                elif et == "purchase" and ck is not None and t_us > ck and (
                    pu is None or t_us < pu
                ):
                    pu = t_us
            if pu is not None:
                rows.append((user_id, su, ck, pu))
                state.remove()
            else:
                state.update((su, ck, pu))
                state.setTimeoutTimestamp(last_us // 1000 + timeout_ms)
        yield pd.DataFrame(
            rows, columns=["user_id", "signup_us", "click_us", "purchase_us"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType="su long, ck long, pu long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
