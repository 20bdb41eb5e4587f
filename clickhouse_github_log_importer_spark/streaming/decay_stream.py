"""Streaming twin of ``time_decayed_user_stats`` (exponentialTimeDecayed*
anchored at each user's latest event — ClickHouse
exponentialTimeDecayedCount/Sum/Avg/Max, reference parametric window
functions the log-importer delegates to ClickHouse).

The batch entry (plans/queries.py::time_decayed_user_stats) anchors the
decay at the user's latest event: w_i = exp((t_i - T)/tau). The decay
recurrence TELESCOPES (the same identity user_decayed_day_checkpoints
exploits): re-anchoring from A to a later A' multiplies every
accumulated term by the one factor exp((A - A')/tau), so the per-user
streaming state is O(1) — (anchor, n, decayed_count, decayed_value_sum,
decayed_value_max) — and the update is ORDER-FREE: an event at t <= A
adds exp((t - A)/tau) under the current anchor; an event at t > A
rescales the sums once and re-anchors. Max survives re-anchoring because
scaling all terms by one positive factor preserves the argmax.

Emission is exactly-once per quiet user (append mode), the same
event-time-timeout discipline as streaming.dedup_stream.lww_dedup_stream:
the timer re-arms only FORWARD (anchor carried in state), fires when the
watermark passes the user's latest event, then the state evicts. Users
active again after eviction re-emit for the new horizon window — the
idempotent-upsert trade every horizon-bounded twin here makes.

One operator, two modes (the parity contract of :mod:`.windows`): batch
frames run the registry entry's exact stateless plan, which is what lets
pytest pin stream == batch == a direct python fold on one fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECAY_SCHEMA = (
    "user_id long, n_events long, decayed_count double, "
    "decayed_value_sum double, decayed_value_avg double, "
    "decayed_value_max double"
)


def time_decayed_user_stats_stream(
    df: DataFrame,
    tau_us: int = 21_600_000_000,  # 6 h, the batch entry's constant
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user decayed (count, sum, avg, max) anchored at the user's
    latest event, all floats rounded 6 dp at emission.

    Batch: the stateless anchored plan (max-anchor + user-keyed join +
    combinable sums — the registry entry). Streaming: O(1) per-user
    state, telescoped re-anchoring, watermark-final exactly-once
    emission.
    """
    import math

    import pandas as pd

    sel = df.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("double").alias("_v"),
    )

    if not df.isStreaming:
        ev = sel.withColumn(
            "_tus", F.unix_micros(F.col("_ts").cast("timestamp"))
        )
        anchors = ev.groupBy("user_id").agg(F.max("_tus").alias("_anchor"))
        j = ev.join(anchors, "user_id")
        w = F.exp(
            (F.col("_tus") - F.col("_anchor")).cast("double")
            / F.lit(float(tau_us))
        )
        wv = w * F.col("_v")
        return j.groupBy("user_id").agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(w), 6).alias("decayed_count"),
            F.round(F.sum(wv), 6).alias("decayed_value_sum"),
            F.round(F.sum(wv) / F.sum(w), 6).alias("decayed_value_avg"),
            F.round(F.max(wv), 6).alias("decayed_value_max"),
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        if state.hasTimedOut:
            anchor, n, dc, dvs, dvm = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "decayed_count": [round(dc, 6)],
                    "decayed_value_sum": [round(dvs, 6)],
                    "decayed_value_avg": [round(dvs / dc, 6)],
                    "decayed_value_max": [round(dvm, 6)],
                }
            )
            return
        anchor, n, dc, dvs, dvm = (
            state.get if state.exists else (None, 0, 0.0, 0.0, None)
        )
        for pdf in pdfs:
            tus = (pd.to_datetime(pdf["_ts"]).astype("int64") // 1000).tolist()
            for t_us, v in zip(tus, pdf["_v"].tolist()):
                if anchor is None:
                    anchor, n, dc, dvs, dvm = t_us, 1, 1.0, v, v
                    continue
                if t_us > anchor:
                    f = math.exp((anchor - t_us) / tau_us)
                    dc, dvs, dvm, anchor = dc * f, dvs * f, dvm * f, t_us
                    w = 1.0
                else:
                    w = math.exp((t_us - anchor) / tau_us)
                n += 1
                dc += w
                dvs += w * v
                dvm = max(dvm, w * v)
        state.update((anchor, n, dc, dvs, dvm))
        # fire when the watermark passes the user's LATEST EVER event;
        # anchor is carried in state so an out-of-order event can only
        # re-arm the timer forward (the lww_dedup_stream lesson)
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(anchor // 1000 + 1, wm_ms + 1))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "decayed_count": pd.Series([], dtype="float64"),
                "decayed_value_sum": pd.Series([], dtype="float64"),
                "decayed_value_avg": pd.Series([], dtype="float64"),
                "decayed_value_max": pd.Series([], dtype="float64"),
            }
        )

    return (
        sel.withWatermark("_ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=DECAY_SCHEMA,
            stateStructType=(
                "anchor long, n long, dc double, dvs double, dvm double"
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
