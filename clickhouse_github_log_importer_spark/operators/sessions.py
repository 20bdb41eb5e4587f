"""Sessionization: gap-based user sessions over the event stream.

The canonical training-data / product-analytics operator the reference
lacks. Two implementations with identical semantics:

- :func:`sessionize` — batch: the islands-and-gaps pattern
  (lag -> new-session flag -> running session index), SLICED on the
  deterministic composite (user, time) key so a mega-user's timeline
  splits over many tasks while a normal user stays whole:
  lag/flag/running-sum run slice-locally, and an O(distinct users)
  per-(slice, user) carry table (previous slice's last timestamp + flag
  totals) corrects the slice-first row and offsets the session index
  (AQE broadcasts it when small, shuffle-joins at user scale). The
  final (user, session) aggregation map-side combines, so even one
  giant session collapses to n_slices partial rows before the shuffle.
- :func:`sessionize_streaming` — Structured Streaming with
  ``applyInPandasWithState``: the custom stateful operator path (SURVEY
  2.9), keeping an open session per user in the state store, emitting a
  session row when the gap closes it, with an event-time timeout so idle
  users flush. This is the template for any bespoke stateful operator
  the built-in windowed aggs can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_GAP_MIN = 30

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MIN,
    user_col: str = "user_id",
    ts_us_col: str = "ts_us",
    value_col: str = "value",
) -> DataFrame:
    """Batch sessionization: one session row per (user, gap-delimited run).

    Output: (user_id, session_start_us, session_end_us, n_events,
    total_value rounded). Exact epoch-micro arithmetic keeps it
    engine-portable.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    spark = events.sparkSession
    n_slices = spark.sparkContext.defaultParallelism
    base = events.select(user_col, ts_us_col, value_col)
    # deterministic composite (user, time) slices (driver-side quantile
    # literals): see ranking.slice_expr for why spark_partition_id after
    # a range exchange is NOT a valid slice id on a branched plan, and
    # ranking.composite_slice_key for why slicing by time alone inflates
    # the carry table toward O(rows)
    from .ranking import composite_slice_key, slice_expr

    sliced = base.withColumn(
        "_slice",
        slice_expr(
            base, composite_slice_key(user_col, ts_us_col), n_slices
        ),
    )
    w = Window.partitionBy("_slice", user_col).orderBy(ts_us_col)
    # slice-local flags: the slice's first row gets 0 here and is
    # corrected by the carry (its true gap needs the previous slice's
    # last timestamp)
    loc = sliced.withColumn(
        "_flag",
        F.when(
            (F.col(ts_us_col) - F.lag(ts_us_col).over(w)) > gap_us, F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long"),
    ).withColumn(
        "_lsum",
        F.sum("_flag").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    summ = loc.groupBy("_slice", user_col).agg(
        F.min(ts_us_col).alias("_first_ts"),
        F.max(ts_us_col).alias("_max_ts"),
        F.sum("_flag").alias("_ftot"),
    )
    w_off = (
        Window.partitionBy(user_col)
        .orderBy("_slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # carry per (slice, user): previous slices' last ts decides the
    # slice-first flag; earlier flag totals offset the session index
    s2 = summ.withColumn("_prev_ts", F.max("_max_ts").over(w_off)).withColumn(
        "_f1",
        F.when(
            (F.col("_first_ts") - F.col("_prev_ts")) > gap_us, F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    offsets = s2.select(
        "_slice",
        user_col,
        "_f1",
        F.coalesce(
            F.sum(F.col("_ftot") + F.col("_f1")).over(w_off), F.lit(0)
        ).alias("_c_in"),
    )
    # no broadcast hint: carry is O(distinct users) rows - AQE decides
    g = loc.join(offsets, ["_slice", user_col])
    sidx = F.col("_c_in") + F.col("_f1") + F.col("_lsum")
    return (
        g.withColumn("_session_idx", sidx)
        .groupBy(user_col, "_session_idx")
        .agg(
            F.min(ts_us_col).alias("session_start_us"),
            F.max(ts_us_col).alias("session_end_us"),
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .drop("_session_idx")
    )


def sessionize_streaming(
    events,
    gap_minutes: int = DEFAULT_GAP_MIN,
):
    """Custom stateful streaming sessionization via applyInPandasWithState.

    Input: a streaming frame with (user_id long, ts timestamp, value
    double) and a watermark already applied on ts. State per user: the
    open session (start/end/count/sum). Emission: every closed session
    (gap exceeded within a batch, or state timeout when the watermark
    passes the gap horizon).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n, v = state.get
                # round exactly like the in-batch close below and the batch
                # operator — the same logical session must not surface with
                # float noise depending on which path closes it
                rows.append((user_id, s, e, n, round(v, 2)))
                state.remove()
        else:
            ts_list: list[int] = []
            vals: list[float] = []
            for pdf in pdfs:
                ts_list.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
                vals.extend(float(x) for x in pdf["value"])
            order = sorted(range(len(ts_list)), key=lambda i: ts_list[i])
            cur = list(state.get) if state.exists else None  # [start,end,n,sum]
            for i in order:
                t_us, v = ts_list[i] , vals[i]
                if cur is None:
                    cur = [t_us, t_us, 1, v]
                elif t_us - cur[1] > gap_ms * 1000:
                    rows.append((user_id, cur[0], cur[1], cur[2], round(cur[3], 2)))
                    cur = [t_us, t_us, 1, v]
                else:
                    cur[1] = max(cur[1], t_us)
                    cur[2] += 1
                    cur[3] += v
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_ms)
        yield __import__("pandas").DataFrame(
            rows,
            columns=[
                "user_id", "session_start_us", "session_end_us", "n_events",
                "total_value",
            ],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType="start long, end long, n long, v double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
