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


# ---------------------------------------------------------------------------
# windowFunnel: the four ClickHouse modes behind ONE dispatcher
#
# ClickHouse windowFunnel(window, [mode])(ts, cond1, cond2, cond3)
# (AggregateFunctionWindowFunnel.h) — maximal chain level per user within
# a sliding window anchored at the chain's first step. The four modes
# (default, a deterministic pinning of the docs' order-undefined
# same-timestamp behavior here called 'inclusive', strict_order,
# strict_deduplication) share one RANGE-SLICED chain scan; each mode's
# level predicate differs. The registry entries
# window_funnel_levels[_inclusive|_strict_order|_strict_dedup]
# (plans/queries.py) are thin wrappers over this function, so a future
# mode lands here once and every caller gets it.

FUNNEL_MODES = ("default", "inclusive", "strict_order", "strict_dedup")


def funnel_chain_scan(
    events: DataFrame,
    inclusive: bool = False,
    emit_min_signup: bool = False,
    conds: tuple[str, str, str] = ("signup", "click", "purchase"),
    bounds: list[float] | None = None,
) -> DataFrame:
    """The shared RANGE-SLICED 3-step chain scan (step types ``conds``).

    ``inclusive=True`` flips the equal-timestamp sort so predecessors at
    the SAME timestamp count (step1 sorts before step2 sorts before
    step3): the deterministic pinning of ClickHouse windowFunnel's
    default mode, whose same-timestamp behavior the docs declare
    order-dependent. Kinds become step1 -2 / step2 -1 / step3 0 (step2
    stays -1, so the scan body is unchanged).

    One segmented scan over the (user, ts)-ordered event stream: the
    per-user fold state (S = latest step1 ts, C = best chain start
    reachable via some step2, i.e. max over step2s so far of the latest
    step1 strictly before that step2) is associative across contiguous
    time slices, so a mega-user's timeline splits over many tasks —
    slice-local cascaded window columns plus a tiny per-(slice, user)
    carry table composed with one more cascade and broadcast back.

    Strictness is encoded in the sort key, not bounded RANGE frames: at
    an equal timestamp step3s (kind -2) sort before step2s (kind -1)
    sort before step1s (kind 0), so an inclusive running frame at a row
    sees exactly the strictly-earlier chain stages — even when a range
    boundary splits equal-ts peers across slices, earlier-slice rows are
    strictly sorted before, keeping the carries exact.

    Returns one row per step event: (user_id, _ts, _k, _gS = latest
    step1 strictly before the row, _gC = best chain start over step2s
    strictly before the row, _slice). ``emit_min_signup`` adds _gSmin
    (running EARLIEST step1 — the other associative extreme, for
    minimum-gap edges). Consumers apply their own window predicate
    (windowFunnel's bound) or none (the strict-order conversion funnel).
    """
    from .ranking import composite_slice_key, slice_expr

    s_t, c_t, p_t = conds
    spark = events.sparkSession
    n_slices = spark.sparkContext.defaultParallelism
    ev = events.select("user_id", "event_type", "ts_us").filter(
        F.col("event_type").isin(s_t, c_t, p_t)
    )
    purchase_k, signup_k = (0, -2) if inclusive else (-2, 0)
    base = ev.select(
        "user_id",
        F.col("ts_us").cast("long").alias("_ts"),
        F.when(F.col("event_type") == p_t, purchase_k)
        .when(F.col("event_type") == c_t, -1)
        .otherwise(signup_k)
        .alias("_k"),
        F.when(F.col("event_type") == s_t, F.col("ts_us").cast("long"))
        .alias("_sig"),
        F.when(F.col("event_type") == c_t, F.col("ts_us").cast("long"))
        .alias("_clk"),
    )
    # deterministic composite (user, time) slices (driver-side quantile
    # literals): see operators.ranking.slice_expr for why
    # spark_partition_id after a range exchange is NOT a valid slice id
    # on a branched plan, and composite_slice_key for why slicing by
    # time alone inflates the carry table toward O(rows) — only a
    # mega-user heavy enough to span a quantile splits across slices.
    sliced = base.withColumn(
        "_slice",
        slice_expr(
            base,
            composite_slice_key("user_id", "_ts"),
            n_slices,
            bounds=bounds,
        ),
    )
    w_loc = (
        Window.partitionBy("_slice", "user_id")
        .orderBy("_ts", "_k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # slice-local state: lS = latest in-slice step1 at-or-before the
    # row, lC = best in-slice chain start (max over in-slice step2s of
    # THEIR lS — same window spec, so one sort evaluates the cascade),
    # lK = latest in-slice step2 (marks "a step2 precedes this row")
    local = (
        sliced.withColumn("_lS", F.max("_sig").over(w_loc))
        .withColumn(
            "_lC",
            F.max(F.when(F.col("_k") == -1, F.col("_lS"))).over(w_loc),
        )
        .withColumn("_lK", F.max("_clk").over(w_loc))
    )
    if emit_min_signup:
        local = local.withColumn("_lSmin", F.min("_sig").over(w_loc))
    # carry table, one row per (slice, user): compose (S, C) across
    # slices — a step2 in slice s chains with the best step1 carried
    # into s, so each slice's C contribution is max(local C, carried S
    # if the slice has any step2); both runs are windows over the tiny
    # table ordered by slice
    summ_aggs = [
        F.max("_sig").alias("_S_out"),
        F.max(F.when(F.col("_k") == -1, F.col("_lS"))).alias("_C_loc"),
        F.max("_clk").alias("_has_clk"),
    ]
    if emit_min_signup:
        summ_aggs.append(F.min("_sig").alias("_Smin_out"))
    summ = local.groupBy("_slice", "user_id").agg(*summ_aggs)
    w_off = (
        Window.partitionBy("user_id")
        .orderBy("_slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summ.withColumn("_S_in", F.max("_S_out").over(w_off)).withColumn(
        "_C_contrib",
        F.greatest(
            "_C_loc",
            F.when(F.col("_has_clk").isNotNull(), F.col("_S_in")),
        ),
    )
    off_cols = [
        F.col("_slice"),
        F.col("user_id"),
        F.col("_S_in"),
        F.max("_C_contrib").over(w_off).alias("_C_in"),
    ]
    if emit_min_signup:
        off_cols.append(F.min("_Smin_out").over(w_off).alias("_Smin_in"))
    offsets = carry.select(*off_cols)
    # no broadcast hint: the carry is O(distinct users) rows — AQE
    # broadcasts when it measures small, shuffle-joins at user scale
    g = local.join(offsets, ["_slice", "user_id"])
    out_cols = [
        F.col("user_id"),
        F.col("_ts"),
        F.col("_k"),
        F.greatest("_lS", "_S_in").alias("_gS"),
        F.greatest(
            "_lC", "_C_in", F.when(F.col("_lK").isNotNull(), F.col("_S_in"))
        ).alias("_gC"),
        # consumers that run a FURTHER segmented pass reuse this slice
        # id: the join above leaves the frame hash-partitioned on
        # (_slice, user_id), so their slice-local window adds no
        # exchange and no second quantile job
        F.col("_slice"),
    ]
    if emit_min_signup:
        # least() skips nulls (like greatest), so a slice with no local
        # step1 correctly inherits the carried-in minimum
        out_cols.append(F.least("_lSmin", "_Smin_in").alias("_gSmin"))
    return g.select(*out_cols)


def _funnel_levels(g: DataFrame, window_us: int, k3: int, k1: int) -> DataFrame:
    """Shared level predicate for the two chain-scan modes: a step3-kind
    row (``k3``) at level 3 when its best chain start is inside the
    window, a step2 (-1) at level 2 when its latest step1 is, a
    step1-kind row (``k1``) at level 1. The scan's kind constants flip
    between modes (default: step3 -2 / step1 0; inclusive: swapped), so
    the kinds are parameters, not copies (review r8)."""
    lvl = (
        g.select(
            "user_id",
            F.when(
                (F.col("_k") == k3)
                & (F.col("_gC") >= F.col("_ts") - window_us),
                3,
            )
            .when(
                (F.col("_k") == -1)
                & (F.col("_gS") >= F.col("_ts") - window_us),
                2,
            )
            .when(F.col("_k") == k1, 1)
            .alias("_lvl"),
        )
        .groupBy("user_id")
        .agg(
            F.max("_lvl").alias("_max_lvl"),
            F.max((F.col("_lvl") == 1).cast("int")).alias("_l1"),
        )
        # only users with a step1 are in the funnel at all
        .filter(F.col("_l1") == 1)
        .select(F.col("_max_lvl").cast("long").alias("funnel_level"))
    )
    return lvl.groupBy("funnel_level").agg(F.count("*").alias("n_users"))


def _funnel_strict_order(
    events: DataFrame,
    window_us: int,
    conds: tuple[str, str, str],
    bounds: list[float] | None = None,
) -> DataFrame:
    """strict_order: ANY intervening event between chain steps kills the
    chain, so the steps must be ADJACENT in the user's full (ts,
    event_id)-ordered stream — rank adjacency (rank+1 / rank+2 hash
    joins on unique-per-user keys) on the range-sliced ranker, never a
    per-user sort on one task."""
    from .ranking import composite_slice_key, ranked

    s_t, c_t, p_t = conds
    r = ranked(
        events.select("user_id", "event_type", "ts_us", "event_id"),
        ["user_id"],
        ["ts_us", "event_id"],
        slice_col=composite_slice_key("user_id", "ts_us"),
        broadcast_offsets=False,
        bounds=bounds,
    )
    s = r.filter(F.col("event_type") == s_t).select(
        F.col("user_id").alias("_u"),
        F.col("_rank").alias("_r1"),
        F.col("ts_us").alias("_t1"),
    )
    # equi-join keys materialized as columns (rank+1 / rank+2), so the
    # adjacency lookups are plain hash joins on unique-per-user keys
    c = r.filter(F.col("event_type") == c_t).select(
        F.col("user_id").alias("_uc"),
        F.col("_rank").alias("_rc"),
        F.col("ts_us").alias("_t2"),
    )
    p = r.filter(F.col("event_type") == p_t).select(
        F.col("user_id").alias("_up"),
        F.col("_rank").alias("_rp"),
        F.col("ts_us").alias("_t3"),
    )
    pairs = (
        s.join(
            c,
            (F.col("_u") == F.col("_uc"))
            & (F.col("_rc") == F.col("_r1") + 1),
        )
        .filter(F.col("_t2") <= F.col("_t1") + window_us)
        .select("_u", "_r1", "_t1")
    )
    triples = pairs.join(
        p,
        (F.col("_u") == F.col("_up")) & (F.col("_rp") == F.col("_r1") + 2),
    ).filter(F.col("_t3") <= F.col("_t1") + window_us)
    levels = (
        s.select(F.col("_u").alias("user_id"), F.lit(1).alias("level"))
        .unionByName(
            pairs.select(F.col("_u").alias("user_id"), F.lit(2).alias("level"))
        )
        .unionByName(
            triples.select(
                F.col("_u").alias("user_id"), F.lit(3).alias("level")
            )
        )
    )
    return (
        levels.groupBy("user_id")
        .agg(F.max("level").alias("funnel_level"))
        .groupBy("funnel_level")
        .agg(F.count("*").alias("n_users"))
    )


def _funnel_strict_dedup(
    g: DataFrame, window_us: int, bounds: list[float] | None = None
) -> DataFrame:
    """strict_deduplication: a REPEAT of an already-matched condition
    between chain steps kills the chain. Shared chain scan + per
    (user, ts) step2 dedup + one more segmented pass carrying two
    associative running values (min qualified-step2 struct, max step2
    ts) — a step3 completes iff the earliest qualified step2 c* has had
    NO step2 since (mk == qt) and no twin at its own timestamp
    (qn == 1)."""
    from .ranking import composite_slice_key, slice_expr

    spark = g.sparkSession
    W = window_us
    # step2s deduped per (user, ts): equal-ts step2s share _gS (step1s
    # at the same ts sort AFTER step2s), so max(_gS) is exact; the count
    # rides along to detect the duplicate-at-c* interrupt
    dq = (
        g.filter(F.col("_k") == -1)
        .groupBy("user_id", "_ts")
        .agg(F.count("*").alias("_nc"), F.max("_gS").alias("_dgS"))
    )
    qual = F.col("_dgS").isNotNull() & (
        F.col("_ts") <= F.col("_dgS") + F.lit(W)
    )
    dq = dq.withColumn(
        "_q",
        F.when(
            qual,
            F.struct(
                F.col("_ts").alias("qt"),
                F.col("_nc").alias("qn"),
                F.col("_dgS").alias("qa"),
            ),
        ),
    )
    st = dq.select(
        "user_id",
        "_ts",
        F.lit(-1).alias("_k2"),
        "_q",
        F.col("_ts").alias("_ck"),
    ).unionByName(
        g.filter(F.col("_k") == -2).select(
            "user_id",
            "_ts",
            F.lit(-2).alias("_k2"),
            F.lit(None)
            .cast("struct<qt:long,qn:bigint,qa:long>")
            .alias("_q"),
            F.lit(None).cast("long").alias("_ck"),
        )
    )
    # the step2 dedup re-shuffled by (user, ts), so pass 2 slices anew;
    # step3s sort before equal-ts step2s (_k2 -2 < -1), so running
    # values at a step3 are strictly-before. The mode dispatcher shares
    # ONE set of quantile literals (r12, guide §1.2): a fresh quantile
    # job here re-executed the whole chain scan just to re-learn the
    # same composite-(user, ts) boundaries (measured 1.2-1.6 s of the
    # entry's 5-6 s at sf0.1).
    n_slices = spark.sparkContext.defaultParallelism
    st = st.withColumn(
        "_sl",
        slice_expr(
            st,
            composite_slice_key("user_id", "_ts"),
            n_slices,
            bounds=bounds,
        ),
    )
    w_loc = (
        Window.partitionBy("_sl", "user_id")
        .orderBy("_ts", "_k2")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = st.withColumn("_lq", F.min("_q").over(w_loc)).withColumn(
        "_lk", F.max("_ck").over(w_loc)
    )
    carry = st.groupBy("_sl", "user_id").agg(
        F.min("_q").alias("_qo"), F.max("_ck").alias("_ko")
    )
    w_off = (
        Window.partitionBy("user_id")
        .orderBy("_sl")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = carry.select(
        "_sl",
        "user_id",
        F.min("_qo").over(w_off).alias("_qi"),
        F.max("_ko").over(w_off).alias("_ki"),
    )
    r = local.join(offs, ["_sl", "user_id"])
    mq = F.least("_lq", "_qi")  # struct min skips nulls, like greatest
    mk = F.greatest("_lk", "_ki")
    l3 = (
        r.filter(
            (F.col("_k2") == -2)
            & mq.isNotNull()
            & (F.col("_ts") <= mq["qa"] + F.lit(W))
            & (mk == mq["qt"])  # no step2 since c* = no interrupt yet
            & (mq["qn"] == 1)  # a twin step2 at c*'s ts interrupts
        )
        .select("user_id")
        .distinct()
    )
    levels = (
        g.filter(F.col("_k") == 0)
        .select("user_id")
        .distinct()
        .withColumn("level", F.lit(1))
        .unionByName(
            dq.filter(F.col("_q").isNotNull())
            .select("user_id")
            .distinct()
            .withColumn("level", F.lit(2))
        )
        .unionByName(l3.withColumn("level", F.lit(3)))
    )
    return (
        levels.groupBy("user_id")
        .agg(F.max("level").alias("funnel_level"))
        .groupBy("funnel_level")
        .agg(F.count("*").alias("n_users"))
    )


def window_funnel(
    events: DataFrame,
    window_us: int,
    mode: str = "default",
    conds: tuple[str, str, str] = ("signup", "click", "purchase"),
) -> DataFrame:
    """ClickHouse ``windowFunnel(window, [mode])`` over an events
    DataFrame (columns: user_id, event_type, ts_us; strict_order also
    needs event_id as the tie key). Returns (funnel_level, n_users).

    Modes (AggregateFunctionWindowFunnel.h):

    - ``default``: strictly-increasing timestamps between steps
      (ClickHouse's ``strict_increase``; this family's deterministic
      baseline).
    - ``inclusive``: same-timestamp predecessors count — the pinned
      deterministic reading of ClickHouse's order-undefined default.
    - ``strict_order``: ANY intervening event between steps kills the
      chain (steps must be rank-adjacent in the full stream).
    - ``strict_dedup``: a repeat of an already-matched condition between
      steps kills the chain (ClickHouse ``strict_deduplication``).

    All modes are one-pass segmented scans or rank-adjacency hash joins
    over composite (user, ts) slices — no per-user single-task sorts, no
    pair expansion; a mega-user spreads across tasks (skew probes ~1.0
    to 1.3 on a 50%-of-log user)."""
    if mode not in FUNNEL_MODES:
        raise ValueError(
            f"window_funnel: unknown mode {mode!r} (one of {FUNNEL_MODES})"
        )
    if len(conds) != 3:
        raise ValueError(
            "window_funnel: exactly 3 step conditions (the shared chain "
            "scan's fold state is the 3-step (S, C) pair)"
        )
    # ONE quantile job per entry (r12, guide §1.2): modes that run a
    # second segmented pass (strict_dedup) or their own ranker
    # (strict_order) reuse the dispatcher's boundary literals instead of
    # re-running a quantile job whose lineage re-executes the chain scan
    from .ranking import composite_slice_key, slice_bounds

    n_slices = events.sparkSession.sparkContext.defaultParallelism
    if mode == "strict_order":
        # strict_order ranks the FULL stream (any intervening event
        # kills a chain), so its boundaries come from the full stream
        b = slice_bounds(
            events.select("user_id", "ts_us"),
            composite_slice_key("user_id", "ts_us"),
            n_slices,
        )
        return _funnel_strict_order(events, window_us, conds, bounds=b)
    ev3 = events.filter(F.col("event_type").isin(*conds)).select(
        "user_id", "ts_us"
    )
    b = slice_bounds(
        ev3, composite_slice_key("user_id", "ts_us"), n_slices
    )
    if mode == "inclusive":
        g = funnel_chain_scan(events, inclusive=True, conds=conds, bounds=b)
        return _funnel_levels(g, window_us, k3=0, k1=-2)
    g = funnel_chain_scan(events, conds=conds, bounds=b)
    if mode == "strict_dedup":
        # r13: strict_dedup's SECOND segmented pass re-executes the
        # whole chain scan per consuming branch. A PERSIST here lost on
        # A/B in r12 (4.2 -> 5.1 s: cache write + frozen partitioning);
        # a lazy localCheckpoint WINS (A/B min 3.38 -> 2.47 s, 2/3
        # pairwise after warm-up) because it additionally truncates the
        # logical plan — the second pass's eager analyses and the
        # action-time optimizer walk a leaf (cache.checkpoint_in). The
        # single-second-pass modes (default/inclusive levels) LOST
        # 0.1-0.2 s under the same A/B — their carry-branch re-execution
        # back-fills idle cores — so only strict_dedup materializes.
        from .cache import checkpoint_in

        return _funnel_strict_dedup(
            checkpoint_in(None, g), window_us, bounds=b
        )
    return _funnel_levels(g, window_us, k3=-2, k1=0)
