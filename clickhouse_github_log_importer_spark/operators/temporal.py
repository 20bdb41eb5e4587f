"""Temporal join operators Spark's DataFrame API lacks natively.

Two operators a time-series / attribution workload needs constantly:

- :func:`asof_join` — for each probe row, the most recent reference row
  with the same key at or before the probe's timestamp. Implemented with
  the union + running ``last(ignorenulls)`` window trick: ONE shuffle on
  the key (the same cost as a sort-merge join), no per-row Python, no
  expansion of (probe x candidate) pairs. This is the scalable form: a
  naive "join all earlier rows then rank" expands by the mean number of
  earlier matches per key before cutting back, which at 100 TB is the
  difference between a sort and an OOM.
- :func:`range_join_bucketed` — pair rows whose timestamps fall within a
  band, WITHOUT an equality key. Spark turns a pure inequality join into
  a broadcast-nested-loop (quadratic); the scalable form buckets time
  into ``ceil(band / width)``-aligned cells, joins on the cell id (a real
  equi-join: shuffle, AQE, skew handling all apply), then refines with
  the exact band predicate. Each reference row keys by its own cell, each
  probe row fans out to the few cells its band can reach, so every
  qualifying pair meets exactly once and no dedup pass is needed.

Reference parity note: the reference delegates all query execution to
ClickHouse and has no as-of/range operators — these are additive engine
surface (SURVEY §2 "beyond the reference" track), shaped for the
training-data/eventlog workloads the engine targets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: attached by asof_join: epoch value of the matched reference row's
#: timestamp (null when no reference row qualifies).
ASOF_TIME = "_asof_time"


def trailing_range_sum(
    df: DataFrame,
    part_col: str,
    ts_col: str,
    val_col: str,
    window_us: int,
    out_col: str = "_trailing",
) -> DataFrame:
    """Per-row trailing-window sum: for each row, the sum of ``val_col``
    over rows of the same ``part_col`` with timestamp in
    ``[t - window_us, t]`` — the time-RANGE sliding frame, in linear time.

    Spark's bounded sliding RANGE frame re-evaluates the ENTIRE frame for
    every row (SlidingWindowFunctionFrame has no retraction), so a key
    whose rows all fall within one window span goes O(n^2): the skew
    probe measured 241x wall on a mega-user partition. The linear plan is
    a prefix-sum difference::

        trailing(t) = cumsum(t) - cumsum(t - window - 1)

    where ``cumsum`` is the UNBOUNDED-preceding RANGE cumsum (add-only,
    incremental, peers at equal timestamps share the value) and the
    subtrahend comes from an as-of lookup (one more shuffle on the same
    key) against the deduped (part, ts, cumsum) frame. Integer
    timestamps make the strict lower bound exact: subtracting rows
    ``ts' <= t - window - 1`` keeps exactly ``ts' >= t - window``.

    ``val_col`` should be an exact integer (cents/micros) for
    order-insensitive, engine-portable sums — same rule as every other
    windowed aggregate here.

    The ordered pass is RANGE-SLICED (``..operators.ranking``'s
    segmented-scan machinery), never ``Window.partitionBy(key)``: a
    mega-key's timeline splits into contiguous slices across many tasks
    (local scan + tiny broadcast carry table), so one user owning half
    the log costs many short tasks, not one straggler. The skew probe
    measured the partition-window form of this operator at 2.65x on a
    50%-of-log user; the sliced form is flat.

    Both cumsum terms ride ONE scan: each input row explodes into a
    value row (kind 0, weight ``val``) plus two zero-weight query rows —
    the minuend at ``t`` (kind 2) and the subtrahend at
    ``t - window - 1`` (kind 1). After the sliced running sum ordered by
    ``(time, kind)``, kind-0 rows at a timestamp sort before both query
    kinds, so each query row reads the inclusive cumsum at its key;
    query weights are zero, so peer order within a kind never matters.
    A final group on (key, t) differences the two terms, and its hash
    partitioning is reused by the per-row join back on (key, ts).
    """
    from .ranking import prefix_sum

    W1 = F.lit(int(window_us) + 1).cast("long")
    ts_l = F.col(ts_col).cast("long")
    v_l = F.col(val_col).cast("long")
    null_l = F.lit(None).cast("long")
    u = df.select(
        part_col,
        F.explode(
            F.array(
                F.struct(
                    ts_l.alias("_time"),
                    F.lit(0).alias("_kind"),
                    v_l.alias("_v"),
                    null_l.alias("_t"),
                ),
                F.struct(
                    (ts_l - W1).alias("_time"),
                    F.lit(1).alias("_kind"),
                    F.lit(0).cast("long").alias("_v"),
                    ts_l.alias("_t"),
                ),
                F.struct(
                    ts_l.alias("_time"),
                    F.lit(2).alias("_kind"),
                    F.lit(0).cast("long").alias("_v"),
                    ts_l.alias("_t"),
                ),
            )
        ).alias("_x"),
    ).select(part_col, "_x.*")
    from .ranking import composite_slice_key

    scanned = prefix_sum(
        u,
        [part_col],
        ["_time", "_kind"],
        "_v",
        # composite (key, time) slicing: only heavy keys split by time,
        # so the offsets table stays O(distinct keys); at that size the
        # offsets join must not FORCE a broadcast — AQE picks broadcast
        # when it measures small, shuffle-join when keys are many
        slice_col=composite_slice_key(part_col, "_time"),
        broadcast_offsets=False,
        # boundary quantiles from the un-exploded scan (same (key, time)
        # distribution — the subtrahend row's -window shift is far inside
        # a slice): quantiling `u` would execute the 3x explode twice
        bounds_df=df.select(
            part_col, F.col(ts_col).cast("long").alias("_time")
        ),
    )
    # equal-(key, ts) peers emit duplicate query rows with identical
    # prefixes; max() collapses them
    at_ts = (
        scanned.filter(F.col("_kind") != 0)
        .groupBy(part_col, "_t")
        .agg(
            (
                F.max(F.when(F.col("_kind") == 2, F.col("_prefix")))
                - F.max(F.when(F.col("_kind") == 1, F.col("_prefix")))
            ).alias(out_col)
        )
    )
    return (
        df.withColumn("_t", F.col(ts_col).cast("long"))
        .join(at_ts, [part_col, "_t"])
        .drop("_t")
    )


def band_count_keyless(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    lower: int,
    upper: int,
    out_col: str = "n_in_band",
) -> DataFrame:
    """Per row: how many OTHER rows (any key) have a timestamp in
    ``[t + lower, t + upper]`` — the count specialization of the keyless
    band join, in linear time.

    :func:`range_join_bucketed` must touch every qualifying pair because
    it RETURNS the pairs; when only the count is needed, pair volume
    (which grows with timeline density, inherently super-linear under
    densification) is avoidable. The count is a step-function difference::

        n(t) = cum(t + upper) - cum(t + lower - 1) - 1   (self excluded)

    where ``cum(T) = #rows with ts <= T``. Both lookups ride ONE
    distributed ordered pass: per-distinct-timestamp counts union'd with
    two zero-weight boundary query rows per input row, prefix-summed by
    the range-sliced machinery of :func:`..operators.ranking.prefix_sum`
    (keyless here: the global time order is range-partitioned into
    contiguous slices, never one task). Query rows sort AFTER the count
    row at an equal timestamp, so both bounds are inclusive-exact in
    integer microseconds.
    """
    from .ranking import prefix_sum

    counts = df.groupBy(F.col(ts_col).cast("long").alias("_tm")).agg(
        F.count("*").cast("long").alias("_c")
    )
    quotes = counts.select(
        "_tm",
        F.lit(0).alias("_q"),
        F.lit(0).alias("_kind"),
        F.lit(None).cast("long").alias("_id"),
        "_c",
    )

    def boundary(offset: int, kind: int) -> DataFrame:
        return df.select(
            (F.col(ts_col).cast("long") + F.lit(offset)).alias("_tm"),
            F.lit(1).alias("_q"),
            F.lit(kind).alias("_kind"),
            F.col(id_col).alias("_id"),
            F.lit(0).cast("long").alias("_c"),
        )

    u = quotes.unionByName(boundary(lower - 1, 0)).unionByName(
        boundary(upper, 1)
    )
    # slice boundaries from the raw timestamp scan, not the composed
    # union: quantiles only need the time DISTRIBUTION (band offsets are
    # +-seconds, far inside a slice), and quantiling `u` itself would
    # re-execute its per-timestamp count shuffle once for the boundary
    # job and again for the real pass
    ps = prefix_sum(
        u,
        [],
        ["_tm", "_q", "_kind", "_id"],
        "_c",
        bounds_df=df.select(F.col(ts_col).cast("long").alias("_tm")),
    )
    hi = F.max(F.when(F.col("_kind") == 1, F.col("_prefix")))
    lo = F.max(F.when(F.col("_kind") == 0, F.col("_prefix")))
    return (
        ps.filter(F.col("_q") == 1)
        .groupBy("_id")
        .agg((hi - lo - 1).alias(out_col))
        .select(F.col("_id").alias(id_col), out_col)
    )


def floor_div(col: Column, width: int) -> Column:
    """Exact floor division on longs. Naive ``/`` rounds through double
    (wrong cells once ulp(quotient) ~ 1); subtracting the positive mod
    first makes the dividend exactly divisible, so the double division is
    exact for |values| < 2^53 (any epoch-micro timestamp) and floor ==
    trunc regardless of sign."""
    posmod = ((col % width) + width) % width
    return ((col - posmod) / width).cast("long")


def asof_join(
    probe: DataFrame,
    reference: DataFrame,
    on: Sequence[str],
    probe_time: str,
    ref_time: str,
    payload: Sequence[str],
    tiebreak: str | None = None,
    allow_exact_matches: bool = True,
    how: str = "left",
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join: attach to each probe row the payload of the latest
    reference row sharing ``on`` with ``ref_time <= probe_time`` (strict
    ``<`` when ``allow_exact_matches=False``).

    ``tolerance`` (same units as the time columns, e.g. epoch micros)
    bounds the lookback like pandas ``merge_asof(tolerance=...)``: a
    match older than ``probe_time - tolerance`` is treated as no match
    (payload nulled on left joins, row dropped on inner). Purely a
    post-predicate on the matched pair — the plan shape is unchanged.

    Both time columns must be integer-comparable (use epoch micros, the
    repo's portable exact timestamp). ``tiebreak`` orders reference rows
    that share a timestamp (the max wins), making the result
    deterministic where pandas ``merge_asof`` and DuckDB ``ASOF JOIN``
    leave duplicate-timestamp picks unspecified. Payload columns must not
    collide with probe columns — alias on the way in.

    Plan shape: one Exchange on the key + one window sort; probe columns
    ride along untouched, so column pruning still reaches the scans.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports left/inner, got {how!r}")
    clash = set(payload) & set(probe.columns)
    if clash:
        raise ValueError(f"payload columns collide with probe columns: {clash}")
    keys = list(on)
    # at equal timestamps the reference row must sort before (inclusive)
    # or after (strict) the probe row so the running last() sees or
    # misses it accordingly
    probe_side, ref_side = (1, 0) if allow_exact_matches else (0, 1)
    p = probe.withColumn("_at", F.col(probe_time).cast("long")).withColumn(
        "_side", F.lit(probe_side)
    )
    r = reference.select(
        *keys,
        F.col(ref_time).cast("long").alias("_at"),
        F.col(ref_time).cast("long").alias(ASOF_TIME),
        *payload,
    ).withColumn("_side", F.lit(ref_side))
    order: list[Column] = [F.col("_at").asc(), F.col("_side").asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [ASOF_TIME, *payload]
    u = p.unionByName(r, allowMissingColumns=True)
    filled = u.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}") for c in carried]
    )
    keep = None
    if tolerance is not None:
        keep = (
            F.col("_at") - F.col(f"_f_{ASOF_TIME}")
        ) <= F.lit(int(tolerance))
    out = (
        filled.filter(F.col("_side") == probe_side)
        .drop(*carried, "_side")
        .select(
            "*",
            *[
                (
                    F.when(keep, F.col(f"_f_{c}"))
                    if keep is not None
                    else F.col(f"_f_{c}")
                ).alias(c)
                for c in carried
            ],
        )
        .drop(*[f"_f_{c}" for c in carried], "_at")
    )
    if how == "inner":
        out = out.filter(F.col(ASOF_TIME).isNotNull())
    return out


def range_join_bucketed(
    probe: DataFrame,
    reference: DataFrame,
    probe_time: str,
    ref_time: str,
    lower: int,
    upper: int,
    payload: Sequence[str],
    bucket_width: int | None = None,
) -> DataFrame:
    """Keyless band join: pairs (probe, reference) with
    ``lower <= ref_time - probe_time <= upper`` (epoch-micro longs).

    ``bucket_width`` defaults to the band width, which bounds the probe
    fan-out at 3 cells per row; every qualifying pair meets exactly once
    because the reference row is keyed only by its own cell. The cell id
    join is a plain equi-join — shuffle-partitionable, AQE-skew-split —
    and the band predicate is evaluated post-join as a cheap long
    comparison. Returns probe columns + payload columns.
    """
    if upper < lower:
        raise ValueError(f"empty band: lower={lower} > upper={upper}")
    width = bucket_width or max(upper - lower, 1)
    clash = set(payload) & set(probe.columns)
    if clash:
        raise ValueError(f"payload columns collide with probe columns: {clash}")
    pt = F.col(probe_time).cast("long")
    rt = F.col(ref_time).cast("long")
    # cells the probe's band [pt+lower, pt+upper] can touch
    lo_cell = (pt + F.lit(lower)).cast("long")
    hi_cell = (pt + F.lit(upper)).cast("long")
    p = probe.withColumn(
        "_cell",
        F.explode(F.sequence(floor_div(lo_cell, width), floor_div(hi_cell, width))),
    ).withColumn("_pt", pt)
    r = reference.select(
        floor_div(rt, width).alias("_cell"),
        rt.alias("_rt"),
        *payload,
    )
    delta = F.col("_rt") - F.col("_pt")
    return (
        p.join(r, "_cell")
        .filter((delta >= F.lit(lower)) & (delta <= F.lit(upper)))
        .drop("_cell", "_pt", "_rt")
    )
