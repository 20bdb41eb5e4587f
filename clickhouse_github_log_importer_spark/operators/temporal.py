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
) -> DataFrame:
    """As-of join: attach to each probe row the payload of the latest
    reference row sharing ``on`` with ``ref_time <= probe_time`` (strict
    ``<`` when ``allow_exact_matches=False``).

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
    out = (
        filled.filter(F.col("_side") == probe_side)
        .drop(*carried, "_side", "_at")
        .select(
            "*",
            *[F.col(f"_f_{c}").alias(c) for c in carried],
        )
        .drop(*[f"_f_{c}" for c in carried])
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
