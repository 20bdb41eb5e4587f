"""Distributed global ranking over low-cardinality partitions.

``Window.partitionBy(type).orderBy(...)`` is the scale trap hiding in
every "rank within category" query: Spark hashes each category to ONE
task, so the whole category sorts serially — parallelism is capped at
the number of categories, and the 100 TB run dies in a single-task sort.
(The scale probe measured exactly this: `event_rank_profile` grew 4.0x
on 3x data while every range-partitioned neighbor stayed linear.)

The scalable plan is the classic two-pass distributed ranking every
MPP engine runs internally:

1. **Range-partition** on ``(category, order keys)`` — a parallel
   sample-based sort that slices each category into contiguous ordered
   ranges across many partitions.
2. **Rank locally** within each (slice, category) — full parallelism.
3. **Prefix offsets**: per-(slice, category) row counts form a TINY
   table (n_slices x n_categories); a cumulative sum over it gives each
   slice's starting rank, broadcast-joined back.

``global rank = slice offset + local rank`` — identical values to the
window form, two shuffles (range + local-window hash) instead of one
serial sort. The offsets table is control-plane-sized by construction.

percent_rank / cume_dist / ntile all derive from (rank, n) in closed
form when the ordering tuple is UNIQUE (tie-free): no peer groups, so
``cume_dist = rank/n``, ``percent_rank = (rank-1)/(n-1)`` (0 when n=1),
and ntile's uneven-bucket rule is integer arithmetic. Callers must
include a unique tiebreaker column in ``order_cols`` — the same
requirement the engine-portable window queries already obey (float-free
deterministic ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    n_slices: int | None = None,
) -> DataFrame:
    """Add ``_rank`` (1-based within ``part_cols``, ordered by
    ``order_cols``, which must end in a unique tiebreaker) and ``_n``
    (partition row count) without ever sorting a whole partition on one
    task. Ascending, nulls-first — Window.orderBy's defaults."""
    n_slices = n_slices or df.sparkSession.sparkContext.defaultParallelism
    rp = df.repartitionByRange(n_slices, *(part_cols + order_cols))
    sliced = rp.withColumn("_slice", F.spark_partition_id())
    # local rank: windows keyed by (slice, category) — n_slices-way
    # parallel, each holds one contiguous ordered range of one category
    w_loc = Window.partitionBy("_slice", *part_cols).orderBy(*order_cols)
    local = sliced.withColumn("_lrank", F.row_number().over(w_loc))
    # tiny counts table -> prefix offsets + totals per category
    counts = local.groupBy("_slice", *part_cols).agg(F.count("*").alias("_c"))
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("_slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(*part_cols)
    offsets = counts.select(
        "_slice",
        *part_cols,
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_c").over(w_tot).alias("_n"),
    )
    return (
        local.join(F.broadcast(offsets), ["_slice", *part_cols])
        .withColumn("_rank", (F.col("_off") + F.col("_lrank")).cast("long"))
        .drop("_slice", "_lrank", "_off")
    )


def prefix_sum(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    val_col: str,
    n_slices: int | None = None,
) -> DataFrame:
    """Add ``_prefix``: the inclusive running sum of ``val_col`` within
    ``part_cols`` ordered by ``order_cols`` (unique tiebreaker required),
    without serializing a stratum onto one task.

    Same two-pass shape as :func:`ranked` — and the range partitioning is
    load-bearing here, not just a parallel sort: per-slice partial sums
    only compose into a global running sum when each slice holds a
    CONTIGUOUS ordered range of its stratum. (Hash slices would
    interleave stratum rows and the offsets would be meaningless.)
    """
    n_slices = n_slices or df.sparkSession.sparkContext.defaultParallelism
    rp = df.repartitionByRange(n_slices, *(part_cols + order_cols))
    sliced = rp.withColumn("_slice", F.spark_partition_id())
    w_loc = (
        Window.partitionBy("_slice", *part_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(val_col).cast("long")
    local = sliced.withColumn("_lsum", F.sum(v).over(w_loc))
    sums = local.groupBy("_slice", *part_cols).agg(F.sum(v).alias("_c"))
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("_slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sums.select(
        "_slice",
        *part_cols,
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        local.join(F.broadcast(offsets), ["_slice", *part_cols])
        .withColumn("_prefix", (F.col("_off") + F.col("_lsum")).cast("long"))
        .drop("_slice", "_lsum", "_off")
    )


def rank_profile(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    ntile: int = 4,
    n_slices: int | None = None,
) -> DataFrame:
    """percent_rank / cume_dist / ntile(n) per category at full
    parallelism — closed forms over the distributed ``ranked`` pass
    (valid because ``order_cols`` ends in a unique tiebreaker)."""
    r, n = F.col("_rank"), F.col("_n")
    k = F.lit(ntile)
    rem = n % k
    basei = F.floor(n / k).cast("long")
    # first (n % k) tiles get base+1 rows (the SQL ntile rule)
    big_span = rem * (basei + 1)
    tile = (
        F.when(r <= big_span, F.floor((r - 1) / (basei + 1)))
        .otherwise(rem + F.floor((r - big_span - 1) / basei))
        + 1
    )
    return (
        ranked(df, part_cols, order_cols, n_slices)
        .withColumn(
            "pr",
            F.round(
                F.when(n > 1, (r - 1) / (n - 1)).otherwise(F.lit(0.0)), 6
            ),
        )
        .withColumn("cd", F.round(r / n, 6))
        .withColumn("quartile" if ntile == 4 else f"ntile{ntile}", tile.cast("long"))
        .drop("_rank", "_n")
    )
