"""Summing / Collapsing / VersionedCollapsing merge semantics.

Completes the MergeTree-family story beside ``dedup_replacing`` (the
reference's events table is ReplacingMergeTree,
``app/service/log_importer.ts:123``): ClickHouse's other mutating table
engines are background-merge folds, and the property that makes them
work is that the fold is ASSOCIATIVE — merging parts in any grouping
yields the same final part. Each function here is that fold expressed as
one keyed DataFrame aggregation, so

    f(a ∪ b)  ==  f(f(a) ∪ f(b))        (pytest-pinned)

holds and incremental compaction (apply to any subset of parts, re-apply
later) is correct by construction. Unlike ClickHouse, whose merges are
eventual and whose within-tier survivor picks are arbitrary, every pick
here is deterministic via an explicit total order column.

Scale notes: every fold is one hash shuffle on the key tuple with
map-side combine (sums, min_by/max_by) — no windows, no sorts, no state
wider than one row per key.

- SummingMergeTree (docs: engines/table-engines/mergetree-family/
  summingmergetree): rows sharing the key collapse to one row with the
  designated numeric columns summed; a group whose sums are all zero is
  dropped; non-summed columns take the value of the FIRST row in
  ``order_col`` order (ClickHouse: arbitrary; we pin it).
- CollapsingMergeTree(sign): state (+1) / cancel (-1) rows pairwise
  cancel per key. Documented merge results: one more state than cancel
  -> last state; one more cancel -> first cancel; equal and last is
  state -> first cancel + last state; equal and last is cancel ->
  nothing. Larger imbalances (broken inserts, ClickHouse logs them)
  degrade to sign-sum: positive -> last state, negative -> first cancel.
- VersionedCollapsingMergeTree(sign, version): opposite-sign pairs with
  the same (key, version) annihilate; the |net| surviving copies of the
  majority sign remain (net multiplicity, emitted as rows). The
  associativity guarantee rides on the engine's documented write
  contract — a cancel row copies every field of its state row except
  sign, so rows of one (key, version, sign) are field-identical. On
  contract-violating input the (key, version, sign) multiplicities are
  still associative but the surviving representative payload may depend
  on merge grouping (as in ClickHouse itself, whose survivor pick is
  arbitrary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def summing_merge(
    df: DataFrame,
    key: list[str],
    sum_cols: list[str],
    order_col: str,
) -> DataFrame:
    """SummingMergeTree fold: one row per key, ``sum_cols`` summed.

    Groups whose every sum is zero are deleted (the engine's documented
    behavior). All other columns take the first row's value in
    ``order_col`` order.
    """
    other = [
        c for c in df.columns if c not in key and c not in sum_cols
        and c != order_col
    ]
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    aggs += [F.min_by(c, order_col).alias(c) for c in other]
    aggs += [F.min(order_col).alias(order_col)]
    out = df.groupBy(*key).agg(*aggs)
    alive = None
    for c in sum_cols:
        cond = F.col(c) != 0
        alive = cond if alive is None else (alive | cond)
    return out.filter(alive).select(*df.columns)


def collapsing_merge(
    df: DataFrame,
    key: list[str],
    sign_col: str,
    order_col: str,
) -> DataFrame:
    """CollapsingMergeTree fold: per key keep 0, 1 or 2 rows.

    One keyed aggregation computes (#state, #cancel, last sign, first
    cancel row, last state row); the documented case split then emits
    the survivors. Rows are whole structs so no column is lost.
    """
    row = F.struct(*[F.col(c) for c in df.columns])
    is_state = F.col(sign_col) == 1
    is_cancel = F.col(sign_col) == -1
    g = df.groupBy(*key).agg(
        F.sum(is_state.cast("long")).alias("_ns"),
        F.sum(is_cancel.cast("long")).alias("_nc"),
        F.max_by(sign_col, order_col).alias("_last_sign"),
        F.min_by(F.when(is_cancel, row), F.when(is_cancel, F.col(order_col))).alias("_fc"),
        F.max_by(F.when(is_state, row), F.when(is_state, F.col(order_col))).alias("_ls"),
    )
    # equal counts + last row is state -> keep BOTH first cancel and
    # last state (the documented not-yet-collapsible pair)
    equal_state = (F.col("_ns") == F.col("_nc")) & (
        F.col("_last_sign") == 1
    )
    keep_ls = (F.col("_ns") > F.col("_nc")) | equal_state
    keep_fc = (F.col("_nc") > F.col("_ns")) | equal_state
    empty = F.array().cast(
        f"array<struct<{','.join(f'{c}:{t}' for c, t in df.dtypes)}>>"
    )
    both = (
        F.when(keep_ls & keep_fc, F.array("_fc", "_ls"))
        .when(keep_ls, F.array("_ls"))
        .when(keep_fc, F.array("_fc"))
        .otherwise(empty)
    )
    exploded = g.select(F.explode(both).alias("_r"))
    return exploded.select(*[F.col(f"_r.{c}").alias(c) for c in df.columns])


def versioned_collapsing_merge(
    df: DataFrame,
    key: list[str],
    sign_col: str,
    version_col: str,
    order_col: str,
) -> DataFrame:
    """VersionedCollapsingMergeTree fold: per (key, version), opposite
    signs annihilate pairwise; |net| copies of the majority sign
    survive, represented by that sign's extreme row in ``order_col``
    order (last state / first cancel) replicated net times."""
    row = F.struct(*[F.col(c) for c in df.columns])
    is_state = F.col(sign_col) == 1
    g = df.groupBy(*key, version_col).agg(
        (
            F.sum(is_state.cast("long"))
            - F.sum((~is_state).cast("long"))
        ).alias("_net"),
        F.max_by(F.when(is_state, row), F.when(is_state, F.col(order_col))).alias("_ls"),
        F.min_by(F.when(~is_state, row), F.when(~is_state, F.col(order_col))).alias("_fc"),
    )
    rep = F.when(F.col("_net") > 0, F.col("_ls")).otherwise(F.col("_fc"))
    survivors = g.filter(F.col("_net") != 0).select(
        rep.alias("_r"),
        F.abs(F.col("_net")).cast("int").alias("_m"),
    )
    exploded = survivors.select(
        F.explode(F.expr("array_repeat(_r, _m)")).alias("_r")
    )
    return exploded.select(*[F.col(f"_r.{c}").alias(c) for c in df.columns])


def ttl_sweep(
    spark,
    table_path: str,
    ts_col: str,
    cutoff,
    partition_col: str = "created_month",
) -> dict:
    """``TTL <ts> + INTERVAL ... DELETE`` analog: partition-pruned expiry.

    ClickHouse applies TTL deletes at merge time, part by part. The
    Spark analog: read the month-partition listing, fully DROP the
    partitions whose upper bound is older than ``cutoff`` (a directory
    delete — no data read at all), rewrite ONLY the single boundary
    partition that straddles the cutoff, and never touch live
    partitions. Cost tracks the boundary partition size, not the table.
    Returns {"dropped": [...], "rewritten": [...], "kept": n}.
    """
    import shutil

    from pyspark.sql import functions as F

    cutoff_lit = F.lit(cutoff).cast("timestamp")
    parts = [
        r[partition_col]
        for r in spark.read.parquet(table_path)
        .select(partition_col)
        .distinct()
        .collect()
    ]
    cutoff_month = int(
        spark.range(1)
        .select(F.date_format(cutoff_lit, "yyyyMM").cast("int"))
        .first()[0]
    )
    dropped = sorted(p for p in parts if p < cutoff_month)
    boundary = [p for p in parts if p == cutoff_month]
    kept = len([p for p in parts if p > cutoff_month])
    for p in dropped:
        shutil.rmtree(f"{table_path}/{partition_col}={p}", ignore_errors=True)
    for p in boundary:
        sub = f"{table_path}/{partition_col}={p}"
        df = spark.read.parquet(sub).filter(F.col(ts_col) >= cutoff_lit)
        df.write.mode("overwrite").parquet(sub + ".ttl_tmp")
        shutil.rmtree(sub)
        shutil.move(sub + ".ttl_tmp", sub)
    return {"dropped": dropped, "rewritten": boundary, "kept": kept}
