"""Mergeable exact-quantile state: the AggregatingMergeTree percentile
materialized-view shape.

The reference delegates this to ClickHouse (`quantileState` in an MV,
`quantileMerge` at read time — AggregateFunction columns in
`app/service/clickhouse.ts`-managed tables); the Spark-first state is the
VALUE HISTOGRAM: a (key..., value, count) frame. It is

- **exact**: no sketch error — quantiles from the merged histogram equal
  quantiles over the raw rows (pytest-pinned merge == direct);
- **mergeable**: merging is `SUM(count)` group-by — associative,
  commutative, idempotent-under-regrouping, so hourly states roll to
  days, days to months, without ever re-reading raw data;
- **bounded**: state size is (keys x distinct values), i.e. the VALUE
  DOMAIN, not the row count — cents-valued metrics have <=~1e6 distinct
  values no matter how many trillion rows produced them (the same reason
  ClickHouse's quantilesExactWeighted scales, and the same trick
  `weighted_median_price` uses);
- **engine-portable**: quantile picking is integer arithmetic over the
  cumulative histogram (idx = (n-1)*num // den, take the smallest value
  whose cumulative count exceeds idx) — ClickHouse quantileExactLow
  semantics, no float index math to disagree on.

The cumulative pass rides the range-sliced prefix scan
(operators/ranking.prefix_sum), so a single key's histogram never
serializes onto one task even when the value domain is wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranking import prefix_sum

# quantile levels as exact rationals (num, den): float levels would make
# the index float math engine-dependent at n*(den-1) boundaries
DEFAULT_LEVELS: dict[str, tuple[int, int]] = {
    "p25": (1, 4),
    "p50": (1, 2),
    "p75": (3, 4),
}


def histogram_state(
    df: DataFrame, keys: list[str], value_col: str, cnt_col: str = "cnt"
) -> DataFrame:
    """Fold raw rows into the quantile state: (keys..., value, count).

    This is the `-State` half: one map-side-combined shuffle on
    (keys, value). The output is the thing an hourly materialized view
    would persist."""
    return df.groupBy(*keys, value_col).agg(
        F.count("*").cast("long").alias(cnt_col)
    )


def merge_state(
    state: DataFrame, keys: list[str], value_col: str, cnt_col: str = "cnt"
) -> DataFrame:
    """The `-Merge` half: re-key a state to coarser ``keys`` (e.g. hour
    states -> day) by summing counts. Associative + commutative, so any
    merge tree over partial states yields the same state."""
    return state.groupBy(*keys, value_col).agg(
        F.sum(cnt_col).cast("long").alias(cnt_col)
    )


def quantiles_from_state(
    state: DataFrame,
    keys: list[str],
    value_col: str,
    levels: dict[str, tuple[int, int]] | None = None,
    cnt_col: str = "cnt",
) -> DataFrame:
    """Exact quantileExactLow per key group from a histogram state.

    idx = (n-1)*num // den (0-based rank, integer arithmetic); the
    quantile is the smallest value whose cumulative count reaches
    idx + 1. Emits ``n_events`` + one BIGINT column per level (raw
    value units — callers scale/round for presentation).

    ``state`` is consumed by three branches (prefix scan x2 + totals);
    the static plan prints its derivation per branch, but AQE's runtime
    exchange reuse collapses the identical upstream exchanges — see
    ``ranking.prefix_sum``'s double-execution note."""
    levels = levels or DEFAULT_LEVELS
    cum = prefix_sum(
        state, list(keys), [value_col], cnt_col, broadcast_offsets=True
    )
    totals = state.groupBy(*keys).agg(
        F.sum(cnt_col).cast("long").alias("_n")
    )
    j = cum.join(F.broadcast(totals), list(keys))
    aggs = [F.max("_n").cast("long").alias("n_events")]
    for name, (num, den) in levels.items():
        idx = F.expr(f"((_n - 1) * {num}) div {den}")
        aggs.append(
            F.min(
                F.when(F.col("_prefix") >= idx + 1, F.col(value_col))
            ).alias(name)
        )
    return j.groupBy(*keys).agg(*aggs)
