"""Skew mitigation operators.

AQE (on in the session factory) already splits skewed *join* partitions at
runtime (``spark.sql.adaptive.skewJoin``). These helpers cover the cases
AQE does not re-plan:

- :func:`salted_aggregate` — a hot grouping key concentrates a reduce
  partition. Two-phase aggregation over (key, salt) then (key) spreads the
  hot key across `salt` reducers; only mergeable aggregates (count/sum/
  min/max) qualify, which is what the engine's query surface uses.
- :func:`replicated_salted_join` — a skewed join key against a
  non-broadcastable build side: replicate the build side `salt` times and
  scatter the probe side, turning one hot partition into `salt` even ones.

Salt derivation is ``spark_partition_id() % salt`` — free (no hash of row
data), deterministic within a run, and uniform as long as upstream
partitions are balanced, which the file source guarantees.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "count": F.sum,  # partial counts merge by summing
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (fn, input column) with fn in
    count|sum|min|max (the mergeable set). Equivalent to
    ``df.groupBy(keys).agg(...)`` for any data, but a key holding 50% of
    all rows occupies `salt` reducers instead of one.
    """
    for fn, _ in aggs.values():
        if fn not in _MERGE:
            raise ValueError(f"non-mergeable aggregate: {fn}")
    salted = df.withColumn("_salt", F.spark_partition_id() % salt)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            (F.count(c) if fn == "count" else getattr(F, fn)(c)).alias(f"_p_{out}")
            for out, (fn, c) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[fn](f"_p_{out}").alias(out)
            for out, (fn, _) in aggs.items()
        ]
    )


def replicated_salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join when the build side cannot broadcast.

    The probe side gets a partition-derived salt; the build side is
    replicated once per salt value (explode of a literal range); the join
    key becomes (on..., salt). Row-identical to ``probe.join(build, on,
    how)`` for inner/left joins, with `salt`x the build-side shuffle
    volume as the price for even reducers. Right/full outer joins are
    rejected: an unmatched build row would surface once per salt value
    (`salt` duplicated null-extension rows), which is not the semantics
    of the plain join.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"replicated_salted_join supports inner/left joins only, got {how!r}: "
            "build-side replication would duplicate unmatched right-side rows"
        )
    p = probe.withColumn("_salt", F.spark_partition_id() % salt)
    b = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = p.join(b, [*on, "_salt"], how)
    return out.drop("_salt")
