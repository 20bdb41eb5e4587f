"""Summing / Collapsing / VersionedCollapsing merge folds.

The load-bearing property is background-merge ASSOCIATIVITY:
f(a ∪ b) == f(f(a) ∪ f(b)) — that is what makes incremental part
compaction correct. Plus the documented case splits, pinned against
plain-python folds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators.mergetree import (
    collapsing_merge,
    summing_merge,
    versioned_collapsing_merge,
)

SUM_SCHEMA = "k string, seq long, hits long, cents long, note string"
COL_SCHEMA = "k string, seq long, sign int, val long"
VER_SCHEMA = "k string, seq long, sign int, ver long, val long"


def rows_set(df):
    return sorted(tuple(r) for r in df.collect())


def test_summing_merge_sums_and_drops_zero_groups(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 2, 100, "first"),
            ("a", 2, 3, -100, "second"),
            ("b", 3, 0, 0, "zeroed"),   # all sums zero -> dropped
            ("b", 4, 0, 0, "zeroed2"),
            ("c", 5, 1, 5, "only"),
        ],
        SUM_SCHEMA,
    )
    out = summing_merge(df, ["k"], ["hits", "cents"], "seq")
    assert rows_set(out) == [
        ("a", 1, 5, 0, "first"),  # non-summed cols from first row by seq
        ("c", 5, 1, 5, "only"),
    ]


@pytest.mark.parametrize(
    "rows,expect",
    [
        # one more state than cancel -> last state survives
        ([(1, 1, 10), (2, -1, 10), (3, 1, 30)], [(3, 1, 30)]),
        # one more cancel -> first cancel survives
        ([(1, -1, 10), (2, 1, 20), (3, -1, 30)], [(1, -1, 10)]),
        # equal, last is state -> first cancel + last state
        ([(1, -1, 10), (2, 1, 20)], [(1, -1, 10), (2, 1, 20)]),
        # equal, last is cancel -> fully collapsed
        ([(1, 1, 10), (2, -1, 20)], []),
        # broken imbalance (2 extra states) -> sign-sum: last state
        ([(1, 1, 1), (2, 1, 2), (3, 1, 3), (4, -1, 4)], [(3, 1, 3)]),
    ],
)
def test_collapsing_merge_documented_cases(spark, rows, expect):
    df = spark.createDataFrame(
        [("k",) + r for r in rows], COL_SCHEMA
    )
    out = collapsing_merge(df, ["k"], "sign", "seq")
    assert rows_set(out) == [("k",) + e for e in expect]


def test_versioned_collapsing_annihilates_pairs(spark):
    df = spark.createDataFrame(
        [
            ("k", 1, 1, 7, 100),   # v7 state
            ("k", 2, -1, 7, 100),  # v7 cancel -> pair gone
            ("k", 3, 1, 8, 200),   # v8 net +1
            ("k", 4, 1, 9, 300),   # v9 net +2 -> two copies survive
            ("k", 5, 1, 9, 301),
            ("q", 6, -1, 1, 50),   # lone cancel survives as cancel
        ],
        VER_SCHEMA,
    )
    out = versioned_collapsing_merge(df, ["k"], "sign", "ver", "seq")
    assert rows_set(out) == [
        ("k", 3, 1, 8, 200),
        ("k", 5, 1, 9, 301),   # last state replicated net=2 times
        ("k", 5, 1, 9, 301),
        ("q", 6, -1, 1, 50),
    ]


def _parts(spark, schema, rows, cut):
    a = spark.createDataFrame(rows[:cut], schema)
    b = spark.createDataFrame(rows[cut:], schema)
    return a, b


def test_merge_folds_are_associative(spark):
    # f(a ∪ b) == f(f(a) ∪ f(b)) — the background-merge contract
    srows = [
        ("a", 1, 2, 100, "x"), ("a", 2, 3, -50, "y"),
        ("b", 3, 1, 1, "z"), ("a", 4, -5, -50, "w"), ("b", 5, 2, 2, "v"),
    ]
    a, b = _parts(spark, SUM_SCHEMA, srows, 3)
    whole = summing_merge(a.unionByName(b), ["k"], ["hits", "cents"], "seq")
    parts = summing_merge(
        summing_merge(a, ["k"], ["hits", "cents"], "seq").unionByName(
            summing_merge(b, ["k"], ["hits", "cents"], "seq")
        ),
        ["k"], ["hits", "cents"], "seq",
    )
    assert rows_set(whole) == rows_set(parts)

    # contract (ClickHouse docs): a cancel row copies every field of its
    # state row except sign, so rows of one (key, version, sign) are
    # field-identical — under that contract the fold is associative on
    # full rows, not just on (key, version, sign) multiplicities
    vrows = [
        ("k", 1, 1, 7, 100), ("k", 1, -1, 7, 100),  # v7 pair
        ("k", 3, 1, 8, 200),                        # v8 state
        ("k", 3, -1, 8, 200),                       # v8 cancel (copy)
        ("k", 3, 1, 8, 200),                        # v8 state re-insert
        ("q", 6, 1, 1, 50),
    ]
    a, b = _parts(spark, VER_SCHEMA, vrows, 3)
    f = lambda d: versioned_collapsing_merge(d, ["k"], "sign", "ver", "seq")
    assert rows_set(f(a.unionByName(b))) == rows_set(
        f(f(a).unionByName(f(b)))
    )


def test_collapsing_merge_associative_on_clean_streams(spark):
    # collapsing is associative when parts split on insert boundaries of
    # complete (cancel, state) conversations — the supported write
    # pattern (each INSERT carries the cancel+state pair together)
    rows = [
        ("k", 1, 1, 10),            # state v1
        ("k", 2, -1, 10), ("k", 3, 1, 20),   # cancel v1 + state v2
        ("k", 4, -1, 20), ("k", 5, 1, 30),   # cancel v2 + state v3
        ("q", 6, 1, 5),
    ]
    f = lambda d: collapsing_merge(d, ["k"], "sign", "seq")
    a, b = _parts(spark, COL_SCHEMA, rows, 3)
    assert rows_set(f(a.unionByName(b))) == rows_set(
        f(f(a).unionByName(f(b)))
    )
    assert rows_set(f(spark.createDataFrame(rows, COL_SCHEMA))) == [
        ("k", 5, 1, 30), ("q", 6, 1, 5)
    ]


def test_folds_are_idempotent(spark):
    rows = [
        ("k", 1, 1, 7, 100), ("k", 2, -1, 7, 100), ("k", 3, 1, 9, 300),
    ]
    df = spark.createDataFrame(rows, VER_SCHEMA)
    f = lambda d: versioned_collapsing_merge(d, ["k"], "sign", "ver", "seq")
    once = f(df)
    assert rows_set(f(once)) == rows_set(once)


def test_ttl_sweep_partition_pruned(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [
            (1, "2015-01-10 00:00:00"),
            (2, "2015-02-10 00:00:00"),
            (3, "2015-03-05 00:00:00"),
            (4, "2015-03-20 00:00:00"),
            (5, "2015-04-01 00:00:00"),
        ],
        "id long, ts string",
    ).select(
        "id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.date_format(F.col("ts").cast("timestamp"), "yyyyMM")
        .cast("int")
        .alias("created_month"),
    )
    df.write.partitionBy("created_month").parquet(path)
    from clickhouse_github_log_importer_spark.operators.mergetree import (
        ttl_sweep,
    )

    res = ttl_sweep(spark, path, "ts", "2015-03-10 00:00:00")
    assert res["dropped"] == [201501, 201502]
    assert res["rewritten"] == [201503]
    assert res["kept"] == 1
    left = sorted(
        r["id"] for r in spark.read.parquet(path).select("id").collect()
    )
    assert left == [4, 5]  # boundary row 3 expired, live partitions intact
    assert not os.path.exists(f"{path}/created_month=201501")
