"""Chunked packed-bitmap set algebra (operators/bitmaps.py).

The groupBitmapAnd/Or analog must be exactly the distinct-set algebra it
replaces: container popcounts == COUNT(DISTINCT), pair ANDs == join
cardinalities, and containers must be lossless mergeable state (OR of two
sub-bitmaps for the same bucket == bitmap of the union)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators.bitmaps import (
    BUCKET_BITS,
    audience_bitmaps,
    bitmap_pair_overlap,
)


def _toy(spark):
    rows = []
    # key "a": ids 0..99 and a far bucket; key "b": evens plus overlap tail
    rows += [("a", i) for i in range(100)]
    rows += [("a", (5 << BUCKET_BITS) + 7)]
    rows += [("b", i) for i in range(0, 200, 2)]
    rows += [("b", (5 << BUCKET_BITS) + 7)]
    # duplicates must not double-count
    rows += [("a", 3), ("b", 0)]
    return spark.createDataFrame(rows, "k string, id long")


def test_container_popcounts_match_distinct(spark):
    df = _toy(spark)
    bm = audience_bitmaps(df, "k", "id")
    got = {r["key"]: r["n"] for r in bm.groupBy("key").agg(
        F.sum("n").alias("n")).collect()}
    exact = {
        r["k"]: r["n"]
        for r in df.distinct().groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert got == exact


def test_pair_overlap_matches_set_algebra(spark):
    df = _toy(spark)
    out = bitmap_pair_overlap(audience_bitmaps(df, "k", "id")).collect()
    assert len(out) == 1
    row = out[0]
    a = {i for k, i in _toy_rows() if k == "a"}
    b = {i for k, i in _toy_rows() if k == "b"}
    assert (row["type_a"], row["type_b"]) == ("a", "b")
    assert row["n_a"] == len(a)
    assert row["n_b"] == len(b)
    assert row["n_and"] == len(a & b)
    assert row["n_or"] == len(a | b)


def _toy_rows():
    rows = []
    rows += [("a", i) for i in range(100)]
    rows += [("a", (5 << BUCKET_BITS) + 7)]
    rows += [("b", i) for i in range(0, 200, 2)]
    rows += [("b", (5 << BUCKET_BITS) + 7)]
    rows += [("a", 3), ("b", 0)]
    return rows


def test_containers_are_mergeable_state(spark):
    # -State/-Merge contract: byte-wise OR of the sub-bitmaps of two
    # disjoint loads == sub-bitmap of the combined load.
    h1 = spark.createDataFrame(
        [("a", i) for i in range(0, 50)], "k string, id long"
    )
    h2 = spark.createDataFrame(
        [("a", i) for i in range(30, 80)], "k string, id long"
    )
    both = h1.unionByName(h2)

    def bmap(df):
        [r] = audience_bitmaps(df, "k", "id").filter(
            F.col("bucket") == 0
        ).collect()
        return np.frombuffer(r["bitmap"], dtype=np.uint8)

    merged = bmap(h1) | bmap(h2)
    assert np.array_equal(merged, bmap(both))
    assert int(np.unpackbits(merged).sum()) == 80


def test_bitmap_algebra_fuzz(spark):
    # randomized id sets across bucket boundaries: container popcounts
    # and pair AND/OR must equal python set algebra exactly
    import random

    rng = random.Random(20260814)
    domain = (1 << BUCKET_BITS) * 3  # spans 3 containers
    sets = {
        k: {rng.randrange(domain) for _ in range(rng.randrange(1, 400))}
        for k in ("a", "b", "c")
    }
    rows = [(k, i) for k, ids in sets.items() for i in ids]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k string, id long")
    out = bitmap_pair_overlap(audience_bitmaps(df, "k", "id")).collect()
    assert len(out) == 3
    for r in out:
        a, b = sets[r["type_a"]], sets[r["type_b"]]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert r["n_and"] == len(a & b), (r["type_a"], r["type_b"])
        assert r["n_or"] == len(a | b)


def test_merge_bitmaps_rollup_equals_direct(spark):
    # -Merge contract for merge_bitmaps: OR-merging hourly container
    # states to a coarser key == building containers directly from the
    # union of the hours' ids (merge == direct), and popcounts equal
    # exact python set cardinalities. Hours 0/1 roll to day 0,
    # hour 24 rolls to day 1; overlapping ids must count once.
    from clickhouse_github_log_importer_spark.operators.bitmaps import (
        merge_bitmaps,
    )

    rows = (
        [(0, i) for i in range(0, 60)]
        + [(1, i) for i in range(40, 90)]  # overlaps hour 0
        + [(1, (3 << BUCKET_BITS) + 5)]  # a far container
        + [(24, i) for i in range(10)]  # next day
    )
    df = spark.createDataFrame(rows, "hour long, id long")
    hourly = audience_bitmaps(df, "hour", "id")
    day = merge_bitmaps(
        hourly, F.expr("CAST(key AS BIGINT) div 24")
    )
    got = {
        (r["key"], r["bucket"]): (r["bitmap"], r["n"])
        for r in day.collect()
    }
    direct = audience_bitmaps(
        df.withColumn("hour", F.expr("hour div 24")), "hour", "id"
    )
    want = {
        (r["key"], r["bucket"]): (r["bitmap"], r["n"])
        for r in direct.collect()
    }
    assert got == want
    day_tot = {
        k: sum(n for (kk, _), (_, n) in got.items() if kk == k)
        for k in ("0", "1")
    }
    assert day_tot == {"0": 91, "1": 10}


def test_merge_bitmaps_rejects_truncated_container(spark):
    # corrupt persisted state (wrong container width) must fail with the
    # explicit domain-contract error, not an opaque numpy broadcast error
    import pytest

    from clickhouse_github_log_importer_spark.operators.bitmaps import (
        _BUCKET_SIZE,
        merge_bitmaps,
    )

    good = bytes(_BUCKET_SIZE // 8)
    bad = bytes(_BUCKET_SIZE // 8 - 1)
    df = spark.createDataFrame(
        [("0", 0, good, 0), ("1", 0, bad, 0)],
        "key string, bucket long, bitmap binary, n long",
    )
    merged = merge_bitmaps(df, F.lit("d"))
    with pytest.raises(Exception) as exc:
        merged.collect()
    assert "merge_bitmaps" in str(exc.value)
    assert "expected" in str(exc.value)
