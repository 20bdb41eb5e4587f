from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators.temporal import (
    ASOF_TIME,
    asof_join,
    range_join_bucketed,
)


@pytest.fixture()
def quotes(spark):
    # (key, t, quote_id, px)
    rows = [
        ("a", 10, 1, 1.0),
        ("a", 20, 2, 2.0),
        ("a", 20, 3, 3.0),  # duplicate timestamp: tiebreak must pin id 3
        ("a", 40, 4, 4.0),
        ("b", 15, 5, 5.0),
    ]
    return spark.createDataFrame(rows, "k string, qt long, quote_id long, px double")


@pytest.fixture()
def trades(spark):
    rows = [
        ("a", 5, 100),   # before any quote -> null
        ("a", 20, 101),  # equal-time: inclusive sees quote 3, strict sees 1
        ("a", 39, 102),  # -> quote 3 (latest at/before 39)
        ("a", 99, 103),  # -> quote 4
        ("b", 14, 104),  # before b's only quote -> null
        ("c", 50, 105),  # key with no quotes at all -> null
    ]
    return spark.createDataFrame(rows, "k string, tt long, trade_id long")


def _by_trade(df):
    return {
        r["trade_id"]: (r["quote_id"], r[ASOF_TIME])
        for r in df.collect()
    }


def test_asof_inclusive_with_tiebreak(trades, quotes):
    out = asof_join(
        trades, quotes, ["k"], "tt", "qt", ["quote_id", "px"], tiebreak="quote_id"
    )
    got = _by_trade(out)
    assert got[100] == (None, None)
    assert got[101] == (3, 20)  # inclusive + max-id tiebreak at the dup ts
    assert got[102] == (3, 20)
    assert got[103] == (4, 40)
    assert got[104] == (None, None)
    assert got[105] == (None, None)
    assert out.count() == 6  # left join keeps every probe row


def test_asof_strict_excludes_equal_time(trades, quotes):
    out = asof_join(
        trades,
        quotes,
        ["k"],
        "tt",
        "qt",
        ["quote_id"],
        tiebreak="quote_id",
        allow_exact_matches=False,
    )
    got = _by_trade(out)
    assert got[101] == (1, 10)  # the 20s quotes are no longer visible
    assert got[102] == (3, 20)  # strictly-earlier rows unaffected


def test_asof_inner_drops_unmatched(trades, quotes):
    out = asof_join(
        trades, quotes, ["k"], "tt", "qt", ["quote_id"], tiebreak="quote_id",
        how="inner",
    )
    assert sorted(r["trade_id"] for r in out.collect()) == [101, 102, 103]


def test_asof_payload_collision_raises(trades, quotes):
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades, quotes.withColumnRenamed("quote_id", "trade_id"),
                  ["k"], "tt", "qt", ["trade_id"])


def test_asof_plan_is_single_shuffle(trades, quotes):
    out = asof_join(trades, quotes, ["k"], "tt", "qt", ["quote_id"])
    plan = out._jdf.queryExecution().simpleString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan  # the union+window form never joins


def _naive_band(probe, reference, lower, upper):
    d = F.col("rt") - F.col("pt")
    return (
        probe.crossJoin(reference)
        .filter((d >= F.lit(lower)) & (d <= F.lit(upper)))
        .select("pid", "rid")
    )


@pytest.mark.parametrize("lower,upper", [(-25, 25), (0, 60), (-3, -1)])
def test_range_join_matches_naive(spark, lower, upper):
    # timestamps straddling 0 so floor-division (not trunc) is exercised
    probe = spark.createDataFrame(
        [(i, t) for i, t in enumerate([-70, -25, -1, 0, 13, 59, 120])],
        "pid long, pt long",
    )
    reference = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate([-71, -50, -26, -24, 0, 1, 25, 26, 61, 119])],
        "rid long, rt long",
    )
    got = range_join_bucketed(
        probe, reference, "pt", "rt", lower, upper, ["rid"]
    ).select("pid", "rid")
    want = _naive_band(probe, reference, lower, upper)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_range_join_no_duplicate_pairs(spark):
    # narrow buckets force multi-cell fan-out; pairs must still be unique
    probe = spark.createDataFrame([(1, 0), (2, 50)], "pid long, pt long")
    reference = spark.createDataFrame(
        [(10 + t, t) for t in range(0, 100, 7)], "rid long, rt long"
    )
    out = range_join_bucketed(
        probe, reference, "pt", "rt", -100, 100, ["rid"], bucket_width=9
    )
    # every reference row is in band for both probes, and each pair
    # appears exactly once despite the probe fanning out to ~23 cells
    assert out.count() == 2 * reference.count()
    assert out.count() == out.dropDuplicates(["pid", "rid"]).count()


def test_range_join_is_equi_join(spark):
    probe = spark.createDataFrame([(1, 0)], "pid long, pt long")
    reference = spark.createDataFrame([(10, 5)], "rid long, rt long")
    out = range_join_bucketed(probe, reference, "pt", "rt", -10, 10, ["rid"])
    plan = out._jdf.queryExecution().simpleString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_trailing_range_sum_matches_sliding_frame(spark):
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from clickhouse_github_log_importer_spark.operators.temporal import (
        trailing_range_sum,
    )

    rng = random.Random(7)
    # duplicate timestamps included: RANGE frames sum ALL peers at the
    # boundary, which the prefix-sum difference must reproduce exactly
    rows = [
        (i, i % 5, rng.choice([10, 20, 20, 30, 40]) * (i % 7), (i * 31) % 9 + 1)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, k long, ts long, v long")
    win = 25
    got = {
        r["id"]: r["_trailing"]
        for r in trailing_range_sum(df, "k", "ts", "v", win).collect()
    }
    w = Window.partitionBy("k").orderBy("ts").rangeBetween(-win, Window.currentRow)
    want = {
        r["id"]: r["s"]
        for r in df.select("id", F.sum("v").over(w).alias("s")).collect()
    }
    assert got == want


def test_trailing_range_sum_empty_window_is_self(spark):
    from clickhouse_github_log_importer_spark.operators.temporal import (
        trailing_range_sum,
    )

    df = spark.createDataFrame(
        [(1, 1, 0, 5), (2, 1, 1000, 7)], "id long, k long, ts long, v long"
    )
    out = {
        r["id"]: r["_trailing"]
        for r in trailing_range_sum(df, "k", "ts", "v", 10).collect()
    }
    # windows too narrow to reach the other row: each row sums only itself
    assert out == {1: 5, 2: 7}


def test_band_count_keyless_exact_and_matches_pair_form(spark):
    from pyspark.sql import functions as F

    from clickhouse_github_log_importer_spark.operators.temporal import (
        band_count_keyless,
        range_join_bucketed,
    )

    rows = [(1, 0), (2, 50), (3, 100), (4, 100), (5, 1000)]
    df = spark.createDataFrame(rows, "id long, ts long")
    out = {
        r["id"]: r["n_in_band"]
        for r in band_count_keyless(df, "ts", "id", -60, 60).collect()
    }
    # band [t-60, t+60], self excluded, duplicate timestamps counted
    assert out == {1: 1, 2: 3, 3: 2, 4: 2, 5: 0}
    # agreement with the pair-enumerating bucketed range join
    pairs = range_join_bucketed(
        df,
        df.select(F.col("id").alias("oid"), F.col("ts").alias("ots")),
        probe_time="ts",
        ref_time="ots",
        lower=-60,
        upper=60,
        payload=["oid"],
    )
    via_pairs = {
        r["id"]: r["n"]
        for r in pairs.filter(F.col("oid") != F.col("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for i, n in out.items():
        assert via_pairs.get(i, 0) == n


def test_asof_tolerance_bounds_lookback(trades, quotes):
    # tolerance=5: only matches with tt - qt <= 5 survive; older ones
    # null out exactly like pandas merge_asof(tolerance=...)
    out = asof_join(
        trades,
        quotes,
        on=["k"],
        probe_time="tt",
        ref_time="qt",
        payload=["quote_id", "px"],
        tiebreak="quote_id",
        tolerance=5,
    )
    got = _by_trade(out)
    assert got[101] == (3, 20)   # equal time, within tolerance
    assert got[102] == (None, None)  # quote at 20, lag 19 > 5 -> nulled
    assert got[103] == (None, None)  # quote at 40, lag 59 > 5
    assert got[100] == (None, None)  # no earlier quote at all
    # inner mode drops the out-of-tolerance rows entirely
    inner = asof_join(
        trades,
        quotes,
        on=["k"],
        probe_time="tt",
        ref_time="qt",
        payload=["quote_id", "px"],
        tiebreak="quote_id",
        how="inner",
        tolerance=5,
    )
    assert sorted(r["trade_id"] for r in inner.collect()) == [101]
