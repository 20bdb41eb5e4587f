"""Streaming quantile state: domain-bounded state, stream == batch ==
the batch -State/-Merge primitives' quantileExactLow picks."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators.quantile_state import (
    histogram_state,
    quantiles_from_state,
)
from clickhouse_github_log_importer_spark.plans.queries import t
from clickhouse_github_log_importer_spark.streaming import (
    quantile_stream as QS,
)

SF = "/root/testdata/sf0.001"


def _final_per_key(rows):
    out = {}
    for r in rows:
        out[r["key"]] = (r["n_events"], r["p25"], r["p50"], r["p75"])
    return out


def test_stream_matches_batch_and_state_primitives(spark, tmp_path):
    src = str(tmp_path / "q_src")
    ev = t(spark, SF, "events").select("event_type", "value")
    # multiple files -> multiple micro-batches, so histograms genuinely
    # merge across batches in the state store
    ev.repartition(4).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("event_type string, value double").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        QS.quantile_state_stream(stream, "event_type", "value")
        .writeStream.format("memory")
        .queryName("q_smoke")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("q_smoke").collect()
    assert len(rows) > 5
    streamed = _final_per_key(rows)

    batch = _final_per_key(
        QS.quantile_state_stream(
            spark.read.parquet(src), "event_type", "value"
        ).collect()
    )
    assert streamed == batch

    # ...and both equal the batch histogram-state primitives' picks
    hist = histogram_state(
        t(spark, SF, "events").select(
            F.col("event_type").alias("key"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        ),
        ["key"],
        "cents",
    )
    direct = {
        r["key"]: (r["n_events"], r["p25"], r["p50"], r["p75"])
        for r in quantiles_from_state(hist, ["key"], "cents").collect()
    }
    assert streamed == direct


def test_state_bounded_by_value_domain(spark):
    # 100k rows over 7 distinct values: the fold's histogram carries 7
    # entries, and the picks follow the quantileExactLow rule exactly
    df = spark.range(0, 100_000).select(
        F.lit("x").alias("k"), ((F.col("id") % 7) / 100.0).alias("val")
    )
    [r] = QS.quantile_state_stream(df, "k", "val").collect()
    assert r["n_events"] == 100_000
    # near-uniform over cents 0..6 (residues 0-4 get 14286, 5-6 get
    # 14285): cumulative crossings of idx+1 = 25000/50000/75000 land on
    # cents 1/3/5
    assert (r["p25"], r["p50"], r["p75"]) == (1, 3, 5)
    vals, cnts = QS._merge_hist([], [], [
        __import__("pandas").DataFrame({"v": [0, 0, 1, 2, 2, 2]})
    ])
    assert vals == [0, 1, 2] and cnts == [2, 1, 3]
