"""Streaming KMV distinct sketch: bounded state, stream == batch ==
the registry's oracle-checked estimate."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.plans.queries import REGISTRY, t
from clickhouse_github_log_importer_spark.streaming import kmv_stream as KS

SF = "/root/testdata/sf0.001"


def _final_per_key(rows):
    """Last update per key (the memory sink keeps every batch's rows)."""
    out = {}
    for r in rows:
        out[r["key"]] = (r["nk"], r["hk"], r["kmv_estimate"])
    return out


def test_stream_matches_batch_and_registry(spark, tmp_path):
    src = str(tmp_path / "kmv_src")
    ev = t(spark, SF, "events").select("event_type", "user_id")
    # multiple files -> multiple micro-batches under maxFilesPerTrigger,
    # so the state actually merges across batches
    ev.repartition(4).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("event_type string, user_id long").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        KS.kmv_distinct_stream(stream, "event_type", "user_id")
        .writeStream.format("memory")
        .queryName("kmv_smoke")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("kmv_smoke").collect()
    assert len(rows) > 5  # several batches touched several keys
    streamed = _final_per_key(rows)

    batch = _final_per_key(
        KS.kmv_distinct_stream(
            spark.read.parquet(src), "event_type", "user_id"
        ).collect()
    )
    assert streamed == batch

    # ...and both equal the oracle-checked registry sketch's estimate
    reg = {
        r["event_type"]: r["kmv_estimate"]
        for r in REGISTRY["uniq_kmv_sketch"].spark(spark, SF).collect()
    }
    assert {k: v[2] for k, v in streamed.items()} == reg


def test_state_is_bounded_at_k(spark):
    # a key with far more than k distinct ids must carry exactly k longs
    # of state and report hk = the k-th smallest hash
    df = spark.range(0, 5000).select(
        F.lit("x").alias("k"), F.col("id").alias("uid")
    )
    [r] = KS.kmv_distinct_stream(df, "k", "uid").collect()
    assert r["nk"] == KS.KMV_STREAM_K
    assert r["hk"] > 0
    # estimate within the 4/sqrt(k-2) contract of the true 5000
    assert abs(r["kmv_estimate"] - 5000) <= 4 / (KS.KMV_STREAM_K - 2) ** 0.5 * 5000
