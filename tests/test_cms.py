"""Count-min sketch: one-sided error, mergeability, audit sensitivity."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators import cms
from clickhouse_github_log_importer_spark.plans.queries import t

SF = "/root/testdata/sf0.001"


def test_cms_estimate_never_underestimates(spark):
    ev = t(spark, SF, "events")
    n_keys = ev.select("user_id").distinct().count()
    rep = cms.heavy_hitter_audit(ev, "user_id", top=25).collect()
    assert len(rep) == min(25, n_keys)
    for r in rep:
        assert r["cms_estimate"] >= r["exact_count"]
        assert r["overestimate"] == r["cms_estimate"] - r["exact_count"]


def test_cms_cells_merge_cellwise(spark):
    # sketch(union) == cellwise sum of sketches (the mergeability that
    # makes CMS a distributed/streaming rollup state)
    ev = t(spark, SF, "events")
    a = ev.filter(F.col("user_id") % 2 == 0)
    b = ev.filter(F.col("user_id") % 2 == 1)
    whole = {
        (r["row"], r["pos"]): r["cell_count"]
        for r in cms.cms_cells(ev, "user_id").collect()
    }
    merged: dict = {}
    for part in (a, b):
        for r in cms.cms_cells(part, "user_id").collect():
            k = (r["row"], r["pos"])
            merged[k] = merged.get(k, 0) + r["cell_count"]
    assert whole == merged


def test_cms_narrow_width_shows_collisions(spark):
    # with width 8 the grid MUST collide (far more keys than cells):
    # the audit's overestimate column actually measures something
    ev = t(spark, SF, "events")
    rep = cms.heavy_hitter_audit(ev, "user_id", top=10, width=8).collect()
    assert any(r["overestimate"] > 0 for r in rep)
    for r in rep:  # one-sided even under heavy collision
        assert r["cms_estimate"] >= r["exact_count"]


def test_cms_streamable_form_equals_batch_form(spark):
    ev = t(spark, SF, "events")
    a = sorted(tuple(r) for r in cms.cms_cells(ev, "user_id").collect())
    b = sorted(tuple(r) for r in cms.cms_cells_streamable(ev, "user_id").collect())
    assert a == b


def test_cms_streaming_matches_batch(spark, tmp_path):
    # the same operator on readStream (availableNow) must yield the
    # identical grid — the sketch IS the bounded streaming state
    src = str(tmp_path / "cms_src")
    ev = t(spark, SF, "events").select("user_id", "event_type", "ts", "value")
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp, value double"
    ).parquet(src)
    out = cms.cms_cells_streamable(stream, "user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("cms_smoke")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(tuple(r) for r in spark.table("cms_smoke").collect())
    batch = sorted(
        tuple(r) for r in cms.cms_cells_streamable(spark.read.parquet(src), "user_id").collect()
    )
    assert streamed == batch


def test_cms_rollup_merge_equals_direct(spark):
    # the -Merge contract: the day grid summed from HOURLY grids must
    # equal the grid built directly from the day's rows — CMS merge is
    # linear (cell-wise add), so equality is exact, not approximate
    from pyspark.sql import functions as F

    ev = t(spark, SF, "events").select(
        F.expr("ts_us div 86400000000").alias("day_id"),
        F.expr("ts_us div 3600000000").alias("hour_id"),
        "user_id",
    )
    per_kh = ev.groupBy("day_id", "hour_id", "user_id").agg(
        F.count("*").alias("c")
    )
    cells = F.posexplode(
        F.array(*[cms.cms_pos("user_id", j) for j in range(cms.CMS_DEPTH)])
    ).alias("row", "pos")
    hourly = (
        per_kh.select("day_id", "hour_id", "c", cells)
        .groupBy("day_id", "hour_id", "row", "pos")
        .agg(F.sum("c").alias("cell_count"))
    )
    merged = sorted(
        tuple(r)
        for r in hourly.groupBy("day_id", "row", "pos")
        .agg(F.sum("cell_count").cast("long").alias("cell_count"))
        .collect()
    )
    per_kd = ev.groupBy("day_id", "user_id").agg(F.count("*").alias("c"))
    direct = sorted(
        tuple(r)
        for r in per_kd.select("day_id", "c", cells)
        .groupBy("day_id", "row", "pos")
        .agg(F.sum("c").cast("long").alias("cell_count"))
        .collect()
    )
    assert merged == direct


def test_cms_rollup_overestimate_one_sided(spark):
    from clickhouse_github_log_importer_spark.plans.queries import REGISTRY

    rows = REGISTRY["cms_state_rollup"].spark(spark, SF).collect()
    assert rows and all(r["overestimate"] >= 0 for r in rows)
    assert all(r["cms_estimate"] >= r["exact_count"] for r in rows)
