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
