"""Streaming count-min sketch: bounded state, stream == batch == the
registry's oracle-checked grid (operators.cms.cms_cells)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators.cms import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_cells,
)
from clickhouse_github_log_importer_spark.plans.queries import t
from clickhouse_github_log_importer_spark.streaming import cms_stream as CS

SF = "/root/testdata/sf0.001"


def _final_grid(rows):
    """Last update per (row, pos) — the memory sink keeps every batch."""
    out = {}
    for r in rows:
        out[(r["row"], r["pos"])] = r["cell_count"]
    return out


def test_stream_matches_batch_and_registry_grid(spark, tmp_path):
    src = str(tmp_path / "cms_src")
    ev = t(spark, SF, "events").select("user_id")
    # multiple files -> multiple micro-batches under maxFilesPerTrigger,
    # so the counter state actually accumulates across batches
    ev.repartition(4).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("user_id long").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        CS.cms_grid_stream(stream, "user_id")
        .writeStream.format("memory")
        .queryName("cms_smoke")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("cms_smoke").collect()
    assert len(rows) > CMS_DEPTH  # several batches emitted refreshed rows
    streamed = _final_grid(rows)

    batch = _final_grid(
        CS.cms_grid_stream(spark.read.parquet(src), "user_id").collect()
    )
    assert streamed == batch

    # ...and both equal the batch grid feeding the oracle-checked audit
    reg = _final_grid(cms_cells(ev, "user_id").collect())
    assert streamed == reg


def test_state_is_bounded_at_grid_size(spark):
    # 20k distinct keys stream into exactly depth rows of <= width cells;
    # every cell_count sums to the event count per row
    df = spark.range(0, 20_000).select(F.col("id").alias("uid"))
    rows = CS.cms_grid_stream(df, "uid").collect()
    by_row = {}
    for r in rows:
        by_row.setdefault(r["row"], []).append(r["cell_count"])
    assert set(by_row) == set(range(CMS_DEPTH))
    for cells in by_row.values():
        assert len(cells) <= CMS_WIDTH
        assert sum(cells) == 20_000
