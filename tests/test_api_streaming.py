"""Query facade (envelope parity) and Structured Streaming ingest tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark import api
from clickhouse_github_log_importer_spark.schema import EVENTS_SCHEMA

from .fixtures import events, write_gz


def test_db_schema_shape():
    schema = api.db_schema()
    keys = [e["key"] for e in schema]
    assert len(keys) == len(EVENTS_SCHEMA.fields)
    assert keys[:3] == ["id", "platform", "type"]
    assert all({"key", "type", "spark_type"} <= set(e) for e in schema)


def test_query_envelope(spark, sf_smoke):
    api.register_views(spark, {"events_t": f"{sf_smoke}/events.parquet"})
    resp = api.query(spark, "SELECT COUNT(*) AS count FROM events_t")
    assert resp["rows"] == 1
    assert resp["meta"][0]["name"] == "count"
    assert resp["data"][0][0] == 1000
    assert set(resp["statistics"]) == {"elapsed", "rows_read", "bytes_read"}
    assert resp["statistics"]["elapsed"] > 0


def test_status_roundtrip(tmp_path):
    import json

    p = str(tmp_path / "status.json")
    with open(p, "w") as f:
        json.dump({"total": 5, "imported": 5}, f)
    assert api.status(p)["total"] == 5


def test_streaming_ingest_available_now(spark, tmp_path):
    from clickhouse_github_log_importer_spark.streaming.pipeline import (
        streaming_ingest,
    )

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    write_gz(os.path.join(in_dir, "2015-01-01-15.json.gz"), events(), corrupt_lines=0)
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    q = streaming_ingest(spark, in_dir, table, ckpt)
    q.awaitTermination(120)
    df = spark.read.parquet(table)
    assert df.count() == 12  # same as batch ingest (drops applied)
    assert df.filter(F.col("created_month") == 201502).count() == 1

    # restart with no new files: checkpoint prevents re-ingest (exactly-once)
    q2 = streaming_ingest(spark, in_dir, table, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(table).count() == 12


def test_query_named_params(spark, sf_smoke):
    api.register_views(spark, {"events_np": f"{sf_smoke}/events.parquet"})
    resp = api.query(
        spark,
        "SELECT COUNT(*) AS c FROM events_np WHERE event_type = :etype",
        args={"etype": "click"},
    )
    plain = api.query(
        spark, "SELECT COUNT(*) AS c FROM events_np WHERE event_type = 'click'"
    )
    assert resp["data"] == plain["data"] and resp["data"][0][0] > 0


def test_op_endpoint_serves_whole_registry(spark, sf_smoke):
    # the GET /op/<name> surface: any registered operator by name, with
    # the ClickhouseSelectResponse envelope — a reference user's whole
    # query surface over HTTP
    import json as _json
    import urllib.request

    from clickhouse_github_log_importer_spark.api_server import serve

    server = serve(spark)
    try:
        host, port = server.server_address
        base = f"http://{host}:{port}"
        ops = _json.load(urllib.request.urlopen(f"{base}/ops"))["ops"]
        assert len(ops) >= 138
        names = {o["name"] for o in ops}
        assert {"record_count", "lttb_downsample_hourly"} <= names

        resp = _json.load(
            urllib.request.urlopen(
                f"{base}/op/events_per_type?sf_dir={sf_smoke}"
            )
        )
        assert resp["op"] == "events_per_type"
        assert resp["rows"] == 5
        assert "event_type" in {m["name"] for m in resp["meta"]}

        limited = _json.load(
            urllib.request.urlopen(
                f"{base}/op/events_per_type?sf_dir={sf_smoke}&limit=2"
            )
        )
        assert limited["rows"] == 2

        try:
            urllib.request.urlopen(f"{base}/op/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
            assert _json.load(e)["error"].startswith("unknown op")
    finally:
        server.shutdown()
