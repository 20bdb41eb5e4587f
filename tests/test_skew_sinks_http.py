"""Skew operators, batched sinks, HTTP facade."""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

import pytest
from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators.skew import (
    replicated_salted_join,
    salted_aggregate,
)
from clickhouse_github_log_importer_spark.sources.sinks import (
    foreach_partition_batched,
    write_events_table,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one key holds ~90% of rows
    rows = [(0, i * 1.0) for i in range(900)] + [(k, 1.0) for k in range(1, 101)]
    return spark.createDataFrame(rows, "k long, v double").repartition(8)


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = {
        r["k"]: (r["n"], r["s"])
        for r in skewed.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"])
        for r in salted_aggregate(
            skewed, ["k"], {"n": ("count", "v"), "s": ("sum", "v")}, salt=4
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_rejects_non_mergeable(skewed):
    with pytest.raises(ValueError):
        salted_aggregate(skewed, ["k"], {"a": ("avg", "v")})


def test_replicated_salted_join_matches_plain(spark, skewed):
    build = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 101)], "k long, name string"
    )
    plain = sorted(
        (r["k"], r["v"], r["name"])
        for r in skewed.join(build, ["k"]).collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["name"])
        for r in replicated_salted_join(skewed, build, ["k"], salt=4).collect()
    )
    assert salted == plain


def test_foreach_partition_batched(spark, tmp_path):
    df = spark.createDataFrame([(i,) for i in range(250)], "x long").repartition(2)
    out = str(tmp_path)

    def send(batch):
        import os
        import uuid

        assert len(batch) <= 100
        with open(os.path.join(out, uuid.uuid4().hex), "w") as f:
            json.dump(batch, f)

    foreach_partition_batched(df, send, batch_size=100)
    import glob

    seen = []
    for p in glob.glob(out + "/*"):
        with open(p) as f:
            seen.extend(r["x"] for r in json.load(f))
    assert sorted(seen) == list(range(250))


def test_write_events_table_clusters(spark, tmp_path):
    from tests.fixtures import events, write_gz

    from clickhouse_github_log_importer_spark.operators.parsers import (
        project_events,
        read_raw,
    )

    src = str(tmp_path / "x.json.gz")
    write_gz(src, events(), corrupt_lines=0)
    table = str(tmp_path / "tbl")
    write_events_table(project_events(read_raw(spark, src)), table)
    assert spark.read.parquet(table).count() == 12


@pytest.fixture(scope="module")
def server(spark, sf_smoke, tmp_path_factory):
    import json as _json

    from clickhouse_github_log_importer_spark.api_server import serve

    status = tmp_path_factory.mktemp("status") / "status.json"
    status.write_text(_json.dumps({"total": 3, "imported": 3}))
    srv = serve(
        spark,
        status_path=str(status),
        table_paths={"events": f"{sf_smoke}/events.parquet"},
    )
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return json.loads(r.read())


def test_http_db_schema(server):
    schema = _get(server + "/query/db_schema")
    assert schema[0]["key"] == "id" and len(schema) > 90


def test_http_status(server):
    assert _get(server + "/status")["total"] == 3


def test_http_sample_endpoints(server):
    rc = _get(server + "/query/record_count")
    assert rc["data"][0][0] == 1000 and "query" in rc
    label = _get(server + "/query/most_used_label?topN=5")
    assert label["rows"] == 5
    act = _get(server + "/query/repo_activity?topN=7")
    assert act["rows"] == 7
    assert act["meta"][1]["name"] == "activity"


def test_http_post_query(server):
    body = urllib.parse.urlencode(
        {"query": "SELECT event_type, COUNT(*) AS c FROM events GROUP BY 1"}
    ).encode()
    req = urllib.request.Request(
        server + "/query",
        data=body,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        resp = json.loads(r.read())
    assert resp["rows"] == 5
    assert {"meta", "data", "rows", "statistics"} <= set(resp)


def test_http_bad_query_and_404(server):
    body = urllib.parse.urlencode({"query": "SELEKT nope"}).encode()
    req = urllib.request.Request(server + "/query", data=body)
    try:
        urllib.request.urlopen(req, timeout=60)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
    try:
        urllib.request.urlopen(server + "/query/unknown_endpoint", timeout=60)
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_cli_schema_and_status(tmp_path):
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "clickhouse_github_log_importer_spark", "schema"],
        capture_output=True, text=True, timeout=120,
    )
    schema = json.loads(out.stdout)
    assert schema[0]["key"] == "id" and out.returncode == 0

    meta = tmp_path / "meta.json"
    meta.write_text('{"a.json.gz": 3, "b.json.gz": 0}')
    out = subprocess.run(
        [sys.executable, "-m", "clickhouse_github_log_importer_spark",
         "status", "--meta", str(meta)],
        capture_output=True, text=True, timeout=120,
    )
    status = json.loads(out.stdout)
    assert status["total"] == 2 and status["imported"] == 1
