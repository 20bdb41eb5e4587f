"""S7/S8 payload-builder tests: exact Cypher statements / plugin params
at the reference's batch sizes (5000 Neo4j, 500 TuGraph)."""

from __future__ import annotations

import glob
import json
import os
import uuid
from datetime import datetime

import pytest

from clickhouse_github_log_importer_spark.operators.graph_payloads import (
    neo4j_edge_payload,
    neo4j_edge_statement,
    neo4j_node_payload,
    neo4j_node_statement,
    tugraph_edge_request,
    tugraph_node_payload,
    tugraph_node_request,
    tugraph_plugin_body,
    write_edges_neo4j,
    write_nodes_tugraph,
)

NODES_DDL = (
    "node_type string, node_key string, props map<string,string>, "
    "updated_at timestamp"
)
EDGES_DDL = (
    "edge_type string, from_key string, to_key string, edge_id long, "
    "props map<string,string>, created_at timestamp"
)


def test_neo4j_node_statement_exact():
    # log_neo4j_importer.ts:365-369, with the label-merge of ts:14-17
    assert neo4j_node_statement("github_repo") == (
        "\nUNWIND $nodes AS node\n"
        "MERGE (n:github_repo{id:node.id})\n"
        "SET n += node.properties\n"
    )
    assert neo4j_node_statement("license") == (
        "\nUNWIND $nodes AS node\n"
        "MERGE (n:license{spdx_id:node.spdx_id})\n"
        "SET n += node.properties\n"
    )
    assert "github_issue_change_request" in neo4j_node_statement("github_issue")


def test_neo4j_edge_statement_exact():
    # structural edge: idempotent MERGE, no id in the pattern
    assert neo4j_edge_statement("has_repo") == (
        "\nUNWIND $edges AS edge\n"
        "MATCH (from:github_org{id:edge.from}), (to:github_repo{id:edge.to})\n"
        "MERGE (from)-[e:has_repo]->(to)\n"
        "SET e += edge.data\n"
    )
    # action edge: event id rides the MERGE pattern (ts:393)
    s = neo4j_edge_statement("comment")
    assert "MERGE (from)-[e:action{id:edge.id}]->(to)" in s
    assert "MATCH (from:github_actor{id:edge.from})" in s
    assert "(to:github_issue_change_request{id:edge.to})" in s


def test_neo4j_payload_shapes():
    n = neo4j_node_payload(
        {"node_type": "github_actor", "node_key": "42", "props": {"login": "u"}}
    )
    assert n == {"id": 42, "properties": {"login": "u"}}
    # composite issue keys stay strings; absent ids are omitted
    e = neo4j_edge_payload(
        {"from_key": "42", "to_key": "7_3", "edge_id": -1, "props": {}}
    )
    assert e == {"from": 42, "to": "7_3", "data": {}}
    e2 = neo4j_edge_payload(
        {"from_key": "42", "to_key": "7_3", "edge_id": 99, "props": {"a": "b"}}
    )
    assert e2["id"] == 99


def test_tugraph_request_shapes():
    n = tugraph_node_payload(
        {
            "node_type": "github_repo",
            "node_key": "7",
            "props": {"name": "o/r"},
            "updated_at": datetime(2022, 1, 1),
        }
    )
    assert n == {
        "id": 7,
        "data": {"name": "o/r", "__updated_at": "2022-01-01 00:00:00"},
    }
    # license nodes carry no __updated_at (ts:358-360)
    lic = tugraph_node_payload(
        {"node_type": "license", "node_key": "MIT", "props": {}, "updated_at": None}
    )
    assert lic == {"spdx_id": "MIT", "data": {}}
    req = tugraph_node_request("issue_label", [{"name": "bug", "data": {}}])
    assert req == {
        "type": "issue_label",
        "primary": "name",
        "nodes": [{"name": "bug", "data": {}}],
    }
    ereq = tugraph_edge_request("open", [])
    assert ereq == {
        "fromKey": "id",
        "fromLabel": "github_actor",
        "toKey": "id",
        "toLabel": "github_issue|github_change_request",
        "label": "open",
        "edges": [],
    }
    body = tugraph_plugin_body({"type": "x"})
    assert body == {"data": json.dumps({"type": "x"}), "timeout": 0}


def _collect_calls(out_dir):
    calls = []
    for p in sorted(glob.glob(os.path.join(out_dir, "*"))):
        with open(p) as f:
            calls.append(json.load(f))
    return calls


def test_write_edges_neo4j_batches(spark, tmp_path):
    # 120 'open' edges at batch_size=50 -> 3 statements of <=50 params
    rows = [
        ("open", str(i), f"7_{i}", 1000 + i, {"t": "x"}, datetime(2022, 1, 1))
        for i in range(120)
    ]
    edges = spark.createDataFrame(rows, EDGES_DDL).coalesce(1)
    out = str(tmp_path)

    def run_cypher(stmt, params):
        with open(os.path.join(out, uuid.uuid4().hex), "w") as f:
            json.dump({"stmt": stmt, "n": len(params), "params": params}, f)

    write_edges_neo4j(edges, run_cypher, batch_size=50)
    calls = _collect_calls(out)
    assert sorted(c["n"] for c in calls) == [20, 50, 50]
    for c in calls:
        assert "MERGE (from)-[e:action{id:edge.id}]->(to)" in c["stmt"]
        for p in c["params"]:
            assert set(p) == {"from", "to", "data", "id"} and p["id"] >= 1000


def test_write_nodes_tugraph_chunks(spark, tmp_path):
    rows = [
        ("github_actor", str(i), {"login": f"u{i}"}, datetime(2022, 1, 1))
        for i in range(1100)
    ]
    nodes = spark.createDataFrame(rows, NODES_DDL).coalesce(1)
    out = str(tmp_path)

    def call_plugin(name, params):
        with open(os.path.join(out, uuid.uuid4().hex), "w") as f:
            json.dump({"plugin": name, "params": params}, f)

    write_nodes_tugraph(nodes, call_plugin)  # default 500/chunk
    calls = _collect_calls(out)
    assert [c["plugin"] for c in calls] == ["update_nodes"] * 3
    assert sorted(len(c["params"]["nodes"]) for c in calls) == [100, 500, 500]
    ids = sorted(n["id"] for c in calls for n in c["params"]["nodes"])
    assert ids == list(range(1100))
    assert all(
        n["data"]["__updated_at"] == "2022-01-01 00:00:00"
        for c in calls
        for n in c["params"]["nodes"]
    )
