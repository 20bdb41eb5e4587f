"""Graph projection (S7/S8 model) tests over the NDJSON fixture set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators.graph import (
    degrees,
    merge_edges,
    merge_nodes,
    project_edges,
    project_nodes,
)
from clickhouse_github_log_importer_spark.operators.parsers import read_raw

from .fixtures import events, write_gz


@pytest.fixture(scope="module")
def graph(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("graph") / "2015-01-01-15.json.gz")
    write_gz(path, events(), corrupt_lines=0)
    raw = read_raw(spark, path)
    nodes = merge_nodes(project_nodes(raw))
    edges = merge_edges(project_edges(raw))
    return nodes, edges


def test_node_types_present(graph):
    nodes, _ = graph
    by_type = {
        r["node_type"]: r["n"]
        for r in nodes.groupBy("node_type").agg(F.count("*").alias("n")).collect()
    }
    assert by_type["github_repo"] == 1
    assert by_type["github_org"] == 1
    # alice, bob, carol (assignee), dave? (merged_by not a node), rev1/rev2, eve
    assert by_type["github_actor"] >= 5
    assert by_type["github_issue"] == 1  # issue #5
    assert by_type["github_change_request"] == 1  # pull #9
    assert by_type["issue_label"] == 1  # 'bug' (the null-name label is filtered)


def test_node_lww_merge(graph):
    nodes, _ = graph
    repo = nodes.filter(
        (F.col("node_type") == "github_repo") & (F.col("node_key") == "2001")
    ).first()
    assert repo["props"]["name"] == "org1/repo1"


def test_issue_vs_change_request_keys(graph):
    nodes, _ = graph
    issue = nodes.filter(F.col("node_type") == "github_issue").first()
    cr = nodes.filter(F.col("node_type") == "github_change_request").first()
    assert issue["node_key"] == "2001_5"
    assert cr["node_key"] == "2001_9"
    assert cr["props"]["commits"] == "2"  # stats merged in


def test_edges(graph):
    _, edges = graph
    et = {
        r["edge_type"]: r["n"]
        for r in edges.groupBy("edge_type").agg(F.count("*").alias("n")).collect()
    }
    assert et["has_repo"] == 1  # org -> repo (WatchEvent with org)
    assert et["has_issue_change_request"] == 2  # repo -> issue, repo -> pull
    assert et["open"] == 1  # IssuesEvent opened
    assert et["comment"] == 1  # IssueCommentEvent
    assert et["close"] >= 1  # PullRequestEvent closed (merged flag)
    assert et["has_assignee"] >= 1
    assert et["has_requested_reviewer"] == 2  # rev1 AND rev2 (all, not first)
    assert et["review"] == 1
    assert et["review_comment"] == 1


def test_close_merged_flag(graph):
    _, edges = graph
    # event 104 is the PullRequestEvent close (merged flag); event 101 is
    # the IssuesEvent-with-pull-fallback close (plain, reference parity)
    close = edges.filter(
        (F.col("edge_type") == "close") & (F.col("edge_id") == 104)
    ).first()
    assert close["props"]["merged"] == "true"
    plain = edges.filter(
        (F.col("edge_type") == "close") & (F.col("edge_id") == 101)
    ).first()
    assert "merged" not in plain["props"]


def test_degrees(graph):
    _, edges = graph
    d = {r["node_key"]: r for r in degrees(edges).collect()}
    # the repo node (2001) has in-degree from org and out-degree to issues
    assert d["2001"]["in_degree"] >= 1 and d["2001"]["out_degree"] >= 2
