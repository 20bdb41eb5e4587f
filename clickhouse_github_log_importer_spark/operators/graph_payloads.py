"""Concrete graph-sink payload builders (S7/S8).

The graph model (:mod:`.graph`) reduces the event stream to two frames —
nodes ``(node_type, node_key, props, updated_at)`` and edges
``(edge_type, from_key, to_key, edge_id, props, created_at)``. This
module turns those frames into the exact wire payloads the reference
emits, behind an injectable transport (the sandbox has no Neo4j/TuGraph
to talk to; a user supplies ``run_cypher`` / ``call_plugin`` bound to a
real driver):

- **Neo4j** (``app/service/log_neo4j_importer.ts:365-399``): per node
  label an ``UNWIND $nodes ... MERGE ... SET n += node.properties``
  statement with 5000-row parameter batches; per edge label an
  ``UNWIND $edges ... MATCH endpoints ... MERGE ... SET e += edge.data``
  statement — with ``{id: edge.id}`` in the MERGE pattern for the
  per-event ``action`` edges only, so repeated actions stay distinct
  while structural edges stay idempotent. The Neo4j importer merges
  ``github_issue``/``github_change_request`` into one
  ``github_issue_change_request`` label and all actor->issue action
  edge types into ``action`` (``log_neo4j_importer.ts:14-46``).
- **TuGraph** (``app/service/log_tugraph_importer.ts:346-402``,
  ``tugraph.ts:84-124``): ``update_nodes`` / ``update_edges`` cpp-plugin
  calls with 500-item chunks; the HTTP body wraps the params as
  ``{"data": JSON.stringify(params), "timeout": 0}``.

Batching runs executor-side in ONE pass over each frame: every partition
groups its rows by type locally and flushes typed batches through the
transport (see :func:`_dispatch_by_type`) — no per-type rescan, no
shuffle, and a 100 TB edge frame never collects to the driver.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

#: log_tugraph_importer.ts:16-20 / log_neo4j_importer.ts:18-22 — primary
#: key per node label, default 'id'.
NODE_PRIMARY_KEY = {
    "issue_label": "name",
    "language": "name",
    "license": "spdx_id",
}

#: log_tugraph_importer.ts:33-46 — endpoint labels per edge type. The
#: compound 'github_issue|github_change_request' endpoints mean "either
#: label"; TuGraph's plugin resolves them, Neo4j uses the merged label.
EDGE_TYPE_PAIR = {
    "has_license": ("github_repo", "license"),
    "has_language": ("github_repo", "language"),
    "has_repo": ("github_org", "github_repo"),
    "has_issue_change_request": ("github_repo", "github_issue|github_change_request"),
    "has_issue_label": ("github_issue|github_change_request", "issue_label"),
    "open": ("github_actor", "github_issue|github_change_request"),
    "comment": ("github_actor", "github_issue|github_change_request"),
    "close": ("github_actor", "github_issue|github_change_request"),
    "has_assignee": ("github_issue|github_change_request", "github_actor"),
    "has_requested_reviewer": ("github_change_request", "github_actor"),
    "review": ("github_actor", "github_change_request"),
    "review_comment": ("github_actor", "github_change_request"),
}

#: actor->issue per-event edges: the Neo4j importer folds them all into
#: one 'action' edge type whose MERGE carries the event id
#: (log_neo4j_importer.ts:20,34-46,393).
ACTION_EDGE_TYPES = ("open", "comment", "close", "review", "review_comment")

#: node labels whose TuGraph payload carries data.__updated_at
#: (log_tugraph_importer.ts:358-360).
_TUGRAPH_TS_TYPES = (
    "github_actor",
    "github_repo",
    "github_org",
    "github_issue",
    "github_change_request",
)


def node_primary(node_type: str) -> str:
    return NODE_PRIMARY_KEY.get(node_type, "id")


def _key_value(key: str | None) -> Any:
    """Numeric node keys travel as ints (Neo4j integer ids); composite
    keys like '123_45' and name/spdx keys stay strings."""
    if key is not None and key.isdigit():
        return int(key)
    return key


# ---------------------------------------------------------------- Neo4j


def neo4j_label(node_type: str) -> str:
    """log_neo4j_importer.ts:14-17: issue + change_request share a label."""
    if node_type in ("github_issue", "github_change_request"):
        return "github_issue_change_request"
    return node_type


def neo4j_edge_label(edge_type: str) -> str:
    return "action" if edge_type in ACTION_EDGE_TYPES else edge_type


def neo4j_node_statement(node_type: str) -> str:
    """The UNWIND-MERGE upsert, verbatim shape (log_neo4j_importer.ts:365-369)."""
    label = neo4j_label(node_type)
    primary = node_primary(node_type)
    return (
        "\nUNWIND $nodes AS node\n"
        f"MERGE (n:{label}{{{primary}:node.{primary}}})\n"
        "SET n += node.properties\n"
    )


def neo4j_edge_statement(edge_type: str) -> str:
    """The endpoint-MATCH + MERGE upsert (log_neo4j_importer.ts:389-394)."""
    from_label, to_label = (neo4j_label(s.split("|")[0]) for s in EDGE_TYPE_PAIR[edge_type])
    from_key, to_key = node_primary(from_label), node_primary(to_label)
    label = neo4j_edge_label(edge_type)
    id_pattern = "{id:edge.id}" if label == "action" else ""
    return (
        "\nUNWIND $edges AS edge\n"
        f"MATCH (from:{from_label}{{{from_key}:edge.from}}), "
        f"(to:{to_label}{{{to_key}:edge.to}})\n"
        f"MERGE (from)-[e:{label}{id_pattern}]->(to)\n"
        "SET e += edge.data\n"
    )


def neo4j_node_payload(row: dict[str, Any]) -> dict[str, Any]:
    """{primary: key, properties: {...}} (log_neo4j_importer.ts:357-362)."""
    primary = node_primary(row["node_type"])
    return {
        primary: _key_value(row["node_key"]),
        "properties": dict(row["props"] or {}),
    }


def neo4j_edge_payload(row: dict[str, Any]) -> dict[str, Any]:
    """{from, to, data, id?} — id only for real (>0) event ids
    (log_neo4j_importer.ts:380-389)."""
    out = {
        "from": _key_value(row["from_key"]),
        "to": _key_value(row["to_key"]),
        "data": dict(row["props"] or {}),
    }
    if row["edge_id"] is not None and row["edge_id"] > 0:
        out["id"] = row["edge_id"]
    return out


def _dispatch_by_type(
    df: DataFrame,
    type_col: str,
    emit: Callable[[str, list[dict[str, Any]]], None],
    batch_size: int,
) -> None:
    """ONE pass over the frame: rows group by type locally inside each
    partition and flush through ``emit(type, rows)`` at ``batch_size`` —
    no per-type rescan (the naive per-type filter loop reads the whole
    frame once per type: 12x the scan cost for edges), no shuffle."""

    def run(it) -> None:
        buckets: dict[str, list[dict[str, Any]]] = {}
        for row in it:
            d = row.asDict()
            b = buckets.setdefault(d[type_col], [])
            b.append(d)
            if len(b) >= batch_size:
                emit(d[type_col], b)
                buckets[d[type_col]] = []
        for ty, b in buckets.items():
            if b:
                emit(ty, b)

    df.foreachPartition(run)


def write_nodes_neo4j(
    nodes: DataFrame,
    run_cypher: Callable[[str, list[dict[str, Any]]], None],
    batch_size: int = 5000,
) -> None:
    """Push the node frame through ``run_cypher(statement, node_batch)``
    in <=5000-row batches per label (runQueryWithParamBatch's default)."""

    def emit(ntype: str, rows: list[dict[str, Any]]) -> None:
        run_cypher(
            neo4j_node_statement(ntype), [neo4j_node_payload(r) for r in rows]
        )

    _dispatch_by_type(nodes, "node_type", emit, batch_size)


def write_edges_neo4j(
    edges: DataFrame,
    run_cypher: Callable[[str, list[dict[str, Any]]], None],
    batch_size: int = 5000,
) -> None:
    def emit(etype: str, rows: list[dict[str, Any]]) -> None:
        run_cypher(
            neo4j_edge_statement(etype), [neo4j_edge_payload(r) for r in rows]
        )

    _dispatch_by_type(edges, "edge_type", emit, batch_size)


# --------------------------------------------------------------- TuGraph


def tugraph_node_payload(row: dict[str, Any]) -> dict[str, Any]:
    """{primary: key, data: {..., __updated_at?}} (log_tugraph_importer.ts:350-362)."""
    ntype = row["node_type"]
    data = dict(row["props"] or {})
    if ntype in _TUGRAPH_TS_TYPES and row.get("updated_at") is not None:
        data["__updated_at"] = str(row["updated_at"])
    return {node_primary(ntype): _key_value(row["node_key"]), "data": data}


def tugraph_edge_payload(row: dict[str, Any]) -> dict[str, Any]:
    """{from, to, data, id} with -1 for absent ids (log_tugraph_importer.ts:380-388)."""
    return {
        "from": _key_value(row["from_key"]),
        "to": _key_value(row["to_key"]),
        "data": dict(row["props"] or {}),
        "id": row["edge_id"] if row["edge_id"] is not None else -1,
    }


def tugraph_node_request(node_type: str, nodes: list[dict[str, Any]]) -> dict[str, Any]:
    """update_nodes plugin params (log_tugraph_importer.ts:366)."""
    return {"type": node_type, "primary": node_primary(node_type), "nodes": nodes}


def tugraph_edge_request(edge_type: str, edges: list[dict[str, Any]]) -> dict[str, Any]:
    """update_edges plugin params (log_tugraph_importer.ts:392-399)."""
    from_label, to_label = EDGE_TYPE_PAIR[edge_type]
    from_key = node_primary(from_label.split("|")[0])
    to_key = node_primary(to_label.split("|")[0])
    return {
        "fromKey": from_key,
        "fromLabel": from_label,
        "toKey": to_key,
        "toLabel": to_label,
        "label": edge_type,
        "edges": edges,
    }


def tugraph_plugin_body(params: dict[str, Any]) -> dict[str, Any]:
    """The POST body wrapping for /cpp_plugin/{name} (tugraph.ts:100-103):
    params are double-encoded under 'data', timeout 0."""
    return {"data": json.dumps(params), "timeout": 0}


def write_nodes_tugraph(
    nodes: DataFrame,
    call_plugin: Callable[[str, dict[str, Any]], None],
    chunk_size: int = 500,
) -> None:
    """Push node chunks through ``call_plugin('update_nodes', params)``
    (500/chunk, splitArr's default — log_tugraph_importer.ts:417-423)."""

    def emit(ntype: str, rows: list[dict[str, Any]]) -> None:
        call_plugin(
            "update_nodes",
            tugraph_node_request(ntype, [tugraph_node_payload(r) for r in rows]),
        )

    _dispatch_by_type(nodes, "node_type", emit, chunk_size)


def write_edges_tugraph(
    edges: DataFrame,
    call_plugin: Callable[[str, dict[str, Any]], None],
    chunk_size: int = 500,
) -> None:
    def emit(etype: str, rows: list[dict[str, Any]]) -> None:
        call_plugin(
            "update_edges",
            tugraph_edge_request(etype, [tugraph_edge_payload(r) for r in rows]),
        )

    _dispatch_by_type(edges, "edge_type", emit, chunk_size)
