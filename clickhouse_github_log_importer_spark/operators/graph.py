"""Property-graph projection of the raw event stream (S7/S8 model).

The reference maintains two alternative graph sinks (Neo4j:
``app/service/log_neo4j_importer.ts``; TuGraph:
``app/service/log_tugraph_importer.ts``) with an in-memory last-write-wins
merge per node/edge key (``updateNode``/``updateEdge``,
``log_tugraph_importer.ts:95-123``) and batched MERGE upserts.

Spark-first re-expression: the graph IS two DataFrames —

- ``nodes(node_type, node_key, props map<string,string>, updated_at)``
- ``edges(edge_type, from_key, to_key, edge_id, props, created_at)``

built as a union of per-edge-type projections over the raw event frame
(the graph reads payload fields the flat events table intentionally drops
— repo language/license/description — so its source is the raw scan, same
as the reference). The A7 last-write-wins upsert becomes a per-property
``max_by(value, created_at)`` aggregation, which reproduces the
reference's *dict-merge* semantics (newer events override per field, not
per node). Writing to an actual Neo4j/TuGraph is a ``foreachPartition``
batched sink over these frames (X3); querying works directly on the
DataFrames (or GraphFrames when available).

Node types: github_repo, github_org, github_actor, github_issue,
github_change_request, issue_label, language, license
(``log_tugraph_importer.ts:11-20``). Edge types and endpoint pairs:
``log_tugraph_importer.ts:31-46``.

Divergence note: the reference classifies issue-vs-change_request by
payload shape per event; identical here except IssuesEvent carrying only
``payload.pull_request`` (rare fallback) — classified by payload presence
too (we read the raw frame, so the bit is available).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .parsers import _ISSUE

_ISSUE_FIELDS = [f.name for f in _ISSUE.fields]


def _issue_view() -> Column:
    """payload.issue ?? payload.pull_request, projected to the shared issue
    fields (the two structs differ in type, so a raw coalesce cannot work)."""
    pi = F.col("payload.issue")
    pp = F.col("payload.pull_request")
    return F.when(
        pi.isNotNull(), F.struct(*[pi[n].alias(n) for n in _ISSUE_FIELDS])
    ).when(pp.isNotNull(), F.struct(*[pp[n].alias(n) for n in _ISSUE_FIELDS]))

NODE_TYPES = (
    "github_repo",
    "github_org",
    "github_actor",
    "github_issue",
    "github_change_request",
    "issue_label",
    "language",
    "license",
)
EDGE_TYPES = (
    "has_license",
    "has_language",
    "has_repo",
    "has_issue_change_request",
    "has_issue_label",
    "open",
    "comment",
    "close",
    "has_assignee",
    "has_requested_reviewer",
    "review",
    "review_comment",
)

ISSUE_EVENTS = (
    "IssuesEvent",
    "IssueCommentEvent",
    "PullRequestEvent",
    "PullRequestReviewEvent",
    "PullRequestReviewCommentEvent",
)
PULL_EVENTS = (
    "PullRequestEvent",
    "PullRequestReviewEvent",
    "PullRequestReviewCommentEvent",
)


def _valid_events(raw: DataFrame) -> DataFrame:
    """check() gate (log_tugraph_importer.ts:345-356): actor/repo present."""
    return raw.filter(
        F.col("_corrupt_record").isNull()
        & F.col("actor.id").isNotNull()
        & F.col("actor.login").isNotNull()
        & F.col("repo.id").isNotNull()
        & F.col("repo.name").isNotNull()
        & F.col("created_at").isNotNull()
    ).withColumn("_ts", F.to_timestamp("created_at"))


def _issue_key() -> Column:
    """getTuGraphIssueId (ts:153-157): `${repoId}_${number}`."""
    return F.concat_ws("_", F.col("repo.id"), _issue_view()["number"].cast("long"))


def _node(ntype: str, key: Column, ts: Column, **props: Column) -> list[Column]:
    entries = [
        F.struct(F.lit(k).alias("key"), v.cast("string").alias("value"))
        for k, v in props.items()
    ]
    pmap = (
        F.map_from_entries(
            F.filter(F.array(*entries), lambda e: e["value"].isNotNull())
        )
        if entries
        else F.map_from_entries(F.array().cast("array<struct<key:string,value:string>>"))
    )
    return [
        F.lit(ntype).alias("node_type"),
        key.cast("string").alias("node_key"),
        pmap.alias("props"),
        ts.alias("updated_at"),
    ]


def _edge(
    etype: str, frm: Column, to: Column, ts: Column, edge_id: Column | None = None,
    **props: Column,
) -> list[Column]:
    entries = [
        F.struct(F.lit(k).alias("key"), v.cast("string").alias("value"))
        for k, v in props.items()
    ]
    pmap = (
        F.map_from_entries(
            F.filter(F.array(*entries), lambda e: e["value"].isNotNull())
        )
        if entries
        else F.map_from_entries(F.array().cast("array<struct<key:string,value:string>>"))
    )
    return [
        F.lit(etype).alias("edge_type"),
        frm.cast("string").alias("from_key"),
        to.cast("string").alias("to_key"),
        (edge_id if edge_id is not None else F.lit(-1)).cast("long").alias("edge_id"),
        pmap.alias("props"),
        ts.alias("created_at"),
    ]


def project_nodes(raw: DataFrame) -> DataFrame:
    """All node observations (pre-merge): one row per (type, key) sighting."""
    ev = _valid_events(raw)
    issue_ev = ev.filter(F.col("type").isin(*ISSUE_EVENTS))
    pull_ev = ev.filter(F.col("type").isin(*PULL_EVENTS))
    issue = _issue_view()
    is_pull = F.col("payload.issue").isNull() | F.col("type").isin(*PULL_EVENTS)
    ts = F.col("_ts")
    repo = F.col("payload.pull_request.base.repo")

    parts = [
        # repo + actor from every event (ts:140-141)
        ev.select(*_node("github_repo", F.col("repo.id"), ts,
                         id=F.col("repo.id"), name=F.col("repo.name"))),
        ev.select(*_node("github_actor", F.col("actor.id"), ts,
                         id=F.col("actor.id"), login=F.col("actor.login"))),
        # org when present (ts:142-149)
        ev.filter(F.col("org.id").isNotNull() & F.col("org.login").isNotNull()).select(
            *_node("github_org", F.col("org.id"), ts,
                   id=F.col("org.id"), login=F.col("org.login"))
        ),
        # issue / change_request (ts:158-177)
        issue_ev.filter(issue.isNotNull()).select(
            F.when(is_pull, F.lit("github_change_request"))
            .otherwise(F.lit("github_issue"))
            .alias("node_type"),
            _issue_key().alias("node_key"),
            F.map_from_entries(
                F.filter(
                    F.array(
                        F.struct(F.lit("id").alias("key"), _issue_key().cast("string").alias("value")),
                        F.struct(F.lit("number").alias("key"), issue["number"].cast("long").cast("string").alias("value")),
                        F.struct(F.lit("title").alias("key"), issue["title"].cast("string").alias("value")),
                        F.struct(F.lit("body").alias("key"), F.coalesce(issue["body"], F.lit("")).alias("value")),
                    ),
                    lambda e: e["value"].isNotNull(),
                )
            ).alias("props"),
            ts.alias("updated_at"),
        ),
        # labels (ts:179-183)
        issue_ev.filter(issue.isNotNull()).select(
            F.explode(F.coalesce(issue["labels"], F.array())).alias("l"), ts.alias("t")
        ).filter(F.col("l.name").isNotNull()).select(
            *_node("issue_label", F.col("l.name"), F.col("t"))
        ),
        # assignee + assignees as actors (ts:184-196)
        issue_ev.filter(issue.isNotNull() & issue["assignee"].isNotNull()).select(
            *_node("github_actor", issue["assignee"]["id"], ts,
                   id=issue["assignee"]["id"], login=issue["assignee"]["login"])
        ),
        issue_ev.filter(issue.isNotNull()).select(
            F.explode(F.coalesce(issue["assignees"], F.array())).alias("a"),
            ts.alias("t"),
        ).filter(F.col("a.id").isNotNull()).select(
            *_node("github_actor", F.col("a.id"), F.col("t"),
                   id=F.col("a.id"), login=F.col("a.login"))
        ),
        # change_request stats when any > 0 (ts:236-247)
        pull_ev.filter(
            (F.coalesce(F.col("payload.pull_request.commits"), F.lit(0)) > 0)
            | (F.coalesce(F.col("payload.pull_request.additions"), F.lit(0)) > 0)
            | (F.coalesce(F.col("payload.pull_request.deletions"), F.lit(0)) > 0)
            | (F.coalesce(F.col("payload.pull_request.changed_files"), F.lit(0)) > 0)
        ).select(
            *_node(
                "github_change_request", _issue_key(), ts,
                id=_issue_key(),
                commits=F.coalesce(F.col("payload.pull_request.commits"), F.lit(0)),
                additions=F.coalesce(F.col("payload.pull_request.additions"), F.lit(0)),
                deletions=F.coalesce(F.col("payload.pull_request.deletions"), F.lit(0)),
                changed_files=F.coalesce(F.col("payload.pull_request.changed_files"), F.lit(0)),
            )
        ),
        # reviewers as actors (ts:248-253)
        pull_ev.select(
            F.explode(
                F.coalesce(F.col("payload.pull_request.requested_reviewers"), F.array())
            ).alias("r"),
            ts.alias("t"),
        ).filter(F.col("r.id").isNotNull()).select(
            *_node("github_actor", F.col("r.id"), F.col("t"), login=F.col("r.login"))
        ),
        # language / license (ts:254-266)
        pull_ev.filter(repo["language"].isNotNull()).select(
            *_node("language", repo["language"], ts)
        ),
        pull_ev.filter(repo["license"]["spdx_id"].isNotNull()).select(
            *_node("license", repo["license"]["spdx_id"], ts)
        ),
        # repo metadata enrichment (ts:267-271)
        pull_ev.filter(
            repo["description"].isNotNull() | repo["default_branch"].isNotNull()
        ).select(
            *_node("github_repo", F.col("repo.id"), ts,
                   description=repo["description"],
                   default_branch=repo["default_branch"])
        ),
        # change_request refs (ts:275-287)
        pull_ev.filter(
            F.col("payload.pull_request.base.ref").isNotNull()
            & F.col("payload.pull_request.base.sha").isNotNull()
        ).select(
            *_node("github_change_request", _issue_key(), ts,
                   base_ref=F.col("payload.pull_request.base.ref"))
        ),
        pull_ev.filter(
            F.col("payload.pull_request.head.ref").isNotNull()
            & F.col("payload.pull_request.head.sha").isNotNull()
            & F.col("payload.pull_request.head.repo").isNotNull()
        ).select(
            *_node("github_change_request", _issue_key(), ts,
                   head_id=F.col("payload.pull_request.head.repo.id"),
                   head_name=F.col("payload.pull_request.head.repo.full_name"),
                   head_ref=F.col("payload.pull_request.head.ref"))
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def project_edges(raw: DataFrame) -> DataFrame:
    """All edge observations (pre-merge)."""
    ev = _valid_events(raw)
    issue_ev = ev.filter(F.col("type").isin(*ISSUE_EVENTS))
    pull_ev = ev.filter(F.col("type").isin(*PULL_EVENTS))
    issue = _issue_view()
    ts = F.col("_ts")
    eid = F.col("id").cast("long")
    action = F.col("payload.action")
    created_str = F.date_format(ts, "yyyy-MM-dd HH:mm:ss")
    repo = F.col("payload.pull_request.base.repo")

    parts = [
        # org -has_repo-> repo (ts:147)
        ev.filter(F.col("org.id").isNotNull() & F.col("org.login").isNotNull()).select(
            *_edge("has_repo", F.col("org.id"), F.col("repo.id"), ts)
        ),
        # repo -has_issue_change_request-> issue (ts:197)
        issue_ev.filter(issue.isNotNull()).select(
            *_edge("has_issue_change_request", F.col("repo.id"), _issue_key(), ts)
        ),
        # issue -has_issue_label-> label (ts:179-183)
        issue_ev.filter(issue.isNotNull()).select(
            _issue_key().alias("k"),
            F.explode(F.coalesce(issue["labels"], F.array())).alias("l"),
            ts.alias("t"),
        ).filter(F.col("l.name").isNotNull()).select(
            *_edge("has_issue_label", F.col("k"), F.col("l.name"), F.col("t"))
        ),
        # issue -has_assignee-> actor (ts:184-196)
        issue_ev.filter(issue.isNotNull() & issue["assignee"].isNotNull()).select(
            *_edge("has_assignee", _issue_key(), issue["assignee"]["id"], ts)
        ),
        issue_ev.filter(issue.isNotNull()).select(
            _issue_key().alias("k"),
            F.explode(F.coalesce(issue["assignees"], F.array())).alias("a"),
            ts.alias("t"),
        ).filter(F.col("a.id").isNotNull()).select(
            *_edge("has_assignee", F.col("k"), F.col("a.id"), F.col("t"))
        ),
        # actor -open-> issue (ts:199-200); IssuesEvent/IssueCommentEvent only
        # reach the plain open/close (parseIssue); pull events emit the
        # merged-flag close below
        ev.filter(
            F.col("type").isin("IssuesEvent", "IssueCommentEvent")
            & issue.isNotNull() & (action == "opened")
        ).select(
            *_edge("open", F.col("actor.id"), _issue_key(), ts, eid,
                   id=eid, created_at=created_str)
        ),
        ev.filter(
            F.col("type").isin("IssuesEvent", "IssueCommentEvent")
            & issue.isNotNull() & (action == "closed")
        ).select(
            *_edge("close", F.col("actor.id"), _issue_key(), ts, eid,
                   id=eid, created_at=created_str)
        ),
        # PullRequestEvent opened (via parseIssue, ts:199-200)
        pull_ev.filter(issue.isNotNull() & (action == "opened")).select(
            *_edge("open", F.col("actor.id"), _issue_key(), ts, eid,
                   id=eid, created_at=created_str)
        ),
        # actor -comment-> issue (ts:210-214)
        ev.filter(
            (F.col("type") == "IssueCommentEvent")
            & issue.isNotNull()
            & F.col("payload.comment.id").isNotNull()
        ).select(
            *_edge("comment", F.col("actor.id"), _issue_key(), ts,
                   F.col("payload.comment.id"),
                   id=F.col("payload.comment.id"),
                   body=F.col("payload.comment.body"),
                   created_at=created_str)
        ),
        # actor -close(merged)-> change_request (ts:222-235)
        pull_ev.filter(issue.isNotNull() & (action == "closed")).select(
            *_edge("close", F.col("actor.id"), _issue_key(), ts, eid,
                   id=eid,
                   merged=F.coalesce(F.col("payload.pull_request.merged"), F.lit(False)),
                   created_at=created_str)
        ),
        # issue -has_requested_reviewer-> actor (ts:248-253)
        pull_ev.select(
            _issue_key().alias("k"),
            F.explode(
                F.coalesce(F.col("payload.pull_request.requested_reviewers"), F.array())
            ).alias("r"),
            ts.alias("t"),
        ).filter(F.col("r.id").isNotNull()).select(
            *_edge("has_requested_reviewer", F.col("k"), F.col("r.id"), F.col("t"))
        ),
        # repo -has_language-> language / -has_license-> license (ts:254-266)
        pull_ev.filter(repo["language"].isNotNull()).select(
            *_edge("has_language", F.col("repo.id"), repo["language"], ts)
        ),
        pull_ev.filter(repo["license"]["spdx_id"].isNotNull()).select(
            *_edge("has_license", F.col("repo.id"), repo["license"]["spdx_id"], ts)
        ),
        # actor -review-> change_request (ts:289-301)
        ev.filter((F.col("type") == "PullRequestReviewEvent") & issue.isNotNull()).select(
            *_edge("review", F.col("actor.id"), _issue_key(), ts,
                   F.coalesce(F.col("payload.review.id"), F.lit(0)),
                   id=F.coalesce(F.col("payload.review.id"), F.lit(0)),
                   body=F.coalesce(F.col("payload.review.body"), F.lit("")),
                   state=F.coalesce(F.col("payload.review.state"), F.lit("")),
                   created_at=created_str)
        ),
        # actor -review_comment-> change_request (ts:303-321)
        ev.filter(
            (F.col("type") == "PullRequestReviewCommentEvent")
            & issue.isNotNull()
            & F.col("payload.comment.id").isNotNull()
        ).select(
            *_edge("review_comment", F.col("actor.id"), _issue_key(), ts,
                   F.col("payload.comment.id"),
                   id=F.col("payload.comment.id"),
                   body=F.col("payload.comment.body"),
                   path=F.col("payload.comment.path"),
                   position=F.coalesce(F.col("payload.comment.position"), F.lit(0)),
                   line=F.coalesce(F.col("payload.comment.line"), F.lit(0)),
                   start_line=F.coalesce(F.col("payload.comment.start_line"), F.lit(0)),
                   created_at=created_str)
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def merge_nodes(observations: DataFrame) -> DataFrame:
    """A7 last-write-wins with dict-merge: per (type, key, prop) keep the
    value at max updated_at (updateNode, ts:95-109)."""
    exploded = observations.select(
        "node_type", "node_key", "updated_at", F.explode_outer("props").alias("k", "v")
    )
    merged = (
        exploded.filter(F.col("k").isNotNull())
        .groupBy("node_type", "node_key", "k")
        .agg(F.max_by("v", "updated_at").alias("v"), F.max("updated_at").alias("t"))
        .groupBy("node_type", "node_key")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("k", "v"))).alias("props"),
            F.max("t").alias("updated_at"),
        )
    )
    # keys whose observations carried no props at all (labels, languages)
    bare = observations.groupBy("node_type", "node_key").agg(
        F.max("updated_at").alias("updated_at")
    )
    return (
        bare.join(merged.select("node_type", "node_key", "props"),
                  ["node_type", "node_key"], "left")
        .select("node_type", "node_key", "props", "updated_at")
    )


def merge_edges(observations: DataFrame) -> DataFrame:
    """A7 last-write-wins per (type, from, to, id) (updateEdge, ts:111-123)."""
    return (
        observations.groupBy("edge_type", "from_key", "to_key", "edge_id")
        .agg(
            F.max_by("props", "created_at").alias("props"),
            F.max("created_at").alias("created_at"),
        )
    )


def project_graph(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The full projection: (nodes, edges), merged and ready to upsert."""
    return merge_nodes(project_nodes(raw)), merge_edges(project_edges(raw))


def degrees(edges: DataFrame) -> DataFrame:
    """Example graph query without GraphFrames: total degree per node key."""
    outd = edges.groupBy(F.col("from_key").alias("node_key")).agg(
        F.count("*").alias("out_degree")
    )
    ind = edges.groupBy(F.col("to_key").alias("node_key")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        outd.join(ind, "node_key", "full")
        .select(
            "node_key",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )
