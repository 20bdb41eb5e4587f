"""GH Archive event parsers (P1-P11) as pure Spark Column expressions.

The reference flattens ten GitHub event types into one wide row via
hand-written JS parsers (``app/parser.js:13-277``, registry ``:266-277``).
Here each parser is a dict of ``column -> Column`` expression over a raw
frame read with an *explicit* schema (no inference — a 100 TB scan must
never be read twice to infer types), and the whole parse layer is one
``select`` so Catalyst sees a single projection: column pruning reaches the
JSON scan, there is no union, no shuffle, and no Python in the hot path.

Parity notes (semantics copied from the reference, implementation is new):

- Rows whose type has no parser are dropped (``app/importer_worker.js:34``).
- Issue-family events missing both ``payload.issue`` and
  ``payload.pull_request`` are dropped (``app/parser.js:38-40``).
- JS ``??`` defaults (``'' / 0 / false / 'NONE'``) are replicated partly
  here and partly by ``schema.fill_defaults`` (ClickHouse implicit
  default-fill, SURVEY 1.2).
- JS truthiness quirks are preserved: ``review.id > 0`` gates
  ``pull_review_id`` (``app/parser.js:132-134``), ``comment.position`` /
  ``line`` are stringified only when truthy (``app/parser.js:151,251-254``),
  ``action`` only when non-empty (``app/parser.js:24-26``).
- Timestamps normalized to UTC seconds (``app/parser.js:6-11``); session
  timezone must be UTC (see ``session.get_spark``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import EVENTS_SCHEMA, EVENT_TYPES, fill_defaults

# --- raw input schema (FIXTURES.md 1; app/parser.js field reads) -------------

_ACTOR = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("login", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("name", T.StringType()),  # push commit author overlap
        T.StructField("email", T.StringType()),
    ]
)

_LABEL = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("color", T.StringType()),
        T.StructField("default", T.BooleanType()),
        T.StructField("description", T.StringType()),
    ]
)

_ISSUE = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("number", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("labels", T.ArrayType(_LABEL)),
        T.StructField("user", _ACTOR),
        T.StructField("author_association", T.StringType()),
        T.StructField("assignee", _ACTOR),
        T.StructField("assignees", T.ArrayType(_ACTOR)),
        T.StructField("comments", T.LongType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("updated_at", T.StringType()),
        T.StructField("closed_at", T.StringType()),
    ]
)

_PULL = T.StructType(
    list(_ISSUE.fields)
    + [
        T.StructField("commits", T.LongType()),
        T.StructField("additions", T.LongType()),
        T.StructField("deletions", T.LongType()),
        T.StructField("changed_files", T.LongType()),
        T.StructField("merged", T.BooleanType()),
        T.StructField("merge_commit_sha", T.StringType()),
        T.StructField("merged_at", T.StringType()),
        T.StructField("merged_by", _ACTOR),
        T.StructField("review_comments", T.LongType()),
        T.StructField("requested_reviewers", T.ArrayType(_ACTOR)),
        T.StructField(
            "base",
            T.StructType(
                [
                    T.StructField("ref", T.StringType()),
                    T.StructField("sha", T.StringType()),
                    # graph projection reads repo metadata the flat table
                    # does not keep (log_tugraph_importer.ts:252-274)
                    T.StructField(
                        "repo",
                        T.StructType(
                            [
                                T.StructField("id", T.LongType()),
                                T.StructField("language", T.StringType()),
                                T.StructField(
                                    "license",
                                    T.StructType([T.StructField("spdx_id", T.StringType())]),
                                ),
                                T.StructField("description", T.StringType()),
                                T.StructField("default_branch", T.StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField(
            "head",
            T.StructType(
                [
                    T.StructField("ref", T.StringType()),
                    T.StructField("sha", T.StringType()),
                    T.StructField(
                        "repo",
                        T.StructType(
                            [
                                T.StructField("id", T.LongType()),
                                T.StructField("full_name", T.StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)

# comment struct is shared by IssueComment / PRReviewComment / CommitComment.
_COMMENT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("body", T.StringType()),
        T.StructField("user", _ACTOR),
        T.StructField("author_association", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("updated_at", T.StringType()),
        T.StructField("pull_request_review_id", T.LongType()),
        T.StructField("path", T.StringType()),
        T.StructField("position", T.LongType()),
        T.StructField("line", T.LongType()),
        T.StructField("start_line", T.LongType()),
        T.StructField("commit_id", T.StringType()),
    ]
)

_RELEASE = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("tag_name", T.StringType()),
        T.StructField("target_commitish", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("draft", T.BooleanType()),
        T.StructField("prerelease", T.BooleanType()),
        T.StructField("author", _ACTOR),
        T.StructField("created_at", T.StringType()),
        T.StructField("published_at", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField(
            "assets",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("uploader", _ACTOR),
                        T.StructField("content_type", T.StringType()),
                        T.StructField("state", T.StringType()),
                        T.StructField("size", T.LongType()),
                        T.StructField("download_count", T.LongType()),
                    ]
                )
            ),
        ),
    ]
)

_PAYLOAD = T.StructType(
    [
        T.StructField("action", T.StringType()),
        T.StructField("issue", _ISSUE),
        T.StructField("pull_request", _PULL),
        T.StructField("comment", _COMMENT),
        T.StructField(
            "review",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("body", T.StringType()),
                    T.StructField("state", T.StringType()),
                    T.StructField("author_association", T.StringType()),
                ]
            ),
        ),
        T.StructField("push_id", T.LongType()),
        T.StructField("size", T.LongType()),
        T.StructField("distinct_size", T.LongType()),
        T.StructField("ref", T.StringType()),
        T.StructField("head", T.StringType()),
        T.StructField(
            "commits",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("author", _ACTOR),
                        T.StructField("message", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "forkee",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("full_name", T.StringType()),
                    T.StructField("owner", _ACTOR),
                ]
            ),
        ),
        T.StructField("release", _RELEASE),
    ]
)

RAW_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("actor", _ACTOR),
        T.StructField("repo", T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
        )),
        T.StructField("org", T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("login", T.StringType())]
        )),
        T.StructField("payload", _PAYLOAD),
        T.StructField("created_at", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

ISSUE_FAMILY = (
    "IssuesEvent",
    "IssueCommentEvent",
    "PullRequestEvent",
    "PullRequestReviewEvent",
    "PullRequestReviewCommentEvent",
)
PULL_FAMILY = (
    "PullRequestEvent",
    "PullRequestReviewEvent",
    "PullRequestReviewCommentEvent",
)


def read_raw(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """S3/S4: tolerant NDJSON(.gz) scan.

    One gzip file = one non-splittable input split = one task, matching the
    reference's file-granularity parallelism (``app/importer_worker.js``).
    PERMISSIVE mode + ``_corrupt_record`` replicates the per-line skip of
    ``app/importer_worker.js:36-38``.
    """
    return (
        spark.read.schema(RAW_EVENT_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(paths)
    )


def _ts(col: Column) -> Column:
    """P13: UTC timestamp normalization (app/parser.js:6-11)."""
    return F.to_timestamp(col)


def _when_type(types: tuple[str, ...] | str, expr: Column) -> Column:
    types = (types,) if isinstance(types, str) else types
    return F.when(F.col("type").isin(*types), expr)


def event_column_exprs() -> dict[str, Column]:
    """All wide-table columns as expressions over the raw envelope.

    One entry per events-table column; families gated on ``type`` so the
    whole parse layer stays a single whole-stage-codegen projection.
    """
    payload = F.col("payload")
    # issuesParser coalesce (app/parser.js:36): issue ?? pull_request. The
    # payload.issue struct lacks pull-only fields, so coalesce per-family:
    # cast the pull struct down to the issue fields for the shared columns.
    issue_fields = [f.name for f in _ISSUE.fields]
    pull_as_issue = F.struct(*[payload["pull_request"][n].alias(n) for n in issue_fields])
    issue_struct = F.struct(*[payload["issue"][n].alias(n) for n in issue_fields])
    issue = F.when(payload["issue"].isNotNull(), issue_struct).otherwise(pull_as_issue)
    pull = payload["pull_request"]
    comment = payload["comment"]
    review = payload["review"]
    release = payload["release"]
    forkee = payload["forkee"]

    cols: dict[str, Column] = {}

    # P1 commonParser (app/parser.js:13-32)
    cols["id"] = F.col("id").cast("long")
    cols["platform"] = F.lit("GitHub")
    cols["type"] = F.col("type")
    cols["action"] = payload["action"]
    cols["actor_id"] = F.col("actor.id")
    cols["actor_login"] = F.col("actor.login")
    cols["repo_id"] = F.col("repo.id")
    cols["repo_name"] = F.col("repo.name")
    cols["org_id"] = F.col("org.id")
    cols["org_login"] = F.col("org.login")
    cols["created_at"] = _ts(F.col("created_at"))

    # P2 issuesParser (app/parser.js:34-79) — shared by the issue family
    fam = ISSUE_FAMILY
    cols["issue_id"] = _when_type(fam, issue["id"])
    cols["issue_number"] = _when_type(fam, issue["number"].try_cast("int"))
    cols["issue_title"] = _when_type(fam, issue["title"])
    labels = F.coalesce(issue["labels"], F.array().cast(_ISSUE["labels"].dataType))
    cols["issue_labels"] = _when_type(
        fam,
        F.transform(
            labels,
            lambda l: F.struct(
                F.coalesce(l["name"], F.lit("")).alias("name"),
                F.coalesce(l["color"], F.lit("")).alias("color"),
                F.coalesce(l["default"], F.lit(False)).try_cast("int").alias("default"),
                F.coalesce(l["description"], F.lit("")).alias("description"),
            ),
        ),
    )
    cols["issue_author_id"] = _when_type(fam, issue["user"]["id"])
    cols["issue_author_login"] = _when_type(fam, issue["user"]["login"])
    cols["issue_author_type"] = _when_type(fam, issue["user"]["type"])
    cols["issue_author_association"] = _when_type(
        fam, F.coalesce(issue["author_association"], F.lit("NONE"))
    )
    cols["issue_assignee_id"] = _when_type(fam, issue["assignee"]["id"])
    cols["issue_assignee_login"] = _when_type(fam, issue["assignee"]["login"])
    assignees = F.coalesce(issue["assignees"], F.array().cast(_ISSUE["assignees"].dataType))
    cols["issue_assignees"] = _when_type(
        fam,
        F.transform(
            assignees,
            lambda a: F.struct(
                F.coalesce(a["login"], F.lit("")).alias("login"),
                F.coalesce(a["id"], F.lit(0)).alias("id"),
            ),
        ),
    )
    cols["issue_comments"] = _when_type(fam, F.coalesce(issue["comments"], F.lit(0)).try_cast("int"))
    cols["issue_created_at"] = _when_type(fam, _ts(issue["created_at"]))
    cols["issue_updated_at"] = _when_type(fam, _ts(issue["updated_at"]))
    cols["issue_closed_at"] = _when_type(fam, _ts(issue["closed_at"]))
    # issue_closed_by_pull_request_numbers: declared in FieldMap
    # (app/utils.ts:61) but never populated by the log parsers.
    cols["issue_closed_by_pull_request_numbers"] = F.lit(None).cast(
        EVENTS_SCHEMA["issue_closed_by_pull_request_numbers"].dataType
    )

    # body: written by five parsers with per-type sources
    # (app/parser.js:44,86,131,160,244)
    cols["body"] = (
        F.when(F.col("type") == "IssuesEvent", F.coalesce(issue["body"], F.lit("")))
        .when(F.col("type") == "PullRequestEvent", F.coalesce(issue["body"], F.lit("")))
        .when(F.col("type") == "IssueCommentEvent", comment["body"])
        .when(F.col("type") == "PullRequestReviewEvent", review["body"])
        .when(F.col("type") == "PullRequestReviewCommentEvent", comment["body"])
        .when(F.col("type") == "CommitCommentEvent", F.coalesce(comment["body"], F.lit("")))
    )

    # P3 issueCommentParser (app/parser.js:81-93)
    t = "IssueCommentEvent"
    cols["issue_comment_id"] = _when_type(t, comment["id"])
    cols["issue_comment_created_at"] = _when_type(t, _ts(comment["created_at"]))
    cols["issue_comment_updated_at"] = _when_type(t, _ts(comment["updated_at"]))
    cols["issue_comment_author_id"] = _when_type(t, comment["user"]["id"])
    cols["issue_comment_author_login"] = _when_type(t, comment["user"]["login"])
    cols["issue_comment_author_type"] = _when_type(t, comment["user"]["type"])
    cols["issue_comment_author_association"] = _when_type(
        t, F.coalesce(comment["author_association"], F.lit("NONE"))
    )

    # P4 pullRequestParser (app/parser.js:95-126) — pull family
    pf = PULL_FAMILY
    cols["pull_commits"] = _when_type(pf, F.coalesce(pull["commits"], F.lit(0)).try_cast("int"))
    cols["pull_additions"] = _when_type(pf, F.coalesce(pull["additions"], F.lit(0)).try_cast("int"))
    cols["pull_deletions"] = _when_type(pf, F.coalesce(pull["deletions"], F.lit(0)).try_cast("int"))
    cols["pull_changed_files"] = _when_type(
        pf, F.coalesce(pull["changed_files"], F.lit(0)).try_cast("int")
    )
    cols["pull_merged"] = _when_type(
        pf, F.coalesce(pull["merged"], F.lit(False)).try_cast("int")
    )
    cols["pull_merge_commit_sha"] = _when_type(
        pf, F.coalesce(pull["merge_commit_sha"], F.lit(""))
    )
    cols["pull_merged_at"] = _when_type(pf, _ts(pull["merged_at"]))
    cols["pull_merged_by_id"] = _when_type(pf, pull["merged_by"]["id"])
    cols["pull_merged_by_login"] = _when_type(pf, pull["merged_by"]["login"])
    cols["pull_merged_by_type"] = _when_type(pf, pull["merged_by"]["type"])
    # first requested reviewer only (app/parser.js:98)
    reviewer = F.element_at(pull["requested_reviewers"], 1)
    cols["pull_requested_reviewer_id"] = _when_type(pf, reviewer["id"])
    cols["pull_requested_reviewer_login"] = _when_type(pf, reviewer["login"])
    cols["pull_requested_reviewer_type"] = _when_type(pf, reviewer["type"])
    cols["pull_review_comments"] = _when_type(
        pf, F.coalesce(pull["review_comments"], F.lit(0)).try_cast("int")
    )
    cols["pull_base_ref"] = _when_type(pf, pull["base"]["ref"])
    cols["pull_head_repo_id"] = _when_type(
        pf, F.coalesce(pull["head"]["repo"]["id"], F.lit(0))
    )
    cols["pull_head_repo_name"] = _when_type(
        pf, F.coalesce(pull["head"]["repo"]["full_name"], F.lit(""))
    )
    cols["pull_head_ref"] = _when_type(pf, pull["head"]["ref"])

    # P5 pullRequestReviewParser (app/parser.js:128-138): review.id gated >0
    # P6 pullRequestReviewCommentParser (:140-167): comment.pull_request_review_id gated >0
    cols["pull_review_id"] = (
        F.when(
            (F.col("type") == "PullRequestReviewEvent") & (review["id"] > 0), review["id"]
        ).when(
            (F.col("type") == "PullRequestReviewCommentEvent")
            & (comment["pull_request_review_id"] > 0),
            comment["pull_request_review_id"],
        )
    )
    cols["pull_review_state"] = _when_type("PullRequestReviewEvent", review["state"])
    cols["pull_review_author_association"] = _when_type(
        "PullRequestReviewEvent", F.coalesce(review["author_association"], F.lit("NONE"))
    )
    t = "PullRequestReviewCommentEvent"
    cols["pull_review_comment_id"] = _when_type(t, comment["id"])
    cols["pull_review_comment_path"] = _when_type(t, comment["path"])
    # JS truthiness: position 0 is omitted -> '' (app/parser.js:150-152)
    cols["pull_review_comment_position"] = _when_type(
        t, F.when(comment["position"] > 0, comment["position"].cast("string"))
    )
    cols["pull_review_comment_author_id"] = _when_type(t, comment["user"]["id"])
    cols["pull_review_comment_author_login"] = _when_type(t, comment["user"]["login"])
    cols["pull_review_comment_author_type"] = _when_type(t, comment["user"]["type"])
    cols["pull_review_comment_author_association"] = _when_type(
        t, F.coalesce(comment["author_association"], F.lit("NONE"))
    )
    cols["pull_review_comment_created_at"] = _when_type(t, _ts(comment["created_at"]))
    cols["pull_review_comment_updated_at"] = _when_type(t, _ts(comment["updated_at"]))

    # P7 pushParser (app/parser.js:169-183)
    t = "PushEvent"
    cols["push_id"] = _when_type(t, payload["push_id"])
    cols["push_size"] = _when_type(t, payload["size"].try_cast("int"))
    cols["push_distinct_size"] = _when_type(t, payload["distinct_size"].try_cast("int"))
    cols["push_ref"] = _when_type(t, payload["ref"])
    cols["push_head"] = _when_type(t, payload["head"])
    commits = F.coalesce(payload["commits"], F.array().cast(_PAYLOAD["commits"].dataType))
    cols["push_commits"] = _when_type(
        t,
        F.transform(
            commits,
            lambda c: F.struct(
                F.coalesce(c["author"]["name"], F.lit("")).alias("name"),
                F.coalesce(c["author"]["email"], F.lit("")).alias("email"),
                F.coalesce(c["message"], F.lit("")).alias("message"),
            ),
        ),
    )

    # P8 forkParser (app/parser.js:185-196)
    t = "ForkEvent"
    cols["fork_forkee_id"] = _when_type(t, forkee["id"])
    cols["fork_forkee_full_name"] = _when_type(t, forkee["full_name"])
    cols["fork_forkee_owner_id"] = _when_type(t, forkee["owner"]["id"])
    cols["fork_forkee_owner_login"] = _when_type(t, forkee["owner"]["login"])
    cols["fork_forkee_owner_type"] = _when_type(t, forkee["owner"]["type"])

    # P9 watchParser (app/parser.js:198-200): envelope only — nothing extra.

    # P10 releaseParser (app/parser.js:202-234)
    t = "ReleaseEvent"
    cols["release_id"] = _when_type(t, release["id"])
    cols["release_tag_name"] = _when_type(t, F.coalesce(release["tag_name"], F.lit("")))
    cols["release_target_commitish"] = _when_type(t, release["target_commitish"])
    cols["release_name"] = _when_type(t, F.coalesce(release["name"], F.lit("")))
    cols["release_draft"] = _when_type(t, release["draft"].try_cast("int"))
    cols["release_author_id"] = _when_type(t, release["author"]["id"])
    cols["release_author_login"] = _when_type(t, release["author"]["login"])
    cols["release_author_type"] = _when_type(t, release["author"]["type"])
    cols["release_prerelease"] = _when_type(t, release["prerelease"].try_cast("int"))
    cols["release_created_at"] = _when_type(t, _ts(release["created_at"]))
    cols["release_published_at"] = _when_type(t, _ts(release["published_at"]))
    cols["release_body"] = _when_type(t, F.coalesce(release["body"], F.lit("")))
    assets = F.coalesce(release["assets"], F.array().cast(_RELEASE["assets"].dataType))
    cols["release_assets"] = _when_type(
        t,
        F.transform(
            assets,
            lambda a: F.struct(
                F.coalesce(a["name"], F.lit("")).alias("name"),
                F.coalesce(a["uploader"]["login"], F.lit("")).alias("uploader_login"),
                F.coalesce(a["uploader"]["id"], F.lit(0)).alias("uploader_id"),
                F.coalesce(a["content_type"], F.lit("")).alias("content_type"),
                F.coalesce(a["state"], F.lit("")).alias("state"),
                F.coalesce(a["size"], F.lit(0)).alias("size"),
                F.coalesce(a["download_count"], F.lit(0)).try_cast("int").alias("download_count"),
            ),
        ),
    )

    # P11 commitCommentParser (app/parser.js:236-264)
    t = "CommitCommentEvent"
    cols["commit_comment_id"] = _when_type(t, comment["id"])
    cols["commit_comment_author_id"] = _when_type(t, comment["user"]["id"])
    cols["commit_comment_author_login"] = _when_type(t, comment["user"]["login"])
    cols["commit_comment_author_type"] = _when_type(t, comment["user"]["type"])
    cols["commit_comment_author_association"] = _when_type(
        t, F.coalesce(comment["author_association"], F.lit("NONE"))
    )
    cols["commit_comment_path"] = _when_type(t, comment["path"])
    cols["commit_comment_position"] = _when_type(
        t, F.when(comment["position"] > 0, comment["position"].cast("string"))
    )
    cols["commit_comment_line"] = _when_type(
        t, F.when(comment["line"] > 0, comment["line"].cast("string"))
    )
    cols["commit_comment_sha"] = _when_type(t, comment["commit_id"])
    cols["commit_comment_created_at"] = _when_type(t, _ts(comment["created_at"]))
    cols["commit_comment_updated_at"] = _when_type(t, _ts(comment["updated_at"]))

    cols["from_api"] = F.lit(0)  # log-sourced (app/importer_worker.js:35)
    return cols


def project_events(raw: DataFrame, from_api: int = 0) -> DataFrame:
    """The full parse layer: raw envelope -> wide events frame.

    Single projection + two filters; equivalent of the reference's
    per-line ``ParseFuncMap.get(type)(item)`` loop
    (``app/importer_worker.js:31-40``) but columnar, codegen'd, and
    parallel per input file.
    """
    issue_missing = (
        F.col("type").isin(*ISSUE_FAMILY)
        & F.col("payload.issue").isNull()
        & F.col("payload.pull_request").isNull()
    )
    filtered = raw.filter(
        F.col("_corrupt_record").isNull()  # S4 tolerant parse: skip bad lines
        & F.col("type").isin(*EVENT_TYPES)  # P12 event-type filter
        & ~issue_missing  # app/parser.js:38-40
    )
    exprs = event_column_exprs()
    wide = filtered.select(
        *[
            # try_cast: a malformed record (e.g. out-of-int-range number)
            # nulls the field (then default-fills) instead of killing the
            # task under ANSI mode — per-line tolerance like the reference
            exprs[f.name].try_cast(f.dataType).alias(f.name)
            for f in EVENTS_SCHEMA.fields
        ]
    )
    if from_api:
        wide = wide.withColumn("from_api", F.lit(int(from_api)))
    filled = fill_defaults(wide)
    # partition column: toYYYYMM(created_at) (app/service/log_importer.ts:124)
    return filled.withColumn(
        "created_month", F.date_format("created_at", "yyyyMM").try_cast("int")
    )
