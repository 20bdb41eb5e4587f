"""Gitee API incremental importer (SURVEY 3.2): normalization P15-P17,
dimension table A8, cursor-watermark state machine T6.

The reference maps Gitee REST events onto the SAME wide ``events`` table
with ``platform='Gitee'`` (``app/service/gitee_importer.ts:155-288``).
Here the normalization layer is pure column expressions over an explicit
raw schema (one codegen'd projection, like the GH parse layer), and the
cursor pagination driver is plain Python with an injectable fetcher (it
is control-plane work — a few requests per repo — not a Spark job).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import EVENTS_SCHEMA, fill_defaults

# --- P15: event-type mapping (gitee_importer.ts:22-35) -----------------------
SUPPORT_EVENTS_MAP = {
    "IssueEvent": "IssuesEvent",
    "IssueCommentEvent": "IssueCommentEvent",
    "PullRequestEvent": "PullRequestEvent",
    "PullRequestCommentEvent": "PullRequestReviewCommentEvent",
    "CommitCommentEvent": "CommitCommentEvent",
    "PushEvent": "PushEvent",
    "StarEvent": "WatchEvent",
    "ForkEvent": "ForkEvent",
}
UNSUPPORTED_EVENTS = {
    "CreateEvent", "DeleteEvent", "MemberEvent", "ProjectCommentEvent", "MilestoneEvent",
}

# --- P16: action normalization (gitee_importer.ts:37-46) ---------------------
ACTION_MAP = {
    "opened": "opened",
    "open": "opened",
    "reopened": "reopened",
    "closed": "closed",
    "rejected": "closed",
    "merged": "closed",
    "starred": "started",
    # 'progressing' -> None => row dropped
}
DROPPED_ACTIONS = {"progressing"}

_USER = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("login", T.StringType())]
)
_GITEE_ISSUE = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("number", T.StringType()),  # base-36! (ts:201)
        T.StructField("title", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField(
            "labels",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("color", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("user", _USER),
        T.StructField("created_at", T.StringType()),
        T.StructField("updated_at", T.StringType()),
        T.StructField("finished_at", T.StringType()),
    ]
)
_GITEE_COMMENT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("body", T.StringType()),
        T.StructField("user", _USER),
        T.StructField("commit_id", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("updated_at", T.StringType()),
    ]
)

#: Gitee payloads overload one struct: issue-like fields at top level for
#: IssueEvent/PullRequestEvent, nested issue/pull_request/comment for the
#: comment events, push fields for PushEvent.
GITEE_RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("actor", _USER),
        T.StructField(
            "repo",
            T.StructType(
                [T.StructField("id", T.LongType()), T.StructField("full_name", T.StringType())]
            ),
        ),
        T.StructField("org", _USER),
        T.StructField("created_at", T.StringType()),
        T.StructField(
            "payload",
            T.StructType(
                list(_GITEE_ISSUE.fields)
                + [
                    T.StructField("action", T.StringType()),
                    T.StructField("issue", _GITEE_ISSUE),
                    # pull_request carries its own action/merged_at: for
                    # PullRequestReviewCommentEvent the reference runs
                    # parsePull(payload.pull_request) (gitee_importer.ts:
                    # 242-250, 275), reading merged state from the NESTED
                    # struct, not the top-level payload
                    T.StructField(
                        "pull_request",
                        T.StructType(
                            list(_GITEE_ISSUE.fields)
                            + [
                                T.StructField("action", T.StringType()),
                                T.StructField("merged_at", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField("comment", _GITEE_COMMENT),
                    T.StructField("merged_at", T.StringType()),
                    # push fields (parsePush, ts:258-268)
                    T.StructField("size", T.LongType()),
                    T.StructField("ref", T.StringType()),
                    T.StructField("after", T.StringType()),
                    T.StructField(
                        "commits",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(
                                        "author",
                                        T.StructType(
                                            [
                                                T.StructField("name", T.StringType()),
                                                T.StructField("email", T.StringType()),
                                            ]
                                        ),
                                    ),
                                    T.StructField("message", T.StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def _map_expr(mapping: dict[str, str], col: Column) -> Column:
    expr = F.lit(None).cast("string")
    for k, v in mapping.items():
        expr = F.when(col == k, F.lit(v)).otherwise(expr)
    return expr


def _base36(col: Column) -> Column:
    """F11: parseInt(number, 36) (gitee_importer.ts:201)."""
    return F.conv(col, 36, 10).cast("long")


def _pull_src(p: Column, mapped_type: Column, field: str) -> Column:
    """parsePull's input struct field: payload.pull_request.<field> for
    PullRequestReviewCommentEvent, payload.<field> otherwise."""
    return F.when(
        mapped_type == "PullRequestReviewCommentEvent", p["pull_request"][field]
    ).otherwise(p[field])


def project_gitee_events(raw: DataFrame) -> DataFrame:
    """P15-P17: normalize raw Gitee API events to the wide events schema.

    Drop rules replicated from parseEvent (gitee_importer.ts:155-165,
    182-196): unsupported/unknown types, missing actor/repo/payload,
    'progressing' or unknown actions, issues without id+number, comments
    without id.
    """
    p = F.col("payload")
    mapped_type = _map_expr(SUPPORT_EVENTS_MAP, F.col("type"))
    mapped_action = _map_expr(ACTION_MAP, p["action"])

    # issue source per mapped type: top-level payload for IssuesEvent /
    # PullRequestEvent, payload.issue for IssueCommentEvent,
    # payload.pull_request for PullRequestReviewCommentEvent
    issue_fields = [f.name for f in _GITEE_ISSUE.fields]
    top_issue = F.struct(*[p[n].alias(n) for n in issue_fields])
    issue = (
        F.when(mapped_type.isin("IssuesEvent", "PullRequestEvent"), top_issue)
        .when(mapped_type == "IssueCommentEvent", F.struct(*[p["issue"][n].alias(n) for n in issue_fields]))
        .when(
            mapped_type == "PullRequestReviewCommentEvent",
            F.struct(*[p["pull_request"][n].alias(n) for n in issue_fields]),
        )
    )
    comment = p["comment"]
    issue_family = ("IssuesEvent", "IssueCommentEvent", "PullRequestEvent",
                    "PullRequestReviewCommentEvent")
    pull_family = ("PullRequestEvent", "PullRequestReviewCommentEvent")
    comment_family = ("IssueCommentEvent", "PullRequestReviewCommentEvent")

    keep = (
        F.col("type").isin(*SUPPORT_EVENTS_MAP)
        & F.col("actor").isNotNull()
        & F.col("repo").isNotNull()
        & F.col("payload").isNotNull()
        # action: NULL (absent) passes; present-but-unknown or dropped fails
        & (p["action"].isNull() | mapped_action.isNotNull())
        # parseIssue gate: truthy id AND number (ts:199-200)
        & (
            ~mapped_type.isin(*issue_family)
            | ((issue["id"] > 0) & issue["number"].isNotNull() & (issue["number"] != ""))
        )
        # parseComment/parseCommitComment gate: truthy comment id (ts:224,232)
        & (
            ~(mapped_type.isin(*comment_family) | (mapped_type == "CommitCommentEvent"))
            | (comment["id"] > 0)
        )
    )

    filtered = raw.filter(keep)

    action = F.when(
        mapped_type.isin(*comment_family), F.lit("created")
    ).otherwise(mapped_action)

    cols: dict[str, Column] = {
        "id": F.col("id"),
        "platform": F.lit("Gitee"),
        "type": mapped_type,
        "action": action,
        "actor_id": F.col("actor.id"),
        "actor_login": F.col("actor.login"),
        "repo_id": F.col("repo.id"),
        "repo_name": F.col("repo.full_name"),
        "org_id": F.col("org.id"),
        "org_login": F.col("org.login"),
        "created_at": F.to_timestamp("created_at"),
        "issue_id": issue["id"],
        # base-36 issue number; PullRequest re-parses base-10 (parsePull ts:249)
        "issue_number": F.when(
            mapped_type.isin(*pull_family), issue["number"].cast("long")
        )
        .otherwise(_base36(issue["number"]))
        .try_cast("int"),
        "issue_title": issue["title"],
        "issue_labels": F.transform(
            F.coalesce(issue["labels"], F.array().cast(_GITEE_ISSUE["labels"].dataType)),
            lambda l: F.struct(
                F.coalesce(l["name"], F.lit("")).alias("name"),
                F.coalesce(l["color"], F.lit("")).alias("color"),
                F.lit(0).alias("default"),  # always false (ts:207)
                F.lit("").alias("description"),  # always '' (ts:208)
            ),
        ),
        "issue_author_id": issue["user"]["id"],
        "issue_author_login": issue["user"]["login"],
        "issue_created_at": F.to_timestamp(issue["created_at"]),
        "issue_updated_at": F.to_timestamp(issue["updated_at"]),
        "issue_closed_at": F.to_timestamp(issue["finished_at"]),
        "body": F.when(mapped_type.isin(*comment_family) | (mapped_type == "CommitCommentEvent"), comment["body"])
        .otherwise(issue["body"]),
        "issue_comment_id": F.when(mapped_type.isin(*comment_family), comment["id"]),
        "issue_comment_created_at": F.when(
            mapped_type.isin(*comment_family), F.to_timestamp(comment["created_at"])
        ),
        "issue_comment_updated_at": F.when(
            mapped_type.isin(*comment_family), F.to_timestamp(comment["updated_at"])
        ),
        "issue_comment_author_id": F.when(
            mapped_type.isin(*comment_family), comment["user"]["id"]
        ),
        "issue_comment_author_login": F.when(
            mapped_type.isin(*comment_family), comment["user"]["login"]
        ),
        # parsePull (ts:241-251): merged iff action string == 'merged'.
        # The source struct is the top-level payload for PullRequestEvent
        # but payload.pull_request for PullRequestReviewCommentEvent
        # (parsePull(payload) ts:272 vs parsePull(payload.pull_request)
        # ts:275).
        "pull_merged": F.when(
            mapped_type.isin(*pull_family) & (_pull_src(p, mapped_type, "action") == "merged"),
            F.lit(1),
        ),
        "pull_merged_at": F.when(
            mapped_type.isin(*pull_family),
            F.to_timestamp(_pull_src(p, mapped_type, "merged_at")),
        ),
        "commit_comment_id": F.when(mapped_type == "CommitCommentEvent", comment["id"]),
        "commit_comment_sha": F.when(
            mapped_type == "CommitCommentEvent", comment["commit_id"]
        ),
        "commit_comment_created_at": F.when(
            mapped_type == "CommitCommentEvent", F.to_timestamp(comment["created_at"])
        ),
        "commit_comment_updated_at": F.when(
            mapped_type == "CommitCommentEvent", F.to_timestamp(comment["updated_at"])
        ),
        "push_size": F.when(mapped_type == "PushEvent", p["size"].try_cast("int")),
        "push_ref": F.when(mapped_type == "PushEvent", p["ref"]),
        "push_head": F.when(mapped_type == "PushEvent", p["after"]),
        "push_commits": F.when(
            mapped_type == "PushEvent",
            F.transform(
                F.coalesce(p["commits"], F.array().cast(GITEE_RAW_SCHEMA["payload"].dataType["commits"].dataType)),
                lambda c: F.struct(
                    F.coalesce(c["author"]["name"], F.lit("")).alias("name"),
                    F.coalesce(c["author"]["email"], F.lit("")).alias("email"),
                    F.coalesce(c["message"], F.lit("")).alias("message"),
                ),
            ),
        ),
        "from_api": F.lit(0),
    }

    wide = filtered.select(
        *[
            (cols[f.name] if f.name in cols else F.lit(None))
            .try_cast(f.dataType)
            .alias(f.name)
            for f in EVENTS_SCHEMA.fields
        ]
    )
    filled = fill_defaults(wide)
    return filled.withColumn(
        "created_month", F.date_format("created_at", "yyyyMM").try_cast("int")
    )


# --- gitee_orgs_repos dimension (ts:440-448, A8) -----------------------------

ORGS_REPOS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),  # 'org' | 'repo'
        T.StructField("created_at", T.TimestampType()),
    ]
)


def read_repo_list(spark: SparkSession, path: str) -> list[str]:
    """S12: local CSV repo list — skip header, take the 3rd column
    (app/service/gitee_importer.ts:295-302)."""
    df = spark.read.option("header", "true").csv(path)
    third = df.columns[2]
    return [r[0] for r in df.select(third).filter(F.col(third).isNotNull()).collect()]


def dedup_orgs_repos(df: DataFrame) -> DataFrame:
    """OPTIMIZE TABLE ... DEDUPLICATE analog (A8, ts:426): ReplacingMergeTree
    ORDER BY (id, name, type) with no version column -> dropDuplicates."""
    return df.dropDuplicates(["id", "name", "type"])


def discover_orgs_repos(
    spark: SparkSession,
    stored: DataFrame | None,
    config_repos: list[str],
    config_orgs: list[str],
    fetch_entity,
    fetch_org_repos_page,
    csv_path: str | None = None,
    per_page: int = 100,
    parse_orgs: bool = True,
    page_limit: int = 10000,
    retry_policy=None,
) -> tuple[DataFrame, list[str]]:
    """getGiteeOrgsAndRepos (gitee_importer.ts:290-433): populate/refresh
    the ``gitee_orgs_repos`` dimension from config + the Gitee API.

    Flow (reference parity):

    1. candidate repos = config list + optional CSV localFile (3rd column,
       header skipped — ts:295-302); candidate orgs = config list;
    2. anti-join candidates against the STORED dimension on name — only
       missing names hit the API (ts:327-356);
    3. ``fetch_entity(name, type) -> dict | None`` pulls entity metadata
       (``/repos/{name}`` or ``/orgs/{name}``); responses without a
       truthy ``id`` are skipped exactly like the reference's missing-id
       guard (ts:312-315);
    4. every stored-or-new org is split into its repo pages via
       ``fetch_org_repos_page(org, page, per_page) -> list[dict]``,
       following full pages to the next one (ts:365-419);
    5. append + A8 dedup (OPTIMIZE ... DEDUPLICATE analog), returning the
       refreshed dimension and the repo-name list the event importer
       feeds from (ts:426-432).

    The dimension is config-bounded driver-side state (like the
    reference's in-memory name list); the anti-join runs as a broadcast
    LEFT ANTI so the stored side streams. ``retry_policy`` wraps both
    fetchers with bounded retries (exceptions only — a None/empty
    response is the legitimate "no such entity / last page" signal).
    """
    if retry_policy is not None:
        from .retry import retrying_fetcher

        _retry_exc = lambda exc, res: exc is not None  # noqa: E731
        fetch_entity = retrying_fetcher(fetch_entity, retry_policy, retry_on=_retry_exc)
        fetch_org_repos_page = retrying_fetcher(
            fetch_org_repos_page, retry_policy, retry_on=_retry_exc
        )

    def _dt(v, default=None):
        """API created_at (ISO-8601, often +08:00) -> naive UTC; absent
        falls back to `default` (the reference uses new Date())."""
        if v is None:
            return default
        if isinstance(v, datetime):
            dt = v
        else:
            dt = datetime.fromisoformat(v)
        if dt.tzinfo is not None:
            dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
        return dt

    repos = list(config_repos)
    if csv_path is not None:
        repos += read_repo_list(spark, csv_path)
    candidates = [(r, "repo") for r in dict.fromkeys(repos)] + [
        (o, "org") for o in dict.fromkeys(config_orgs)
    ]

    if stored is None:
        stored = spark.createDataFrame([], ORGS_REPOS_SCHEMA)
    cand_df = spark.createDataFrame(
        [(n, ty) for n, ty in candidates], "name string, type string"
    )
    missing = [
        (r["name"], r["type"])
        for r in cand_df.join(
            F.broadcast(stored.select("name")), "name", "left_anti"
        ).collect()
    ]

    new_rows = []
    for name, ty in missing:
        data = fetch_entity(name, ty)
        if not data or not data.get("id"):
            continue  # missing-id guard (ts:312-315)
        new_rows.append(
            (
                int(data["id"]),
                name,
                ty,
                _dt(data.get("created_at"), default=datetime.utcnow()),
            )
        )

    dim = stored
    if new_rows:
        dim = dim.unionByName(
            spark.createDataFrame(new_rows, ORGS_REPOS_SCHEMA)
        )

    split_rows = []
    if parse_orgs:
        org_names = [r["name"] for r in dim.filter(F.col("type") == "org").select("name").distinct().collect()]
        for org in org_names:
            page = 1
            while page <= page_limit:
                batch = fetch_org_repos_page(org, page, per_page) or []
                for r in batch:
                    if not r.get("id"):
                        continue
                    split_rows.append(
                        (int(r["id"]), r["full_name"], "repo", _dt(r.get("created_at")))
                    )
                if len(batch) < per_page:
                    break  # last page (ts:385-399)
                page += 1
    if split_rows:
        dim = dim.unionByName(spark.createDataFrame(split_rows, ORGS_REPOS_SCHEMA))

    dim = dedup_orgs_repos(dim)
    repo_names = [
        r["name"]
        for r in dim.filter(F.col("type") == "repo").select("name").distinct().collect()
    ]
    return dim, sorted(repo_names)


def repo_watermarks(events: DataFrame, orgs_repos: DataFrame) -> DataFrame:
    """loadRepos (J2/A4, ts:108-126): per-repo min created_at + argMin/argMax
    event ids, LEFT-joined onto the repo dimension."""
    agg = (
        events.filter(F.col("platform") == "Gitee")
        .groupBy("repo_id")
        .agg(
            F.min("created_at").alias("min_ed"),
            F.min_by("id", "created_at").alias("min_id"),
            F.max_by("id", "created_at").alias("max_id"),
        )
    )
    dim = orgs_repos.filter(F.col("type") == "repo").select("id", "name", "created_at")
    return dim.join(F.broadcast(agg), dim.id == agg.repo_id, "left").select(
        "name", "created_at", "min_ed", "min_id", "max_id"
    )


# --- T6: two-sided cursor fill state machine ---------------------------------


@dataclass
class RepoCursor:
    """ReqContext (gitee_importer.ts:7-16)."""

    name: str
    created_at: datetime
    max_id: int = 0
    min_id: int = 0
    min_created_at: datetime | None = None
    prev_id: int = -1
    stage: str = "new"  # new | old | break


def paginate_repo_events(
    cursor: RepoCursor,
    fetch_page,
    sink,
    page_limit: int = 10000,
    retry_policy=None,
) -> RepoCursor:
    """The two-sided fill (T6, gitee_importer.ts:57-106).

    ``fetch_page(name, prev_id) -> list[dict]`` returns a page of parsed
    events (descending id), empty when exhausted. ``sink(events)`` persists.
    Stage 'new': pull until hitting the stored max_id (dedup filter
    e.id > max_id), then either 'break' (history already complete: oldest
    stored event within 3 days of repo creation) or 'old' (resume
    backwards from min_id). Stage 'old': pull until no data.

    ``retry_policy`` adds bounded in-place retries around each page fetch
    (request_executor.ts retryOption semantics) — only EXCEPTIONS retry;
    an empty page is the legitimate end-of-data signal. A page that still
    fails after max_attempts ends the tick with the cursor intact, so the
    next tick resumes exactly where this one stopped (the watermark makes
    the re-pull idempotent).
    """
    if retry_policy is not None:
        from .retry import retrying_fetcher

        fetch_page = retrying_fetcher(
            fetch_page, retry_policy, retry_on=lambda exc, res: exc is not None
        )
    pages = 0
    while cursor.stage != "break" and pages < page_limit:
        pages += 1
        events = fetch_page(cursor.name, cursor.prev_id)
        if not events:
            break
        cursor.prev_id = events[-1]["id"]
        if cursor.stage == "new" and cursor.max_id > 0:
            fresh = []
            hit_known = False
            for e in events:
                if e["id"] <= cursor.max_id:
                    hit_known = True
                    break
                fresh.append(e)
            if fresh:
                sink(fresh)
            if hit_known:
                if cursor.min_id > 0:
                    complete = (
                        cursor.min_created_at is not None
                        and cursor.min_created_at.year > 1970
                        and cursor.min_created_at - cursor.created_at
                        < timedelta(days=3)
                    )
                    if complete:
                        cursor.stage = "break"
                    else:
                        cursor.stage = "old"
                        cursor.prev_id = cursor.min_id
                else:
                    cursor.stage = "break"
        else:
            sink(events)
    return cursor
