"""The wide GitHub/Gitee ``events`` table schema.

Spark mapping of the reference's ``FieldMap`` (``app/utils.ts:20-145``) and
table DDL (``app/service/log_importer.ts:120-127``):

- ClickHouse ``UInt64`` -> LongType, ``UInt32/UInt16`` -> IntegerType,
  ``UInt8`` bool-ish -> IntegerType 0/1 (queries compare ``pull_merged=1``).
- ``LowCardinality(String)`` / ``Enum`` -> StringType (parquet dictionary
  encoding is the storage analog; enum domains validated at ingest).
- ``Nested(...)`` parallel arrays -> ArrayType(StructType) as the canonical
  form; ``issue_labels.name``-style parallel-array projections are provided
  by :func:`nested_projection` for query parity.
- Non-Nullable ClickHouse columns are *implicitly defaulted* on insert
  (number->0, string->'', enum->parser default). Spark keeps every column
  nullable in storage but :data:`COLUMN_DEFAULTS` + ``fill_defaults`` apply
  the same fill so aggregates match (SURVEY 1.2, the top correctness risk).

Partitioning: ``created_month = yyyyMM(created_at)`` mirrors
``PARTITION BY toYYYYMM(created_at)`` (``app/service/log_importer.ts:124``).
Dedup identity: :data:`DEDUP_KEY` is the ReplacingMergeTree ORDER BY tuple
(``app/service/log_importer.ts:125-126``); version column ``from_api``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- enum domains (app/utils.ts:16-18,23-27) ---------------------------------
AUTHOR_TYPES = ("Bot", "Mannequin", "Organization", "User")
AUTHOR_ASSOCIATIONS = (
    "COLLABORATOR", "CONTRIBUTOR", "MEMBER", "NONE", "OWNER", "MANNEQUIN",
)
REVIEW_STATES = ("approved", "commented", "dismissed", "changes_requested", "pending")
EVENT_TYPES = (
    "IssuesEvent",
    "IssueCommentEvent",
    "PullRequestEvent",
    "PullRequestReviewEvent",
    "PullRequestReviewCommentEvent",
    "PushEvent",
    "ForkEvent",
    "WatchEvent",
    "ReleaseEvent",
    "CommitCommentEvent",
)
PLATFORMS = ("GitHub", "Gitee", "GitLab", "Gitea", "AtomGit")

ISSUE_LABEL = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("color", T.StringType()),
        T.StructField("default", T.IntegerType()),
        T.StructField("description", T.StringType()),
    ]
)
ISSUE_ASSIGNEE = T.StructType(
    [
        T.StructField("login", T.StringType()),
        T.StructField("id", T.LongType()),
    ]
)
PUSH_COMMIT = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("message", T.StringType()),
    ]
)
RELEASE_ASSET = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("uploader_login", T.StringType()),
        T.StructField("uploader_id", T.LongType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("download_count", T.IntegerType()),
    ]
)

# (name, spark type, clickhouse-ish type string for db_schema(), default)
# Order follows FieldMap (app/utils.ts:20-145).
_S, _L, _I, _TS = "string", "long", "int", "timestamp"
_FIELDS: list[tuple[str, object, str, object]] = [
    ("id", T.LongType(), "UInt64", 0),
    ("platform", T.StringType(), "Enum('GitHub'=1,'Gitee'=2,'GitLab'=3,'Gitea'=4,'AtomGit'=5)", "GitHub"),
    ("type", T.StringType(), "Enum(...10 event types)", ""),
    ("action", T.StringType(), "LowCardinality(String)", ""),
    ("actor_id", T.LongType(), "UInt64", 0),
    ("actor_login", T.StringType(), "LowCardinality(String)", ""),
    ("repo_id", T.LongType(), "UInt64", 0),
    ("repo_name", T.StringType(), "LowCardinality(String)", ""),
    ("org_id", T.LongType(), "UInt64", 0),
    ("org_login", T.StringType(), "LowCardinality(String)", ""),
    ("created_at", T.TimestampType(), "DateTime", None),
    ("issue_id", T.LongType(), "UInt64", 0),
    ("issue_number", T.IntegerType(), "UInt32", 0),
    ("issue_title", T.StringType(), "String", ""),
    ("body", T.StringType(), "String", ""),
    ("issue_labels", T.ArrayType(ISSUE_LABEL), "Nested(name,color,default,description)", []),
    ("issue_author_id", T.LongType(), "UInt64", 0),
    ("issue_author_login", T.StringType(), "LowCardinality(String)", ""),
    ("issue_author_type", T.StringType(), "Enum(Bot,Mannequin,Organization,User)", ""),
    ("issue_author_association", T.StringType(), "Enum(author_association)", ""),
    ("issue_assignee_id", T.LongType(), "UInt64", 0),
    ("issue_assignee_login", T.StringType(), "LowCardinality(String)", ""),
    ("issue_assignees", T.ArrayType(ISSUE_ASSIGNEE), "Nested(login,id)", []),
    ("issue_created_at", T.TimestampType(), "Nullable(DateTime)", None),
    ("issue_updated_at", T.TimestampType(), "Nullable(DateTime)", None),
    ("issue_comments", T.IntegerType(), "UInt16", 0),
    ("issue_closed_at", T.TimestampType(), "Nullable(DateTime)", None),
    ("issue_closed_by_pull_request_numbers", T.ArrayType(T.IntegerType()), "Array(UInt32)", []),
    ("issue_comment_id", T.LongType(), "UInt64", 0),
    ("issue_comment_created_at", T.TimestampType(), "Nullable(DateTime)", None),
    ("issue_comment_updated_at", T.TimestampType(), "Nullable(DateTime)", None),
    ("issue_comment_author_association", T.StringType(), "Enum(author_association)", ""),
    ("issue_comment_author_id", T.LongType(), "UInt64", 0),
    ("issue_comment_author_login", T.StringType(), "LowCardinality(String)", ""),
    ("issue_comment_author_type", T.StringType(), "Enum(author_type)", ""),
    ("pull_commits", T.IntegerType(), "UInt16", 0),
    ("pull_additions", T.IntegerType(), "UInt32", 0),
    ("pull_deletions", T.IntegerType(), "UInt32", 0),
    ("pull_changed_files", T.IntegerType(), "UInt32", 0),
    ("pull_merged", T.IntegerType(), "UInt8", 0),
    ("pull_merge_commit_sha", T.StringType(), "String", ""),
    ("pull_merged_at", T.TimestampType(), "Nullable(DateTime)", None),
    ("pull_merged_by_id", T.LongType(), "UInt64", 0),
    ("pull_merged_by_login", T.StringType(), "LowCardinality(String)", ""),
    ("pull_merged_by_type", T.StringType(), "Enum(author_type)", ""),
    ("pull_requested_reviewer_id", T.LongType(), "UInt64", 0),
    ("pull_requested_reviewer_login", T.StringType(), "LowCardinality(String)", ""),
    ("pull_requested_reviewer_type", T.StringType(), "Enum(author_type)", ""),
    ("pull_review_comments", T.IntegerType(), "UInt16", 0),
    ("pull_base_ref", T.StringType(), "LowCardinality(String)", ""),
    ("pull_head_repo_id", T.LongType(), "UInt64", 0),
    ("pull_head_repo_name", T.StringType(), "LowCardinality(String)", ""),
    ("pull_head_ref", T.StringType(), "LowCardinality(String)", ""),
    ("pull_review_state", T.StringType(), "Enum(review_state)", ""),
    ("pull_review_author_association", T.StringType(), "Enum(author_association)", ""),
    ("pull_review_id", T.LongType(), "UInt64", 0),
    ("pull_review_comment_id", T.LongType(), "UInt64", 0),
    ("pull_review_comment_path", T.StringType(), "String", ""),
    ("pull_review_comment_position", T.StringType(), "String", ""),
    ("pull_review_comment_author_id", T.LongType(), "UInt64", 0),
    ("pull_review_comment_author_login", T.StringType(), "LowCardinality(String)", ""),
    ("pull_review_comment_author_type", T.StringType(), "Enum(author_type)", ""),
    ("pull_review_comment_author_association", T.StringType(), "Enum(author_association)", ""),
    ("pull_review_comment_created_at", T.TimestampType(), "Nullable(DateTime)", None),
    ("pull_review_comment_updated_at", T.TimestampType(), "Nullable(DateTime)", None),
    ("push_id", T.LongType(), "UInt64", 0),
    ("push_size", T.IntegerType(), "UInt32", 0),
    ("push_distinct_size", T.IntegerType(), "UInt32", 0),
    ("push_ref", T.StringType(), "LowCardinality(String)", ""),
    ("push_head", T.StringType(), "String", ""),
    ("push_commits", T.ArrayType(PUSH_COMMIT), "Nested(name,email,message)", []),
    ("fork_forkee_id", T.LongType(), "UInt64", 0),
    ("fork_forkee_full_name", T.StringType(), "LowCardinality(String)", ""),
    ("fork_forkee_owner_id", T.LongType(), "UInt64", 0),
    ("fork_forkee_owner_login", T.StringType(), "LowCardinality(String)", ""),
    ("fork_forkee_owner_type", T.StringType(), "Enum(author_type)", ""),
    ("release_id", T.LongType(), "UInt64", 0),
    ("release_tag_name", T.StringType(), "String", ""),
    ("release_target_commitish", T.StringType(), "LowCardinality(String)", ""),
    ("release_name", T.StringType(), "String", ""),
    ("release_draft", T.IntegerType(), "UInt8", 0),
    ("release_author_id", T.LongType(), "UInt64", 0),
    ("release_author_login", T.StringType(), "LowCardinality(String)", ""),
    ("release_author_type", T.StringType(), "Enum(author_type)", ""),
    ("release_prerelease", T.IntegerType(), "UInt8", 0),
    ("release_created_at", T.TimestampType(), "Nullable(DateTime)", None),
    ("release_published_at", T.TimestampType(), "Nullable(DateTime)", None),
    ("release_body", T.StringType(), "String", ""),
    ("release_assets", T.ArrayType(RELEASE_ASSET), "Nested(7 asset fields)", []),
    ("commit_comment_id", T.LongType(), "UInt64", 0),
    ("commit_comment_author_id", T.LongType(), "UInt64", 0),
    ("commit_comment_author_login", T.StringType(), "LowCardinality(String)", ""),
    ("commit_comment_author_type", T.StringType(), "Enum(author_type)", ""),
    ("commit_comment_author_association", T.StringType(), "Enum(author_association)", ""),
    ("commit_comment_path", T.StringType(), "String", ""),
    ("commit_comment_position", T.StringType(), "String", ""),
    ("commit_comment_line", T.StringType(), "String", ""),
    ("commit_comment_sha", T.StringType(), "String", ""),
    ("commit_comment_created_at", T.TimestampType(), "Nullable(DateTime)", None),
    ("commit_comment_updated_at", T.TimestampType(), "Nullable(DateTime)", None),
    ("from_api", T.IntegerType(), "UInt8", 0),
]

EVENTS_SCHEMA = T.StructType([T.StructField(n, t, True) for n, t, _, _ in _FIELDS])

#: ClickHouse implicit default per non-nullable column (SURVEY 1.2).
COLUMN_DEFAULTS: dict[str, object] = {
    n: d for n, _, _, d in _FIELDS if d is not None and not isinstance(d, list)
}
#: Array (Nested) columns default to empty arrays.
ARRAY_COLUMNS: tuple[str, ...] = tuple(
    n for n, t, _, d in _FIELDS if isinstance(d, list)
)

#: ReplacingMergeTree ORDER BY tuple = dedup identity
#: (app/service/log_importer.ts:125-126). year/month components are derived
#: from created_at at dedup time.
DEDUP_KEY = (
    "platform",
    "org_id",
    "repo_id",
    "actor_id",
    "type",
    "action",
    "created_year",
    "created_month",
    "issue_id",
    "issue_comment_id",
    "pull_review_id",
    "pull_review_comment_id",
    "commit_comment_id",
    "push_id",
    "release_id",
)
#: ReplacingMergeTree version column: max wins (API data beats log data).
VERSION_COLUMN = "from_api"
#: Partition column expression target (toYYYYMM(created_at)).
PARTITION_COLUMN = "created_month"


def db_schema() -> list[dict[str, str]]:
    """``GET /query/db_schema`` parity: ``[{key, type}]``.

    Mirrors ``app/controller/query.ts:7-14`` reading ``FieldMap``; we emit
    both the ClickHouse-ish declared type and the Spark SQL type.
    """
    return [
        {"key": n, "type": ch, "spark_type": t.simpleString()}
        for n, t, ch, _ in _FIELDS
    ]


def fill_defaults(df):
    """Apply ClickHouse implicit default-fill to a projected events frame.

    Numeric -> 0, string -> '' (enum columns get the parser-visible default,
    already baked into COLUMN_DEFAULTS), Nested arrays -> []. Nullable
    DateTime columns stay NULL. This keeps e.g. ``pull_merged=1`` filters and
    LEFT-JOIN zero arithmetic identical to ClickHouse results.
    """
    from pyspark.sql import functions as F

    exprs = []
    for field in df.schema.fields:
        n = field.name
        if n in COLUMN_DEFAULTS:
            exprs.append(F.coalesce(F.col(n), F.lit(COLUMN_DEFAULTS[n])).alias(n))
        elif n in ARRAY_COLUMNS:
            empty = F.from_json(F.lit("[]"), field.dataType)
            exprs.append(F.coalesce(F.col(n), empty).alias(n))
        else:
            exprs.append(F.col(n))
    return df.select(*exprs)


def nested_projection(df, column: str):
    """ClickHouse ``Nested`` parallel-array projections for query parity.

    ClickHouse exposes ``issue_labels.name`` etc. as parallel arrays; the
    canonical Spark form is one array<struct>. This returns the frame with
    flattened ``<column>.<field>``-style array columns added
    (``transform(col, x -> x.field)``), matching the reference's insert
    layout (``app/parser.js:48-51``).
    """
    from pyspark.sql import functions as F

    field = df.schema[column]
    assert isinstance(field.dataType, T.ArrayType)
    inner = field.dataType.elementType
    assert isinstance(inner, T.StructType)
    out = df
    for sub in inner.fieldNames():
        out = out.withColumn(
            f"{column}.{sub}", F.transform(F.col(column), lambda x: x[sub])
        )
    return out
