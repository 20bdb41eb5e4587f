"""Gitee normalization (P15-P17) and cursor state machine (T6) tests."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.sources.gitee import (
    GITEE_RAW_SCHEMA,
    RepoCursor,
    dedup_orgs_repos,
    paginate_repo_events,
    project_gitee_events,
    repo_watermarks,
)

RAW_EVENTS = [
    # StarEvent -> WatchEvent, action starred -> started
    {"id": 1, "type": "StarEvent", "actor": {"id": 10, "login": "u1"},
     "repo": {"id": 100, "full_name": "o/r"},
     "payload": {"action": "starred"}, "created_at": "2022-01-01T10:00:00+08:00"},
    # IssueEvent -> IssuesEvent, base-36 number, action open -> opened
    {"id": 2, "type": "IssueEvent", "actor": {"id": 10, "login": "u1"},
     "repo": {"id": 100, "full_name": "o/r"},
     "payload": {"action": "open", "id": 55, "number": "I4XYZ",
                 "title": "t", "body": "b",
                 "labels": [{"name": "it's", "color": "red"}],
                 "user": {"id": 10, "login": "u1"},
                 "created_at": "2022-01-01T09:00:00+08:00",
                 "updated_at": "2022-01-01T09:30:00+08:00"},
     "created_at": "2022-01-01T10:00:00+08:00"},
    # progressing action -> dropped
    {"id": 3, "type": "IssueEvent", "actor": {"id": 10, "login": "u1"},
     "repo": {"id": 100, "full_name": "o/r"},
     "payload": {"action": "progressing", "id": 56, "number": "1Z",
                 "user": {"id": 10, "login": "u1"}},
     "created_at": "2022-01-01T10:00:00+08:00"},
    # unsupported type -> dropped
    {"id": 4, "type": "MilestoneEvent", "actor": {"id": 10, "login": "u1"},
     "repo": {"id": 100, "full_name": "o/r"}, "payload": {},
     "created_at": "2022-01-01T10:00:00+08:00"},
    # PullRequestEvent merged -> closed + pull_merged=1, base-10 number
    {"id": 5, "type": "PullRequestEvent", "actor": {"id": 11, "login": "u2"},
     "repo": {"id": 100, "full_name": "o/r"},
     "payload": {"action": "merged", "id": 77, "number": "12",
                 "title": "pr", "body": "pb",
                 "user": {"id": 11, "login": "u2"},
                 "merged_at": "2022-01-02T00:00:00+08:00"},
     "created_at": "2022-01-02T01:00:00+08:00"},
    # comment event: no action field (an unknown action would be dropped,
    # gitee_importer.ts:188-191); forced action=created
    {"id": 6, "type": "IssueCommentEvent", "actor": {"id": 11, "login": "u2"},
     "repo": {"id": 100, "full_name": "o/r"},
     "payload": {"issue": {"id": 55, "number": "I4XYZ", "title": "t",
                           "user": {"id": 10, "login": "u1"}},
                 "comment": {"id": 900, "body": "hi",
                             "user": {"id": 11, "login": "u2"}}},
     "created_at": "2022-01-02T02:00:00+08:00"},
    # PR review comment: merged state comes from the NESTED pull_request
    # (parsePull(payload.pull_request), gitee_importer.ts:275), not the
    # top-level payload, which carries no action/merged_at here
    {"id": 7, "type": "PullRequestCommentEvent", "actor": {"id": 11, "login": "u2"},
     "repo": {"id": 100, "full_name": "o/r"},
     "payload": {"pull_request": {"id": 77, "number": "12", "title": "pr",
                                  "user": {"id": 11, "login": "u2"},
                                  "action": "merged",
                                  "merged_at": "2022-01-02T00:00:00+08:00"},
                 "comment": {"id": 901, "body": "lgtm",
                             "user": {"id": 10, "login": "u1"}}},
     "created_at": "2022-01-02T03:00:00+08:00"},
]


@pytest.fixture(scope="module")
def gitee_events(spark):
    raw = spark.createDataFrame(RAW_EVENTS, GITEE_RAW_SCHEMA)
    return {r["id"]: r.asDict() for r in project_gitee_events(raw).collect()}


def test_type_and_action_mapping(gitee_events):
    assert set(gitee_events) == {1, 2, 5, 6, 7}  # 3 (progressing), 4 (unsupported) dropped
    assert gitee_events[1]["type"] == "WatchEvent"
    assert gitee_events[1]["action"] == "started"
    assert gitee_events[2]["type"] == "IssuesEvent"
    assert gitee_events[2]["action"] == "opened"
    assert gitee_events[5]["action"] == "closed"  # merged -> closed
    assert gitee_events[6]["action"] == "created"  # comment forced


def test_platform_and_base36(gitee_events):
    assert all(e["platform"] == "Gitee" for e in gitee_events.values())
    # parseInt('I4XYZ', 36) = 30862piece? verified against python int(x,36)
    assert gitee_events[2]["issue_number"] == int("I4XYZ".lower(), 36)
    assert gitee_events[5]["issue_number"] == 12  # pull: base-10 re-parse
    assert gitee_events[5]["pull_merged"] == 1


def test_utc_and_labels(gitee_events):
    # +08:00 input normalized to UTC (P13)
    assert gitee_events[1]["created_at"] == datetime(2022, 1, 1, 2, 0, 0)
    labels = [l.asDict() for l in gitee_events[2]["issue_labels"]]
    assert labels == [{"name": "it's", "color": "red", "default": 0, "description": ""}]


def test_comment_projection(gitee_events):
    e = gitee_events[6]
    assert e["issue_comment_id"] == 900 and e["body"] == "hi"
    assert e["issue_id"] == 55  # from nested issue


def test_review_comment_nested_pull_merged(gitee_events):
    e = gitee_events[7]
    assert e["type"] == "PullRequestReviewCommentEvent"
    assert e["action"] == "created"  # comment family forced
    assert e["issue_id"] == 77 and e["issue_number"] == 12
    assert e["issue_comment_id"] == 901 and e["body"] == "lgtm"
    # merged state from payload.pull_request, normalized +08:00 -> UTC
    assert e["pull_merged"] == 1
    assert e["pull_merged_at"] == datetime(2022, 1, 1, 16, 0, 0)


def test_dedup_orgs_repos(spark):
    df = spark.createDataFrame(
        [(1, "o/r", "repo", datetime(2020, 1, 1)), (1, "o/r", "repo", datetime(2020, 1, 1)),
         (2, "org1", "org", datetime(2020, 1, 1))],
        "id long, name string, type string, created_at timestamp",
    )
    assert dedup_orgs_repos(df).count() == 2


def test_discover_orgs_repos_from_empty(spark, tmp_path):
    """getGiteeOrgsAndRepos flow (gitee_importer.ts:290-433): empty
    dimension -> entity fetches for missing names -> org split into repo
    pages -> dedup -> repo list feeding repo_watermarks."""
    from clickhouse_github_log_importer_spark.sources.gitee import (
        discover_orgs_repos,
    )

    csv = tmp_path / "repos.csv"
    csv.write_text("a,b,repo\n1,x,o1/csvrepo\n2,y,o1/csvrepo\n")  # dup row

    fetched = []

    def fetch_entity(name, ty):
        fetched.append((name, ty))
        if name == "ghost/repo":
            return {"message": "404"}  # no id -> skipped (ts:312-315)
        return {
            "id": abs(hash(name)) % 10_000,
            "created_at": "2022-03-01T10:00:00+08:00",
        }

    # org1 has 3 repos across two pages (per_page=2): the full first page
    # must trigger a second fetch
    pages = {
        ("org1", 1): [
            {"id": 501, "full_name": "org1/r1", "created_at": "2022-01-01T00:00:00Z"},
            {"id": 502, "full_name": "org1/r2", "created_at": "2022-01-02T00:00:00Z"},
        ],
        ("org1", 2): [
            {"id": 503, "full_name": "org1/r3", "created_at": "2022-01-03T00:00:00Z"},
        ],
    }

    def fetch_org_repos_page(org, page, per_page):
        assert per_page == 2
        return pages.get((org, page), [])

    dim, repos = discover_orgs_repos(
        spark,
        stored=None,
        config_repos=["o2/confrepo", "ghost/repo"],
        config_orgs=["org1"],
        fetch_entity=fetch_entity,
        fetch_org_repos_page=fetch_org_repos_page,
        csv_path=str(csv),
        per_page=2,
    )
    rows = {(r["name"], r["type"]) for r in dim.collect()}
    assert ("org1", "org") in rows
    assert repos == ["o1/csvrepo", "o2/confrepo", "org1/r1", "org1/r2", "org1/r3"]
    # ghost/repo fetched but skipped; csv dup deduplicated to one fetch+row
    assert fetched.count(("o1/csvrepo", "repo")) == 1
    assert dim.filter(F.col("name") == "o1/csvrepo").count() == 1
    # +08:00 normalized to UTC
    ts = dim.filter(F.col("name") == "o2/confrepo").collect()[0]["created_at"]
    assert ts == datetime(2022, 3, 1, 2, 0, 0)

    # second run with the populated dimension: anti-join means NO
    # re-fetching of known names
    fetched.clear()
    dim2, repos2 = discover_orgs_repos(
        spark,
        stored=dim,
        config_repos=["o2/confrepo"],
        config_orgs=["org1"],
        fetch_entity=fetch_entity,
        fetch_org_repos_page=fetch_org_repos_page,
        per_page=2,
    )
    assert fetched == []  # nothing missing
    assert repos2 == repos
    assert dim2.count() == dim.count()  # split re-pull deduped away


def test_repo_watermarks(spark):
    from clickhouse_github_log_importer_spark.sources.gitee import ORGS_REPOS_SCHEMA

    events = spark.createDataFrame(
        [("Gitee", 100, 7, datetime(2022, 1, 1)), ("Gitee", 100, 9, datetime(2022, 1, 3)),
         ("GitHub", 100, 8, datetime(2022, 1, 2))],
        "platform string, repo_id long, id long, created_at timestamp",
    )
    dim = spark.createDataFrame(
        [(100, "o/r", "repo", datetime(2021, 12, 1)), (5, "org1", "org", datetime(2021, 1, 1))],
        ORGS_REPOS_SCHEMA,
    )
    rows = {r["name"]: r.asDict() for r in repo_watermarks(events, dim).collect()}
    assert list(rows) == ["o/r"]  # orgs filtered out
    assert rows["o/r"]["min_id"] == 7 and rows["o/r"]["max_id"] == 9
    assert rows["o/r"]["min_ed"] == datetime(2022, 1, 1)


def test_cursor_two_sided_fill():
    # pages keyed by prev_id: descending ids 10..1; stored watermarks 7..8
    all_events = [{"id": i} for i in range(10, 0, -1)]

    def fetch(name, prev_id):
        pool = [e for e in all_events if prev_id < 0 or e["id"] < prev_id]
        return pool[:3]

    got: list[int] = []
    cur = RepoCursor(
        name="o/r", created_at=datetime(2021, 1, 1), max_id=8, min_id=7,
        min_created_at=datetime(2022, 6, 1),
    )
    paginate_repo_events(cur, fetch, lambda evs: got.extend(e["id"] for e in evs))
    # 'new' stage: 10, 9 (stop at 8); 'old' stage resumes below min_id=7
    assert got == [10, 9, 6, 5, 4, 3, 2, 1]
    assert cur.stage == "old"


def test_cursor_break_when_history_complete():
    def fetch(name, prev_id):
        # the page reaches the stored max_id=8 -> transition decision fires
        return [{"id": 9}, {"id": 8}] if prev_id < 0 else []

    got = []
    cur = RepoCursor(
        name="o/r", created_at=datetime(2022, 1, 1), max_id=8, min_id=7,
        min_created_at=datetime(2022, 1, 2),  # within 3 days of creation
    )
    paginate_repo_events(cur, fetch, lambda evs: got.extend(e["id"] for e in evs))
    assert got == [9] and cur.stage == "break"


def test_read_repo_list(spark, tmp_path):
    from clickhouse_github_log_importer_spark.sources.gitee import read_repo_list

    p = tmp_path / "repos.csv"
    p.write_text("a,b,repo_path,d\n1,x,org1/repo1,z\n2,y,org2/repo2,w\n3,q,,v\n")
    assert read_repo_list(spark, str(p)) == ["org1/repo1", "org2/repo2"]
