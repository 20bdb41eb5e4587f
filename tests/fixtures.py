"""GH Archive NDJSON fixtures covering the reference's edge cases
(FIXTURES.md 1: every case exercises a reference code path)."""

from __future__ import annotations

import gzip
import json
import os


def _env(i, etype, payload, actor=None, org=None, created="2015-01-01T15:00:00Z"):
    e = {
        "id": str(i),
        "type": etype,
        "actor": actor or {"id": 1001, "login": "alice"},
        "repo": {"id": 2001, "name": "org1/repo1"},
        "payload": payload,
        "created_at": created,
    }
    if org:
        e["org"] = org
    return e


ISSUE = {
    "id": 10,
    "number": 5,
    "title": "crash on start",
    "body": "it crashes",
    "labels": [
        {"name": "bug", "color": "red", "default": True, "description": "a bug"},
        {"name": None, "color": None, "default": None, "description": None},
    ],
    "user": {"id": 1001, "login": "alice", "type": "User"},
    "author_association": "OWNER",
    "assignee": {"id": 7, "login": "carol"},
    "assignees": [{"id": 7, "login": "carol"}, {"id": None, "login": None}],
    "comments": 3,
    "created_at": "2015-01-01T14:00:00Z",
    "updated_at": "2015-01-01T14:30:00Z",
    "closed_at": None,
}

PULL = {
    **ISSUE,
    "id": 20,
    "number": 9,
    "commits": 2,
    "additions": 10,
    "deletions": 4,
    "changed_files": 3,
    "merged": True,
    "merge_commit_sha": "deadbeef",
    "merged_at": "2015-01-01T16:00:00Z",
    "merged_by": {"id": 8, "login": "dave", "type": "User"},
    "review_comments": 1,
    "requested_reviewers": [
        {"id": 30, "login": "rev1", "type": "User"},
        {"id": 31, "login": "rev2", "type": "Bot"},
    ],
    "base": {"ref": "main", "repo": {"id": 2001}},
    "head": {"ref": "fix", "repo": {"id": 555, "full_name": "alice/fork"}},
}


def events() -> list[dict]:
    return [
        _env(100, "IssuesEvent", {"action": "opened", "issue": ISSUE}),
        # IssuesEvent falling back to pull_request (app/parser.js:36)
        _env(101, "IssuesEvent", {"action": "closed", "pull_request": PULL}),
        # neither issue nor pull_request -> dropped (app/parser.js:38-40)
        _env(102, "IssuesEvent", {"action": "opened"}),
        _env(
            103,
            "IssueCommentEvent",
            {
                "action": "created",
                "issue": ISSUE,
                "comment": {
                    "id": 40,
                    "body": "me too",
                    "user": {"id": 9, "login": "eve[bot]", "type": "Bot"},
                    "author_association": None,
                    "created_at": "2015-01-01T15:05:00Z",
                    "updated_at": "2015-01-01T15:05:00Z",
                },
            },
        ),
        _env(104, "PullRequestEvent", {"action": "closed", "pull_request": PULL}),
        _env(
            105,
            "PullRequestReviewEvent",
            {
                "action": "created",
                "pull_request": PULL,
                "review": {
                    "id": 0,  # review.id=0 -> pull_review_id omitted
                    "body": None,
                    "state": "approved",
                    "author_association": "MEMBER",
                },
            },
        ),
        _env(
            106,
            "PullRequestReviewCommentEvent",
            {
                "action": "created",
                "pull_request": PULL,
                "comment": {
                    "id": 50,
                    "pull_request_review_id": 60,
                    "path": "src/a.py",
                    "position": 0,  # falsy -> omitted -> ''
                    "body": "nit",
                    "user": {"id": 9, "login": "eve", "type": "User"},
                    "author_association": "CONTRIBUTOR",
                    "created_at": "2015-01-01T15:06:00Z",
                    "updated_at": "2015-01-01T15:07:00Z",
                },
            },
        ),
        _env(
            107,
            "PushEvent",
            {
                "push_id": 999,
                "size": 2,
                "distinct_size": 2,
                "ref": "refs/heads/main",
                "head": "abc123",
                "commits": [
                    {"author": {"name": "bob", "email": "b@x.com"}, "message": "m1"},
                    {"message": None},  # missing author -> '' (app/parser.js:179-181)
                ],
            },
            actor={"id": 4, "login": "bob"},
        ),
        _env(
            108,
            "ForkEvent",
            {"forkee": {"id": 777, "full_name": "bob/fork", "owner": {"id": 4, "login": "bob", "type": "User"}}},
        ),
        _env(109, "WatchEvent", {"action": "started"}, org={"id": 3001, "login": "org1"}),
        _env(
            110,
            "ReleaseEvent",
            {
                "action": "published",
                "release": {
                    "id": 880,
                    "tag_name": "v1.0",
                    "target_commitish": "main",
                    "name": None,
                    "draft": False,
                    "prerelease": True,
                    "author": {"id": 1001, "login": "alice", "type": "User"},
                    "created_at": "2015-01-01T12:00:00Z",
                    "published_at": "2015-01-01T13:00:00Z",
                    "body": "notes",
                    "assets": [
                        {
                            "name": "bin.tar.gz",
                            "uploader": {"id": 1001, "login": "alice"},
                            "content_type": "application/gzip",
                            "state": "uploaded",
                            "size": 1024,
                            "download_count": 5,
                        }
                    ],
                },
            },
        ),
        _env(
            111,
            "CommitCommentEvent",
            {
                "comment": {
                    "id": 70,
                    "user": {"id": 9, "login": "eve", "type": "User"},
                    "author_association": "NONE",
                    "body": "hm",
                    "path": "README.md",
                    "position": 3,
                    "line": 12,
                    "commit_id": "cafe01",
                    "created_at": "2015-01-01T15:08:00Z",
                    "updated_at": "2015-01-01T15:09:00Z",
                },
            },
        ),
        # unknown type -> dropped (app/importer_worker.js:34)
        _env(112, "GollumEvent", {"pages": []}),
        # second month for partitioning
        _env(113, "WatchEvent", {"action": "started"}, created="2015-02-03T10:00:00Z"),
    ]


def write_gz(path: str, objs: list[dict], corrupt_lines: int = 1) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as f:
        for o in objs:
            f.write(json.dumps(o) + "\n")
        for _ in range(corrupt_lines):
            f.write("{not valid json\n")
    return path
