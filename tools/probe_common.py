"""Shared helpers for the standalone probe scripts (scale_probe,
skew_probe). Kept tiny and import-side-effect-free so one script never
executes another's module-level setup just to borrow a function."""

from __future__ import annotations

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def git_head() -> str:
    """Short HEAD sha for stamping probe artifacts; best-effort."""
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=REPO, capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:  # noqa: BLE001 — stamp is best-effort metadata
        return "unknown"
