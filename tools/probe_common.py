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


def wait_for_idle(threshold: float | None = None, timeout_s: int = 600,
                  poll_s: int = 15) -> dict:
    """Probe-side twin of bench.py's load gate (review r8: the 26-row
    re-probe batch ran at load1 up to 22.8 and flipped one verdict —
    the exact phantom the bench gate exists to stop, applied only to
    bench). Blocks until load1 <= threshold and load5 <= 1.25x threshold
    (r9: a bench admitted at load5 5.1 under the old 2x limit measured
    a 41% phantom; see bench.py's gate comment);
    proceeds after timeout_s with the failure recorded in the returned
    telemetry. SPARK_GRAFT_BENCH_LOAD_GATE=0 skips (same env as bench —
    one knob for "I know the host is busy")."""
    import sys
    import time

    if os.environ.get("SPARK_GRAFT_BENCH_LOAD_GATE", "1") == "0":
        return {"skipped": True}
    if threshold is None:
        env = os.environ.get("SPARK_GRAFT_BENCH_LOAD_MAX")
        threshold = float(env) if env else max(2.0, 0.1 * (os.cpu_count() or 8))

    def busy(l1: float, l5: float) -> bool:
        return l1 > threshold or l5 > 1.25 * threshold

    t0 = time.monotonic()
    l1, l5 = os.getloadavg()[:2]
    while busy(l1, l5) and time.monotonic() - t0 < timeout_s:
        print(
            f"# probe load gate: host busy (load1={l1:.1f}, load5={l5:.1f};"
            f" need <= {threshold}/{1.25 * threshold}) — waiting...",
            file=sys.stderr,
        )
        time.sleep(poll_s)
        l1, l5 = os.getloadavg()[:2]
    return {
        "threshold": threshold,
        "waited_s": round(time.monotonic() - t0),
        "load1_when_proceeding": round(l1, 1),
        "load5_when_proceeding": round(l5, 1),
        "passed": not busy(l1, l5),
    }


def cpu_ticks() -> tuple[int, int] | None:
    """(total, steal) jiffies from /proc/stat — None where unreadable.
    Steal is the hypervisor running other guests on our vCPUs (SCALE.md
    r10: 8-10% at times on this host); sampling it around each timed
    cell lets a reader attribute a noisy cell numerically (the r11
    bench does the same per pass)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except (OSError, ValueError):
        return None


def steal_pct(before, after) -> float | None:
    """Steal share of all CPU ticks between two cpu_ticks() samples."""
    if not before or not after or after[0] <= before[0]:
        return None
    return round(100.0 * (after[1] - before[1]) / (after[0] - before[0]), 2)


def steal_threshold() -> float:
    """Max steal% a probe cell may be stamped at without retry — the
    bench load-gate's convention (r11 verdict: the new folds' skew/scale
    rows were stamped at 5-13% steal, making the worst skew ratio in
    the artifact steal-inflated evidence). SPARK_GRAFT_PROBE_STEAL_MAX
    overrides (default 2.0)."""
    env = os.environ.get("SPARK_GRAFT_PROBE_STEAL_MAX")
    return float(env) if env else 2.0


def measure_with_steal_gate(measure_fn, max_attempts: int = 3):
    """Run ``measure_fn() -> (result, steal_pct)`` until the measured
    steal is at or under ``steal_threshold()``, retrying up to
    ``max_attempts`` times. Returns ``(result, steal, contaminated)`` —
    the lowest-steal attempt wins, and ``contaminated=True`` (which the
    probes write into the row and print loudly) means every attempt ran
    hot: a contaminated stamp can land, but never silently."""
    import sys

    thr = steal_threshold()
    best = None  # (sort_key, result, steal)
    for attempt in range(max_attempts):
        result, sp = measure_fn()
        key = sp if sp is not None else -1.0  # unreadable /proc -> accept
        if best is None or key < best[0]:
            best = (key, result, sp)
        if sp is None or sp <= thr:
            return result, sp, False
        print(
            f"# steal gate: attempt {attempt + 1}/{max_attempts} measured "
            f"{sp}% steal (> {thr}%) — re-measuring",
            file=sys.stderr,
        )
    _, result, sp = best
    print(
        f"# WARNING steal gate: cell stamped CONTAMINATED at {sp}% steal "
        f"after {max_attempts} attempts — do not hang verdicts off it",
        file=sys.stderr,
    )
    return result, sp, True
