"""Probe-artifact hygiene gates.

r5 and r6 both caught stale SCALE_PROBE.json rows measuring code that
had since changed; every row must therefore carry its provenance
(commit + probed_at) and the calibration-adjusted ratio so the judge
can tell a fresh measurement from a fossil. A registry entry without
any probe row is also flagged — new operators must be probed the round
they land (the registry gains entries in plans/queries.py; this gate is
what makes 'and probe it' enforceable)."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _probe_rows() -> dict:
    with open(os.path.join(REPO, "SCALE_PROBE.json")) as f:
        return json.load(f)["queries"]


def test_every_probe_row_is_stamped_and_calibrated():
    rows = _probe_rows()
    missing = {
        name: [k for k in ("commit", "probed_at", "ratio_hi_caladj") if k not in row]
        for name, row in rows.items()
        if not {"commit", "probed_at", "ratio_hi_caladj"} <= row.keys()
        and "error" not in row
    }
    assert not missing, (
        f"{len(missing)} SCALE_PROBE.json rows lack provenance/caladj "
        f"fields: {dict(list(missing.items())[:8])}"
    )


def test_every_registry_entry_has_a_probe_row():
    from clickhouse_github_log_importer_spark.plans.queries import REGISTRY

    rows = _probe_rows()
    unprobed = sorted(set(REGISTRY) - set(rows))
    assert not unprobed, f"registry entries never scale-probed: {unprobed}"


def test_no_probe_row_is_staler_than_its_code():
    # a row's stamp commit must be >= the last commit touching the
    # entry's function span (tools/probe_staleness.py; VERDICT r7 #6)
    from tools.probe_staleness import stale_rows

    bad = stale_rows()
    assert not bad, f"{len(bad)} stale probe rows: {bad[:8]}"
