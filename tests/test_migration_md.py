"""MIGRATION.md completeness gate: a reference user migrating
dashboards needs every registry entry in the switch-over table; a new
@register without a MIGRATION.md mention fails here."""

from __future__ import annotations

from pathlib import Path

from clickhouse_github_log_importer_spark.plans.queries import REGISTRY

MD = Path(__file__).resolve().parents[1] / "MIGRATION.md"


def test_every_registry_entry_is_in_migration_md():
    text = MD.read_text()
    missing = [n for n in REGISTRY if f"`{n}`" not in text]
    assert not missing, f"MIGRATION.md missing {len(missing)}: {missing}"


def test_funnel_library_form_documented():
    text = MD.read_text()
    assert "operators.sessions.window_funnel" in text
    assert "mode='strict_dedup'" in text
