"""anova_value_by_type: one-way ANOVA of value-in-cents across event
types — F/df/eta² must match a direct python computation from the raw
definition on a hand-built fixture (independent of the SQL/DataFrame
expression trees), and the moments must be exact integers (no float
accumulation)."""

from __future__ import annotations

from clickhouse_github_log_importer_spark.plans.queries import REGISTRY


def test_anova_matches_direct_python(spark, tmp_path):
    from tests.test_behavioral import _write_events

    # values chosen so group means clearly differ; cents are exact
    groups = {
        "click": [0.10, 0.20, 0.30, 0.40],
        "error": [0.50, 0.60, 0.70],
        "purchase": [0.90, 0.95, 1.00, 0.85, 0.80],
        "signup": [0.05, 0.15],
        "view": [0.55, 0.45, 0.50],
    }
    rows = []
    eid = 0
    for g, vals in groups.items():
        for v in vals:
            eid += 1
            rows.append((eid, eid * 1000, eid, g, v))
    sf = _write_events(tmp_path, rows)
    got = REGISTRY["anova_value_by_type"].spark(spark, sf).first()

    cents = {g: [round(v * 100) for v in vals] for g, vals in groups.items()}
    n = sum(len(c) for c in cents.values())
    s = sum(sum(c) for c in cents.values())
    ss = sum(x * x for c in cents.values() for x in c)
    grp = sum(sum(c) ** 2 / len(c) for c in cents.values())
    ssb = grp - s * s / n
    ssw = ss - grp
    f = (ssb / 4) / (ssw / (n - 5))
    eta = ssb / (ss - s * s / n)

    assert got["n_groups"] == 5
    assert got["n_total"] == n
    assert got["df_between"] == 4
    assert got["df_within"] == n - 5
    assert abs(got["f_stat"] - round(f, 6)) < 1e-9
    assert abs(got["eta_sq"] - round(eta, 6)) < 1e-9


def test_anova_absent_group_drops_out(spark, tmp_path):
    # r9 (ADVICE fix): a dataset missing one of the five types must not
    # divide by zero — the absent group's S^2/n term guards to 0 and k
    # shrinks, in BOTH engines (oracle checked via compare at the
    # registry gate; here the direct math with k=3)
    from clickhouse_github_log_importer_spark.plans.queries import REGISTRY
    from tests.test_behavioral import _write_events

    groups = {
        "click": [0.10, 0.20, 0.30, 0.40],
        "purchase": [0.90, 0.95, 1.00],
        "view": [0.55, 0.45],
    }
    rows = []
    eid = 0
    for g, vals in groups.items():
        for v in vals:
            eid += 1
            rows.append((eid, eid * 1000, eid, g, v))
    sf = _write_events(tmp_path, rows)
    got = REGISTRY["anova_value_by_type"].spark(spark, sf).first()

    cents = {g: [round(v * 100) for v in vals] for g, vals in groups.items()}
    n = sum(len(c) for c in cents.values())
    s = sum(sum(c) for c in cents.values())
    ss = sum(x * x for c in cents.values() for x in c)
    grp = sum(sum(c) ** 2 / len(c) for c in cents.values())
    k = 3
    f = ((grp - s * s / n) / (k - 1)) / ((ss - grp) / (n - k))

    assert got["n_groups"] == k
    assert got["df_between"] == k - 1
    assert got["df_within"] == n - k
    assert abs(got["f_stat"] - round(f, 6)) < 1e-9
