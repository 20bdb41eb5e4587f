"""Independent-reimplementation pins for the r6 statistics family.

Every statistics query in the registry is oracle-checked against DuckDB —
but both engines could share the same wrong formula. These tests pin each
statistic against a SECOND, independent implementation (pure numpy/pandas
over the raw rows, no histograms, no prefix scans, no pinned-order folds)
on a seeded random events table, so the algebraic reductions the Spark
plans use (rank histograms, exact power sums, doubled Tukey fences,
folded-phase ANOVA, marginal-through-cells entropy) are each verified
against the textbook per-row definition they claim to equal.
"""

from __future__ import annotations

import functools
import math
import operator
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clickhouse_github_log_importer_spark.plans.queries import REGISTRY

SEED = 20260815
N = 3000
N_USERS = 40
TYPES = ["click", "view", "purchase", "signup", "error"]
HOUR0 = 490_000  # epoch hours, far from any tz boundary artifacts
SPAN_HOURS = 500


@pytest.fixture(scope="module")
def stats_sf(tmp_path_factory):
    """Seeded events table with hour-of-day seasonality + value skew."""
    rng = np.random.default_rng(SEED)
    # hour-of-day intensity so entropy/period/ACF have real structure
    hod_weight = 1.0 + 0.8 * np.sin(2 * np.pi * np.arange(24) / 24)
    hours = rng.integers(0, SPAN_HOURS, N)
    hod = (HOUR0 + hours) % 24
    keep_p = hod_weight[hod] / hod_weight.max()
    # resample rejected rows onto fresh hours (keeps N fixed)
    for _ in range(4):
        redo = rng.random(N) > keep_p
        hours[redo] = rng.integers(0, SPAN_HOURS, redo.sum())
        hod = (HOUR0 + hours) % 24
        keep_p = hod_weight[hod] / hod_weight.max()
    off_us = rng.integers(0, 3_600_000_000, N)
    ts_us = (HOUR0 + hours).astype("int64") * 3_600_000_000 + off_us
    cents = rng.lognormal(mean=5.0, sigma=1.2, size=N).astype("int64") + 1
    table = pa.table(
        {
            "event_id": pa.array(np.arange(N), pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, N_USERS, N), pa.int64()),
            "event_type": pa.array(
                [TYPES[i] for i in rng.integers(0, len(TYPES), N)],
                pa.string(),
            ),
            "value": pa.array(cents / 100.0, pa.float64()),
            "props": pa.array(["{}"] * N, pa.string()),
        }
    )
    sf_dir = str(tmp_path_factory.mktemp("stats_sf"))
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    df = pd.DataFrame(
        {
            "event_id": np.arange(N),
            "ts_us": ts_us,
            "hour_id": ts_us // 3_600_000_000,
            "h": (ts_us // 3_600_000_000) % 24,
            "user_id": table["user_id"].to_numpy(),
            "t": table["event_type"].to_pylist(),
            "cents": np.round((cents / 100.0) * 100).astype("int64"),
        }
    )
    return sf_dir, df


def _run(spark, name, sf_dir) -> pd.DataFrame:
    return REGISTRY[name].spark(spark, sf_dir).toPandas()


def _series(df) -> np.ndarray:
    lo, hi = df.hour_id.min(), df.hour_id.max()
    x = np.zeros(int(hi - lo + 1))
    vc = df.hour_id.value_counts()
    x[(vc.index.to_numpy() - lo).astype(int)] = vc.to_numpy()
    return x


def test_spearman_matches_per_row_ranks(spark, stats_sf):
    sf_dir, df = stats_sf
    out = _run(spark, "spearman_value_hour", sf_dir)
    rh = pd.Series(df.h).rank(method="average").to_numpy()
    rv = pd.Series(df.cents).rank(method="average").to_numpy()
    want = np.corrcoef(rh, rv)[0, 1]
    assert out.n.iloc[0] == N
    assert out.spearman_rho.iloc[0] == pytest.approx(want, abs=2e-6)


def test_moments_match_numpy(spark, stats_sf):
    sf_dir, df = stats_sf
    out = _run(spark, "value_moments_by_type", sf_dir).set_index("event_type")
    for t_, g in df.groupby("t"):
        y = g.cents.to_numpy(dtype=float)
        c = y - y.mean()
        m2, m3, m4 = (c**2).mean(), (c**3).mean(), (c**4).mean()
        row = out.loc[t_]
        assert row.n == len(y)
        assert row.var_pop == pytest.approx(m2, rel=1e-9)
        assert row.skew_pop == pytest.approx(m3 / m2**1.5, abs=2e-6)
        assert row.kurt_pop == pytest.approx(m4 / m2**2, abs=2e-6)


def test_regression_matches_numpy(spark, stats_sf):
    sf_dir, df = stats_sf
    out = _run(spark, "value_hour_regression", sf_dir).set_index("event_type")
    for t_, g in df.groupby("t"):
        x, y = g.h.to_numpy(dtype=float), g.cents.to_numpy(dtype=float)
        sl = ((x * y).mean() - x.mean() * y.mean()) / (
            (x * x).mean() - x.mean() ** 2
        )
        ic = y.mean() - sl * x.mean()
        row = out.loc[t_]
        assert row.slope_cents_per_hour == pytest.approx(sl, abs=2e-6)
        assert row.intercept_cents == pytest.approx(ic, abs=2e-5)


def test_entropy_matches_numpy(spark, stats_sf):
    sf_dir, df = stats_sf
    out = _run(spark, "hour_entropy_by_type", sf_dir).set_index("event_type")
    for t_, g in df.groupby("t"):
        p = g.h.value_counts(normalize=True).to_numpy()
        want = -(p * np.log(p)).sum()
        assert out.loc[t_].entropy_nats == pytest.approx(want, abs=2e-6)
        assert out.loc[t_].entropy_bits == pytest.approx(
            want / math.log(2), abs=2e-6
        )


def test_autocorrelation_matches_numpy(spark, stats_sf):
    sf_dir, df = stats_sf
    out = _run(spark, "hourly_autocorrelation", sf_dir).set_index("lag")
    x = _series(df)
    c = x - x.mean()
    den = (c**2).sum()
    for k in (1, 2, 3):
        want = (c[:-k] * c[k:]).sum() / den
        assert out.loc[k].n_hours == len(x)
        assert out.loc[k].acf == pytest.approx(want, abs=2e-6)


def test_tukey_outliers_match_bruteforce(spark, stats_sf):
    sf_dir, df = stats_sf
    out = _run(spark, "hourly_outliers_tukey", sf_dir)
    x = _series(df)
    s = np.sort(x)
    n = len(s)
    q1, q3 = s[(n - 1) // 4], s[3 * (n - 1) // 4]
    lo_f, hi_f = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    lo_hours = {
        int(df.hour_id.min() + i)
        for i, v in enumerate(x)
        if v < lo_f
    }
    hi_hours = {
        int(df.hour_id.min() + i)
        for i, v in enumerate(x)
        if v > hi_f
    }
    got_lo = set(out[out.side == "low"].hour_id)
    got_hi = set(out[out.side == "high"].hour_id)
    assert got_lo == lo_hours and got_hi == hi_hours
    assert (out.q1 == q1).all() and (out.q3 == q3).all()


def test_period_strength_matches_anova(spark, stats_sf):
    sf_dir, df = stats_sf
    out = _run(spark, "hourly_period_strength", sf_dir).set_index(
        "period_hours"
    )
    x = _series(df)
    xb = x.mean()
    sst = ((x - xb) ** 2).sum()
    strengths = {}
    for p in (6, 12, 24, 168):
        ph = np.arange(len(x)) % p
        ssb = sum(
            (ph == i).sum() * (x[ph == i].mean() - xb) ** 2
            for i in range(p)
        )
        strengths[p] = ssb / sst
        assert out.loc[p].strength == pytest.approx(ssb / sst, abs=2e-6)
    peak = max(strengths, key=lambda p: round(strengths[p], 6))
    assert bool(out.loc[peak].is_peak)
    # the injected seasonality is daily: 24 must beat 6 and 12
    assert strengths[24] > strengths[12] and strengths[24] > strengths[6]


def test_association_suite_matches_contingency(spark, stats_sf):
    sf_dir, df = stats_sf
    out = _run(spark, "categorical_association_suite", sf_dir).iloc[0]
    band = df.h // 6
    ct = pd.crosstab(df.t, band)
    o = ct.to_numpy(dtype=float)
    n = o.sum()
    r = o.sum(1, keepdims=True)
    c = o.sum(0, keepdims=True)
    e = r @ c / n
    chi2 = ((o - e) ** 2 / e).sum()
    nr, nc = o.shape
    assert out.n == N and out.n_rows == nr and out.n_cols == nc
    assert out.contingency_coeff == pytest.approx(
        math.sqrt(chi2 / (chi2 + n)), abs=2e-6
    )
    phi2c = max(0.0, chi2 / n - (nr - 1) * (nc - 1) / (n - 1))
    rc = nr - (nr - 1) ** 2 / (n - 1)
    cc = nc - (nc - 1) ** 2 / (n - 1)
    assert out.cramers_v_bc == pytest.approx(
        math.sqrt(phi2c / min(rc - 1, cc - 1)), abs=2e-6
    )
    pr, pc, pj = (r / n).ravel(), (c / n).ravel(), (o / n).ravel()
    hx = -(pr * np.log(pr)).sum()
    hy = -(pc * np.log(pc)).sum()
    pj = pj[pj > 0]
    hxy = -(pj * np.log(pj)).sum()
    assert out.theils_u == pytest.approx((hx + hy - hxy) / hx, abs=2e-6)


def test_ks_matches_per_row_ecdf(spark, stats_sf):
    sf_dir, df = stats_sf
    out = _run(spark, "kolmogorov_smirnov_values", sf_dir).iloc[0]
    a = np.sort(df[df.t == "click"].cents.to_numpy())
    b = np.sort(df[df.t == "view"].cents.to_numpy())
    grid = np.union1d(a, b)
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    d = np.abs(fa - fb).max()
    assert out.n_click == len(a) and out.n_view == len(b)
    assert out.d_stat == pytest.approx(d, abs=2e-6)
    assert out.ks_stat == pytest.approx(
        math.sqrt(len(a) * len(b) / (len(a) + len(b))) * d, abs=2e-6
    )


def test_bitwise_masks_match_reduce(spark, stats_sf):
    sf_dir, df = stats_sf
    out = _run(spark, "bitwise_user_masks", sf_dir).set_index("event_type")
    for t_, g in df.groupby("t"):
        ids = [int(u) for u in g.user_id]
        row = out.loc[t_]
        assert row.users_bit_and == functools.reduce(operator.and_, ids)
        assert row.users_bit_or == functools.reduce(operator.or_, ids)
        assert row.users_bit_xor == functools.reduce(operator.xor, ids)


def test_multiple_regression_matches_lstsq(spark, stats_sf):
    sf_dir, df = stats_sf
    out = _run(spark, "value_multiple_regression", sf_dir).set_index(
        "event_type"
    )
    dow = (df.ts_us // 86_400_000_000) % 7
    for t_, g in df.assign(dow=dow).groupby("t"):
        X = np.column_stack([np.ones(len(g)), g.h, g.dow])
        y = g.cents.to_numpy(dtype=float)
        b, *_ = np.linalg.lstsq(X, y, rcond=None)
        pred = X @ b
        r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
        row = out.loc[t_]
        assert row.intercept_cents == pytest.approx(b[0], abs=2e-3)
        assert row.hour_coef == pytest.approx(b[1], abs=2e-5)
        assert row.dow_coef == pytest.approx(b[2], abs=2e-5)
        assert row.r2 == pytest.approx(r2, abs=2e-6)


def test_sequence_next_node_matches_pandas(spark, stats_sf):
    sf_dir, df = stats_sf
    out = _run(spark, "sequence_next_node", sf_dir).set_index(
        "next_event_type"
    )["n_users"]
    want: dict[str, int] = {}
    srt = df.sort_values(["user_id", "ts_us", "event_id"])
    for _, g in srt.groupby("user_id"):
        rows = g.reset_index(drop=True)
        clicks = rows.index[rows.t == "click"]
        if len(clicks) == 0 or clicks[0] + 1 >= len(rows):
            continue
        nxt = rows.t.iloc[clicks[0] + 1]
        want[nxt] = want.get(nxt, 0) + 1
    assert dict(out) == want


def test_auc_matches_per_row_ranks(spark, stats_sf):
    # score_auc's histogram-rank reduction vs the textbook midrank
    # formula on raw rows (the same identity sklearn's roc_auc_score
    # implements): AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos*n_neg)
    # with average ranks for ties. Gini = 2*AUC - 1.
    sf_dir, df = stats_sf
    out = _run(spark, "score_auc", sf_dir)
    y = (df.t == "purchase").to_numpy()
    r = pd.Series(df.cents).rank(method="average").to_numpy()
    n_pos, n_neg = int(y.sum()), int((~y).sum())
    want = (r[y].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert (int(out.n_pos.iloc[0]), int(out.n_neg.iloc[0])) == (n_pos, n_neg)
    assert out.auc.iloc[0] == pytest.approx(want, abs=2e-6)
    assert out.gini.iloc[0] == pytest.approx(2 * want - 1, abs=4e-6)


def test_calibration_depths_and_rates(spark, stats_sf):
    # equi-depth contract on the calibration curve: bucket depths are
    # within one tie-group of N/B, totals conserve, and per-bucket
    # rates/means match a brute-force per-row recomputation over the
    # same integer-rank bucket assignment
    sf_dir, df = stats_sf
    out = _run(spark, "score_calibration_curve", sf_dir).set_index("bucket")
    assert int(out.n_events.sum()) == N
    assert int(out.n_pos.sum()) == int((df.t == "purchase").sum())
    d = pd.DataFrame({"v": df.cents, "pos": (df.t == "purchase")})
    g = d.groupby("v").agg(m=("v", "size"), np=("pos", "sum")).sort_index()
    g["before"] = g.m.cumsum() - g.m
    g["bucket"] = (g.before * 10) // N
    want = g.groupby("bucket").agg(
        n=("m", "sum"), npos=("np", "sum"),
        sv=("m", lambda s: (s.index.to_numpy() * s.to_numpy()).sum()),
    )
    for b, row in want.iterrows():
        o = out.loc[b]
        assert int(o.n_events) == int(row.n)
        assert int(o.n_pos) == int(row.npos)
        assert o.pos_rate == pytest.approx(row.npos / row.n, abs=1e-4)
        assert o.mean_score_cents == pytest.approx(
            row.sv / row.n, abs=5e-3
        )
