"""zipf_fit_words must be the actual least-squares fit (numpy pin) and
funnel_time_to_convert must match a brute-force per-user replay."""

from __future__ import annotations

import numpy as np

from clickhouse_github_log_importer_spark.plans.queries import REGISTRY, t

SF = "/root/testdata/sf0.001"


def test_zipf_matches_numpy_lstsq(spark):
    import duckdb

    con = duckdb.connect()
    wc = con.execute(
        f"""
        SELECT word, COUNT(*) c FROM (
          SELECT unnest(list_filter(string_split(text,' '), x -> x <> '')) AS word
          FROM '{SF}/documents.parquet')
        GROUP BY 1 ORDER BY c DESC, word ASC LIMIT 1000
        """
    ).fetchall()
    x = np.log(np.arange(1, len(wc) + 1, dtype=float))
    y = np.log(np.array([c for _, c in wc], dtype=float))
    A = np.vstack([x, np.ones_like(x)]).T
    (slope, intercept), res, *_ = np.linalg.lstsq(A, y, rcond=None)
    r2 = 1 - res[0] / ((y - y.mean()) ** 2).sum()

    [row] = REGISTRY["zipf_fit_words"].spark(spark, SF).collect()
    assert row["n_words"] == len(wc)
    assert abs(row["zipf_slope"] - slope) < 1e-5
    assert abs(row["intercept"] - intercept) < 1e-5
    assert abs(row["r_squared"] - r2) < 1e-5
    # corpus sanity: a frequency-ranked vocabulary decays
    assert row["zipf_slope"] < 0


def test_zipf_global_rank_window_input_is_bounded(spark):
    """Plan gate (r10): the unpartitioned rank window must read the
    bucketed pre-top-K, never the raw vocabulary — the physical plan
    carries TWO row_number windows with a rank filter between them, so
    the single-task global sort is <= B * ZIPF_TOP rows by construction
    on any corpus."""
    df = REGISTRY["zipf_fit_words"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("row_number()") >= 2, plan
    # the per-bucket prefilter sits between the two windows
    assert "_pr" in plan and "_b" in plan, plan


def test_funnel_latency_matches_bruteforce(spark):
    rows = (
        t(spark, SF, "events")
        .select("user_id", "ts_us", "event_type")
        .collect()
    )
    s: dict[int, int] = {}
    for r in rows:
        if r["event_type"] == "signup":
            s[r["user_id"]] = min(s.get(r["user_id"], r["ts_us"]), r["ts_us"])
    p: dict[int, int] = {}
    for r in rows:
        u = r["user_id"]
        if r["event_type"] == "purchase" and u in s and r["ts_us"] > s[u]:
            p[u] = min(p.get(u, r["ts_us"]), r["ts_us"])
    lats = sorted((p[u] - s[u]) // 1_000_000 for u in p)

    def q(level: float) -> float:
        # linear interpolation, the percentile()/quantile_cont contract
        k = (len(lats) - 1) * level
        lo, hi = int(np.floor(k)), int(np.ceil(k))
        return lats[lo] + (k - lo) * (lats[hi] - lats[lo])

    [row] = REGISTRY["funnel_time_to_convert"].spark(spark, SF).collect()
    assert row["n_signup_users"] == len(s)
    assert row["n_converted"] == len(lats)
    assert row["conversion_rate"] == round(len(lats) / len(s), 6)
    for col, level in (("p50_sec", 0.5), ("p90_sec", 0.9), ("p99_sec", 0.99)):
        assert abs(row[col] - q(level)) < 1e-3, col
