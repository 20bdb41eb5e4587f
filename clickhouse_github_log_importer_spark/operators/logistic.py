"""Distributed logistic regression via IRLS (iteratively reweighted
least squares) — the Spark-first analog of ClickHouse's
stochasticLogisticRegression aggregate (reference semantics: fit a
binary classifier inside the engine; AggregateFunctionMLMethod.h).

Why IRLS and not SGD: ClickHouse's SGD state is update-order-dependent
(merge order changes the fit), which is exactly the nondeterminism this
repo pins away. IRLS is Newton's method on the log-likelihood: each
iteration needs only the Gram moments X'WX (6 sums — symmetric 3x3) and
X'Wz (3 sums), ALL map-side-combinable plain aggregates over one
projection of the fact table — no shuffle wider than the 9-number
partial merge, no per-row Python, no instance ever leaves the
executors. The driver solves the 3x3 normal equations in closed form
(cofactors) between passes; iteration count is fixed (deterministic),
so the whole fit is ITERS sequential scans, each embarrassingly
parallel — the same execution contract as the integer Lloyd's k-means
in operators/clustering.py.

Float portability: betas are NOT quantized between iterations (a
round() between engines can itself diverge by an ulp); instead the
final coefficients round at 6 dp, and the drift analysis holds because
each iteration's sums agree across engines to ~1e-12 relative (order-
only differences), so three Newton steps keep betas within ~1e-10 —
far inside the 6 dp rounding bucket. The DuckDB oracle re-derives every
iteration via unrolled CTEs with the identical expression trees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ITERS = 3
FEATURES = ("intercept", "hour_norm", "value_norm")


def _solve3(s, t):
    """Closed-form solve of the symmetric 3x3 system A beta = t with
    A = [[s00,s01,s02],[s01,s11,s12],[s02,s12,s22]] via cofactors —
    the same literal formula the SQL oracle unrolls, so both engines
    share one expression tree."""
    s00, s01, s02, s11, s12, s22 = s
    c00 = s11 * s22 - s12 * s12
    c01 = s02 * s12 - s01 * s22
    c02 = s01 * s12 - s02 * s11
    c11 = s00 * s22 - s02 * s02
    c12 = s02 * s01 - s00 * s12
    c22 = s00 * s11 - s01 * s01
    det = s00 * c00 + s01 * c01 + s02 * c02
    t0, t1, t2 = t
    return (
        (c00 * t0 + c01 * t1 + c02 * t2) / det,
        (c01 * t0 + c11 * t1 + c12 * t2) / det,
        (c02 * t0 + c12 * t1 + c22 * t2) / det,
    )


#: |u| clamp before the sigmoid: at |u| >= ~38, p saturates to exactly
#: 1.0 (or 0.0) in doubles, so w = p*(1-p) hits 0 — Spark's non-ANSI
#: z = (y-p)/w silently NULLs rows out of the moments while DuckDB
#: produces inf, and the deviance ln(1-p) RAISES in DuckDB (the repo's
#: pinned ln(0) gotcha). Clamping at +-30 keeps every expression finite
#: and IDENTICAL in both engines (p within [9.4e-14, 1 - 9.4e-14]);
#: the oracle applies the same greatest/least tree.
U_CLAMP = 30.0


def _u(beta):
    b0, b1, b2 = beta
    raw = F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2")
    return F.greatest(F.lit(-U_CLAMP), F.least(F.lit(U_CLAMP), raw))


def _moments(ev: DataFrame, beta):
    """One IRLS pass: the 9 Gram/response moments under the current
    beta, as a single map-side-combinable aggregation."""
    u = _u(beta)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-u))
    w = p * (F.lit(1.0) - p)
    z = u + (F.col("y") - p) / w
    x1, x2 = F.col("x1"), F.col("x2")
    row = ev.agg(
        F.sum(w).alias("s00"),
        F.sum(w * x1).alias("s01"),
        F.sum(w * x2).alias("s02"),
        F.sum(w * x1 * x1).alias("s11"),
        F.sum(w * x1 * x2).alias("s12"),
        F.sum(w * x2 * x2).alias("s22"),
        F.sum(w * z).alias("t0"),
        F.sum(w * x1 * z).alias("t1"),
        F.sum(w * x2 * z).alias("t2"),
    ).collect()[0]
    return (
        (row.s00, row.s01, row.s02, row.s11, row.s12, row.s22),
        (row.t0, row.t1, row.t2),
    )


def irls_fit(ev: DataFrame, iters: int = ITERS):
    """Fit logit(P(y=1)) = b0 + b1*x1 + b2*x2 over a frame with columns
    (x1, x2, y double). Returns (betas, deviance, n_pos_pred): final
    raw coefficients, residual deviance -2*loglik, and the count of
    instances predicted positive at the 0.5 threshold (u > 0)."""
    beta = (0.0, 0.0, 0.0)
    for _ in range(iters):
        s, t_vec = _moments(ev, beta)
        beta = _solve3(s, t_vec)
    u = _u(beta)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-u))
    stats = ev.agg(
        F.sum(
            F.lit(-2.0)
            * (
                F.col("y") * F.log(p)
                + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p)
            )
        ).alias("deviance"),
        F.sum(F.when(u > 0, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_pos_pred"),
    ).collect()[0]
    return beta, stats.deviance, stats.n_pos_pred


def fit_result_long(spark, beta, deviance, n_pos_pred) -> DataFrame:
    """Long-form (term, coef) frame of a finished fit, coefficients and
    deviance rounded 6 dp — the engine-portable output shape."""
    rows = [
        (FEATURES[0], round(beta[0], 6)),
        (FEATURES[1], round(beta[1], 6)),
        (FEATURES[2], round(beta[2], 6)),
        ("deviance", round(deviance, 6)),
        ("n_pos_pred", float(n_pos_pred)),
    ]
    return spark.createDataFrame(rows, "term string, coef double")
