"""Distributed PCA over embedding columns (Gram pass + unrolled power
iteration) — the dimensionality-reduction step a training-data pipeline
runs before ANN indexing / semantic dedup (whitening, compaction), and
the engine analog of the reference's delegate-everything-to-the-store
posture for vector math (the log-importer keeps embeddings opaque; this
engine makes them first-class).

Design, engine-portable by construction (the IRLS / kmeans discipline):

1. **Exact integer moment pass.** Embeddings quantize to
   round(x*1000)::BIGINT (the repo-wide convention,
   operators.similarity.quantized), and ONE batched numpy kernel
   (mapInPandas, Arrow) accumulates per-batch d-dim sums and the d x d
   integer Gram; a groupBy over (i, j) cells — d(d+1)/2 rows total,
   control-plane-sized — merges batches. The scaled covariance cell
   ``cov = N * S_ij - S_i * S_j`` is an exact BIGINT, so the oracle
   hashes bit-identically (no float merge-order drift). Range: safe to
   ~1e16 rows at |x| <= 3 before int64 overflow — document, don't hide.
2. **Unrolled power iteration, both engines.** Eigenvectors are not
   SQL-expressible in closed form, but a FIXED number of power-method
   steps from a FIXED start vector is just arithmetic: both engines run
   the SAME 8 unrolled iterations (matrix-vector product, L2 normalize)
   on the real covariance ``cov / (N^2 * 1e6)``, then a Rayleigh
   quotient for the eigenvalue; top-k components come from Hotelling
   deflation (C <- C - lambda v v^T), same unrolling. Outputs round to
   6 dp — double sum-order noise is ~1e-12, convergence is NOT assumed
   (both engines compute the same iterate, converged or not; pytest
   separately checks closeness to numpy's eigh on the fixture).
3. **Projection** is a per-row dot product against driver-inlined
   component literals (the IVF-codebook pattern) — a projection, no
   shuffle; sequential-fold form for oracle bit-parity (see
   :func:`pca_project`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PCA_ITERS = 8
PCA_QUANT = 1000.0


def covariance_cells(emb: DataFrame, dims: int) -> DataFrame:
    """Upper-triangle scaled covariance of the quantized embedding
    column: rows (i, j, n, cov) with 1-based i <= j and
    ``cov = N * sum(q_i q_j) - sum(q_i) * sum(q_j)`` (exact BIGINT;
    real covariance = cov / N^2 / 1e6).

    One Arrow-batched numpy kernel per partition batch emits the
    d(d+1)/2 upper-triangle cells of its batch Gram plus the batch
    sums; the groupBy merge is over O(d^2) keys regardless of row
    count — the classic tree-reduce moment pass."""
    import numpy as np
    import pandas as pd

    from .similarity import quantized

    iu = None  # built lazily inside the kernel (numpy not on driver path)

    def gram_batches(it):
        nonlocal iu
        for pdf in it:
            if len(pdf) == 0:
                continue
            # quantization happened JVM-side (similarity.quantized — the
            # repo-wide half-away F.round rule, matching the oracle's
            # round(x,0)); the kernel sees exact int64 milli-units
            q = np.vstack(
                [np.asarray(v, dtype=np.int64) for v in pdf["q"]]
            )
            if q.shape[1] != dims:
                raise ValueError(
                    f"embedding dim {q.shape[1]} != declared {dims}"
                )
            g = q.T @ q  # d x d int64; |q|<=~3e3 -> safe for huge batches
            s = q.sum(axis=0)
            if iu is None:
                iu = np.triu_indices(dims)
            yield pd.DataFrame(
                {
                    "i": iu[0] + 1,
                    "j": iu[1] + 1,
                    "n_rows": np.int64(len(pdf)),
                    "s_ij": g[iu],
                    "s_i": s[iu[0]],
                    "s_j": s[iu[1]],
                }
            )

    cells = emb.select(quantized("embedding").alias("q")).mapInPandas(
        gram_batches,
        "i int, j int, n_rows long, s_ij long, s_i long, s_j long",
    )
    # the batch sums s_i/s_j repeat per cell row so the merge needs no
    # second pass: everything is one map-side-combinable groupBy
    agg = cells.groupBy("i", "j").agg(
        F.sum("n_rows").alias("n"),
        F.sum("s_ij").alias("s_ij"),
        F.sum("s_i").alias("s_i"),
        F.sum("s_j").alias("s_j"),
    )
    return agg.select(
        "i",
        "j",
        F.col("n").cast("long").alias("n"),
        (
            F.col("n") * F.col("s_ij") - F.col("s_i") * F.col("s_j")
        ).cast("long").alias("cov"),
    )


def power_components(cov_rows, dims: int, k: int = 3):
    """Driver-side unrolled power iteration with Hotelling deflation on
    collected covariance cells — ``cov_rows`` is the (i, j, n, cov)
    collect() of :func:`covariance_cells` (d(d+1)/2 values: control-
    plane-sized, the IVF-codebook precedent). Returns
    (components, eigenvalues): ``components[c][i]`` after exactly
    ``PCA_ITERS`` normalized steps from the all-ones start vector —
    NOT necessarily converged, but the SQL oracle runs the identical
    unrolling, so the comparison is exact by construction."""
    import numpy as np

    n = int(cov_rows[0]["n"])
    c = np.zeros((dims, dims), dtype=np.float64)
    for r in cov_rows:
        v = float(r["cov"]) / (float(n) * float(n)) / (PCA_QUANT ** 2)
        c[r["i"] - 1, r["j"] - 1] = v
        c[r["j"] - 1, r["i"] - 1] = v
    comps, lams = [], []
    for _ in range(k):
        v = np.ones(dims, dtype=np.float64) / np.sqrt(float(dims))
        for _ in range(PCA_ITERS):
            w = c @ v
            v = w / np.sqrt(float(w @ w))
        lam = float(v @ (c @ v))
        comps.append(v.copy())
        lams.append(lam)
        c = c - lam * np.outer(v, v)
    return comps, lams


def pca_project(
    emb: DataFrame, components, emb_col: str = "embedding"
) -> DataFrame:
    """Append ``pca`` (array<double>, one value per component): the
    embedding's dot product with each driver-inlined component literal.
    No shuffle, no Python workers. The fold is a LEFT-TO-RIGHT
    F.aggregate over zip_with — an interpreted HOF (CodegenFallback),
    chosen deliberately because sequential accumulation matches the
    oracle's SUM(... ORDER BY dim) double tree term-for-term; when
    throughput outranks bit-parity, swap in a batched einsum kernel
    (the similarity._dot_pairs precedent)."""
    proj = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col(emb_col),
                    F.array(*[F.lit(float(x)) for x in comp]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for comp in components
        ]
    )
    return emb.withColumn("pca", proj)
