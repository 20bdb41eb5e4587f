"""Deterministic Lloyd's k-means over quantized embeddings.

The reference delegates all vector work to its storage engine; a
training-data pipeline needs clustering for semantic dedup and corpus
diversification (SemDeDup-style: cluster embeddings, keep one
representative per cluster). This is the canonical scalable Lloyd's
shape — the same one Spark MLlib uses — made bit-reproducible so the
DuckDB oracle can verify every iteration:

- vectors are quantized to integer milli-units
  (:func:`..operators.similarity.quantized`), so every distance is exact
  int64 math — no float accumulation order to diverge between engines;
- centroids are DRIVER-side state (k x dims ints, like a FAISS/MLlib
  codebook), closed over by an Arrow-batched pandas UDF: assignment is a
  narrow map over the corpus (one ``X @ C.T`` einsum per batch), ZERO
  shuffle, and scales to any corpus size at constant driver memory;
- the update step is ONE shuffle of (k x dims) partial sums
  (posexplode + map-side combine), then a k*dims-row collect — the only
  driver traffic per iteration;
- new centroid component = trunc(sum / n) in exact integer math
  (matching DuckDB's truncating ``//``; Python's ``//`` floors, which
  differs on negative sums), empty clusters keep their previous
  centroid;
- distance ties break to the smaller centroid id (numpy argmin takes
  the first minimum; the oracle orders by (d2, cid)).

At 100 TB: iters full scans + iters tiny shuffles, centroid state is
k*dims ints broadcast in the task closure — the textbook distributed
k-means cost model. The quantization keeps it deterministic under ANY
partitioning, which float Lloyd's never is (sum order changes the ulp).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import CacheScope, persist_in
from .similarity import with_quantized_norm


def _trunc_div(s: int, n: int) -> int:
    """Truncating integer division for n > 0 (DuckDB ``//`` semantics)."""
    q = abs(s) // n
    return q if s >= 0 else -q


def _assign_struct(qcol, centroids: list[list[int]]):
    """struct(cluster_id int, d2 bigint): nearest centroid by exact
    integer squared-L2, ties to the smaller centroid id. One einsum per
    Arrow batch against the k x dims int64 centroid matrix."""
    C = np.array(centroids, dtype=np.int64)
    cn = np.einsum("ij,ij->i", C, C)

    # built per call: pandas_udf parses its DDL type against the ACTIVE session
    @F.pandas_udf("cluster_id int, d2 bigint")
    def nearest(a: pd.Series) -> pd.DataFrame:
        if len(a) == 0:
            return pd.DataFrame({"cluster_id": pd.Series(dtype="int32"),
                                 "d2": pd.Series(dtype="int64")})
        X = np.vstack(a.to_numpy()).astype(np.int64, copy=False)
        d2 = (
            np.einsum("ij,ij->i", X, X)[:, None]
            - 2 * (X @ C.T)
            + cn[None, :]
        )
        best = np.argmin(d2, axis=1)  # first minimum = smallest cid
        return pd.DataFrame(
            {"cluster_id": best.astype(np.int32), "d2": d2[np.arange(len(best)), best]}
        )

    return nearest(qcol)


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scope: CacheScope | None = None,
    centroids: list[list[int]] | None = None,
) -> tuple[DataFrame, list[list[int]]]:
    """Run `iters` Lloyd's update steps from a deterministic seed (the k
    smallest-id nonzero vectors, ordered by id -> cluster ids 0..k-1).

    Returns (assignments, centroids): assignments has
    (id_col, norm2, cluster_id, d2) against the FINAL centroids;
    centroids is the k x dims integer matrix after the last update.

    ``centroids`` short-circuits the fit: pass an already-fitted codebook
    (k x dims ints — e.g. memoized from an identical earlier fit, which is
    safe because the whole procedure is bit-deterministic) and only the
    final assignment projection is built — zero extra scans.
    """
    qn = persist_in(scope, with_quantized_norm(df, vec_col, id_col))
    if centroids is not None:
        cents = centroids
        s = _assign_struct(F.col("q"), cents)
        assigned = qn.select(
            F.col(id_col),
            F.col("norm2"),
            s.getField("cluster_id").alias("cluster_id"),
            s.getField("d2").alias("d2"),
        )
        return assigned, cents
    init = qn.orderBy(id_col).limit(k).collect()
    if len(init) < k:
        raise ValueError(f"need >= {k} nonzero vectors, got {len(init)}")
    cents = [list(r["q"]) for r in init]
    dims = len(cents[0])
    for _ in range(iters):
        a = qn.select(
            "q", _assign_struct(F.col("q"), cents).getField("cluster_id").alias("cid")
        )
        rows = (
            a.select("cid", F.posexplode("q").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by: dict[int, dict[int, tuple[int, int]]] = {}
        for r in rows:
            by.setdefault(r["cid"], {})[r["pos"]] = (r["s"], r["n"])
        cents = [
            [_trunc_div(*by[cid][p]) for p in range(dims)] if cid in by else cents[cid]
            for cid in range(k)
        ]
    s = _assign_struct(F.col("q"), cents)
    assigned = qn.select(
        F.col(id_col),
        F.col("norm2"),
        s.getField("cluster_id").alias("cluster_id"),
        s.getField("d2").alias("d2"),
    )
    return assigned, cents


def kmeans_centroids_long(spark, cents: list[list[int]]) -> DataFrame:
    """Final centroids in long form (cluster_id, pos, val) — k*dims rows,
    the exact state the oracle's unrolled iteration must reproduce."""
    data = [
        (cid, pos, int(val))
        for cid, vec in enumerate(cents)
        for pos, val in enumerate(vec)
    ]
    return spark.createDataFrame(data, "cluster_id int, pos int, val long")


def kmeans_profile(assigned: DataFrame, cents: list[list[int]]) -> DataFrame:
    """Per-cluster audit: (cluster_id, n_members, min_vec_id,
    centroid_norm2). Centroid norms are driver ints inlined as an array
    literal — no join for k values."""
    id_col = assigned.columns[0]
    norms = F.array(*[F.lit(sum(v * v for v in vec)).cast("long") for vec in cents])
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.min(id_col).alias("min_vec_id"),
        )
        .select(
            "cluster_id",
            "n_members",
            "min_vec_id",
            F.element_at(norms, F.col("cluster_id") + 1).alias("centroid_norm2"),
        )
    )


def kmeans_keepers(assigned: DataFrame) -> DataFrame:
    """SemDeDup representative selection: per cluster keep the member
    nearest its centroid (exact integer d2, ties to the smaller id).
    One min-struct aggregation — no window, no second scan."""
    id_col = assigned.columns[0]
    best = F.min(F.struct("d2", id_col)).alias("b")
    return (
        assigned.groupBy("cluster_id")
        .agg(best)
        .select(
            "cluster_id",
            F.col(f"b.{id_col}").alias("keeper_vec_id"),
            F.col("b.d2").alias("d2"),
        )
    )
