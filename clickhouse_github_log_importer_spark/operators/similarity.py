"""Similarity search over embedding columns (array<float>).

Two paths:

- :func:`cosine_topk` — brute-force exact top-k: every (query, corpus)
  pair scored. Correctness baseline and perfectly fine when |queries| is
  small (the corpus side streams; the query side broadcasts).
- :func:`lsh_buckets` / :func:`lsh_topk` — random-hyperplane LSH: sign
  sketch of the embedding -> bucket; candidates share a bucket. This is
  the 100 TB path: bucketing is a narrow per-row map, and the search join
  touches only same-bucket pairs (shuffle keys are uniform bucket ids).

Determinism: embeddings are quantized to integer milli-units before any
arithmetic (round(x*1000)), so dot products and norms are exact integer
math; the final cosine is one IEEE-exact division+sqrt — bit-identical
on any engine. Hyperplanes are pseudo-random +-1 vectors derived from
md5 (functions.hashing family) so every engine derives the same planes.

Scoring is Arrow-batched numpy, NOT column expressions: Spark evaluates
``aggregate``/``zip_with`` lambdas as CodegenFallback — interpreted per
array element — so a dot product written as a higher-order function
costs d interpreted ops per row (and the 8-plane LSH sketch costs 8*d).
One int64 matmul per Arrow batch does the same exact integer math
vectorized; measured ~6 s -> sub-second on a 2k-vector corpus for the
IVF probe, and the LSH/pair-scoring paths have identical shape. The
quantization step itself stays a column expression (one pass per row,
and Spark's HALF_UP rounding must be preserved bit-exactly).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .cache import CacheScope, persist_in

LSH_PLANES = 8
QUANT_SCALE = 1000


def plane_weights(planes: int, dims: int) -> list[list[int]]:
    """Deterministic +-1 hyperplanes: sign of bit 0 of md5(f"{j}_{i}").

    Same derivation as functions.hashing's md5 family; tiny (planes x
    dims) and derived identically driver-side (for the SQL oracle) and
    executor-side (inside the bucket UDF, from the batch's actual
    vector width) — no data scan needed to learn `dims`.
    """
    out = []
    for j in range(planes):
        row = []
        for i in range(dims):
            h = hashlib.md5(f"plane:{j}_{i}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) % 2 == 0 else -1)
        out.append(row)
    return out


#: executor-side memo: (planes, dims) -> (dims x planes) int64 matrix
_PLANE_MATRIX_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _plane_matrix(planes: int, dims: int) -> np.ndarray:
    key = (planes, dims)
    if key not in _PLANE_MATRIX_CACHE:
        _PLANE_MATRIX_CACHE[key] = np.array(
            plane_weights(planes, dims), dtype=np.int64
        ).T
    return _PLANE_MATRIX_CACHE[key]


def quantized(col: Column | str) -> Column:
    """array<float> -> exact integer milli-units (array<long>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.round(x.cast("double") * QUANT_SCALE, 0).cast("long"))


def _dot(a: Column, b: Column) -> Column:
    """Higher-order-function dot product. Interpreted (CodegenFallback);
    kept ONLY for the one-pass-per-row norm in :func:`with_quantized_norm`
    — never use it in per-pair scoring (see `_dot_pairs`)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _dot_pairs(acol: Column, bcol: Column) -> Column:
    """Row-wise exact int64 dot of two array<bigint> columns, one einsum
    per Arrow batch. Bit-identical to the HOF form (pure integer math).
    (The UDF is built per call: pandas_udf parses its DDL return type
    against the ACTIVE session, so module-import-time creation would
    require a SparkContext before any session exists.)"""

    @F.pandas_udf("bigint")
    def dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="int64")
        am = np.vstack(a.to_numpy()).astype(np.int64, copy=False)
        bm = np.vstack(b.to_numpy()).astype(np.int64, copy=False)
        return pd.Series(np.einsum("ij,ij->i", am, bm))

    return dot(acol, bcol)


def _cosine(qq: Column, cq: Column, qn: Column, cn: Column) -> Column:
    """Exact cosine from quantized vectors + precomputed integer norms."""
    return _dot_pairs(qq, cq).cast("double") / (
        F.sqrt(qn.cast("double")) * F.sqrt(cn.cast("double"))
    )


def with_quantized_norm(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, q: array<long>, norm2: long) — the reusable scoring input."""
    q = quantized(vec_col)
    return df.select(
        F.col(id_col), q.alias("q"), _dot(q, q).alias("norm2")
    ).filter(F.col("norm2") > 0)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (brute force baseline).

    Output: (query_id, neighbor_id, cos_sim, rank). The query side is
    broadcast; the corpus is scanned once; ranking is a per-query window
    over the scored pairs (k small => TakeOrdered-ish cost).
    """
    c = with_quantized_norm(corpus, vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("q").alias("cq"),
        F.col("norm2").alias("cn"),
    )
    # the query side is broadcast by contract (small): coalesce to one
    # partition so its quantize/sketch Arrow stage is one task, not
    # |input partitions| near-empty Python-worker tasks
    qd = with_quantized_norm(queries.coalesce(1), vec_col, id_col).select(
        F.col(id_col).alias("query_id"),
        F.col("q").alias("qq"),
        F.col("norm2").alias("qn"),
    )
    scored = (
        c.join(F.broadcast(qd), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("qq"), F.col("cq"), F.col("qn"), F.col("cn")).alias(
                "cos_exact"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_exact"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_exact", 6).alias("cos_sim"),
            "rank",
        )
    )


def bucket_col(qcol: Column, planes: int = LSH_PLANES) -> Column:
    """Sign-sketch bucket id from a quantized vector column.

    One (batch x dims) @ (dims x planes) int64 matmul per Arrow batch,
    then a packbits over the sign row — the plane matrix is derived
    inside the UDF from the batch's vector width (deterministic md5, so
    every executor and the SQL oracle agree) and memoized per executor.
    """
    pows = (1 << np.arange(planes)).astype(np.int64)

    @F.pandas_udf("bigint")
    def bucket(q: pd.Series) -> pd.Series:
        if len(q) == 0:
            return pd.Series([], dtype="int64")
        qm = np.vstack(q.to_numpy()).astype(np.int64, copy=False)
        proj = qm @ _plane_matrix(planes, qm.shape[1])
        return pd.Series(((proj >= 0) * pows[None, :]).sum(axis=1))

    return bucket(qcol)


def lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = LSH_PLANES,
    dims: int | None = None,
) -> DataFrame:
    """(id, bucket) under the deterministic hyperplane sketch.

    `dims` is accepted for API compatibility but unused: the bucket UDF
    reads the vector width off each Arrow batch, so no driver-side
    ``first()`` scan is spent learning it.
    """
    qn = with_quantized_norm(df, vec_col, id_col)
    return qn.select(F.col(id_col), bucket_col(F.col("q"), planes).alias("bucket"))


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = LSH_PLANES,
    dims: int | None = None,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-restricted.

    (id_a, id_b, cos_sim) for same-bucket pairs with cosine >= threshold.
    The bucket equality join is the scale path (never all-pairs); exact
    integer-quantized cosine only on bucket-mates. Sign-sketch buckets
    collapse near-identical vectors with high probability, so recall for
    true near-dups (cos ~ 1) is excellent; lower `planes` to trade cost
    for recall at looser thresholds.

    The bucketed frame is persisted — the self-join would otherwise run
    the quantize+sketch pipeline once per side (~2x measured on the
    MinHash analog). Pass a :class:`CacheScope` to control unpersist.
    """
    qn = with_quantized_norm(df, vec_col, id_col)
    qb = persist_in(
        scope,
        qn.select(
            F.col(id_col), "q", "norm2", bucket_col(F.col("q"), planes).alias("bucket")
        ),
    )
    a, b = qb.alias("a"), qb.alias("b")
    cos = _cosine(F.col("a.q"), F.col("b.q"), F.col("a.norm2"), F.col("b.norm2"))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cos.alias("cos_exact"),
        )
        .filter(F.col("cos_exact") >= threshold)
        .select("id_a", "id_b", F.round("cos_exact", 6).alias("cos_sim"))
    )


def ivf_codebook(
    df: DataFrame,
    n_lists: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[int], int]]:
    """IVF coarse codebook: the `n_lists` smallest-id NONZERO vectors,
    collected driver-side as (centroid_id, quantized_vec, norm2).

    The codebook is deliberately driver-side state (like a FAISS IVF
    quantizer): n_lists x dims integers, inlined as literals so that list
    assignment is a pure projection — zero shuffle over the corpus. The
    smallest-id selection is a deterministic stand-in for an offline
    k-means; swap the selection, keep the plumbing.

    Zero-norm vectors are filtered BEFORE the smallest-id cut (matching
    the SQL oracle): a zero embedding among the n_lists smallest ids
    must not shrink or shift the codebook. Quantize-then-TakeOrdered is
    a narrow projection + per-partition heap — no shuffle, no second
    scan.
    """
    qn = with_quantized_norm(df, vec_col, id_col)  # filters norm2 > 0
    rows = qn.orderBy(F.col(id_col)).limit(n_lists).collect()
    return [(r[0], list(r["q"]), r["norm2"]) for r in rows]


def _probe_lists(
    qcol: Column, norm2col: Column, codebook: list[tuple[int, list[int], int]], nprobe: int
) -> Column:
    """Top-`nprobe` centroid ids by exact cosine (ties -> smaller id),
    as an array<long>.

    Arrow-batched numpy: one (batch x dims) @ (dims x k) int64 matmul
    per Arrow batch (see module docstring for why not column
    expressions). cos = int dot / (sqrt * sqrt) in float64 —
    bit-identical to the SQL oracle; ties take the smaller centroid id
    via stable argsort over the id-ordered codebook.
    """
    cmat_t = np.array([cq for _, cq, _ in codebook], dtype=np.int64).T  # (d, k)
    csqrt = np.sqrt(np.array([cn for _, _, cn in codebook], dtype=np.float64))
    cids = np.array([cid for cid, _, _ in codebook], dtype=np.int64)
    assert list(cids) == sorted(cids), "codebook must be id-ordered for tie-breaks"

    @F.pandas_udf("array<bigint>")
    def probes(q: pd.Series, norm2: pd.Series) -> pd.Series:
        if len(q) == 0:
            return pd.Series([], dtype=object)
        qm = np.vstack(q.to_numpy())  # (n, d) int64 — exact
        dots = qm @ cmat_t  # (n, k) int64 — exact
        cos = dots.astype(np.float64) / (
            np.sqrt(norm2.to_numpy().astype(np.float64))[:, None] * csqrt[None, :]
        )
        # stable sort on -cos: equal-cos ties keep codebook (ascending id) order
        idx = np.argsort(-cos, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(cids[idx]))

    return probes(qcol, norm2col.cast("long"))


def ivf_assign(
    df: DataFrame,
    codebook: list[tuple[int, list[int], int]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, list_id): nearest-centroid assignment as a narrow projection
    (the inverted-file build). No shuffle, no join — the codebook is
    literal constants in the plan."""
    qn = with_quantized_norm(df, vec_col, id_col)
    return qn.select(
        F.col(id_col),
        F.element_at(_probe_lists(F.col("q"), F.col("norm2"), codebook, 1), 1).alias(
            "list_id"
        ),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_lists: int = 16,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebook: list[tuple[int, list[int], int]] | None = None,
) -> DataFrame:
    """IVF-Flat approximate top-k: each query probes its `nprobe` nearest
    inverted lists; exact cosine ranking over only those lists' members.

    Scale shape: corpus-side list assignment is a projection; the query
    side (queries x nprobe rows) broadcasts; the candidate join keys on
    list_id. Recall/cost tunes via nprobe (= ClickHouse/FAISS IVF probes).

    ``codebook`` lets the caller reuse an already-built quantizer (it is
    deterministic driver-side state); omitted, it is built from the corpus.
    """
    if codebook is None:
        codebook = ivf_codebook(corpus, n_lists, vec_col, id_col)
    c = with_quantized_norm(corpus, vec_col, id_col)
    c = c.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("q").alias("cq"),
        F.col("norm2").alias("cn"),
        F.element_at(
            _probe_lists(F.col("q"), F.col("norm2"), codebook, 1), 1
        ).alias("list_id"),
    )
    # the query side is broadcast by contract (small): coalesce to one
    # partition so its quantize/sketch Arrow stage is one task, not
    # |input partitions| near-empty Python-worker tasks
    qd = with_quantized_norm(queries.coalesce(1), vec_col, id_col)
    qd = qd.select(
        F.col(id_col).alias("query_id"),
        F.col("q").alias("qq"),
        F.col("norm2").alias("qn"),
        F.explode(
            _probe_lists(F.col("q"), F.col("norm2"), codebook, nprobe)
        ).alias("list_id"),
    )
    scored = (
        c.join(F.broadcast(qd), ["list_id"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("qq"), F.col("cq"), F.col("qn"), F.col("cn")).alias(
                "cos_exact"
            ),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("cos_exact"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_exact", 6).alias("cos_sim"),
            "rank",
        )
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = LSH_PLANES,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the query's
    LSH bucket. Recall is tunable via `planes` (fewer planes = bigger
    buckets = higher recall & cost)."""
    c = with_quantized_norm(corpus, vec_col, id_col)
    c = c.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("q").alias("cq"),
        F.col("norm2").alias("cn"),
        bucket_col(F.col("q"), planes).alias("bucket"),
    )
    # the query side is broadcast by contract (small): coalesce to one
    # partition so its quantize/sketch Arrow stage is one task, not
    # |input partitions| near-empty Python-worker tasks
    qd = with_quantized_norm(queries.coalesce(1), vec_col, id_col)
    qd = qd.select(
        F.col(id_col).alias("query_id"),
        F.col("q").alias("qq"),
        F.col("norm2").alias("qn"),
        bucket_col(F.col("q"), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(qd), ["bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("qq"), F.col("cq"), F.col("qn"), F.col("cn")).alias(
                "cos_exact"
            ),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("cos_exact"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_exact", 6).alias("cos_sim"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — FAISS-IVFPQ-shaped compressed-domain search.
# Reference parity note: the reference delegates vector work to ClickHouse;
# PQ/ADC is part of this repo's LLM-pipeline track (brief), not a port.
# ---------------------------------------------------------------------------

PQ_M = 4  # subspaces
PQ_K = 16  # codewords per subspace


def pq_subcodebooks(
    codebook: list[tuple[int, list[int], int]], m: int = PQ_M
) -> list[list[list[int]]]:
    """Split an IVF-style codebook (k id-ordered quantized vectors) into
    `m` per-subspace codeword tables: ``out[j][cw]`` is codeword `cw`'s
    quantized subvector in subspace `j`.

    Codeword index = rank of the source vector in id order (0..k-1) —
    the same deterministic k-means stand-in as :func:`ivf_codebook`, so
    the SQL oracle derives the identical tables with ORDER BY/LIMIT.
    Subspaces are contiguous equal slices of the vector (d % m == 0 by
    contract; the 64-d test corpus uses 4 x 16).
    """
    dims = len(codebook[0][1])
    assert dims % m == 0, f"dims {dims} not divisible by m {m}"
    dsub = dims // m
    return [
        [list(q[j * dsub : (j + 1) * dsub]) for _, q, _ in codebook]
        for j in range(m)
    ]


def _pq_codes_col(qcol: Column, subcb: list[list[list[int]]]) -> Column:
    """Per-row PQ codes (array<int>, length m): nearest codeword per
    subspace by exact integer L2 core (c.c - 2 x.c; x.x is constant
    within a subspace so it cannot change the argmin). Ties -> smaller
    codeword index (np.argmin takes the first minimum).

    One (batch x dsub) @ (dsub x k) int64 matmul per subspace per Arrow
    batch — the encode is a narrow projection, zero shuffle."""
    mats = [np.array(cb, dtype=np.int64).T for cb in subcb]  # (dsub, k) each
    cnorms = [np.einsum("dk,dk->k", mt, mt) for mt in mats]
    dsub = mats[0].shape[0]

    @F.pandas_udf("array<int>")
    def codes(q: pd.Series) -> pd.Series:
        if len(q) == 0:
            return pd.Series([], dtype=object)
        X = np.vstack(q.to_numpy()).astype(np.int64, copy=False)  # (n, d)
        outs = []
        for j, (mt, cn) in enumerate(zip(mats, cnorms)):
            dots = X[:, j * dsub : (j + 1) * dsub] @ mt  # (n, k) exact
            outs.append(np.argmin(cn[None, :] - 2 * dots, axis=1))
        return pd.Series(list(np.stack(outs, axis=1).astype(np.int32)))

    return codes(qcol)


def pq_encode(
    df: DataFrame,
    codebook: list[tuple[int, list[int], int]],
    m: int = PQ_M,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>, recon_norm2): the compressed corpus.

    recon_norm2 = ||x_hat||^2 = sum_j ||c_{j,code_j}||^2 (subspaces are
    orthogonal coordinate slices) — exact int64, needed by the ADC
    cosine denominator. Codebook literals live in the plan: encode is a
    shuffle-free scan, M small ints per vector (the 100 TB win: the
    search below reads 4 bytes/vector + codes, never the embeddings)."""
    subcb = pq_subcodebooks(codebook, m)
    cnorm_lits = [
        F.array(*[F.lit(int(sum(c * c for c in cw))) for cw in cb]) for cb in subcb
    ]
    qn = with_quantized_norm(df, vec_col, id_col)
    enc = qn.select(
        F.col(id_col), _pq_codes_col(F.col("q"), subcb).alias("codes")
    )
    recon = sum(
        F.element_at(cnorm_lits[j], F.col("codes")[j] + 1) for j in range(m)
    )
    return enc.select(id_col, "codes", recon.cast("long").alias("recon_norm2"))


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: list[tuple[int, list[int], int]],
    k: int = 3,
    m: int = PQ_M,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k over PQ codes.

    Per query, a lookup table LUT[j][cw] = <q_sub_j, c_{j,cw}> (exact
    int) is built driver-side from the collected query vectors (queries
    are small by contract — the same control-plane role as the IVF/PQ
    codebooks). The corpus side is ONE narrow scan over the code table:
    adc_dot(q, x) = sum_j LUT[j][code_j(x)] via literal-array gathers —
    no join, no shuffle until the per-query top-k. Score is the ADC
    cosine adc_dot / (|q| * |x_hat|), exactly reproducible: integer LUT
    sums, one float divide.
    """
    subcb = pq_subcodebooks(codebook, m)
    dims = len(codebook[0][1])
    dsub = dims // m
    qrows = (
        with_quantized_norm(queries, vec_col, id_col)
        .select(id_col, "q", "norm2")
        .collect()
    )
    qrows.sort(key=lambda r: r[0])
    enc = pq_encode(corpus, codebook, m, vec_col, id_col)

    # adc_dots: for each corpus row an array<long>, one ADC dot per query
    # (query order = id order) — literal LUT gathers, pure column math.
    per_query = []
    for r in qrows:
        qv = list(r["q"])
        luts = [
            F.array(
                *[
                    F.lit(
                        int(
                            sum(
                                a * b
                                for a, b in zip(
                                    qv[j * dsub : (j + 1) * dsub], cw
                                )
                            )
                        )
                    )
                    for cw in subcb[j]
                ]
            )
            for j in range(m)
        ]
        per_query.append(
            sum(
                F.element_at(luts[j], F.col("codes")[j] + 1) for j in range(m)
            ).cast("long")
        )
    qids = F.array(*[F.lit(int(r[0])) for r in qrows])
    qnorms = F.array(*[F.lit(int(r["norm2"])) for r in qrows])
    scored = (
        enc.filter(F.col("recon_norm2") > 0)
        .select(
            F.col(id_col).alias("neighbor_id"),
            "recon_norm2",
            F.posexplode(F.array(*per_query)).alias("_qpos", "adc_dot"),
        )
        .select(
            F.element_at(qids, F.col("_qpos") + 1).alias("query_id"),
            "neighbor_id",
            (
                F.col("adc_dot").cast("double")
                / (
                    F.sqrt(F.element_at(qnorms, F.col("_qpos") + 1).cast("double"))
                    * F.sqrt(F.col("recon_norm2").cast("double"))
                )
            ).alias("adc_cos"),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("adc_cos", 6).alias("adc_sim"),
            "rank",
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: list[tuple[int, list[int], int]],
    k: int = 3,
    m: int = PQ_M,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF+PQ (the full FAISS-IVFPQ shape): ADC scoring restricted to
    each query's `nprobe` nearest inverted lists.

    Corpus side is ONE narrow scan emitting (id, list_id, codes,
    recon_norm2) — coarse assignment and PQ encode fused into the same
    Arrow projection over codebook literals. The query side is a tiny
    driver-built table of (query_id, list_id, qnorm, lut_0..lut_{m-1})
    rows — the per-query integer LUTs ride the broadcast join, so
    scoring a candidate is m array gathers + one divide. Relative to
    :func:`pq_adc_topk` this trades the full code-table scan for a
    list-restricted equi-join (the IVF recall/cost knob, tunable via
    nprobe); relative to :func:`ivf_topk` it never touches the raw
    embeddings at search time.
    """
    subcb = pq_subcodebooks(codebook, m)
    dims = len(codebook[0][1])
    dsub = dims // m
    cnorm_lits = [
        F.array(*[F.lit(int(sum(c * c for c in cw))) for cw in cb]) for cb in subcb
    ]
    qn = with_quantized_norm(corpus, vec_col, id_col)
    enc = qn.select(
        F.col(id_col).alias("neighbor_id"),
        _pq_codes_col(F.col("q"), subcb).alias("codes"),
        F.element_at(
            _probe_lists(F.col("q"), F.col("norm2"), codebook, 1), 1
        ).alias("list_id"),
    )
    recon = sum(
        F.element_at(cnorm_lits[j], F.col("codes")[j] + 1) for j in range(m)
    )
    enc = enc.withColumn("recon_norm2", recon.cast("long")).filter(
        F.col("recon_norm2") > 0
    )

    # query side: nprobe nearest centroids + per-subspace LUTs, all
    # driver-side (mirrors _probe_lists' exact math: int dots, float64
    # cosine, ties -> smaller centroid id via stable sort)
    import math

    qrows = sorted(
        with_quantized_norm(queries, vec_col, id_col).collect(),
        key=lambda r: r[0],
    )
    out_rows = []
    for r in qrows:
        qv, qnorm = list(r["q"]), int(r["norm2"])
        scored = []
        for cid, cq, cn in codebook:
            dot = sum(a * b for a, b in zip(qv, cq))
            scored.append((-(dot / (math.sqrt(qnorm) * math.sqrt(cn))), cid))
        scored.sort()  # (-cos, cid): desc cos, ties -> smaller id
        luts = [
            [
                sum(a * b for a, b in zip(qv[j * dsub : (j + 1) * dsub], cw))
                for cw in subcb[j]
            ]
            for j in range(m)
        ]
        for _, cid in scored[:nprobe]:
            out_rows.append((int(r[0]), int(cid), qnorm, *luts))
    lut_fields = ", ".join(f"lut_{j} array<bigint>" for j in range(m))
    qdf = corpus.sparkSession.createDataFrame(
        out_rows,
        f"query_id bigint, list_id bigint, qnorm bigint, {lut_fields}",
    )
    adc = sum(
        F.element_at(F.col(f"lut_{j}"), F.col("codes")[j] + 1) for j in range(m)
    ).cast("long")
    scored = (
        enc.join(F.broadcast(qdf), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                adc.cast("double")
                / (
                    F.sqrt(F.col("qnorm").cast("double"))
                    * F.sqrt(F.col("recon_norm2").cast("double"))
                )
            ).alias("adc_cos"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("adc_cos", 6).alias("adc_sim"),
            "rank",
        )
    )
