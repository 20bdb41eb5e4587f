"""Training-data pipeline queries: dedup, similarity, text analysis,
multimodal — each registered with a DuckDB oracle generated from the SAME
constants (seeds, band layout, hyperplanes, stopword lists) as the Spark
plans, so both engines compute bit-identical results.

DuckDB-SQL building blocks mirroring the Spark operators:

- words:    list_filter(string_split(text,' '), w -> w <> '')
- shingles: n-gram join over 1-indexed list positions (short docs -> one
  whole-text shingle), identical to operators.dedup_text.shingles_of
- hash:     md5-hex-prefix -> BIGINT (functions.hashing twins)
- quantize: round(x*1000)::BIGINT (operators.similarity.quantized)
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64_sql
from ..operators import bm25 as BM
from ..operators import dedup_text as DT
from ..operators import multimodal as MM
from ..operators import similarity as SIM
from ..operators import text_analysis as TA
from ..operators.cache import checkpoint_in, persist_in
from .queries import register, t

# --- shared SQL fragments ----------------------------------------------------

_WORDS = "list_filter(string_split(text, ' '), w -> w <> '')"


def _shingles_sql(n: int) -> str:
    """DuckDB twin of shingles_of(text, n) (over alias `words`)."""
    gram = " || ' ' || ".join(f"words[i+{k}]" for k in range(n))
    return (
        f"CASE WHEN len(words) >= {n} THEN "
        f"list_transform(range(1, len(words) - {n - 2}), i -> {gram}) "
        f"ELSE [array_to_string(words, ' ')] END"
    )


def _minhash_sql(perms: int) -> list[str]:
    """Per-permutation min-hash expressions over alias `bases` (the list of
    M31-reduced shingle hashes) — twin of minhash_signatures' affine maps."""
    m = DT.MERSENNE31
    return [
        f"list_min(list_transform(bases, x -> ({a} * x + {b}) % {m}))"
        for a, b in DT.perm_constants(perms)
    ]


def _spread(spark, df):
    """Fan a small single-file input across the cluster for CPU-heavy
    per-row ops. One parquet file at local scale = one partition = one
    core; at 100 TB inputs arrive in thousands of splits and this is a
    no-op (we only repartition when the scan is narrower than the
    parallelism). The partition count is memoized on the frame object
    (r12): ``df.rdd`` re-plans the query per call (~10 ms driver time),
    and with ``t()``'s table memo the SAME frame object flows through
    every dataops entry."""
    par = spark.sparkContext.defaultParallelism
    n = getattr(df, "_spread_nparts", None)
    if n is None:
        n = df.rdd.getNumPartitions()
        df._spread_nparts = n
    if n < par:
        return df.repartition(par)
    return df


# =====================================================================
# Deduplication
# =====================================================================


@register(
    "dedup_exact",
    f"""
    SELECT {md5_hash64_sql('text')} AS content_hash,
           min(doc_id) AS kept_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup",),
    doc="Exact content-hash dedup: one row per distinct content, smallest "
    "doc_id kept. operators.dedup_text.exact_dedup.",
)
def dedup_exact(spark, sf_dir):
    return DT.exact_dedup(_spread(spark, t(spark, sf_dir, "documents")))


@register(
    "dup_span_report",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    sp AS (
      SELECT doc_id, {md5_hash64_sql('s')} AS g
      FROM (SELECT doc_id, unnest({_shingles_sql(6)}) AS s FROM w)
    ),
    per_dg AS (SELECT doc_id, g, COUNT(*) AS c_dg FROM sp GROUP BY 1, 2),
    per_g AS (SELECT g, sum(c_dg) AS c_g FROM per_dg GROUP BY 1)
    SELECT doc_id, CAST(sum(c_dg) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN c_g >= 2 THEN c_dg ELSE 0 END) AS BIGINT) AS dup_spans,
           round(sum(CASE WHEN c_g >= 2 THEN c_dg ELSE 0 END) * 1.0
                 / sum(c_dg), 6) AS dup_frac
    FROM per_dg JOIN per_g USING (g)
    GROUP BY doc_id
    """,
    tags=("dedup", "audit"),
    doc="Exact substring-duplication profile at 6-word-span granularity "
    "(the dataflow form of ExactSubstr dedup): per document, total spans, "
    "spans occurring more than once corpus-wide, duplicated fraction. "
    "Explode -> hash -> (doc,span) map-side-combined count -> corpus "
    "multiplicity -> equi-join back -> per-doc rollup; every shuffle "
    "keyed by span hash or doc id, linear in corpus. "
    "operators.dedup_text.dup_span_profile.",
)
def dup_span_report(spark, sf_dir):
    return DT.dup_span_profile(_spread(spark, t(spark, sf_dir, "documents")), n=6)


def _lsh_pairs_oracle(perms: int = DT.MINHASH_PERMS, bands: int = DT.MINHASH_BANDS) -> str:
    rows = perms // bands
    mh = _minhash_sql(perms)
    band_selects = []
    for b in range(bands):
        member = " || ',' || ".join(
            f"CAST(mh_{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, {md5_hash64_sql(f'({member})')} AS band_hash FROM sig"
        )
    return f"""
    WITH sig AS (
      SELECT doc_id,
             {', '.join(f'{e} AS mh_{i}' for i, e in enumerate(mh))}
      FROM (
        SELECT doc_id,
               list_transform(sh, x -> {md5_hash64_sql('x')} % {DT.MERSENNE31}) AS bases
        FROM (
          SELECT doc_id, {_shingles_sql(3)} AS sh
          FROM (SELECT doc_id, {_WORDS} AS words FROM documents)
        )
      )
    ),
    bands AS (
      {' UNION ALL '.join(band_selects)}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    """


@register(
    "dedup_minhash_lsh",
    _lsh_pairs_oracle(),
    tags=("dedup", "lsh"),
    doc="MinHash+LSH near-dup candidate pairs: 12 seeded min-hashes over "
    "word 3-gram shingles, 4 bands x 3 rows, pairs sharing any band. "
    "operators.dedup_text.lsh_candidate_pairs.",
)
def dedup_minhash_lsh(spark, sf_dir):
    return DT.lsh_candidate_pairs(_spread(spark, t(spark, sf_dir, "documents")))


def _simhash_sql(bits: int = DT.SIMHASH_BITS) -> str:
    terms = []
    for b in range(bits):
        cnt = f"len(list_filter(hs, x -> (x >> {b}) & 1 = 1))"
        terms.append(f"(CASE WHEN 2 * {cnt} > len(hs) THEN {2**b} ELSE 0 END)")
    return " + ".join(terms)


@register(
    "simhash_signatures",
    f"""
    SELECT doc_id, CAST({_simhash_sql()} AS BIGINT) AS simhash
    FROM (
      SELECT doc_id,
             list_transform({_WORDS}, w -> {md5_hash64_sql('w')}) AS hs
      FROM documents
    )
    """,
    tags=("dedup",),
    doc="32-bit SimHash per document (term-frequency majority vote per "
    "bit). operators.dedup_text.simhash.",
)
def simhash_signatures(spark, sf_dir):
    return DT.simhash(_spread(spark, t(spark, sf_dir, "documents")))


@register(
    "ngram_jaccard_pairs",
    f"""
    WITH pairs AS ({_lsh_pairs_oracle()}),
    sets AS (
      SELECT doc_id, list_distinct(sh) AS sh
      FROM (
        SELECT doc_id, {_shingles_sql(3)} AS sh
        FROM (SELECT doc_id, {_WORDS} AS words FROM documents)
      )
    )
    SELECT id_a, id_b,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
    FROM pairs
    JOIN sets a ON pairs.id_a = a.doc_id
    JOIN sets b ON pairs.id_b = b.doc_id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    """,
    tags=("dedup",),
    doc="Exact n-gram Jaccard verification over the LSH candidate pairs "
    "(the verify stage after banding). operators.dedup_text.jaccard_verify.",
)
def ngram_jaccard_pairs(spark, sf_dir):
    docs = _spread(spark, t(spark, sf_dir, "documents"))
    # one corpus scan: signatures + distinct shingle sets together; LSH
    # banding and the Jaccard verify both consume the persisted profile
    # (ambient entry-scope lifetime — rotates on the next invocation)
    prof = persist_in(None, DT.minhash_signatures(docs, keep_shingles=True))
    pairs = DT.lsh_candidate_pairs(docs, sig=prof.drop("sh"))
    return DT.jaccard_verify(
        docs, pairs, threshold=0.5, sets=prof.select("doc_id", "sh")
    )


# =====================================================================
# Similarity search
# =====================================================================

_QUANT = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))"
_DOT = "CAST(list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])) AS BIGINT)"


def _ann_oracle(k: int, n_queries: int) -> str:
    dot_qc = _DOT.format(a="q.q", b="c.q")
    return f"""
    WITH qn AS (
      SELECT vec_id, q, {_DOT.format(a='q', b='q')} AS norm2
      FROM (SELECT vec_id, {_QUANT} AS q FROM embeddings)
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST({dot_qc} AS DOUBLE) / (sqrt(CAST(q.norm2 AS DOUBLE)) * sqrt(CAST(c.norm2 AS DOUBLE))) AS cos_exact
      FROM (SELECT * FROM qn WHERE vec_id < {n_queries} AND norm2 > 0) q
      JOIN (SELECT * FROM qn WHERE norm2 > 0) c ON c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, round(cos_exact, 6) AS cos_sim, rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_exact DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    WHERE rank <= {k}
    """


@register(
    "ann_cosine_topk",
    _ann_oracle(k=5, n_queries=8),
    tags=("similarity",),
    doc="Brute-force exact cosine top-5 for 8 query vectors over the "
    "embeddings table; integer-quantized arithmetic makes the scores "
    "engine-exact. operators.similarity.cosine_topk.",
)
def ann_cosine_topk(spark, sf_dir):
    emb = _spread(spark, t(spark, sf_dir, "embeddings"))
    return SIM.cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)


def _lsh_bucket_sql(planes: list[list[int]]) -> str:
    terms = []
    for j, w in enumerate(planes):
        wlit = "[" + ", ".join(str(v) for v in w) + "]"
        proj = f"list_sum(list_transform(range(1, len(q) + 1), i -> q[i] * ({wlit})[i]))"
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {2**j} ELSE 0 END)")
    return " + ".join(terms)


def _lsh_buckets_oracle(planes: int = SIM.LSH_PLANES, dims: int = 64) -> str:
    w = SIM.plane_weights(planes, dims)
    return f"""
    SELECT bucket, COUNT(*) AS n_vectors, min(vec_id) AS min_vec_id
    FROM (
      SELECT vec_id, CAST({_lsh_bucket_sql(w)} AS BIGINT) AS bucket
      FROM (
        SELECT vec_id, {_QUANT} AS q FROM embeddings
        WHERE {_DOT.format(a=_QUANT, b=_QUANT)} > 0
      )
    )
    GROUP BY bucket
    """


@register(
    "ann_lsh_buckets",
    _lsh_buckets_oracle(),
    tags=("similarity", "lsh"),
    doc="Random-hyperplane LSH sign-sketch buckets (8 deterministic md5-"
    "derived planes): the scale path for ANN — occupancy histogram. "
    "operators.similarity.lsh_buckets.",
)
def ann_lsh_buckets(spark, sf_dir):
    emb = _spread(spark, t(spark, sf_dir, "embeddings"))
    return (
        SIM.lsh_buckets(emb, dims=64)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


_IVF_QN = f"""
    qn AS (
      SELECT * FROM (
        SELECT vec_id, q, {_DOT.format(a='q', b='q')} AS norm2
        FROM (SELECT vec_id, {_QUANT} AS q FROM embeddings)
      ) WHERE norm2 > 0
    ),
    cents AS (
      SELECT vec_id AS c_id, q AS cq, norm2 AS cn
      FROM qn ORDER BY vec_id LIMIT 16
    ),
    centroid_cos AS (
      SELECT v.vec_id, c.c_id,
             CAST({_DOT.format(a='v.q', b='c.cq')} AS DOUBLE)
               / (sqrt(CAST(v.norm2 AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))) AS ccos,
             row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY CAST({_DOT.format(a='v.q', b='c.cq')} AS DOUBLE)
                                      / (sqrt(CAST(v.norm2 AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))) DESC,
                                      c.c_id ASC) AS rn
      FROM qn v CROSS JOIN cents c
    )
"""


#: coarse-quantizer memo, keyed by the embeddings table fingerprint
#: (path, mtime, size — not bare sf_dir, so in-place regeneration
#: invalidates): like the k-means codebook, the IVF quantizer is
#: deterministic driver-side state (16 x dims ints) shared by every IVF
#: query in the process instead of re-collected per query
_IVF_CB: dict[tuple, list[tuple[int, list[int], int]]] = {}


def _ivf_codebook(spark, sf_dir):
    from .queries import table_fingerprint

    key = table_fingerprint(sf_dir, "embeddings")
    if key not in _IVF_CB:
        emb = _spread(spark, t(spark, sf_dir, "embeddings"))
        _IVF_CB[key] = SIM.ivf_codebook(emb, n_lists=16)
    return _IVF_CB[key]


@register(
    "ann_ivf_lists",
    f"""
    WITH {_IVF_QN}
    SELECT c_id AS list_id, COUNT(*) AS n_vectors, min(vec_id) AS min_vec_id
    FROM centroid_cos WHERE rn = 1
    GROUP BY c_id
    """,
    tags=("similarity", "ivf"),
    doc="IVF inverted-file build: 16-centroid coarse codebook (smallest-id "
    "vectors; deterministic k-means stand-in), nearest-centroid assignment "
    "as a shuffle-free projection over inlined codebook literals; list "
    "occupancy histogram. operators.similarity.ivf_assign.",
)
def ann_ivf_lists(spark, sf_dir):
    emb = _spread(spark, t(spark, sf_dir, "embeddings"))
    return (
        SIM.ivf_assign(emb, _ivf_codebook(spark, sf_dir))
        .groupBy("list_id")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


@register(
    "ann_ivf_topk",
    f"""
    WITH {_IVF_QN},
    assigned AS (SELECT vec_id, c_id AS list_id FROM centroid_cos WHERE rn = 1),
    probes AS (
      SELECT cc.vec_id AS query_id, cc.c_id AS list_id
      FROM centroid_cos cc WHERE cc.rn <= 2 AND cc.vec_id < 8
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             CAST({_DOT.format(a='q.q', b='c.q')} AS DOUBLE)
               / (sqrt(CAST(q.norm2 AS DOUBLE)) * sqrt(CAST(c.norm2 AS DOUBLE))) AS cos_exact
      FROM probes p
      JOIN assigned a ON a.list_id = p.list_id AND a.vec_id <> p.query_id
      JOIN qn q ON q.vec_id = p.query_id
      JOIN qn c ON c.vec_id = a.vec_id
    )
    SELECT query_id, neighbor_id, round(cos_exact, 6) AS cos_sim, rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_exact DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    WHERE rank <= 3
    """,
    tags=("similarity", "ivf"),
    doc="IVF-Flat approximate top-3 with nprobe=2 for 8 query vectors: "
    "exact cosine ranking restricted to each query's two nearest inverted "
    "lists. Corpus assignment is a projection; probe side broadcasts. "
    "operators.similarity.ivf_topk.",
)
def ann_ivf_topk(spark, sf_dir):
    emb = _spread(spark, t(spark, sf_dir, "embeddings"))
    return SIM.ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 8),
        k=3,
        n_lists=16,
        nprobe=2,
        codebook=_ivf_codebook(spark, sf_dir),
    )


def _pq_slice_dot(a_vec: str, b_vec: str, m_expr: str, dsub: int = 16) -> str:
    """SQL for <a_vec, b_vec> restricted to subspace `m_expr` (0-based):
    exact int dot over the 1-based inclusive DuckDB slice."""
    sl = f"[{m_expr}*{dsub}+1:({m_expr}+1)*{dsub}]"
    return _DOT.format(a=f"{a_vec}{sl}", b=f"{b_vec}{sl}")


#: PQ oracle CTEs: same 16 smallest-id quantized vectors as the IVF
#: codebook, re-indexed 0..15 in id order; per-subspace codeword =
#: argmin of the exact integer L2 core (c.c - 2 x.c; x.x is constant
#: within a subspace), ties -> smaller codeword index.
_PQ_CTES = f"""
    qn AS (
      SELECT * FROM (
        SELECT vec_id, q, {_DOT.format(a='q', b='q')} AS norm2
        FROM (SELECT vec_id, {_QUANT} AS q FROM embeddings)
      ) WHERE norm2 > 0
    ),
    cents AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cw, q AS cq
      FROM (SELECT vec_id, q FROM qn ORDER BY vec_id LIMIT 16)
    ),
    pq_dists AS (
      SELECT v.vec_id, m.m, c.cw,
             {_pq_slice_dot('c.cq', 'c.cq', 'm.m')}
               - 2 * {_pq_slice_dot('v.q', 'c.cq', 'm.m')} AS dcore,
             {_pq_slice_dot('c.cq', 'c.cq', 'm.m')} AS cnorm
      FROM qn v
      CROSS JOIN generate_series(0, 3) AS m(m)
      CROSS JOIN cents c
    ),
    pq_codes AS (
      SELECT vec_id, m, cw, cnorm
      FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                     ORDER BY dcore ASC, cw ASC) AS rn
        FROM pq_dists
      ) WHERE rn = 1
    )
"""


@register(
    "ann_pq_code_histogram",
    f"""
    WITH {_PQ_CTES}
    SELECT m AS subspace, cw AS codeword, COUNT(*) AS n_vectors,
           min(vec_id) AS min_vec_id
    FROM pq_codes GROUP BY m, cw
    """,
    tags=("similarity", "pq"),
    doc="Product-quantization encode + codeword occupancy per subspace "
    "(4 x 16-d subspaces, 16 codewords from the shared IVF stand-in "
    "codebook). Encode is a shuffle-free Arrow projection over codebook "
    "literals — the compressed corpus is 4 small ints/vector. "
    "operators.similarity.pq_encode.",
)
def ann_pq_code_histogram(spark, sf_dir):
    emb = _spread(spark, t(spark, sf_dir, "embeddings"))
    enc = SIM.pq_encode(emb, _ivf_codebook(spark, sf_dir))
    return (
        enc.select("vec_id", F.posexplode("codes").alias("_m", "_cw"))
        .groupBy(
            F.col("_m").cast("long").alias("subspace"),
            F.col("_cw").cast("long").alias("codeword"),
        )
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


@register(
    "ann_pq_topk",
    f"""
    WITH {_PQ_CTES},
    parts AS (
      SELECT qv.vec_id AS query_id, co.vec_id AS neighbor_id,
             qv.norm2 AS qnorm, co.cnorm,
             {_pq_slice_dot('qv.q', 'ct.cq', 'co.m')} AS part_dot
      FROM (SELECT * FROM qn WHERE vec_id < 8) qv
      CROSS JOIN pq_codes co
      JOIN cents ct ON ct.cw = co.cw
    ),
    adc AS (
      SELECT query_id, neighbor_id, min(qnorm) AS qnorm,
             SUM(part_dot) AS adc_dot, SUM(cnorm) AS recon_norm2
      FROM parts GROUP BY query_id, neighbor_id
    )
    SELECT query_id, neighbor_id, round(adc_cos, 6) AS adc_sim, rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_cos DESC, neighbor_id ASC) AS rank
      FROM (
        SELECT query_id, neighbor_id,
               CAST(adc_dot AS DOUBLE)
                 / (sqrt(CAST(qnorm AS DOUBLE)) * sqrt(CAST(recon_norm2 AS DOUBLE))) AS adc_cos
        FROM adc
        WHERE recon_norm2 > 0 AND neighbor_id <> query_id
      )
    ) WHERE rank <= 3
    """,
    tags=("similarity", "pq"),
    doc="ADC (asymmetric-distance) approximate top-3 for 8 query vectors "
    "over PQ codes: per-query integer LUTs inlined as literals, so the "
    "search is ONE narrow scan of the 4-byte code table — no join, no "
    "embedding reads, shuffle only for the per-query top-k. "
    "operators.similarity.pq_adc_topk.",
)
def ann_pq_topk(spark, sf_dir):
    emb = _spread(spark, t(spark, sf_dir, "embeddings"))
    return SIM.pq_adc_topk(
        emb,
        emb.filter(F.col("vec_id") < 8),
        codebook=_ivf_codebook(spark, sf_dir),
        k=3,
    )


#: IVFPQ oracle (shared by ann_ivfpq_topk and the recall audit)
_IVFPQ_SQL = f"""
    WITH qn AS (
      SELECT * FROM (
        SELECT vec_id, q, {_DOT.format(a='q', b='q')} AS norm2
        FROM (SELECT vec_id, {_QUANT} AS q FROM embeddings)
      ) WHERE norm2 > 0
    ),
    cents AS (
      SELECT vec_id AS c_id, row_number() OVER (ORDER BY vec_id) - 1 AS cw,
             q AS cq, norm2 AS cn
      FROM (SELECT * FROM qn ORDER BY vec_id LIMIT 16)
    ),
    centroid_cos AS (
      SELECT v.vec_id, c.c_id,
             row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY CAST({_DOT.format(a='v.q', b='c.cq')} AS DOUBLE)
                                      / (sqrt(CAST(v.norm2 AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))) DESC,
                                      c.c_id ASC) AS rn
      FROM qn v CROSS JOIN cents c
    ),
    assigned AS (SELECT vec_id, c_id FROM centroid_cos WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, c_id FROM centroid_cos
      WHERE rn <= 2 AND vec_id < 8
    ),
    pq_dists AS (
      SELECT v.vec_id, m.m, c.cw,
             {_pq_slice_dot('c.cq', 'c.cq', 'm.m')}
               - 2 * {_pq_slice_dot('v.q', 'c.cq', 'm.m')} AS dcore,
             {_pq_slice_dot('c.cq', 'c.cq', 'm.m')} AS cnorm
      FROM qn v
      CROSS JOIN generate_series(0, 3) AS m(m)
      CROSS JOIN cents c
    ),
    pq_codes AS (
      SELECT vec_id, m, cw, cnorm
      FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                     ORDER BY dcore ASC, cw ASC) AS rn
        FROM pq_dists
      ) WHERE rn = 1
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assigned a ON a.c_id = p.c_id AND a.vec_id <> p.query_id
    ),
    parts AS (
      SELECT cd.query_id, cd.neighbor_id, qv.norm2 AS qnorm, co.cnorm,
             {_pq_slice_dot('qv.q', 'ct.cq', 'co.m')} AS part_dot
      FROM cand cd
      JOIN pq_codes co ON co.vec_id = cd.neighbor_id
      JOIN cents ct ON ct.cw = co.cw
      JOIN qn qv ON qv.vec_id = cd.query_id
    ),
    adc AS (
      SELECT query_id, neighbor_id, min(qnorm) AS qnorm,
             SUM(part_dot) AS adc_dot, SUM(cnorm) AS recon_norm2
      FROM parts GROUP BY query_id, neighbor_id
    )
    SELECT query_id, neighbor_id, round(adc_cos, 6) AS adc_sim, rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_cos DESC, neighbor_id ASC) AS rank
      FROM (
        SELECT query_id, neighbor_id,
               CAST(adc_dot AS DOUBLE)
                 / (sqrt(CAST(qnorm AS DOUBLE)) * sqrt(CAST(recon_norm2 AS DOUBLE))) AS adc_cos
        FROM adc WHERE recon_norm2 > 0
      )
    ) WHERE rank <= 3
"""


@register(
    "ann_ivfpq_topk",
    _IVFPQ_SQL,
    tags=("similarity", "pq", "ivf"),
    doc="IVF+PQ (full FAISS-IVFPQ shape): coarse assignment + PQ encode "
    "fused into one Arrow scan; per-query integer LUTs ride the tiny "
    "broadcast probe table; ADC scoring restricted to nprobe=2 inverted "
    "lists — never touches raw embeddings at search time. "
    "operators.similarity.ivfpq_topk.",
)
def ann_ivfpq_topk(spark, sf_dir):
    emb = _spread(spark, t(spark, sf_dir, "embeddings"))
    return SIM.ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") < 8),
        codebook=_ivf_codebook(spark, sf_dir),
        k=3,
        nprobe=2,
    )


@register(
    "ann_ivfpq_recall_report",
    f"""
    WITH ex AS (
      SELECT query_id, neighbor_id FROM ({_ann_oracle(k=3, n_queries=8)})
    ),
    ad AS (
      SELECT query_id, neighbor_id FROM ({{ivfpq}})
    ),
    h AS (
      SELECT ex.query_id, count(*) AS n
      FROM ex JOIN ad USING (query_id, neighbor_id)
      GROUP BY 1
    )
    SELECT q.query_id, CAST(3 AS BIGINT) AS k,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
           round(coalesce(h.n, 0) / 3.0, 6) AS recall
    FROM (SELECT DISTINCT query_id FROM ex) q
    LEFT JOIN h USING (query_id)
    """.format(ivfpq=_IVFPQ_SQL),
    tags=("similarity", "pq", "ivf", "audit"),
    doc="Compressed-domain index quality audit: IVFPQ(nprobe=2) top-3 "
    "vs exact brute-force cosine top-3, per query — the ADC twin of "
    "ann_recall_report, closing the loop on what PQ compression + list "
    "restriction cost in recall (the nprobe/M/K tuning signal).",
)
def ann_ivfpq_recall_report(spark, sf_dir):
    emb = _spread(spark, t(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < 8)
    cb = _ivf_codebook(spark, sf_dir)
    # NOT persisted (r12, interleaved A/B): the exact side feeds two
    # consumers (hit join + distinct-query denominator), but caching the
    # k x |queries| result LOST pairwise (min 2.4 -> 3.1 s at sf0.1) —
    # the duplicated brute-force branch back-fills idle cores inside the
    # one job, while the cache pins a materialization order on it.
    exact = SIM.cosine_topk(emb, q, k=3).select("query_id", "neighbor_id")
    adc = SIM.ivfpq_topk(emb, q, codebook=cb, k=3, nprobe=2).select(
        "query_id", "neighbor_id"
    )
    hits = (
        exact.join(adc, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n"))
    )
    return (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.lit(3).cast("long").alias("k"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_hits"),
            F.round(F.coalesce("n", F.lit(0)) / F.lit(3.0), 6).alias("recall"),
        )
    )


def _lsh_topk_oracle(k: int = 3, n_queries: int = 8, dims: int = 64) -> str:
    w = SIM.plane_weights(SIM.LSH_PLANES, dims)
    return f"""
    WITH qn AS (
      SELECT * FROM (
        SELECT vec_id, q, {_DOT.format(a='q', b='q')} AS norm2
        FROM (SELECT vec_id, {_QUANT} AS q FROM embeddings)
      ) WHERE norm2 > 0
    ),
    b AS (
      SELECT vec_id, q, norm2, CAST({_lsh_bucket_sql(w)} AS BIGINT) AS bucket
      FROM qn
    ),
    scored AS (
      SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST({_DOT.format(a='qs.q', b='c.q')} AS DOUBLE)
               / (sqrt(CAST(qs.norm2 AS DOUBLE)) * sqrt(CAST(c.norm2 AS DOUBLE))) AS cos_exact
      FROM (SELECT * FROM b WHERE vec_id < {n_queries}) qs
      JOIN b c ON c.bucket = qs.bucket AND c.vec_id <> qs.vec_id
    )
    SELECT query_id, neighbor_id, round(cos_exact, 6) AS cos_sim, rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_exact DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    WHERE rank <= {k}
    """


@register(
    "ann_lsh_topk",
    _lsh_topk_oracle(),
    tags=("similarity", "lsh"),
    doc="Bucket-restricted approximate top-3: exact cosine ranking within "
    "the query's LSH bucket. operators.similarity.lsh_topk.",
)
def ann_lsh_topk(spark, sf_dir):
    emb = _spread(spark, t(spark, sf_dir, "embeddings"))
    return SIM.lsh_topk(emb, emb.filter(F.col("vec_id") < 8), k=3)


@register(
    "embedding_near_dup_pairs",
    f"""
    WITH qn AS (
      SELECT * FROM (
        SELECT vec_id, q, {_DOT.format(a='q', b='q')} AS norm2,
               CAST({{bucket}} AS BIGINT) AS bucket
        FROM (SELECT vec_id, {_QUANT} AS q FROM embeddings)
      ) WHERE norm2 > 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(CAST({_DOT.format(a='a.q', b='b.q')} AS DOUBLE)
                 / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))), 6) AS cos_sim
    FROM qn a JOIN qn b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE CAST({_DOT.format(a='a.q', b='b.q')} AS DOUBLE)
          / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))) >= 0.3
    """.replace("{bucket}", _lsh_bucket_sql(SIM.plane_weights(SIM.LSH_PLANES, 64))),
    tags=("similarity", "dedup", "lsh"),
    doc="Embedding-cosine near-dup pairs restricted to LSH bucket-mates "
    "(threshold 0.3 for this synthetic corpus; production uses ~0.95). "
    "operators.similarity.near_dup_pairs.",
)
def embedding_near_dup_pairs(spark, sf_dir):
    emb = _spread(spark, t(spark, sf_dir, "embeddings"))
    return SIM.near_dup_pairs(emb, threshold=0.3, dims=64)


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE pairs AS ({_lsh_pairs_oracle()}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach (id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
    )
    SELECT id AS doc_id, min(r) AS cluster_id
    FROM reach GROUP BY id
    """,
    tags=("dedup",),
    doc="Connected-components cluster assignment over MinHash-LSH "
    "candidate pairs: cluster_id = min reachable doc_id (iterative "
    "min-label propagation; DuckDB oracle uses a recursive CTE). "
    "operators.dedup_text.connected_components.",
)
def dedup_clusters(spark, sf_dir):
    docs = _spread(spark, t(spark, sf_dir, "documents"))
    return DT.connected_components(DT.lsh_candidate_pairs(docs))


# =====================================================================
# Text analysis
# =====================================================================


def _lang_id_oracle() -> str:
    score_cols = []
    for lang, markers in sorted(TA.LANG_MARKERS.items()):
        arr = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
        score_cols.append(
            f"len(list_filter(words, w -> list_contains({arr}, w))) AS score_{lang}"
        )
    langs = sorted(TA.LANG_MARKERS)
    pred = "'unknown'"
    for lang in reversed(langs):
        conds = [f"score_{lang} > 0"]
        for other in langs:
            if other != lang:
                op = ">=" if other > lang else ">"
                conds.append(f"score_{lang} {op} score_{other}")
        pred = f"CASE WHEN {' AND '.join(conds)} THEN '{lang}' ELSE {pred} END"
    return f"""
    SELECT doc_id, {', '.join(f'score_{l}' for l in langs)}, {pred} AS pred_lang
    FROM (
      SELECT doc_id, {', '.join(score_cols)}
      FROM (SELECT doc_id, {_WORDS} AS words FROM documents)
    )
    """


@register(
    "lang_id",
    _lang_id_oracle(),
    tags=("text",),
    doc="n-gram-heuristic language ID: marker-stopword hit counts per "
    "language, argmax with alphabetical tie-break. "
    "operators.text_analysis.lang_id.",
)
def lang_id_query(spark, sf_dir):
    return TA.lang_id(_spread(spark, t(spark, sf_dir, "documents")))


_STOP_ARR = "[" + ", ".join(f"'{s}'" for s in TA.EN_STOPWORDS) + "]"


@register(
    "text_quality",
    f"""
    SELECT doc_id,
           len(words) AS n_tokens,
           round(CAST(len(list_distinct(words)) AS DOUBLE) / len(words), 4) AS distinct_ratio,
           round(CAST(len(list_filter(words, w -> list_contains({_STOP_ARR}, w))) AS DOUBLE) / len(words), 4) AS stopword_ratio,
           round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text), 4) AS alpha_ratio,
           round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(words), 4) AS mean_token_len,
           round(0.35 * (CAST(len(list_distinct(words)) AS DOUBLE) / len(words))
               + 0.25 * (CAST(len(list_filter(words, w -> list_contains({_STOP_ARR}, w))) AS DOUBLE) / len(words))
               + 0.25 * (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text))
               + 0.15 * least(CAST(len(words) AS DOUBLE) / 100.0, 1.0), 4) AS quality_score
    FROM (SELECT doc_id, text, {_WORDS} AS words FROM documents)
    """,
    tags=("text",),
    doc="Gopher/C4-style quality features + composite score. "
    "operators.text_analysis.quality_features.",
)
def text_quality(spark, sf_dir):
    return TA.quality_features(_spread(spark, t(spark, sf_dir, "documents")))


@register(
    "token_stats",
    f"""
    SELECT doc_id,
           len({_WORDS}) AS ws_tokens,
           len(regexp_extract_all(text, '{TA.TOKEN_PATTERN}')) AS regex_tokens,
           length(text) AS n_chars,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
    FROM documents
    """,
    tags=("text",),
    doc="Token counting: whitespace + BPE-ish regex + chars/4 estimate. "
    "operators.text_analysis.token_stats.",
)
def token_stats_query(spark, sf_dir):
    return TA.token_stats(_spread(spark, t(spark, sf_dir, "documents")))


@register(
    "doc_fingerprints",
    f"""
    SELECT doc_id, fps[1] AS fp_1, fps[2] AS fp_2, fps[3] AS fp_3, fps[4] AS fp_4
    FROM (
      SELECT doc_id,
             list_sort(list_distinct(list_transform(sh, x -> {md5_hash64_sql('x')}))) AS fps
      FROM (
        SELECT doc_id, {_shingles_sql(4)} AS sh
        FROM (SELECT doc_id, {_WORDS} AS words FROM documents)
      )
    )
    """,
    tags=("text",),
    doc="Bottom-4 hash fingerprint over word 4-gram shingles "
    "(winnowing-style sketch). operators.text_analysis.fingerprints.",
)
def doc_fingerprints(spark, sf_dir):
    return TA.fingerprints(_spread(spark, t(spark, sf_dir, "documents")))


def _corpus_summary_oracle() -> str:
    langs = sorted(TA.LANG_MARKERS)
    score_cols = []
    for lang, markers in sorted(TA.LANG_MARKERS.items()):
        arr = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
        score_cols.append(
            f"len(list_filter(words, w -> list_contains({arr}, w))) AS score_{lang}"
        )
    pred = "'unknown'"
    for lang in reversed(langs):
        conds = [f"score_{lang} > 0"]
        for other in langs:
            if other != lang:
                op = ">=" if other > lang else ">"
                conds.append(f"score_{lang} {op} score_{other}")
        pred = f"CASE WHEN {' AND '.join(conds)} THEN '{lang}' ELSE {pred} END"
    return f"""
    SELECT pred_lang,
           COUNT(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(quality), 4) AS avg_quality
    FROM (
      SELECT {pred} AS pred_lang,
             len(words) AS n_tokens,
             round(0.35 * (CAST(len(list_distinct(words)) AS DOUBLE) / len(words))
                 + 0.25 * (CAST(len(list_filter(words, w -> list_contains({_STOP_ARR}, w))) AS DOUBLE) / len(words))
                 + 0.25 * (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text))
                 + 0.15 * least(CAST(len(words) AS DOUBLE) / 100.0, 1.0), 4) AS quality
      FROM (
        SELECT text, {', '.join(score_cols)}, words
        FROM (SELECT text, {_WORDS} AS words FROM documents)
      )
    )
    GROUP BY pred_lang
    """


@register(
    "corpus_quality_summary",
    _corpus_summary_oracle(),
    tags=("text", "pipeline"),
    doc="End-to-end corpus profile: language-ID + quality scoring + token "
    "counting composed in ONE projection (featurizers are per-row column "
    "expressions, so composition costs zero extra passes/joins), then a "
    "per-language rollup — the shape of a real pre-training data audit.",
)
def corpus_quality_summary(spark, sf_dir):
    # Single pass: every featurizer (language scores, quality features,
    # token count) is a column expression over the same row, so composing
    # them costs zero extra scans or joins — deliberately NOT
    # lang_id(...).join(quality_features(...)).
    from ..operators.dedup_text import words_of

    docs = _spread(spark, t(spark, sf_dir, "documents"))
    words = words_of("text")
    scores = TA.lang_scores("text")
    langs = sorted(scores)
    pred = F.lit("unknown")
    for lang in reversed(langs):
        cond = scores[lang] > 0
        for other in langs:
            if other != lang:
                op = scores[lang] >= scores[other] if other > lang else scores[lang] > scores[other]
                cond = cond & op
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    n_tokens = F.size(words)
    stop_arr = F.array(*[F.lit(s) for s in TA.EN_STOPWORDS])
    quality = F.round(
        0.35 * (F.size(F.array_distinct(words)).cast("double") / n_tokens)
        + 0.25
        * (
            F.size(F.filter(words, lambda x: F.array_contains(stop_arr, x))).cast(
                "double"
            )
            / n_tokens
        )
        + 0.25
        * (
            F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double")
            / F.length("text")
        )
        + 0.15 * F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)),
        4,
    )
    per_doc = docs.select(pred.alias("pred_lang"), n_tokens.alias("n_tokens"), quality.alias("quality"))
    return per_doc.groupBy("pred_lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    )


# =====================================================================
# Multimodal plumbing
# =====================================================================


@register(
    "multimodal_features",
    f"""
    SELECT doc_id,
           strlen(text) AS n_bytes,
           CAST(ceil(strlen(text) / {MM.FRAME_STRIDE}.0) AS BIGINT) AS n_frames,
           md5(substr(text, 1, {MM.FRAME_STRIDE})) AS head_md5
    FROM documents
    """,
    tags=("multimodal",),
    doc="Binary-column feature extraction through the real mapInPandas "
    "plumbing (Arrow batches, declared schema) with the codec-agnostic "
    "fake decoder — the plumbing test double; multimodal_image_features "
    "runs the same path through the REAL PPM/BMP codecs: byte "
    "count, frame count at stride 16, head digest. "
    "operators.multimodal.extract_features.",
)
def multimodal_features(spark, sf_dir):
    media = MM.as_media_table(_spread(spark, t(spark, sf_dir, "documents")))
    return MM.extract_features(media)


def _channel_sum_sql(c: int) -> str:
    n = f"(48 * (4 + doc_id % 5))"
    return (
        f"CAST(list_sum(list_transform("
        f"list_filter(range(0, {n}), k -> k % 3 = {c}), "
        f"k -> (doc_id * {MM.PIX_A} + k * {MM.PIX_B}) % 256)) AS BIGINT)"
    )


@register(
    "multimodal_image_features",
    f"""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS format,
           CAST({MM.IMG_WIDTH} AS BIGINT) AS width,
           CAST(4 + doc_id % 5 AS BIGINT) AS height,
           CAST({MM.IMG_WIDTH} * (4 + doc_id % 5) AS BIGINT) AS n_pixels,
           {_channel_sum_sql(0)} AS sum_r,
           {_channel_sum_sql(1)} AS sum_g,
           {_channel_sum_sql(2)} AS sum_b
    FROM documents
    """,
    tags=("multimodal",),
    doc="REAL image decode end-to-end: one deterministic synthetic image "
    "per doc (pixel k = (doc_id*PIX_A + k*PIX_B) mod 256), encoded as an "
    "actual P6 PPM (even ids) or uncompressed 24-bit BMP (odd ids) binary "
    "payload, then parsed back by the pure-stdlib codecs "
    "(operators.multimodal.decode_ppm/decode_bmp: header parse, BGR->RGB, "
    "bottom-up row order, 4-byte padding) and reduced to typed features. "
    "The oracle recomputes dims + exact per-channel integer sums from the "
    "same closed-form formula, so a decode bug in either container "
    "(channel swap, row-order, padding) breaks hash parity. Both codecs "
    "are load-bearing in one query. operators.multimodal."
    "as_image_media_table + extract_image_features.",
)
def multimodal_image_features(spark, sf_dir):
    docs = _spread(spark, t(spark, sf_dir, "documents"))
    media = MM.as_image_media_table(docs)
    return MM.extract_image_features(media)


_AUD_SAMPLES = (
    f"list_transform(range(0, 256 + doc_id % 64), "
    f"k -> (doc_id * {MM.AUD_A} + k * {MM.AUD_B}) % 65536 - 32768)"
)


@register(
    "multimodal_audio_features",
    f"""
    SELECT doc_id,
           CAST({MM.AUD_RATE} AS BIGINT) AS sample_rate,
           CAST(256 + doc_id % 64 AS BIGINT) AS n_samples,
           CAST(list_sum({_AUD_SAMPLES}) AS BIGINT) AS sum_samples,
           CAST(list_sum(list_transform({_AUD_SAMPLES}, s -> abs(s))) AS BIGINT)
             AS sum_abs,
           CAST(list_max(list_transform({_AUD_SAMPLES}, s -> abs(s))) AS BIGINT)
             AS max_abs
    FROM documents
    """,
    tags=("multimodal", "audio"),
    doc="REAL audio decode end-to-end: one deterministic 16-bit mono PCM "
    "WAV per doc (sample k = (doc_id*AUD_A + k*AUD_B) mod 2^16 - 2^15), "
    "encoded as an actual RIFF/WAVE binary and parsed back by the "
    "pure-stdlib chunk-walking decoder (fmt contract validation, "
    "word-aligned chunk skip, little-endian int16), reduced to exact "
    "integer features the oracle recomputes in closed form — an "
    "endianness/sign/chunk-walk bug breaks hash parity. "
    "operators.multimodal.as_audio_media_table + extract_audio_features.",
)
def multimodal_audio_features(spark, sf_dir):
    docs = _spread(spark, t(spark, sf_dir, "documents"))
    return MM.extract_audio_features(MM.as_audio_media_table(docs))


@register(
    "multimodal_frame_sample",
    f"""
    SELECT doc_id,
           CAST(f AS BIGINT) AS frame_idx,
           CAST(f * {MM.FRAME_STRIDE} AS BIGINT) AS byte_offset
    FROM documents,
         LATERAL (SELECT unnest(range(0, CAST(ceil(strlen(text) / {MM.FRAME_STRIDE}.0) AS BIGINT))) AS f)
    """,
    tags=("multimodal",),
    doc="Deterministic frame sampling over binary payloads (stride-16 "
    "offsets). operators.multimodal.frame_sample.",
)
def multimodal_frame_sample(spark, sf_dir):
    media = MM.as_media_table(_spread(spark, t(spark, sf_dir, "documents")))
    return MM.frame_sample(media)


# =====================================================================
# Sampling / hygiene / cross-modal curation
# =====================================================================


@register(
    "docs_hash_sample",
    f"""
    SELECT lang, COUNT(*) AS n_total,
           CAST(sum(CASE WHEN {md5_hash64_sql("CAST(doc_id AS VARCHAR)")} % 8 = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           min(CASE WHEN {md5_hash64_sql("CAST(doc_id AS VARCHAR)")} % 8 = 0
                    THEN doc_id END) AS min_sampled_key
    FROM documents GROUP BY lang
    """,
    tags=("sampling",),
    doc="Deterministic hash sampling (1-in-8 by 60-bit md5 of the key), "
    "audited per language stratum: totals, kept counts, smallest kept "
    "key. Reproducible on any engine, no RNG, no coordination — the "
    "scalable way to cut a training subset. "
    "operators.sampling.stratified_sample_summary.",
)
def docs_hash_sample(spark, sf_dir):
    from ..operators.sampling import stratified_sample_summary

    return stratified_sample_summary(
        _spread(spark, t(spark, sf_dir, "documents")), "doc_id", "lang"
    )


@register(
    "source_capped_sample",
    """
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n_total
      FROM documents
    )
    SELECT source, min(n_total) AS n_total, COUNT(*) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS kept_chars, min(doc_id) AS min_kept_doc_id
    FROM ranked WHERE rn <= 40
    GROUP BY source
    """,
    tags=("sampling", "curation"),
    doc="Per-source document cap (keep the 40 largest docs per source, "
    "deterministic (n_chars DESC, doc_id) order): the C4/RefinedWeb-style "
    "domain cap that stops one mega-source from dominating a mix. NOT a "
    "bare source-keyed window (that serializes each source's sort onto "
    "one task — fatal when sources are few and huge): two-phase top-cap "
    "— rank within (input slice, source) in parallel, prune past the "
    "cap (lossless), exact-rank the <= cap x slices survivors. The "
    "per-source TOTAL rides the same slice window (each slice's count "
    "carried on its local-rank-1 row, summed per source), so one scan "
    "covers both. operators.sampling.per_stratum_cap is the row-level "
    "form.",
)
def source_capped_sample(spark, sf_dir):
    cap = 40
    docs = _spread(spark, t(spark, sf_dir, "documents"))
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    w_local = Window.partitionBy("_slice", "source").orderBy(*order)
    w_lcnt = Window.partitionBy("_slice", "source")
    w_final = Window.partitionBy("source").orderBy(*order)
    pruned = (
        docs.select("source", "doc_id", "n_chars")
        .withColumn("_slice", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(w_local))
        .withColumn("_lc", F.count("*").over(w_lcnt))
        .filter(F.col("_lr") <= cap)
    )
    in_cap = F.col("_rn") <= cap
    return (
        pruned.withColumn("_rn", F.row_number().over(w_final))
        .groupBy("source")
        .agg(
            # each slice's full count rides its local-rank-1 row (always
            # a survivor), so the pre-cap total needs no second scan
            F.sum(F.when(F.col("_lr") == 1, F.col("_lc"))).alias("n_total"),
            F.sum(in_cap.cast("long")).alias("n_kept"),
            F.sum(F.when(in_cap, F.col("n_chars"))).alias("kept_chars"),
            F.min(F.when(in_cap, F.col("doc_id"))).alias("min_kept_doc_id"),
        )
    )


@register(
    "dataset_split_summary",
    f"""
    SELECT source,
           CASE WHEN h < 98 THEN 'train' WHEN h < 99 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc_id
    FROM (
      SELECT source, doc_id, n_chars,
             {md5_hash64_sql("CAST(doc_id AS VARCHAR)")} % 100 AS h
      FROM documents
    )
    GROUP BY source, split
    """,
    tags=("sampling", "curation"),
    doc="Deterministic 98/1/1 train/val/test assignment by md5 residue "
    "class of the doc key, audited per (source, split). A narrow map — "
    "no RNG, no shuffle, no global count — and consistent across tables "
    "(same key => same split), so later joins cannot leak train rows "
    "into eval. operators.sampling.split_assign.",
)
def dataset_split_summary(spark, sf_dir):
    from ..operators.sampling import split_assign

    docs = _spread(spark, t(spark, sf_dir, "documents"))
    return (
        split_assign(docs, "doc_id")
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@register(
    "pii_scan",
    f"""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(sum(CASE WHEN email_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_email,
           CAST(sum(CASE WHEN long_digit_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_long_digits,
           CAST(sum(email_hits) AS BIGINT) AS total_email_hits
    FROM (
      SELECT lang,
             len(regexp_extract_all(text, '{TA.EMAIL_PATTERN}')) AS email_hits,
             len(regexp_extract_all(text, '{TA.LONG_DIGIT_PATTERN}'))
               AS long_digit_hits
      FROM documents
    )
    GROUP BY lang
    """,
    tags=("text", "hygiene"),
    doc="PII hygiene scan: per-language counts of documents containing "
    "email-shaped or long-digit-run patterns (regex dialect restricted "
    "to the Java/RE2 common subset so both engines agree). Narrow map + "
    "one rollup shuffle. operators.text_analysis.pii_features.",
)
def pii_scan(spark, sf_dir):
    docs = _spread(spark, t(spark, sf_dir, "documents"))
    feats = TA.pii_features(docs)
    return (
        docs.select("doc_id", "lang")
        .join(feats, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("email_hits") > 0).cast("long")).alias("docs_with_email"),
            F.sum((F.col("long_digit_hits") > 0).cast("long")).alias(
                "docs_with_long_digits"
            ),
            F.sum("email_hits").alias("total_email_hits"),
        )
    )


@register(
    "cross_modal_near_dups",
    f"""
    WITH pairs AS ({_lsh_pairs_oracle()}),
    qn AS (
      SELECT vec_id, q, {_DOT.format(a='q', b='q')} AS norm2
      FROM (SELECT vec_id, {_QUANT} AS q FROM embeddings)
      WHERE {_DOT.format(a='q', b='q')} > 0
    )
    SELECT id_a, id_b,
           round(CAST({_DOT.format(a='a.q', b='b.q')} AS DOUBLE)
                 / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))),
                 6) AS cos_sim
    FROM pairs
    JOIN qn a ON a.vec_id = id_a
    JOIN qn b ON b.vec_id = id_b
    """,
    tags=("dedup", "similarity", "cross-modal"),
    doc="Cross-modal dedup consistency: MinHash-LSH text candidate pairs "
    "scored by exact integer-quantized embedding cosine (doc_id aligns "
    "with vec_id). The candidate set is the (tiny) LSH output, so the "
    "embedding join touches candidates only — never all pairs. Composes "
    "operators.dedup_text.lsh_candidate_pairs + operators.similarity.",
)
def cross_modal_near_dups(spark, sf_dir):
    docs = _spread(spark, t(spark, sf_dir, "documents"))
    pairs = DT.lsh_candidate_pairs(docs)
    qn = SIM.with_quantized_norm(_spread(spark, t(spark, sf_dir, "embeddings")))
    a = qn.select(
        F.col("vec_id").alias("id_a"), F.col("q").alias("qa"), F.col("norm2").alias("na")
    )
    b = qn.select(
        F.col("vec_id").alias("id_b"), F.col("q").alias("qb"), F.col("norm2").alias("nb")
    )
    return (
        pairs.join(F.broadcast(a), "id_a")
        .join(F.broadcast(b), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                SIM._cosine(F.col("qa"), F.col("qb"), F.col("na"), F.col("nb")), 6
            ).alias("cos_sim"),
        )
    )


@register(
    "cluster_keepers",
    f"""
    WITH RECURSIVE pairs AS ({_lsh_pairs_oracle()}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach (id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
    ),
    clusters AS (
      SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
    ),
    ranked AS (
      SELECT c.cluster_id, c.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_docs
      FROM clusters c JOIN documents d USING (doc_id)
    )
    SELECT cluster_id, doc_id AS keeper_id, n_chars AS keeper_chars,
           n_docs AS cluster_size
    FROM ranked WHERE rn = 1
    """,
    tags=("dedup",),
    doc="Canonical-document selection: per near-dup cluster keep the "
    "longest document (ties to the smallest id) — the final step that "
    "turns dedup clusters into a drop list. Clustered docs only "
    "(singletons never enter the pair graph). Composes "
    "connected_components + a per-cluster ranking window.",
)
def cluster_keepers(spark, sf_dir):
    from pyspark.sql import Window

    docs = _spread(spark, t(spark, sf_dir, "documents"))
    clusters = DT.connected_components(DT.lsh_candidate_pairs(docs))
    joined = clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    cw = Window.partitionBy("cluster_id")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count("*").over(cw))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keeper_id"),
            F.col("n_chars").alias("keeper_chars"),
            "cluster_size",
        )
    )


# =====================================================================
# Decontamination / mixture weighting / repetition filters
# =====================================================================

_IS_EVAL = md5_hash64_sql("CAST(doc_id AS VARCHAR)") + " % 16 = 0"


@register(
    "decontamination_report",
    f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, {_IS_EVAL} AS is_eval,
             {md5_hash64_sql('s')} AS shingle_hash
      FROM (
        SELECT doc_id, unnest({_shingles_sql(3)}) AS s
        FROM (SELECT doc_id, {_WORDS} AS words FROM documents)
      )
    )
    SELECT t.doc_id, count(DISTINCT t.shingle_hash) AS n_shared_shingles,
           count(DISTINCT e.doc_id) AS n_eval_docs
    FROM (SELECT doc_id, shingle_hash FROM sh WHERE NOT is_eval) t
    JOIN (SELECT doc_id, shingle_hash FROM sh WHERE is_eval) e
      USING (shingle_hash)
    GROUP BY 1
    """,
    tags=("text", "hygiene", "decontamination"),
    doc="Benchmark decontamination: training docs (the 15/16 hash split) "
    "sharing any word 3-gram with the held-out eval split (the 1/16), "
    "with shared-shingle and touched-eval-doc counts. Eval side "
    "broadcast; both sides reduced to distinct (doc, shingle-hash) "
    "before the join. operators.decontamination.eval_overlap_report.",
)
def decontamination_report(spark, sf_dir):
    from ..functions.hashing import md5_hash64
    from ..operators import decontamination as DC

    docs = _spread(spark, t(spark, sf_dir, "documents"))
    h = md5_hash64(F.col("doc_id").cast("string"))
    return DC.eval_overlap_report(
        docs.filter(h % 16 != 0), docs.filter(h % 16 == 0)
    )


@register(
    "doc_token_rarity",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_WORDS}) AS tok FROM documents),
    vocab AS (SELECT tok, COUNT(*) AS tok_count FROM toks GROUP BY tok),
    tot AS (SELECT SUM(tok_count) AS total_tokens FROM vocab)
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(total_tokens - tok_count) AS BIGINT) AS rarity_sum,
           round(CAST(SUM(total_tokens - tok_count) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_rarity
    FROM toks JOIN vocab USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
    tags=("text", "quality"),
    doc="Unigram-LM rarity (integer-exact perplexity proxy): per-token "
    "rarity = total_tokens - corpus_count(token), summed exactly per "
    "doc; one float division at the end. Vocabulary aggregates with "
    "map-side combine and broadcasts back (Heaps' law keeps it small). "
    "operators.text_analysis.token_rarity.",
)
def doc_token_rarity(spark, sf_dir):
    return TA.token_rarity(_spread(spark, t(spark, sf_dir, "documents")))


@register(
    "doc_chunk_plan",
    f"""
    WITH d AS (
      SELECT doc_id, words, len(words) AS dl
      FROM (SELECT doc_id, {_WORDS} AS words FROM documents)
      WHERE len(words) > 0
    ),
    c AS (
      SELECT doc_id, words, dl,
             unnest(range(0,
               1 + CAST(((greatest(dl - 64, 0) + 47)
                         - (greatest(dl - 64, 0) + 47) % 48) / 48 AS BIGINT)
             )) AS chunk_idx
      FROM d
    )
    SELECT doc_id, chunk_idx, chunk_idx * 48 AS start_word,
           len(words[chunk_idx*48 + 1 : chunk_idx*48 + 64]) AS n_words,
           {md5_hash64_sql("array_to_string(words[chunk_idx*48 + 1 : chunk_idx*48 + 64], ' ')")} AS chunk_hash
    FROM c
    """,
    tags=("text", "chunking"),
    doc="Sliding-window chunk plan (window 64, stride 48): one row per "
    "chunk with token span + md5-family chunk fingerprint. Pure per-row "
    "explode/slice — no shuffle, no join, no Python; linear in corpus "
    "tokens. operators.chunking.chunk_plan.",
)
def doc_chunk_plan(spark, sf_dir):
    from ..operators.chunking import chunk_plan

    return chunk_plan(_spread(spark, t(spark, sf_dir, "documents")))


def _bloom_pos_sql(i: int) -> str:
    """DuckDB twin of operators.decontamination.bloom_positions[i]."""
    from ..functions.hashing import seeded_hash64_sql
    from ..operators.decontamination import _BLOOM_SEED0, BLOOM_BITS

    return (
        seeded_hash64_sql("CAST(shingle_hash AS VARCHAR)", _BLOOM_SEED0 + i)
        + f" % {BLOOM_BITS}"
    )


@register(
    "bloom_contamination_report",
    f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, {_IS_EVAL} AS is_eval,
             {md5_hash64_sql('s')} AS shingle_hash
      FROM (
        SELECT doc_id, unnest({_shingles_sql(3)}) AS s
        FROM (SELECT doc_id, {_WORDS} AS words FROM documents)
      )
    ),
    tr AS (SELECT doc_id, shingle_hash FROM sh WHERE NOT is_eval),
    ev AS (SELECT DISTINCT shingle_hash FROM sh WHERE is_eval),
    evpos AS (
      SELECT DISTINCT pos FROM (
        SELECT unnest([{_bloom_pos_sql(0)}, {_bloom_pos_sql(1)}, {_bloom_pos_sql(2)}]) AS pos
        FROM ev
      )
    ),
    bloomhits AS (
      SELECT doc_id, count(*) AS n_bloom_hits FROM tr
      WHERE {_bloom_pos_sql(0)} IN (SELECT pos FROM evpos)
        AND {_bloom_pos_sql(1)} IN (SELECT pos FROM evpos)
        AND {_bloom_pos_sql(2)} IN (SELECT pos FROM evpos)
      GROUP BY doc_id
    ),
    exact AS (
      SELECT t.doc_id, count(*) AS n_exact_hits
      FROM tr t JOIN ev USING (shingle_hash) GROUP BY 1
    ),
    tot AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY 1)
    SELECT t.doc_id, t.n_shingles, b.n_bloom_hits,
           coalesce(e.n_exact_hits, 0) AS n_exact_hits,
           b.n_bloom_hits - coalesce(e.n_exact_hits, 0) AS n_false_pos
    FROM tot t
    JOIN bloomhits b USING (doc_id)
    LEFT JOIN exact e USING (doc_id)
    """,
    tags=("text", "hygiene", "decontamination", "bloom"),
    doc="Bloom-screened contamination (8 KiB position set, k=3 md5-family "
    "hashes; eval side folds to a capped broadcast regardless of "
    "benchmark size) beside the exact broadcast join, reporting the "
    "per-doc false-positive count — the measured FP rate that tunes "
    "BLOOM_BITS/BLOOM_HASHES. No false negatives by construction. "
    "operators.decontamination.bloom_contamination_report.",
)
def bloom_contamination_report(spark, sf_dir):
    from ..functions.hashing import md5_hash64
    from ..operators import decontamination as DC

    docs = _spread(spark, t(spark, sf_dir, "documents"))
    h = md5_hash64(F.col("doc_id").cast("string"))
    return DC.bloom_contamination_report(
        docs.filter(h % 16 != 0), docs.filter(h % 16 == 0)
    )


@register(
    "corpus_mixture_weights",
    """
    SELECT lang, count(*) AS n_docs,
           round(CAST(count(*) AS DOUBLE) / sum(CAST(count(*) AS DOUBLE)) OVER (), 6)
             AS raw_share,
           round(pow(count(*), 0.7) / sum(pow(count(*), 0.7)) OVER (), 6)
             AS temp_share
    FROM documents GROUP BY lang
    """,
    tags=("sampling", "mixture"),
    doc="Temperature-scaled mixture weights per language (w ∝ n^0.7 "
    "normalized, tau the standard multilingual re-balancing knob): the "
    "sampling plan for a training mix. The global window runs on "
    "|languages| rows, never the corpus. "
    "operators.sampling.temperature_mixture.",
)
def corpus_mixture_weights(spark, sf_dir):
    from ..operators.sampling import temperature_mixture

    return temperature_mixture(
        _spread(spark, t(spark, sf_dir, "documents")), "lang"
    )


@register(
    "doc_repetition_profile",
    f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    base AS (
      SELECT doc_id, len(words) AS n_words,
             len(list_distinct(words)) AS n_distinct
      FROM w WHERE len(words) > 0
    ),
    bg AS (
      SELECT doc_id, unnest({_shingles_sql(2)}) AS b FROM w
      WHERE len(words) > 0
    ),
    cnt AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
    top AS (
      SELECT doc_id, max(c) AS top_cnt, sum(c) AS n_bigrams
      FROM cnt GROUP BY 1
    )
    SELECT doc_id, n_words,
           round(1 - n_distinct / CAST(n_words AS DOUBLE), 6) AS dup_word_frac,
           round(top_cnt / CAST(n_bigrams AS DOUBLE), 6) AS top_bigram_frac
    FROM base JOIN top USING (doc_id)
    """,
    tags=("text", "quality"),
    doc="Gopher-style repetition filter: per-doc duplicate-word fraction "
    "and top-bigram share — the boilerplate/spam signals cross-document "
    "dedup cannot see. operators.text_analysis.repetition_profile.",
)
def doc_repetition_profile(spark, sf_dir):
    return TA.repetition_profile(_spread(spark, t(spark, sf_dir, "documents")))


# =====================================================================
# Packing + end-to-end curation funnel
# =====================================================================


@register(
    "sequence_packing_plan",
    f"""
    WITH s AS (
      SELECT lang, doc_id, len({_WORDS}) AS n_tokens FROM documents
    ),
    c AS (
      SELECT lang, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - n_tokens AS BIGINT) AS start
      FROM s
    )
    SELECT lang, start // 2048 AS bin_id, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           round(CAST(sum(n_tokens) AS BIGINT) / 2048.0, 4) AS fill_ratio
    FROM c GROUP BY 1, 2
    """,
    tags=("sampling", "packing"),
    doc="Sequence packing: documents streamed in doc_id order into "
    "2048-token bins per language — the batching plan that turns a "
    "curated corpus into training sequences. Per-stratum windows keep "
    "the cumsum partitioned; exact integer arithmetic keeps the plan "
    "bit-reproducible. operators.sampling.pack_plan.",
)
def sequence_packing_plan(spark, sf_dir):
    from ..operators.sampling import pack_plan

    docs = _spread(spark, t(spark, sf_dir, "documents"))
    sized = docs.select(
        "lang", "doc_id", F.size(DT.words_of("text")).alias("n_tokens")
    )
    return pack_plan(sized, "n_tokens", "doc_id", "lang", capacity=2048)


_QSCORE = f"""round(0.35 * (CAST(len(list_distinct(words)) AS DOUBLE) / len(words))
               + 0.25 * (CAST(len(list_filter(words, w -> list_contains({_STOP_ARR}, w))) AS DOUBLE) / len(words))
               + 0.25 * (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text))
               + 0.15 * least(CAST(len(words) AS DOUBLE) / 100.0, 1.0), 4)"""


@register(
    "curation_funnel",
    f"""
    WITH q AS (
      SELECT doc_id, {_QSCORE} AS quality_score
      FROM (SELECT doc_id, text, {_WORDS} AS words FROM documents)
    ),
    k AS (
      SELECT min(doc_id) AS doc_id FROM documents
      GROUP BY {md5_hash64_sql('text')}
    ),
    p AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{TA.EMAIL_PATTERN}')) AS e,
             len(regexp_extract_all(text, '{TA.LONG_DIGIT_PATTERN}')) AS d
      FROM documents
    ),
    f AS (
      SELECT q.doc_id, q.quality_score >= 0.5 AS q_ok,
             k.doc_id IS NOT NULL AS is_kept,
             (p.e = 0 AND p.d = 0) AS pii_ok
      FROM q LEFT JOIN k ON k.doc_id = q.doc_id
             JOIN p ON p.doc_id = q.doc_id
    )
    SELECT count(*) AS n_total,
           CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(sum(CASE WHEN q_ok AND is_kept THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           CAST(sum(CASE WHEN q_ok AND is_kept AND pii_ok THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clean
    FROM f
    """,
    tags=("text", "hygiene", "dedup", "funnel"),
    doc="End-to-end curation funnel: survivors after each stage of "
    "quality filter (composite score >= 0.5) -> exact dedup (canonical "
    "doc per content hash) -> PII screen, composed from the "
    "quality_features + exact_dedup + pii_features operators in one "
    "aggregation pass over the flag joins.",
)
def curation_funnel(spark, sf_dir):
    docs = _spread(spark, t(spark, sf_dir, "documents"))
    q = TA.quality_features(docs).select("doc_id", "quality_score")
    kept = DT.exact_dedup(docs).select(
        F.col("kept_id").alias("doc_id"), F.lit(1).alias("_kept")
    )
    p = TA.pii_features(docs).select("doc_id", "email_hits", "long_digit_hits")
    flags = (
        q.join(kept, "doc_id", "left")
        .join(p, "doc_id")
        .select(
            (F.col("quality_score") >= 0.5).alias("q_ok"),
            F.col("_kept").isNotNull().alias("is_kept"),
            ((F.col("email_hits") == 0) & (F.col("long_digit_hits") == 0)).alias(
                "pii_ok"
            ),
        )
    )
    return flags.agg(
        F.count("*").alias("n_total"),
        F.sum(F.col("q_ok").cast("long")).alias("n_quality"),
        F.sum((F.col("q_ok") & F.col("is_kept")).cast("long")).alias("n_unique"),
        F.sum((F.col("q_ok") & F.col("is_kept") & F.col("pii_ok")).cast("long")).alias(
            "n_clean"
        ),
    )


# =====================================================================
# Deterministic k-means clustering + semantic dedup (SemDeDup-style)
# =====================================================================

KM_K, KM_ITERS, KM_DIMS = 8, 3, 64


def _kmeans_cte(k: int, iters: int, dims: int) -> str:
    """Unrolled Lloyd's iteration as CTEs (same pattern as the PageRank
    oracle): every step exact integer math, ending at centroids c{iters}
    and final assignment af(vec_id, cid, d2)."""
    parts = [
        f"""
    WITH qn AS (
      SELECT * FROM (
        SELECT vec_id, q, {_DOT.format(a='q', b='q')} AS norm2
        FROM (SELECT vec_id, {_QUANT} AS q FROM embeddings)
      ) WHERE norm2 > 0
    ),
    pos AS (SELECT unnest(generate_series(1, {dims})) AS pos),
    vx AS (SELECT vec_id, pos, q[pos] AS x FROM qn, pos),
    c0 AS (
      SELECT cid, pos, q[pos] AS val
      FROM (SELECT q, row_number() OVER (ORDER BY vec_id) - 1 AS cid
            FROM qn ORDER BY vec_id LIMIT {k}), pos
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
    a{i} AS (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, c.cid,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY sum((v.x - c.val) * (v.x - c.val)) ASC,
                                        c.cid ASC) AS rn
        FROM vx v JOIN c{i - 1} c ON c.pos = v.pos
        GROUP BY v.vec_id, c.cid
      ) WHERE rn = 1
    ),
    c{i} AS (
      SELECT p.cid, p.pos, COALESCE(s.val, p.val) AS val
      FROM c{i - 1} p LEFT JOIN (
        SELECT a.cid, v.pos,
               CAST(sum(v.x) AS BIGINT) // CAST(count(*) AS BIGINT) AS val
        FROM a{i} a JOIN vx v ON v.vec_id = a.vec_id
        GROUP BY a.cid, v.pos
      ) s ON s.cid = p.cid AND s.pos = p.pos
    )"""
        )
    parts.append(
        f""",
    af AS (
      SELECT vec_id, cid, d2 FROM (
        SELECT v.vec_id, c.cid,
               CAST(sum((v.x - c.val) * (v.x - c.val)) AS BIGINT) AS d2,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY sum((v.x - c.val) * (v.x - c.val)) ASC,
                                        c.cid ASC) AS rn
        FROM vx v JOIN c{iters} c ON c.pos = v.pos
        GROUP BY v.vec_id, c.cid
      ) WHERE rn = 1
    )"""
    )
    return "".join(parts)


_KM_CTE = _kmeans_cte(KM_K, KM_ITERS, KM_DIMS)


#: fitted-codebook memo, keyed by (embeddings fingerprint, k, iters). The
#: fit is bit-deterministic (exact integer Lloyd's), so the centroid matrix
#: is a reusable model artifact — the three kmeans-family queries share one
#: fit per process instead of refitting (iters+1 corpus scans each) per
#: query. The fingerprint (path, mtime, size) invalidates the memo if the
#: table is regenerated in place mid-process; the SQL oracle refits from
#: the data, so a stale model would silently break parity.
_KM_CENTS: dict[tuple, list[list[int]]] = {}


def _kmeans(spark, sf_dir):
    from ..operators import clustering as KM
    from .queries import table_fingerprint

    emb = _spread(spark, t(spark, sf_dir, "embeddings"))
    key = (table_fingerprint(sf_dir, "embeddings"), KM_K, KM_ITERS)
    assigned, cents = KM.kmeans_fit(
        emb, k=KM_K, iters=KM_ITERS, centroids=_KM_CENTS.get(key)
    )
    _KM_CENTS[key] = cents
    return assigned, cents


@register(
    "kmeans_centroids",
    f"""
    {_KM_CTE}
    SELECT cid AS cluster_id, pos - 1 AS pos, val FROM c{KM_ITERS}
    """,
    tags=("clustering",),
    doc=f"Final centroids of {KM_ITERS}-step deterministic integer "
    f"Lloyd's k-means (k={KM_K}) in long form (cluster_id, pos, val): "
    "the oracle re-derives every iteration via unrolled CTEs. "
    "operators.clustering.kmeans_fit.",
)
def kmeans_centroids(spark, sf_dir):
    from ..operators import clustering as KM

    _, cents = _kmeans(spark, sf_dir)
    return KM.kmeans_centroids_long(spark, cents)


@register(
    "kmeans_cluster_profile",
    f"""
    {_KM_CTE}
    SELECT af.cid AS cluster_id, count(*) AS n_members,
           min(af.vec_id) AS min_vec_id, cn.centroid_norm2
    FROM af JOIN (
      SELECT cid, CAST(sum(val * val) AS BIGINT) AS centroid_norm2
      FROM c{KM_ITERS} GROUP BY cid
    ) cn ON cn.cid = af.cid
    GROUP BY af.cid, cn.centroid_norm2
    """,
    tags=("clustering",),
    doc="Per-cluster audit of the final k-means assignment: member "
    "count, smallest member id, and the exact integer centroid norm. "
    "operators.clustering.kmeans_profile.",
)
def kmeans_cluster_profile(spark, sf_dir):
    from ..operators import clustering as KM

    assigned, cents = _kmeans(spark, sf_dir)
    return KM.kmeans_profile(assigned, cents)


@register(
    "semantic_dedup_keepers",
    f"""
    {_KM_CTE}
    SELECT cid AS cluster_id, vec_id AS keeper_vec_id, d2
    FROM (
      SELECT cid, vec_id, d2,
             row_number() OVER (PARTITION BY cid ORDER BY d2 ASC, vec_id ASC) AS rn
      FROM af
    ) WHERE rn = 1
    """,
    tags=("clustering", "dedup"),
    doc="SemDeDup representative selection: the member nearest its "
    "final centroid per cluster (exact integer squared-L2, ties to the "
    "smaller id). operators.clustering.kmeans_keepers.",
)
def semantic_dedup_keepers(spark, sf_dir):
    assigned, _ = _kmeans(spark, sf_dir)
    from ..operators import clustering as KM

    return KM.kmeans_keepers(assigned)


# =====================================================================
# Index quality audit + corpus hygiene composition
# =====================================================================


@register(
    "ann_recall_report",
    f"""
    WITH {_IVF_QN},
    assigned AS (SELECT vec_id, c_id AS list_id FROM centroid_cos WHERE rn = 1),
    probes AS (
      SELECT cc.vec_id AS query_id, cc.c_id AS list_id
      FROM centroid_cos cc WHERE cc.rn <= 2 AND cc.vec_id < 8
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             CAST({_DOT.format(a='q.q', b='c.q')} AS DOUBLE)
               / (sqrt(CAST(q.norm2 AS DOUBLE)) * sqrt(CAST(c.norm2 AS DOUBLE))) AS cos_exact
      FROM probes p
      JOIN assigned a ON a.list_id = p.list_id AND a.vec_id <> p.query_id
      JOIN qn q ON q.vec_id = p.query_id
      JOIN qn c ON c.vec_id = a.vec_id
    ),
    ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_exact DESC, neighbor_id ASC) AS rank
        FROM scored
      ) WHERE rank <= 3
    ),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY CAST({_DOT.format(a='q.q', b='c.q')} AS DOUBLE)
                                        / (sqrt(CAST(q.norm2 AS DOUBLE)) * sqrt(CAST(c.norm2 AS DOUBLE))) DESC,
                                        c.vec_id ASC) AS rank
        FROM (SELECT * FROM qn WHERE vec_id < 8) q
        JOIN qn c ON c.vec_id <> q.vec_id
      ) WHERE rank <= 3
    )
    SELECT b.query_id, count(i.neighbor_id) AS n_matched,
           round(CAST(count(i.neighbor_id) AS DOUBLE) / 3, 6) AS recall_at_3
    FROM brute b LEFT JOIN ivf i
      ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    """,
    tags=("similarity", "ivf", "audit"),
    doc="Index quality audit: recall@3 of the IVF(nprobe=2) index against "
    "exact brute-force cosine top-3 per query vector. The self-evaluation "
    "loop a production ANN deployment runs on a held-out query sample; "
    "both sides reuse the memoized coarse quantizer. "
    "operators.similarity.ivf_topk vs cosine_topk.",
)
def ann_recall_report(spark, sf_dir):
    emb = _spread(spark, t(spark, sf_dir, "embeddings"))
    qv = emb.filter(F.col("vec_id") < 8)
    cb = _ivf_codebook(spark, sf_dir)
    ivf = SIM.ivf_topk(
        emb, qv, k=3, n_lists=16, nprobe=2, codebook=cb
    ).select(F.col("query_id").alias("iq"), F.col("neighbor_id").alias("in_"))
    exact = SIM.cosine_topk(emb, qv, k=3).select("query_id", "neighbor_id")
    return (
        exact.join(
            ivf,
            (exact.query_id == ivf.iq) & (exact.neighbor_id == ivf.in_),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("in_").alias("n_matched"))
        .select(
            "query_id",
            "n_matched",
            F.round(F.col("n_matched").cast("double") / 3, 6).alias(
                "recall_at_3"
            ),
        )
    )


@register(
    "dedup_rate_by_source",
    """
    SELECT source, count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique,
           round(CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE)
                 / count(*), 6) AS dup_rate
    FROM documents
    GROUP BY source
    """,
    tags=("dedup", "audit"),
    doc="Per-source exact-duplicate audit: content-hash distinct counts "
    "vs raw counts, the first diagnostic a corpus curation run prints. "
    "Two-phase distinct aggregation on (source, hash) — map-side "
    "combined, never a full-row shuffle.",
)
def dedup_rate_by_source(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_unique"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            F.round(
                (F.col("n_docs") - F.col("n_unique")).cast("double")
                / F.col("n_docs"),
                6,
            ).alias("dup_rate"),
        )
    )


def _minhash_est_sql(perms: int = DT.MINHASH_PERMS) -> str:
    """SUM of per-permutation signature-component matches between pair
    sides a/b, as SQL."""
    return " + ".join(
        f"(CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END)" for i in range(perms)
    )


@register(
    "minhash_estimate_report",
    f"""
    WITH pairs AS ({_lsh_pairs_oracle()}),
    sig AS (
      SELECT doc_id,
             {', '.join(f'{e} AS mh_{i}' for i, e in enumerate(_minhash_sql(DT.MINHASH_PERMS)))}
      FROM (
        SELECT doc_id,
               list_transform(sh, x -> {md5_hash64_sql('x')} % {DT.MERSENNE31}) AS bases
        FROM (
          SELECT doc_id, {_shingles_sql(3)} AS sh
          FROM (SELECT doc_id, {_WORDS} AS words FROM documents)
        )
      )
    ),
    est AS (
      SELECT p.id_a, p.id_b,
             round(CAST(({_minhash_est_sql()}) AS DOUBLE)
                   / {DT.MINHASH_PERMS}, 6) AS est_jaccard
      FROM pairs p
      JOIN sig a ON a.doc_id = p.id_a
      JOIN sig b ON b.doc_id = p.id_b
    ),
    sets AS (
      SELECT doc_id, list_distinct(sh) AS sh
      FROM (
        SELECT doc_id, {_shingles_sql(3)} AS sh
        FROM (SELECT doc_id, {_WORDS} AS words FROM documents)
      )
    ),
    ex AS (
      SELECT id_a, id_b,
             round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS exact_jaccard
      FROM pairs
      JOIN sets a ON pairs.id_a = a.doc_id
      JOIN sets b ON pairs.id_b = b.doc_id
    )
    SELECT e.id_a, e.id_b, e.est_jaccard, x.exact_jaccard,
           round(abs(e.est_jaccard - x.exact_jaccard), 6) AS abs_err
    FROM est e JOIN ex x ON x.id_a = e.id_a AND x.id_b = e.id_b
    """,
    tags=("dedup", "lsh", "audit"),
    doc="Sketch quality audit for the MinHash dedup path: per LSH "
    "candidate pair, the signature-agreement Jaccard estimate "
    "(matches/12) against the exact shingle-set Jaccard, with absolute "
    "error. The estimator-calibration check a dedup deployment runs "
    "before trusting banding thresholds at corpus scale; candidates "
    "only, never all-pairs. operators.dedup_text.minhash_signatures + "
    "jaccard_verify.",
)
def minhash_estimate_report(spark, sf_dir):
    docs = _spread(spark, t(spark, sf_dir, "documents"))
    # ONE corpus scan for the whole audit: the persisted profile carries
    # both the signature columns (est side, banding side) and the distinct
    # shingle sets (exact side). Round 3 computed the shingle->hash
    # pipeline ~3x here (signatures, then lsh_candidate_pairs' internal
    # recompute, then jaccard_verify's re-shingle).
    # r13: checkpoint over persist (A/B 3/3 pairwise, min 1.29 -> 1.24,
    # medians lower on every trial) — see cache.checkpoint_in
    prof = checkpoint_in(None, DT.minhash_signatures(docs, keep_shingles=True))
    sig = prof.drop("sh")
    pairs = checkpoint_in(None, DT.lsh_candidate_pairs(docs, sig=sig))
    matches = sum(
        (F.col(f"a.mh_{i}") == F.col(f"b.mh_{i}")).cast("int")
        for i in range(DT.MINHASH_PERMS)
    )
    est = (
        pairs.join(sig.alias("a"), F.col("id_a") == F.col("a.doc_id"))
        .join(sig.alias("b"), F.col("id_b") == F.col("b.doc_id"))
        .select(
            "id_a",
            "id_b",
            F.round(
                matches.cast("double") / DT.MINHASH_PERMS, 6
            ).alias("est_jaccard"),
        )
    )
    exact = DT.jaccard_verify(
        docs, pairs, threshold=0.0, sets=prof.select("doc_id", "sh")
    ).withColumnRenamed("jaccard", "exact_jaccard")
    return est.join(exact, ["id_a", "id_b"]).select(
        "id_a",
        "id_b",
        "est_jaccard",
        "exact_jaccard",
        F.round(F.abs(F.col("est_jaccard") - F.col("exact_jaccard")), 6).alias(
            "abs_err"
        ),
    )


# --- BM25 keyword search -----------------------------------------------------


def _bm25_oracle(
    terms: tuple[str, ...], k: int, k1: float, b: float
) -> str:
    """DuckDB twin of operators.bm25.bm25_topk: identical expression
    association term-for-term (log-free rational IDF — see the module
    docstring for why no ln)."""
    tf_cols = ", ".join(
        f"len(list_filter({_WORDS}, w -> w = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    contribs = " + ".join(
        f"(((CAST(n - df_{i} AS DOUBLE) + 0.5) / (CAST(df_{i} AS DOUBLE) + 0.5))"
        f" * ((CAST(tf_{i} AS DOUBLE) * {k1 + 1!r})"
        f" / (CAST(tf_{i} AS DOUBLE) + {k1!r} * (1 - {b!r} + {b!r}"
        f" * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE)))))))"
        for i in range(len(terms))
    )
    nmatch = " + ".join(
        f"CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END" for i in range(len(terms))
    )
    return f"""
    WITH d AS (
      SELECT doc_id, len({_WORDS}) AS dl, {tf_cols} FROM documents
    ),
    s AS (SELECT COUNT(*) AS n, SUM(dl) AS sum_dl, {df_cols} FROM d),
    scored AS (
      SELECT doc_id, ({nmatch}) AS n_terms_matched, ({contribs}) AS score
      FROM d CROSS JOIN s
    )
    SELECT doc_id, n_terms_matched, round(score, 6) AS bm25, rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@register(
    "bm25_keyword_search",
    _bm25_oracle(BM.BM25_TERMS, 15, BM.BM25_K1, BM.BM25_B),
    tags=("text", "retrieval"),
    doc="BM25 top-15 for a fixed query-term set: per-doc tf/dl as a "
    "narrow no-explode projection, corpus stats as ONE broadcast 1-row "
    "aggregate, top-k via per-partition heaps. Log-free rational IDF "
    "for cross-engine bit parity. operators.bm25.bm25_topk.",
)
def bm25_keyword_search(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return BM.bm25_topk(docs)


@register(
    "hybrid_rrf_search",
    f"""
    WITH b AS ({{bm25}}),
    a AS ({{ann}}),
    fused AS (
      SELECT coalesce(b.doc_id, a.neighbor_id) AS doc_id,
             b.rank AS bm25_rank, a.rank AS ann_rank,
             coalesce(1.0 / (60 + b.rank), 0) + coalesce(1.0 / (60 + a.rank), 0)
               AS rrf
      FROM b FULL JOIN a ON a.neighbor_id = b.doc_id
    )
    SELECT doc_id, bm25_rank, ann_rank, round(rrf, 6) AS rrf_score, rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rank
      FROM fused
    ) WHERE rank <= 10
    """.format(
        bm25=_bm25_oracle(BM.BM25_TERMS, 15, BM.BM25_K1, BM.BM25_B),
        ann=_ann_oracle(k=15, n_queries=1),
    ),
    tags=("text", "retrieval", "similarity"),
    doc="Hybrid retrieval: reciprocal-rank fusion (RRF, c=60) of the "
    "BM25 top-15 and the exact-cosine ANN top-15 for query vector 0 "
    "(doc_id and vec_id share the id space in this corpus). Both legs "
    "keep their own scale shapes; the fusion is a full outer join of "
    "two <=15-row lists plus a 10-row ranking window — driver-trivial "
    "at any corpus size. A missing leg contributes exactly 0.",
)
def hybrid_rrf_search(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    emb = _spread(spark, t(spark, sf_dir, "embeddings"))
    b = BM.bm25_topk(docs).select("doc_id", F.col("rank").alias("bm25_rank"))
    a = SIM.cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=15).select(
        F.col("neighbor_id").alias("_aid"), F.col("rank").alias("ann_rank")
    )
    j = b.join(a, b["doc_id"] == a["_aid"], "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(60) + F.col("bm25_rank")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("ann_rank")), F.lit(0.0))
    fused = j.select(
        F.coalesce("doc_id", "_aid").alias("doc_id"),
        "bm25_rank",
        "ann_rank",
        rrf.alias("_rrf"),
    )
    top = fused.orderBy(F.desc("_rrf"), F.asc("doc_id")).limit(10)
    win = Window.orderBy(F.desc("_rrf"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(win).cast("long")).select(
        "doc_id",
        "bm25_rank",
        "ann_rank",
        F.round("_rrf", 6).alias("rrf_score"),
        "rank",
    )


@register(
    "chunk_dup_rate",
    f"""
    WITH d AS (
      SELECT doc_id, words, len(words) AS dl
      FROM (SELECT doc_id, {_WORDS} AS words FROM documents)
      WHERE len(words) > 0
    ),
    c AS (
      SELECT doc_id, words, dl,
             unnest(range(0,
               1 + CAST(((greatest(dl - 64, 0) + 47)
                         - (greatest(dl - 64, 0) + 47) % 48) / 48 AS BIGINT)
             )) AS chunk_idx
      FROM d
    ),
    ch AS (
      SELECT doc_id,
             {md5_hash64_sql("array_to_string(words[chunk_idx*48 + 1 : chunk_idx*48 + 64], ' ')")} AS chunk_hash
      FROM c
    ),
    per_dh AS (SELECT doc_id, chunk_hash, COUNT(*) AS c_dh FROM ch GROUP BY 1, 2),
    per_h AS (SELECT chunk_hash, SUM(c_dh) AS c_h FROM per_dh GROUP BY 1)
    SELECT doc_id, CAST(SUM(c_dh) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN c_h >= 2 THEN c_dh ELSE 0 END) AS BIGINT)
             AS dup_chunks,
           round(CAST(SUM(CASE WHEN c_h >= 2 THEN c_dh ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(c_dh) AS DOUBLE), 6) AS dup_frac
    FROM per_dh JOIN per_h USING (chunk_hash)
    GROUP BY doc_id
    """,
    tags=("text", "chunking", "dedup"),
    doc="Paragraph-level dedup audit (C4-style granularity between "
    "doc-exact and span-exact): corpus multiplicity of every sliding "
    "chunk fingerprint, rolled up per doc — same two keyed shuffles as "
    "dup_span_report but over window-64 chunks, so a repeated paragraph "
    "flags without a full-doc or 6-gram match. Composes "
    "operators.chunking.chunk_plan with the span-profile shape.",
)
def chunk_dup_rate(spark, sf_dir):
    from ..operators.chunking import chunk_plan

    ch = chunk_plan(_spread(spark, t(spark, sf_dir, "documents"))).select(
        "doc_id", "chunk_hash"
    )
    per_dh = ch.groupBy("doc_id", "chunk_hash").agg(F.count("*").alias("c_dh"))
    # r13: checkpoint over persist (A/B chunk_dup_rate 3/3 pairwise,
    # min 1.22 -> 0.77 s)
    per_dh = checkpoint_in(None, per_dh)  # feeds the rollup AND the join probe
    per_h = per_dh.groupBy("chunk_hash").agg(F.sum("c_dh").alias("c_h"))
    return (
        per_dh.join(per_h, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.sum("c_dh").alias("n_chunks"),
            F.sum(
                F.when(F.col("c_h") >= 2, F.col("c_dh")).otherwise(F.lit(0))
            ).alias("dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "dup_chunks",
            F.round(
                F.col("dup_chunks").cast("double")
                / F.col("n_chunks").cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )


# =====================================================================
# DSIR-style importance weights for data selection
# =====================================================================

_DSIR_BUCKETS = 1024
_DSIR_TARGET_LANG = "en"
_DSIR_TOP = 20


def _dsir_oracle() -> str:
    B, lang, top = _DSIR_BUCKETS, _DSIR_TARGET_LANG, _DSIR_TOP
    h = md5_hash64_sql("w")
    return f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest({_WORDS}) AS w FROM documents
    ),
    tb AS (SELECT doc_id, lang, {h} % {B} AS b FROM tok),
    raw AS (SELECT b, count(*) AS rc FROM tb GROUP BY b),
    tgt AS (SELECT b, count(*) AS tc FROM tb WHERE lang = '{lang}' GROUP BY b),
    tot AS (SELECT count(*) AS raw_n,
                   CAST(sum(CASE WHEN lang = '{lang}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS tgt_n
            FROM tb),
    wt AS (
      SELECT raw.b,
             ln((COALESCE(tgt.tc, 0) + 1) / (tot.tgt_n + {B}.0))
               - ln((raw.rc + 1) / (tot.raw_n + {B}.0)) AS w_b
      FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot
    ),
    scored AS (
      SELECT tb.doc_id, min(tb.lang) AS lang,
             CAST(count(*) AS BIGINT) AS n_tokens,
             round(sum(wt.w_b), 4) AS dsir_weight
      FROM tb JOIN wt ON wt.b = tb.b
      GROUP BY tb.doc_id
    )
    SELECT doc_id, lang, n_tokens, dsir_weight
    FROM scored ORDER BY dsir_weight DESC, doc_id ASC LIMIT {top}
    """


# =====================================================================
# Hashed-bigram LM fluency scoring (CCNet-style perplexity filter)
# =====================================================================

_LM_BUCKETS = 128
_LM_LANG = "en"
_LM_TOP = 20


def _ngram_lm_oracle() -> str:
    B, lang, top = _LM_BUCKETS, _LM_LANG, _LM_TOP
    h1 = md5_hash64_sql("words[i]")
    h2 = md5_hash64_sql("words[i+1]")
    return f"""
    WITH w AS (SELECT doc_id, lang, {_WORDS} AS words FROM documents),
    b AS (
      SELECT doc_id, lang, p[1] AS b1, p[2] AS b2
      FROM (
        SELECT doc_id, lang,
               unnest(list_transform(range(1, len(words)),
                                     i -> [{h1} % {B}, {h2} % {B}])) AS p
        FROM w
      )
    ),
    c12 AS (SELECT b1, b2, CAST(count(*) AS BIGINT) AS c
            FROM b WHERE lang = '{lang}' GROUP BY 1, 2),
    c1 AS (SELECT b1, CAST(sum(c) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
    s AS (
      SELECT b.doc_id, min(b.lang) AS lang,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             round(avg(ln(coalesce(c1.c1, 0) + {B}.0)
                       - ln(coalesce(c12.c, 0) + 1.0)), 4) AS bigram_nll
      FROM b LEFT JOIN c12 USING (b1, b2) LEFT JOIN c1 USING (b1)
      GROUP BY b.doc_id
    )
    SELECT doc_id, lang, n_bigrams, bigram_nll
    FROM s ORDER BY bigram_nll ASC, doc_id ASC LIMIT {top}
    """


@register(
    "ngram_lm_fluency",
    _ngram_lm_oracle(),
    tags=("text", "quality", "llm-pipeline"),
    doc="CCNet-style LM quality filter (Wenzek et al. 2020), hashed to "
    "stay engine-exact: an add-one-smoothed conditional bigram LM over "
    "128 hash buckets is trained on the lang='en' slice, every doc is "
    "scored by mean negative log-likelihood per bigram, and the 20 most "
    "fluent docs (lowest NLL, doc_id tiebreak) are returned — the "
    "keep/drop signal a perplexity filter thresholds on. Scale shape: "
    "the bigram-count table is capped at 128^2 rows and the unigram "
    "table at 128 regardless of corpus size, so scoring is two "
    "BROADCAST left joins over one token-pair scan (built by a "
    "transform/slice over the split words array — no window, no "
    "self-join, no position explode); train + score = three "
    "map-side-combined passes over the token stream. Floats: ln() is "
    "the scoring definition; IEEE-double on both engines, rounded 4 dp.",
)
def ngram_lm_fluency(spark, sf_dir):
    B, lang, top = _LM_BUCKETS, _LM_LANG, _LM_TOP
    docs = t(spark, sf_dir, "documents")
    bkt = (
        f"CAST(conv(substring(md5({{}}), 1, 15), 16, 10) AS BIGINT) % {B}"
    )
    pair = (
        "transform(slice(_words, 1, greatest(size(_words) - 1, 0)), "
        f"(w, i) -> struct({bkt.format('w')} AS b1, "
        f"{bkt.format('element_at(_words, i + 2)')} AS b2))"
    )
    b = (
        docs.withColumn(
            "_words", F.filter(F.split("text", " "), lambda w: w != "")
        )
        .select("doc_id", "lang", F.explode(F.expr(pair)).alias("p"))
        .select("doc_id", "lang", F.col("p.b1").alias("b1"), F.col("p.b2").alias("b2"))
    )
    # r13: c1 derives from c12, so the c1 broadcast re-ran the whole
    # tokenize+md5 bigram explode; checkpointing the (<= B^2-row) bigram
    # count table makes c1 a re-aggregation of materialized rows.
    # Tokenize passes 3 -> 2 (A/B min-of-2: 1.60 -> 1.29 s, 3/3).
    from ..operators.cache import checkpoint_in

    c12 = checkpoint_in(
        None,
        b.filter(F.col("lang") == lang)
        .groupBy("b1", "b2")
        .agg(F.count("*").cast("long").alias("c")),
    )
    c1 = c12.groupBy("b1").agg(F.sum("c").cast("long").alias("c1"))
    nll = F.log(F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(B))) - F.log(
        F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0)
    )
    scored = (
        b.join(F.broadcast(c12), ["b1", "b2"], "left")
        .join(F.broadcast(c1), ["b1"], "left")
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg(nll), 4).alias("bigram_nll"),
        )
    )
    return scored.orderBy(F.asc("bigram_nll"), F.asc("doc_id")).limit(top)


@register(
    "dsir_importance_weights",
    _dsir_oracle(),
    tags=("text", "selection", "llm-pipeline"),
    doc="DSIR-style data-selection importance weights (Xie et al. 2023, "
    "'Data Selection for Language Models via Importance Resampling'): "
    "hashed-unigram bag features into 1024 buckets, per-doc weight = "
    "log-likelihood ratio of the target distribution (lang='en' docs) "
    "vs the raw pool, add-one smoothed; top-20 docs by weight. Scale "
    "shape: the two bucket-count tables and the 1-row totals are "
    "BROADCAST (1024 rows each, regardless of corpus size); the token "
    "stream is scanned twice with map-side-combined counts and once "
    "for scoring — no shuffle ever carries more than (docs x 1) rows. "
    "Floats: ln() is the defining operation of the method; both engines "
    "use IEEE-double natural log and the weight is rounded to 4 dp.",
)
def dsir_importance_weights(spark, sf_dir):
    B, lang, top = _DSIR_BUCKETS, _DSIR_TARGET_LANG, _DSIR_TOP
    from ..functions.hashing import md5_hash64

    docs = t(spark, sf_dir, "documents")
    tb = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("w"),
    ).filter(F.col("w") != "").select(
        "doc_id", "lang", F.pmod(md5_hash64(F.col("w")), F.lit(B)).alias("b")
    )
    # r13 (guide §1.2): raw/tgt/tot were three separate aggregations,
    # each a broadcast subtree re-running the tokenize+md5 explode — the
    # corpus pipeline executed 4x per invocation. ONE map-side-combined
    # per-bucket aggregation now carries both counts; the totals are a
    # second-level aggregate of the (tiny, B-row) bucket table, which is
    # checkpointed so the totals job and the weight broadcast both read
    # the materialized B rows instead of re-tokenizing. A/B min-of-2:
    # 1.64 -> 1.14 s, 3/3 pairwise; tokenize passes 4 -> 2 (the
    # irreducible learn-then-score pair).
    from ..operators.cache import checkpoint_in

    per_b = checkpoint_in(
        None,
        tb.groupBy("b").agg(
            F.count("*").alias("rc"),
            F.sum((F.col("lang") == lang).cast("long")).alias("tc"),
        ),
    )
    tot = per_b.agg(
        F.sum("rc").alias("raw_n"), F.sum("tc").alias("tgt_n")
    )
    wt = per_b.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log(
                (F.coalesce(F.col("tc"), F.lit(0)) + 1)
                / (F.col("tgt_n") + F.lit(float(B)))
            )
            - F.log((F.col("rc") + 1) / (F.col("raw_n") + F.lit(float(B))))
        ).alias("w_b"),
    )
    scored = (
        tb.join(F.broadcast(wt), "b")
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.count("*").alias("n_tokens"),
            F.round(F.sum("w_b"), 4).alias("dsir_weight"),
        )
    )
    return scored.orderBy(F.desc("dsir_weight"), F.asc("doc_id")).limit(top)


@register(
    "edit_distance_near_pairs",
    """
    WITH d0 AS (
      SELECT doc_id, substr(text, 1, 12) AS blk,
             substr(text, 1, 64) AS t64
      FROM documents
    ),
    bs AS (SELECT blk FROM d0 GROUP BY blk HAVING COUNT(*) <= 64),
    d AS (SELECT d0.* FROM d0 JOIN bs USING (blk)),
    p AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             CAST(levenshtein(a.t64, b.t64) AS BIGINT) AS edit_distance
      FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
    )
    SELECT * FROM p WHERE edit_distance <= 16
    ORDER BY edit_distance, doc_id_a, doc_id_b LIMIT 20
    """,
    tags=("dedup", "er", "text", "llm-pipeline"),
    doc="Blocked edit-distance near-duplicate pairs (ClickHouse "
    "editDistance / classic entity-resolution blocking): candidate "
    "pairs share a 12-char prefix block, pairs within Levenshtein 16 "
    "on the 64-char head survive; top-20 by (distance, ids). The "
    "all-pairs trap is handled the way production ER does: the "
    "equi-join on the block key only ever expands WITHIN a block, and "
    "a size guard drops pathological blocks (>64 members) before the "
    "join, so the worst task is 64x64 comparisons regardless of "
    "corpus size — the hot loop is Spark's built-in levenshtein "
    "(JVM codegen, Wagner-Fischer), no Python in the path.",
)
def edit_distance_near_pairs(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, 12).alias("blk"),
        F.substring("text", 1, 64).alias("t64"),
    )
    ok = docs.groupBy("blk").agg(F.count("*").alias("_bn")).filter(
        F.col("_bn") <= 64
    )
    d = docs.join(ok.select("blk"), "blk")
    a = d.select(
        "blk", F.col("doc_id").alias("doc_id_a"), F.col("t64").alias("_ta")
    )
    b = d.select(
        "blk", F.col("doc_id").alias("doc_id_b"), F.col("t64").alias("_tb")
    )
    pairs = (
        a.join(b, "blk")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select(
            "doc_id_a",
            "doc_id_b",
            F.levenshtein("_ta", "_tb").cast("long").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= 16)
    )
    return pairs.orderBy(
        "edit_distance", "doc_id_a", "doc_id_b"
    ).limit(20)


@register(
    "vocab_growth_curve",
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    tok2 AS (SELECT doc_id, w FROM tok WHERE w <> ''),
    firsts AS (SELECT w, min(doc_id) AS fd FROM tok2 GROUP BY w),
    n AS (SELECT count(*) AS nd FROM documents),
    cps AS (SELECT CAST(power(2, g.generate_series) AS BIGINT) AS c
            FROM generate_series(4, 40) g, n
            WHERE power(2, g.generate_series) <= nd)
    SELECT c AS checkpoint_docs,
           CAST((SELECT count(*) FROM firsts WHERE fd < c) AS BIGINT)
             AS vocab_size,
           CAST((SELECT count(*) FROM tok2 WHERE doc_id < c) AS BIGINT)
             AS total_tokens
    FROM cps ORDER BY 1
    """,
    tags=("text", "corpus-stats", "llm-pipeline"),
    doc="Heaps'-law vocabulary growth audit: distinct-token vocabulary "
    "size and total token count at geometric doc-count checkpoints "
    "(powers of two up to the corpus size) — the curve a tokenizer "
    "team reads before fixing a vocab budget, and a drift alarm when "
    "a new crawl bends it. Scale shape: ONE token-keyed map-side-"
    "combined shuffle to (token, first_doc) — the vocabulary "
    "histogram — then both curves are rollups of tiny frames joined "
    "against a BROADCAST <=40-row checkpoint spine; the token stream "
    "is scanned once and nothing wider than the vocabulary ever "
    "shuffles.",
)
def vocab_growth_curve(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("w")
        ).filter(F.col("w") != "")
    )
    firsts = tok.groupBy("w").agg(F.min("doc_id").alias("fd"))
    # lazy checkpoint spine: no driver-side count action; 2^k exact in
    # double through 2^40
    nd = docs.agg(F.count("*").alias("nd"))
    cps = (
        spark.range(4, 41)
        .select(
            F.pow(F.lit(2.0), F.col("id").cast("double"))
            .cast("long")
            .alias("checkpoint_docs")
        )
        .crossJoin(F.broadcast(nd))
        .filter(F.col("checkpoint_docs") <= F.col("nd"))
        .select("checkpoint_docs")
    )
    # token counts per doc need no explode at all: count the split array
    per_doc = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).cast("long").alias("ntok"),
    )
    vocab = (
        firsts.join(
            F.broadcast(cps), F.col("fd") < F.col("checkpoint_docs")
        )
        .groupBy("checkpoint_docs")
        .agg(F.count("*").cast("long").alias("vocab_size"))
    )
    toks = (
        per_doc.join(
            F.broadcast(cps), F.col("doc_id") < F.col("checkpoint_docs")
        )
        .groupBy("checkpoint_docs")
        .agg(F.sum("ntok").cast("long").alias("total_tokens"))
    )
    return (
        cps.join(F.broadcast(vocab), "checkpoint_docs", "left")
        .join(F.broadcast(toks), "checkpoint_docs", "left")
        .select(
            "checkpoint_docs",
            F.coalesce("vocab_size", F.lit(0)).cast("long").alias(
                "vocab_size"
            ),
            F.coalesce("total_tokens", F.lit(0)).cast("long").alias(
                "total_tokens"
            ),
        )
    )


def _epoch_shuffle_oracle(epoch: int = 1, top: int = 20) -> str:
    h = md5_hash64_sql(f"concat('epoch{epoch}:', CAST(doc_id AS VARCHAR))")
    return f"""
    SELECT doc_id, {h} AS shuffle_rank
    FROM documents
    ORDER BY shuffle_rank, doc_id LIMIT {top}
    """


@register(
    "epoch_shuffle_sample",
    _epoch_shuffle_oracle(),
    tags=("llm-pipeline", "shuffle", "sampling"),
    doc="Deterministic training-epoch shuffle: every doc gets the "
    "pseudorandom rank md5('epoch1:' || doc_id) — reshuffling between "
    "epochs is just a new seed prefix, and the order is reproducible "
    "across runs, engines, and cluster sizes (no RNG state, no "
    "partition-order dependence — the properties a resumable data "
    "loader needs). The full-epoch materialization at 100 TB is "
    "repartitionByRange(shuffle_rank) + sortWithinPartitions (one "
    "range shuffle, globally ordered shards, no global sort); this "
    "query surfaces the head of the epoch order as the driver-"
    "checkable sample via TakeOrdered, never a full sort.",
)
def epoch_shuffle_sample(spark, sf_dir):
    from ..functions.hashing import md5_hash64

    docs = t(spark, sf_dir, "documents")
    ranked = docs.select(
        "doc_id",
        md5_hash64(
            F.concat(F.lit("epoch1:"), F.col("doc_id").cast("string"))
        ).alias("shuffle_rank"),
    )
    return ranked.orderBy("shuffle_rank", "doc_id").limit(20)


@register(
    "token_fertility_by_lang",
    """
    WITH d AS (
      SELECT lang,
             CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
                  AS BIGINT) AS n_tok,
             CAST(n_chars AS BIGINT) AS n_chars
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(sum(n_chars) / CAST(sum(n_tok) AS DOUBLE), 4)
             AS chars_per_token,
           round(sum(n_tok) / CAST(count(*) AS DOUBLE), 4)
             AS tokens_per_doc
    FROM d GROUP BY lang
    """,
    tags=("text", "corpus-stats", "llm-pipeline"),
    doc="Tokenizer fertility audit per language: bytes(chars)-per-token "
    "and tokens-per-doc — the ratio a tokenizer team watches per "
    "language slice (a lang whose fertility drifts up is being "
    "under-served by the vocab and will train slower per byte). "
    "Zero-shuffle token counting (size of the filtered split array, "
    "no explode) into one map-side-combined aggregate; ratios from "
    "exact integer sums, IEEE-identical in both engines.",
)
def token_fertility_by_lang(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        .cast("long")
        .alias("n_tok"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    return d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(
            F.sum("n_chars") / F.sum("n_tok").cast("double"), 4
        ).alias("chars_per_token"),
        F.round(
            F.sum("n_tok") / F.count("*").cast("double"), 4
        ).alias("tokens_per_doc"),
    )


@register(
    "tfidf_doc_keywords",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_WORDS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dft.df,
             CAST(tf.tf AS DOUBLE)
             * ln((CAST(nn.n AS DOUBLE) + 1.0)
                  / (CAST(dft.df AS DOUBLE) + 1.0)) AS score
      FROM tf JOIN dft USING (term) CROSS JOIN nn
    )
    SELECT doc_id, term, tf, df, round(score, 6) AS tfidf, rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term ASC) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
    tags=("text", "retrieval"),
    doc="Per-document keyword extraction: top-3 terms by smooth TF-IDF "
    "(tf * ln((N+1)/(df+1))). Term frequencies and document "
    "frequencies are two map-side-combined shuffles over the token "
    "stream (tf keyed by (doc, term), df derived from the tf frame — "
    "the raw tokens are never re-shuffled); the corpus size joins as "
    "a broadcast 1-row aggregate. Ranking orders on the RAW double "
    "score (identical IEEE expression both engines — exact-int "
    "inputs, one ln, one multiply) with the term as tiebreak, so the "
    "cut is deterministic. Per-doc top-3 is a row_number window "
    "partitioned by doc_id: per-key state is bounded by a document's "
    "vocabulary, which the corpus contract bounds by doc length, "
    "never by corpus size.",
)
def tfidf_doc_keywords(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    dft = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    nn = docs.agg(F.count("*").cast("long").alias("n"))
    scored = (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * F.log(
                    (F.col("n").cast("double") + F.lit(1.0))
                    / (F.col("df").cast("double") + F.lit(1.0))
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id", "term", "tf", "df",
            F.round("score", 6).alias("tfidf"), "rnk",
        )
    )


_GOPHER_MIN_WORDS = 50
_GOPHER_MAX_WORDS = 100_000
_GOPHER_MWL_LO = 3.0
_GOPHER_MWL_HI = 10.0
_GOPHER_STOP_FRAC = 0.06
_GOPHER_DISTINCT_FRAC = 0.3


def _gopher_oracle() -> str:
    feats = f"""
      SELECT len(words) AS nw,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len(words) AS mwl,
             CAST(len(list_filter(words,
                    w -> list_contains({_STOP_ARR}, w))) AS DOUBLE)
               / len(words) AS stop_frac,
             CAST(len(list_distinct(words)) AS DOUBLE)
               / len(words) AS distinct_frac
      FROM (SELECT text, {_WORDS} AS words FROM documents)
    """
    rules = {
        "min_words": f"nw >= {_GOPHER_MIN_WORDS}",
        "max_words": f"nw <= {_GOPHER_MAX_WORDS}",
        "mean_word_len": f"mwl >= {_GOPHER_MWL_LO} AND mwl <= {_GOPHER_MWL_HI}",
        "stopword_frac": f"stop_frac >= {_GOPHER_STOP_FRAC}",
        "distinct_frac": f"distinct_frac >= {_GOPHER_DISTINCT_FRAC}",
    }
    rules["all_rules"] = " AND ".join(f"({c})" for c in rules.values())
    arms = " UNION ALL ".join(
        f"SELECT '{name}' AS rule, CASE WHEN {cond} THEN 1 ELSE 0 END AS ok"
        " FROM f"
        for name, cond in rules.items()
    )
    return f"""
    WITH f AS ({feats})
    SELECT rule,
           CAST(sum(ok) AS BIGINT) AS n_pass,
           CAST(count(*) - sum(ok) AS BIGINT) AS n_fail,
           round(CAST(sum(ok) AS DOUBLE) / count(*), 4) AS pass_rate
    FROM ({arms}) GROUP BY rule
    """


@register(
    "gopher_rules_report",
    _gopher_oracle(),
    tags=("text", "quality", "pipeline"),
    doc="Gopher-style rule battery audit (Rae et al. 2021 table A1 "
    "shape): per-rule pass/fail counts and pass rate over the corpus — "
    "word-count bounds, mean-word-length band, stopword-fraction "
    "floor, distinct-word-fraction floor (the repetition rule), plus "
    "the conjunction row ('all_rules' = the corpus keep rate). "
    "Complements text_quality (per-doc features) with the corpus-level "
    "filter-audit view a curation pipeline tracks per snapshot. One "
    "projection computes every feature, one explode fans each doc to "
    "its 6 rule verdicts (constant fan-out), one map-side-combined "
    "aggregation — no joins, no windows, linear and skew-free.",
)
def gopher_rules_report(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    words = DT.words_of("text")  # the one tokenization rule (_WORDS twin)
    stop_arr = F.array(*[F.lit(s) for s in TA.EN_STOPWORDS])
    nw = F.size(words).cast("double")
    feats = docs.select(
        F.size(words).alias("nw"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            .cast("double")
            / nw
        ).alias("mwl"),
        (
            F.size(
                F.filter(words, lambda w: F.array_contains(stop_arr, w))
            ).cast("double")
            / nw
        ).alias("stop_frac"),
        (F.size(F.array_distinct(words)).cast("double") / nw).alias(
            "distinct_frac"
        ),
    )
    checks = {
        "min_words": F.col("nw") >= _GOPHER_MIN_WORDS,
        "max_words": F.col("nw") <= _GOPHER_MAX_WORDS,
        "mean_word_len": (F.col("mwl") >= _GOPHER_MWL_LO)
        & (F.col("mwl") <= _GOPHER_MWL_HI),
        "stopword_frac": F.col("stop_frac") >= _GOPHER_STOP_FRAC,
        "distinct_frac": F.col("distinct_frac") >= _GOPHER_DISTINCT_FRAC,
    }
    checks["all_rules"] = F.lit(True)
    for name, cond in list(checks.items())[:-1]:
        checks["all_rules"] = checks["all_rules"] & cond
    verdicts = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                cond.cast("int").alias("ok"),
            )
            for name, cond in checks.items()
        ]
    )
    ex = feats.select(F.explode(verdicts).alias("r")).select(
        "r.rule", "r.ok"
    )
    return ex.groupBy("rule").agg(
        F.sum("ok").cast("long").alias("n_pass"),
        (F.count("*") - F.sum("ok")).cast("long").alias("n_fail"),
        F.round(
            F.sum("ok").cast("double") / F.count("*"), 4
        ).alias("pass_rate"),
    )


@register(
    "source_overlap_matrix",
    f"""
    WITH sh AS (
      SELECT DISTINCT source,
             {md5_hash64_sql('s')} AS h
      FROM (
        SELECT source, unnest({_shingles_sql(4)}) AS s
        FROM (SELECT source, {_WORDS} AS words FROM documents)
      )
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS shared_shingles
    FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
    """,
    tags=("dedup", "pipeline"),
    doc="Cross-source contamination matrix: for every source pair, the "
    "number of distinct word-4-gram shingle hashes they share — the "
    "'who copies from whom' view a curation pipeline uses to decide "
    "dedup ordering and source trust (doc-level exact dedup misses "
    "partial copying; this is the span-level signal aggregated to "
    "source granularity). Scale shape: shingles reduce to DISTINCT "
    "(hash, source) FIRST (map-side-combined, output bounded by "
    "vocabulary x sources, not by corpus rows), then NO JOIN AT ALL: "
    "one groupBy(hash) collects the source set (bounded by the SOURCE "
    "CARDINALITY by construction — a shingle in a million docs still "
    "folds to <= |sources| elements) and the a<b pairs explode in-row "
    "from the sorted set. The oracle states the same relation as a "
    "self-join; the join-free form halves the shingle-scan work (the "
    "joined form re-executed the explode+md5 subtree per side when AQE "
    "broadcast one side — measured 10.3 s -> the rewrite at sf0.1) and "
    "removes the only shuffle wider than the hash table.",
)
def source_overlap_matrix(spark, sf_dir):
    from ..functions.hashing import md5_hash64
    from ..operators.dedup_text import shingles_of

    docs = t(spark, sf_dir, "documents")
    sh = docs.select(
        "source",
        F.explode(F.array_distinct(shingles_of("text", 4))).alias("s"),
    ).select("source", md5_hash64("s").alias("h"))
    src_sets = sh.groupBy("h").agg(
        F.array_sort(F.collect_set("source")).alias("_ss")
    )
    a = F.col("_ss")
    pairs = F.flatten(
        F.transform(
            a,
            lambda x, i: F.transform(
                F.slice(a, i + 2, F.size(a)),
                lambda y: F.struct(
                    x.alias("source_a"), y.alias("source_b")
                ),
            ),
        )
    )
    return (
        src_sets.filter(F.size("_ss") >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.source_a").alias("source_a"),
            F.col("p.source_b").alias("source_b"),
        )
        .agg(F.count("*").cast("long").alias("shared_shingles"))
    )


def _lang_confusion_oracle() -> str:
    langs = sorted(TA.LANG_MARKERS)
    score_cols = []
    for lang, markers in sorted(TA.LANG_MARKERS.items()):
        arr = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
        score_cols.append(
            f"len(list_filter(words, w -> list_contains({arr}, w)))"
            f" AS score_{lang}"
        )
    pred = "'unknown'"
    for lang in reversed(langs):
        conds = [f"score_{lang} > 0"]
        for other in langs:
            if other != lang:
                op = ">=" if other > lang else ">"
                conds.append(f"score_{lang} {op} score_{other}")
        pred = f"CASE WHEN {' AND '.join(conds)} THEN '{lang}' ELSE {pred} END"
    return f"""
    WITH p AS (
      SELECT lang, {pred} AS pred_lang
      FROM (
        SELECT lang, {', '.join(score_cols)}
        FROM (SELECT lang, {_WORDS} AS words FROM documents)
      )
    ),
    m AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
          FROM p GROUP BY 1, 2),
    tt AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS nt FROM m GROUP BY 1)
    SELECT m.lang, m.pred_lang, m.n_docs,
           round(CAST(m.n_docs AS DOUBLE) / tt.nt, 4) AS frac
    FROM m JOIN tt USING (lang)
    """


@register(
    "lang_id_confusion",
    _lang_confusion_oracle(),
    tags=("text", "quality", "pipeline"),
    doc="Language-ID confusion matrix: predicted vs TRUE language (the "
    "documents table carries ground-truth `lang`), with per-true-"
    "language row fractions — the classifier-drift audit a curation "
    "pipeline runs when the heuristic language ID gates training-data "
    "routing (mis-ID silently starves a language's token budget; "
    "token_fertility_by_lang is the downstream alarm, this is the "
    "upstream cause). One projection computes the marker scores + "
    "argmax (same expression family as lang_id / corpus_quality_"
    "summary), one map-side-combined aggregation to the |langs|^2 "
    "matrix, per-language totals broadcast back.",
)
def lang_id_confusion(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    # TA.lang_id owns the argmax/tie-break rule (alphabetically-first
    # wins) in exactly one place; passing the TRUE label as the id
    # column gives the (lang, scores..., pred_lang) projection directly
    scored = TA.lang_id(docs, text_col="text", id_col="lang")
    m = (
        scored.select("lang", "pred_lang")
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    tt = m.groupBy("lang").agg(F.sum("n_docs").cast("long").alias("nt"))
    return m.join(F.broadcast(tt), "lang").select(
        "lang",
        "pred_lang",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("nt"), 4).alias(
            "frac"
        ),
    )


# =====================================================================
# PCA over embeddings (Gram pass + unrolled power iteration)
# =====================================================================

PCA_DIMS = 64
PCA_COMPONENTS = 3


def _pca_cells_cte() -> str:
    """Shared oracle CTE: exact-integer scaled covariance cells over
    the quantized embeddings (same _QUANT milli-unit rule as the ANN
    family). cov = N*S_ij - S_i*S_j stays integer, so the covariance
    entry hashes bit-identically with zero float drift."""
    return f"""
    q AS MATERIALIZED (SELECT {_QUANT} AS q FROM embeddings),
    pdims AS (SELECT unnest(range(1, {PCA_DIMS + 1})) AS i),
    cells AS MATERIALIZED (
      SELECT di.i AS i, dj.i AS j,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(q.q[di.i] AS HUGEINT) * q.q[dj.i]) AS HUGEINT)
               AS s_ij,
             CAST(sum(q.q[di.i]) AS HUGEINT) AS s_i,
             CAST(sum(q.q[dj.i]) AS HUGEINT) AS s_j
      FROM q, pdims di, pdims dj
      WHERE di.i <= dj.i
      GROUP BY di.i, dj.i
    )"""


@register(
    "embedding_covariance",
    f"""
    WITH {_pca_cells_cte()}
    SELECT i, j, n, CAST(n * s_ij - s_i * s_j AS BIGINT) AS cov
    FROM cells
    """,
    tags=("embeddings", "pca", "linear-algebra"),
    doc="Scaled covariance of the quantized embedding column: "
    "upper-triangle cells (i <= j, 1-based) with the EXACT integer "
    "cov = N*sum(q_i q_j) - sum(q_i)*sum(q_j) (real covariance = "
    "cov / N^2 / 1e6) — the moment pass PCA, whitening, and Mahalanobis "
    "scoring all start from. One Arrow-batched numpy Gram kernel per "
    "partition batch (operators/pca.py::covariance_cells; quantization "
    "happens JVM-side via the repo-wide similarity.quantized rule so "
    "both engines round identically), merged by a map-side-combinable "
    "groupBy over d(d+1)/2 = 2080 cells — control-plane-sized output "
    "regardless of row count, the classic tree-reduce. Integer range "
    "documented: safe to ~1e16 rows at |x| <= 3 before int64 overflow.",
)
def embedding_covariance(spark, sf_dir):
    from ..operators import pca as P

    emb = _spread(spark, t(spark, sf_dir, "embeddings"))
    return P.covariance_cells(emb, PCA_DIMS)


def _pca_power_oracle_parts(k: int = PCA_COMPONENTS, iters: int = 8):
    """Unrolled power iteration + Hotelling deflation as plain SQL —
    the IRLS trick applied to eigenvectors: a FIXED number of steps
    from a FIXED start vector is just arithmetic both engines can run
    identically; convergence is not assumed, agreement is."""
    ctes = [
        f"""
    c0 AS MATERIALIZED (
      SELECT i, j,
             CAST(n * s_ij - s_i * s_j AS DOUBLE)
               / (CAST(n AS DOUBLE) * n) / 1000000.0 AS v
      FROM (SELECT i, j, n, s_ij, s_i, s_j FROM cells
            UNION ALL
            SELECT j, i, n, s_ij, s_j, s_i FROM cells WHERE i < j)
    )"""
    ]
    selects = []
    for c in range(1, k + 1):
        ctes.append(
            f"""
    v{c}_0 AS (SELECT i, 1.0 / sqrt({PCA_DIMS}.0) AS x FROM pdims)"""
        )
        for s in range(1, iters + 1):
            ctes.append(
                f"""
    w{c}_{s} AS (SELECT m.i AS i, sum(m.v * p.x) AS wx
               FROM c{c - 1} m JOIN v{c}_{s - 1} p ON p.i = m.j
               GROUP BY m.i),
    v{c}_{s} AS MATERIALIZED (
      SELECT i, wx / sqrt((SELECT sum(wx * wx) FROM w{c}_{s})) AS x
      FROM w{c}_{s})"""
            )
        ctes.append(
            f"""
    lam{c} AS (SELECT sum(a.x * m.v * b.x) AS l
             FROM c{c - 1} m
             JOIN v{c}_{iters} a ON a.i = m.i
             JOIN v{c}_{iters} b ON b.i = m.j)"""
        )
        if c < k:
            ctes.append(
                f"""
    c{c} AS MATERIALIZED (SELECT m.i, m.j,
                  m.v - (SELECT l FROM lam{c}) * a.x * b.x AS v
           FROM c{c - 1} m
           JOIN v{c}_{iters} a ON a.i = m.i
           JOIN v{c}_{iters} b ON b.i = m.j)"""
            )
        selects.append(
            f"""
      SELECT {c} AS component, v.i AS dim_i,
             round(v.x, 6) AS loading,
             round((SELECT l FROM lam{c}), 6) AS eigenvalue
      FROM v{c}_{iters} v"""
        )
    return ctes, selects


def _pca_power_sql(k: int = PCA_COMPONENTS, iters: int = 8) -> str:
    ctes, selects = _pca_power_oracle_parts(k, iters)
    return (
        "\n    WITH "
        + _pca_cells_cte()
        + ","
        + ",".join(ctes)
        + "\n    SELECT CAST(component AS INT) AS component,"
        + " CAST(dim_i AS INT) AS dim_i, loading, eigenvalue FROM ("
        + " UNION ALL ".join(selects)
        + "\n    )"
    )


@register(
    "embedding_pca_power",
    _pca_power_sql(),
    tags=("embeddings", "pca", "linear-algebra"),
    doc="Top-3 principal components of the embedding covariance via "
    "EXACTLY 8 unrolled power-iteration steps per component from the "
    "all-ones start vector, with Hotelling deflation between "
    "components (C <- C - lambda v v^T) — eigen-decomposition is not "
    "SQL-expressible, but a fixed unrolling is just arithmetic, so "
    "the DuckDB oracle runs the IDENTICAL steps and the comparison is "
    "exact by construction whether or not 8 steps have converged "
    "(pytest separately checks closeness to numpy.linalg.eigh on a "
    "well-separated fixture). The distributed work is the exact-"
    "integer covariance pass (embedding_covariance); the d x d = "
    "64 x 64 matrix is control-plane-sized, so the iteration itself "
    "runs on driver-collected cells — the IVF-codebook / IRLS "
    "precedent — and loadings return as literals. Rounding via "
    "F.round (HALF_UP) mirrors DuckDB round(). Library surface: "
    "operators/pca.py (covariance_cells / power_components / "
    "pca_project — projection is a codegen dot product against "
    "inlined component literals, no shuffle).",
)
def embedding_pca_power(spark, sf_dir):
    from ..operators import pca as P

    emb = _spread(spark, t(spark, sf_dir, "embeddings"))
    rows = P.covariance_cells(emb, PCA_DIMS).collect()
    comps, lams = P.power_components(rows, PCA_DIMS, k=PCA_COMPONENTS)
    data = [
        (c + 1, i + 1, float(comps[c][i]), float(lams[c]))
        for c in range(PCA_COMPONENTS)
        for i in range(PCA_DIMS)
    ]
    df = spark.createDataFrame(
        data, "component int, dim_i int, loading double, eigenvalue double"
    )
    return df.select(
        "component",
        "dim_i",
        F.round("loading", 6).alias("loading"),
        F.round("eigenvalue", 6).alias("eigenvalue"),
    )


def _pca_projection_sql(k: int = PCA_COMPONENTS, iters: int = 8) -> str:
    """Projection oracle: the unrolled-component CTEs plus one
    ORDER-DETERMINISTIC dot product per (row, component) —
    SUM(... ORDER BY dim) accumulates left-to-right exactly like the
    Spark side's F.aggregate fold over zip_with, so the double
    expression trees match term-for-term before the 6 dp round."""
    ctes, _ = _pca_power_oracle_parts(k, iters)
    pcs = ",\n        ".join(
        f"round((SELECT sum(CAST(e.embedding[v.i] AS DOUBLE) * v.x "
        f"ORDER BY v.i) FROM v{c}_{iters} v), 6) AS pc{c}"
        for c in range(1, k + 1)
    )
    return (
        "\n    WITH "
        + _pca_cells_cte()
        + ","
        + ",".join(ctes)
        + f"""
    SELECT e.vec_id,
        {pcs}
    FROM embeddings e
    """
    )


@register(
    "embedding_pca_projection",
    _pca_projection_sql(),
    tags=("embeddings", "pca", "linear-algebra"),
    doc="Every embedding projected onto the unrolled power-iteration "
    "components (pc1..pc3) — the actual dimensionality-reduction "
    "output a pipeline materializes before ANN indexing or semantic "
    "dedup, completing the PCA family (moments -> components -> "
    "projection). The projection is operators/pca.py::pca_project: a "
    "LEFT-TO-RIGHT F.aggregate fold over zip_with against the "
    "driver-inlined component literals — sequential order chosen "
    "deliberately so the oracle's SUM(... ORDER BY dim) accumulates "
    "the IDENTICAL double tree (engine-parity over raw floats; a "
    "batched einsum kernel is the drop-in when throughput matters "
    "more than bit-parity, per the similarity._dot_pairs precedent). "
    "No shuffle: the component literals ride the task closure.",
)
def embedding_pca_projection(spark, sf_dir):
    from ..operators import pca as P

    emb = t(spark, sf_dir, "embeddings")
    rows = P.covariance_cells(_spread(spark, emb), PCA_DIMS).collect()
    comps, _ = P.power_components(rows, PCA_DIMS, k=PCA_COMPONENTS)
    # the projection itself needs no _spread: it must stay a bare
    # scan + project (zero exchanges, plan-gated)
    out = P.pca_project(emb.select("vec_id", "embedding"), comps)
    return out.select(
        "vec_id",
        *[
            F.round(F.element_at("pca", c + 1), 6).alias(f"pc{c + 1}")
            for c in range(PCA_COMPONENTS)
        ],
    )


# =====================================================================
# Tokenizer construction: BPE merge learning
# =====================================================================

BPE_MERGES = 8

#: learned-merge-table memo, keyed by (documents fingerprint, merges) —
#: the kmeans fitted-codebook precedent (_KM_CENTS): the fit is
#: bit-deterministic, so the merge table is a reusable model artifact
#: shared by the train and apply entries per process instead of
#: refitting (8 vocab jobs + collects) per query. The fingerprint
#: (path, mtime, size) invalidates on table regeneration; the SQL
#: oracle always refits from the data, so a stale memo would break
#: parity loudly, never silently.
_BPE_TABLES: dict[tuple, list] = {}


def clear_model_memos() -> None:
    """Drop every process-level fitted-model memo (BPE merge tables,
    k-means codebooks, IVF coarse quantizers). Measurement tooling calls
    this between timed repeats of the TRAIN-side entries so a probe of
    e.g. ``bpe_merge_table`` times the distributed fit, not a dict
    lookup (ADVICE r9: min-of-2 with a warm memo keeps the memo hit and
    makes the scaling verdict vacuous). Production code never needs it —
    the fingerprint keys already invalidate on data change."""
    _BPE_TABLES.clear()
    _KM_CENTS.clear()
    _IVF_CB.clear()


def _bpe_table(spark, docs, sf_dir):
    from ..operators import bpe as BPE
    from .queries import table_fingerprint

    key = (table_fingerprint(sf_dir, "documents"), BPE_MERGES)
    if key not in _BPE_TABLES:
        _BPE_TABLES[key] = BPE.bpe_fit(docs, merges=BPE_MERGES)
    return _BPE_TABLES[key]


def _bpe_ctes(merges: int = BPE_MERGES) -> str:
    """Unrolled BPE training CTEs: one (pairs -> best -> rewrite) trio
    per merge step, ending at vocabulary generation ``v{merges}``.
    Token lists ride a unit-separator string encoding
    (``US US tok US US tok US US``); the rewrite is
    ``replace(enc, US l US US r US, US l r US)`` — each match consumes
    one separator per side so back-to-back occurrences still match,
    reproducing the Spark fold's leftmost non-overlapping scan exactly
    (pinned in tests/test_bpe.py). The LEFT JOIN ON TRUE keeps the
    vocabulary alive through a merge-exhausted step on tiny fixtures."""
    S = "chr(31)"
    parts = [
        f"""
    WITH w0 AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
            FROM documents)
      GROUP BY 1
    ),
    v0 AS (
      SELECT word, cnt,
             {S} || {S}
             || array_to_string(list_transform(range(1, length(word) + 1),
                                               i -> word[i]), {S} || {S})
             || {S} || {S} AS enc
      FROM w0
    )"""
    ]
    for s in range(1, merges + 1):
        parts.append(
            f""",
    p{s} AS (
      SELECT (pr).l AS lhs, (pr).r AS rhs, CAST(SUM(cnt) AS BIGINT) AS c
      FROM (SELECT cnt,
                   unnest(list_transform(range(1, len(tk)),
                          i -> struct_pack(l := tk[i], r := tk[i + 1]))) AS pr
            FROM (SELECT cnt,
                         list_filter(string_split(enc, {S}), x -> x <> '') AS tk
                  FROM v{s - 1}))
      GROUP BY 1, 2
    ),
    b{s} AS (SELECT lhs, rhs, c FROM p{s} ORDER BY c DESC, lhs, rhs LIMIT 1),
    v{s} AS (
      SELECT word, cnt,
             CASE WHEN b.lhs IS NULL THEN enc
                  ELSE replace(enc, {S} || b.lhs || {S} || {S} || b.rhs || {S},
                               {S} || b.lhs || b.rhs || {S})
             END AS enc
      FROM v{s - 1} LEFT JOIN b{s} b ON TRUE
    )"""
        )
    return "".join(parts)


def _bpe_oracle(merges: int = BPE_MERGES) -> str:
    union = "\n    UNION ALL\n    ".join(
        f"SELECT {s} AS step, lhs, rhs, lhs || rhs AS merged, "
        f"c AS pair_count FROM b{s}"
        for s in range(1, merges + 1)
    )
    return _bpe_ctes(merges) + "\n    " + union + "\n    "


@register(
    "bpe_merge_table",
    _bpe_oracle(),
    tags=("tokenizer", "bpe", "text"),
    doc="BPE merge learning (the tokenizer-training step of an LLM data "
    "pipeline, subword-nmt / HF-tokenizers trainer shape): the corpus "
    "aggregates ONCE to a (word, count) vocabulary, then each of the "
    f"{BPE_MERGES} merge steps is a tiny adjacent-pair-count aggregation "
    "over the bounded vocabulary, a single-row argmax collect (the "
    "k-means centroid-collect pattern), and a JVM-side leftmost-non-"
    "overlapping fold rewriting token arrays. Determinism: pair weight "
    "= sum of word counts, ties to the lexicographically smallest "
    "(lhs, rhs). At 100 TB only step 0 touches the corpus; the merge "
    "loop runs over vocabulary rows (millions, not terabytes) and "
    "ships one row per step to the driver. Library surface: "
    "operators/bpe.py (word_vocab / bpe_fit / merge_table_df).",
)
def bpe_merge_table(spark, sf_dir):
    from ..operators import bpe as BPE

    docs = _spread(spark, t(spark, sf_dir, "documents"))
    return BPE.merge_table_df(spark, _bpe_table(spark, docs, sf_dir))


@register(
    "bpe_merge_table_incremental",
    _bpe_oracle(),
    tags=("tokenizer", "bpe", "text"),
    doc="BPE merge learning with INCREMENTALLY MAINTAINED pair counts "
    "(r10; the classic delta update a real 32k-merge trainer needs — "
    "only pairs overlapping the merged pair change): per step, argmax "
    "the persisted pair-count table, rewrite ONLY the words containing "
    "the winning pair (a predicate scan of the in-memory vocabulary, "
    "no shuffle for the untouched rest), and fold the (new − old) "
    "pair-count delta of those words into the table — the per-step "
    "shuffle is delta-sized, not vocabulary-sized, while the "
    "single-row argmax collect remains the loop head exactly as in "
    "every production trainer. Integer arithmetic end-to-end makes "
    "the maintained counts equal a full recount EXACTLY, so the "
    "learned table is bit-identical to bpe_merge_table's "
    "(pytest-pinned; the oracle is the same DuckDB refit). Library "
    "surface: operators/bpe.py::bpe_fit_incremental.",
)
def bpe_merge_table_incremental(spark, sf_dir):
    from ..operators import bpe as BPE

    docs = _spread(spark, t(spark, sf_dir, "documents"))
    return BPE.merge_table_df(
        spark, BPE.bpe_fit_incremental(docs, merges=BPE_MERGES)
    )


def _bpe_apply_oracle(merges: int = BPE_MERGES) -> str:
    """Apply-side oracle: per-word token counts from the final
    vocabulary generation, joined back to per-document word counts —
    the same lookup-table shape the Spark side broadcasts."""
    S = "chr(31)"
    return (
        _bpe_ctes(merges)
        + f""",
    vn AS (
      SELECT word,
             len(list_filter(string_split(enc, {S}), x -> x <> ''))
               AS tok
      FROM v{merges}
    ),
    dw AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS word
            FROM documents)
      GROUP BY 1, 2
    )
    SELECT dw.doc_id,
           CAST(SUM(dw.cnt) AS BIGINT) AS n_words,
           CAST(SUM(dw.cnt * length(dw.word)) AS BIGINT) AS n_word_chars,
           CAST(SUM(dw.cnt * vn.tok) AS BIGINT) AS n_tokens
    FROM dw JOIN vn USING (word)
    GROUP BY 1
    """
    )


@register(
    "bpe_token_counts",
    _bpe_apply_oracle(),
    tags=("tokenizer", "bpe", "text"),
    doc="BPE APPLY side (train -> tokenize, completing the family with "
    "bpe_merge_table): per document, exact word / character / "
    "post-merge token counts under the learned merge table — the "
    "token-budget accounting a packing or pricing pipeline needs. "
    "Scale shape: tokenization is a BROADCAST LOOKUP — the final "
    "vocabulary (word -> token count) is bounded and broadcast-joined "
    "to per-document word counts, so the corpus is never re-scanned "
    "per merge and no merge folds run on document rows; all outputs "
    "exact BIGINT (no floats to drift). Library surface: "
    "operators/bpe.py::bpe_vocab_after.",
)
def bpe_token_counts(spark, sf_dir):
    from ..operators import bpe as BPE

    docs = _spread(spark, t(spark, sf_dir, "documents"))
    table = _bpe_table(spark, docs, sf_dir)
    vocab_n = BPE.bpe_vocab_after(docs, table).select(
        "word", F.size("tokens").cast("long").alias("tok")
    )
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    # ONE doc_id-keyed shuffle: occurrences broadcast-join the lookup
    # directly (no (doc_id, word) pre-shuffle — map-side combine on
    # doc_id already absorbs the fanout)
    return words.join(F.broadcast(vocab_n), "word").groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum(F.length("word")).cast("long").alias("n_word_chars"),
        F.sum("tok").cast("long").alias("n_tokens"),
    )


ZIPF_TOP = 1000


@register(
    "zipf_fit_words",
    f"""
    WITH wc AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
            FROM documents)
      GROUP BY 1
    ),
    rk AS (
      SELECT word, cnt,
             row_number() OVER (ORDER BY cnt DESC, word ASC) AS rnk
      FROM wc QUALIFY rnk <= {ZIPF_TOP}
    ),
    pts AS (
      SELECT rnk, ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
      FROM rk
    ),
    m AS (
      -- explicit sequential left fold over rank-ordered lists: DuckDB
      -- documents ORDER BY inside an aggregate but does NOT guarantee
      -- sequential accumulation for commutative aggregates across
      -- versions/thread counts; list_reduce pins the order by
      -- construction (ADVICE r9), matching Spark's F.aggregate fold
      -- (the 0.0 + x1 seed is exact: both series are non-negative)
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             list_reduce(list(x ORDER BY rnk), (a, b) -> a + b) AS sx,
             list_reduce(list(y ORDER BY rnk), (a, b) -> a + b) AS sy,
             list_reduce(list(x * y ORDER BY rnk), (a, b) -> a + b) AS sxy,
             list_reduce(list(x * x ORDER BY rnk), (a, b) -> a + b) AS sxx,
             list_reduce(list(y * y ORDER BY rnk), (a, b) -> a + b) AS syy
      FROM pts
    )
    SELECT n AS n_words,
           round((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS zipf_slope,
           round((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                        / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
                 / CAST(n AS DOUBLE), 6) AS intercept,
           round(((CAST(n AS DOUBLE) * sxy - sx * sy)
                  * (CAST(n AS DOUBLE) * sxy - sx * sy))
                 / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS r_squared
    FROM m
    """,
    tags=("text", "corpus-stats", "llm-pipeline"),
    doc="Zipf's-law fit over the word-frequency histogram: OLS of "
    "ln(count) on ln(rank) for the top-1000 words (slope ~ -1 on "
    "natural language; a bent or shallow slope is the classic "
    "boilerplate/spam alarm next to vocab_growth_curve's Heaps "
    "audit). Float parity by ORDERED ACCUMULATION (the "
    "embedding_pca_projection precedent): the five OLS moments "
    "accumulate in rank order on both engines — Spark folds a sorted "
    "collected array (bounded: top-1000), DuckDB uses "
    "DuckDB list_reduce over a rank-ordered list (an explicit "
    "sequential fold — SUM(.. ORDER BY) does not guarantee "
    "accumulation order for commutative aggregates) — so the doubles "
    "agree bit-for-bit before the 6 dp round. Scale shape: ONE "
    "map-side-combined word count, then an EXACT bucketed pre-top-K "
    "(per-hash-bucket row_number over B tasks) so the global rank "
    "window reads <= B * 1000 rows by construction even on a "
    "web-scale vocabulary (URLs/typos/code), ranking + fold on the "
    "top-1000 rows only.",
)
def zipf_fit_words(spark, sf_dir):
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    # bucketed pre-top-K (r10): a web-scale corpus (URLs, typos, code)
    # breaks the "language-bounded vocabulary" assumption, so the global
    # rank must never see the raw vocab. Every global top-K word is in
    # its hash bucket's top-K, so the per-bucket row_number (distributed
    # over B tasks) is an EXACT prefilter; the unpartitioned window then
    # reads <= B * ZIPF_TOP rows by construction, whatever the corpus.
    n_buckets = spark.sparkContext.defaultParallelism
    pre = (
        wc.withColumn(
            "_b", F.pmod(F.xxhash64("word"), F.lit(n_buckets))
        )
        .withColumn(
            "_pr",
            F.row_number().over(
                Window.partitionBy("_b").orderBy(
                    F.desc("cnt"), F.asc("word")
                )
            ),
        )
        .filter(F.col("_pr") <= ZIPF_TOP)
        .drop("_b", "_pr")
    )
    rk = (
        pre.withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.asc("word"))
            ).cast("long"),
        )
        .filter(F.col("rnk") <= ZIPF_TOP)
        .select(
            "rnk",
            F.log(F.col("rnk").cast("double")).alias("x"),
            F.log(F.col("cnt").cast("double")).alias("y"),
        )
    )
    pts = rk.groupBy().agg(
        F.expr(
            "sort_array(collect_list(struct(rnk, x, y)))"
        ).alias("pts")
    )
    zero = F.lit(0.0)
    fold = F.aggregate(
        F.col("pts"),
        F.struct(
            zero.alias("sx"), zero.alias("sy"), zero.alias("sxy"),
            zero.alias("sxx"), zero.alias("syy"),
        ),
        lambda a, p: F.struct(
            (a["sx"] + p["x"]).alias("sx"),
            (a["sy"] + p["y"]).alias("sy"),
            (a["sxy"] + p["x"] * p["y"]).alias("sxy"),
            (a["sxx"] + p["x"] * p["x"]).alias("sxx"),
            (a["syy"] + p["y"] * p["y"]).alias("syy"),
        ),
    )
    m = pts.select(
        F.size("pts").cast("long").alias("n"), fold.alias("m")
    ).select(
        "n",
        F.col("n").cast("double").alias("nd"),
        F.col("m.sx").alias("sx"), F.col("m.sy").alias("sy"),
        F.col("m.sxy").alias("sxy"), F.col("m.sxx").alias("sxx"),
        F.col("m.syy").alias("syy"),
    )
    slope = (F.col("nd") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("nd") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.col("n").alias("n_words"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("nd"), 6
        ).alias("intercept"),
        F.round(
            (
                (F.col("nd") * F.col("sxy") - F.col("sx") * F.col("sy"))
                * (F.col("nd") * F.col("sxy") - F.col("sx") * F.col("sy"))
            )
            / (
                (F.col("nd") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("nd") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("r_squared"),
    )
