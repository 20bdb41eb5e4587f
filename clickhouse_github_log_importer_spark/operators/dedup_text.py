"""Document deduplication operators for training-data pipelines.

Four tiers, all pure DataFrame/column expressions (no Python UDFs — the
per-row work is array expressions inside whole-stage codegen; the only
shuffles are the ones the algorithms inherently need):

- :func:`exact_dedup` — content-hash groupBy. One shuffle on the hash.
- :func:`minhash_signatures` / :func:`lsh_candidate_pairs` — MinHash+LSH:
  shingle -> seeded-min-hash signature (computed per-row, NO explode/
  shuffle) -> band buckets -> self-join on (band, hash). At 100 TB the
  band join is the only shuffle and its keys are uniformly distributed
  hashes; candidate sets stay tiny because bucket collisions are rare.
- :func:`simhash` / :func:`simhash_candidate_pairs` — 32-bit SimHash with
  banded hamming join (4 x 8-bit bands -> any-band-equal candidates ->
  exact popcount filter), the classic near-dup path for short docs.
- :func:`jaccard_verify` — exact n-gram Jaccard on candidate pairs via
  array_intersect/array_union (set semantics), the verification stage
  after any LSH: never run it all-pairs.

Hashing uses the md5-based 60-bit family (functions.hashing) so results
are reproducible across engines — swap in xxhash64 for raw speed when
cross-engine parity is not needed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64
from .cache import CacheScope, checkpoint_in, persist_in

#: MinHash defaults: 12 permutations in 4 bands of 3 rows — detects
#: Jaccard >~ 0.6 pairs with high probability while keeping the signature
#: cheap. Tune (perms, bands) per corpus.
MINHASH_PERMS = 12
MINHASH_BANDS = 4
SIMHASH_BITS = 32
SIMHASH_BANDS = 4

#: MinHash permutation family: ONE md5 per shingle, then `perms` affine
#: maps h -> (a*h + b) mod M31 over the Mersenne prime 2^31-1. Each map is
#: a bijection on [0, M31), products stay under 2^62 (no int64 overflow,
#: ANSI-safe), and the constants derive from md5 so any engine can
#: reproduce them. ~10x cheaper than seeding md5 per permutation.
MERSENNE31 = (1 << 31) - 1


def perm_constants(perms: int = MINHASH_PERMS) -> list[tuple[int, int]]:
    out = []
    for s in range(perms):
        a = int(hashlib.md5(f"perm_a:{s}".encode()).hexdigest()[:8], 16) % (
            MERSENNE31 - 1
        ) + 1
        b = int(hashlib.md5(f"perm_b:{s}".encode()).hexdigest()[:8], 16) % MERSENNE31
        out.append((a, b))
    return out


def words_of(text: Column | str) -> Column:
    """Whitespace tokens, empties dropped."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda w: w != "")


def shingles_of(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles; documents shorter than n words collapse to a
    single whole-text shingle so every doc has >=1 shingle.

    The words array is bound ONCE as a lambda variable (the wrapping
    single-element ``transform``): higher-order-function lambdas are
    interpreted (CodegenFallback) and do NOT common-subexpression-
    eliminate an outer derived-array reference, so the naive form
    re-evaluated ``filter(split(text))`` inside every ``element_at`` —
    O(words^2) interpreted work per document, measured 8.8 s -> 0.5 s
    (16x) on the sf0.1 shingle explode when bound. Every shingle
    consumer (dup spans, minhash, decontamination, fingerprints,
    overlap matrix) inherits the fix."""
    w = words_of(text)

    def body(wa: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(wa) - (n - 1))
        gram = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(wa, i + k) for k in range(n)]
        )
        return F.when(F.size(wa) >= n, F.transform(idx, gram)).otherwise(
            F.array(F.concat_ws(" ", wa))
        )

    return F.get(F.transform(F.array(w), body), 0)


def dup_span_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 6,
    scope=None,
) -> DataFrame:
    """Exact substring-duplication profile: per document, how many of its
    n-word spans occur more than once in the corpus (in another document
    or repeated within the same one), and the duplicated fraction.

    The span-granular form of ExactSubstr dedup ("Deduplicating Training
    Data Makes Language Models Better" builds a corpus suffix array; a
    suffix array is driver-bound state Spark cannot shard usefully, but
    fixed-length span multiplicity gives the same per-doc duplication
    signal as pure dataflow): explode n-gram spans, hash each to a
    60-bit key (both engines hash identically, so collision behavior is
    part of the contract rather than a divergence), count occurrences
    per (doc, span) with map-side combine, roll spans up to corpus
    multiplicity, join the tiny-per-key counts back, reduce per doc.
    Every shuffle is keyed by span hash or doc id — uniform,
    linear-in-corpus, no all-pairs stage anywhere.

    Output: (doc_id, n_spans, dup_spans, dup_frac).
    """
    spans = df.select(
        F.col(id_col),
        F.explode(shingles_of(text_col, n)).alias("s"),
    ).select(F.col(id_col), md5_hash64("s").alias("g"))
    per_dg = spans.groupBy(id_col, "g").agg(F.count("*").alias("c_dg"))
    # per_dg feeds BOTH the corpus rollup and the join probe:
    # materialize it or the explode+hash+first-shuffle pipeline runs
    # twice (DataFrame lineage shares no subtrees; ~2x measured at
    # sf0.1). r13: lazy localCheckpoint over persist — plan truncates
    # to a leaf for both consumers (A/B dup_span_report 3/3 pairwise,
    # min 1.40 -> 1.06 s; chunk-profile twin 3/3, 1.22 -> 0.77 s).
    per_dg = checkpoint_in(scope, per_dg)
    per_g = per_dg.groupBy("g").agg(F.sum("c_dg").alias("c_g"))
    return (
        per_dg.join(per_g, "g")
        .groupBy(id_col)
        .agg(
            F.sum("c_dg").alias("n_spans"),
            F.sum(
                F.when(F.col("c_g") >= 2, F.col("c_dg")).otherwise(F.lit(0))
            ).alias("dup_spans"),
        )
        .select(
            F.col(id_col),
            "n_spans",
            "dup_spans",
            F.round(F.col("dup_spans") / F.col("n_spans"), 6).alias("dup_frac"),
        )
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest id.

    Returns one row per distinct content: (content_hash, kept_id, dup_count).
    Map-side partial aggregation makes the shuffle carry one row per
    distinct (hash) per partition — at 100 TB the reduce side sees the
    distinct-content cardinality, not the corpus size.
    """
    return (
        df.select(md5_hash64(text_col).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count("*").alias("dup_count"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    perms: int = MINHASH_PERMS,
    shingle_n: int = 3,
    keep_shingles: bool = False,
) -> DataFrame:
    """Per-doc MinHash signature as `perms` columns mh_0..mh_{p-1}.

    Entirely per-row (transform + array_min over the shingle array): no
    explode, no shuffle, embarrassingly parallel over the scan. One md5
    per shingle; permutations are affine maps over M31 (see
    perm_constants).

    With ``keep_shingles`` the distinct shingle array rides along as an
    ``sh`` column, so a caller that needs BOTH signatures and exact
    shingle sets (the estimator-calibration audit) pays one corpus scan
    instead of re-shingling per consumer. Signatures are unchanged:
    min over a permuted hash is invariant to duplicate shingles.
    """
    sh = F.array_distinct(shingles_of(text_col, shingle_n))
    bases = F.transform(sh, lambda x: md5_hash64(x) % MERSENNE31)
    if keep_shingles:
        out = df.select(F.col(id_col), sh.alias("sh"), bases.alias("_bases"))
    else:
        out = df.select(F.col(id_col), bases.alias("_bases"))

    # one-arg closure per permutation (a (x, s=s) default would be treated
    # as an (element, index) lambda and bind the array index to s)
    def affine(a: int, b: int):
        return lambda x: (F.lit(a) * x + F.lit(b)) % MERSENNE31

    for s, (a, b) in enumerate(perm_constants(perms)):
        out = out.withColumn(
            f"mh_{s}", F.array_min(F.transform("_bases", affine(a, b)))
        )
    return out.drop("_bases")


def band_hashes(
    sig: DataFrame, perms: int = MINHASH_PERMS, bands: int = MINHASH_BANDS
) -> DataFrame:
    """(id, band, band_hash) — one row per band per doc."""
    rows = perms // bands
    id_col = sig.columns[0]
    cols = []
    for b in range(bands):
        member = F.concat_ws(
            ",", *[F.col(f"mh_{b * rows + r}").cast("string") for r in range(rows)]
        )
        cols.append(
            F.struct(F.lit(b).alias("band"), md5_hash64(member).alias("band_hash"))
        )
    return sig.select(
        F.col(id_col), F.explode(F.array(*cols)).alias("bh")
    ).select(id_col, F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    perms: int = MINHASH_PERMS,
    bands: int = MINHASH_BANDS,
    scope: CacheScope | None = None,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any MinHash band.

    The self-join key (band, band_hash) is a uniform 60-bit hash: no skew,
    and the per-bucket fanout is bounded by real near-duplicate clusters.

    ``sig``: precomputed signature frame (first column = id, mh_* columns)
    — pass it when the caller already materialized signatures (audit
    queries) so the shingle+hash pipeline isn't recomputed here.
    """
    if sig is None:
        sig = minhash_signatures(df, text_col, id_col, perms)
    # materialize the (small) band table: the self-join would otherwise
    # recompute the full shingle+hash pipeline for BOTH sides (~2x cost
    # measured). One row per band per doc — tiny relative to the corpus;
    # pass a CacheScope to control the release point (operators/cache.py).
    # r13: checkpoint over persist (A/B minhash_estimate_report 3/3
    # pairwise; lsh/clusters 2/3 — see OPTIMIZATION_r13.md).
    bh = checkpoint_in(scope, band_hashes(sig, perms, bands))
    a = bh.alias("a")
    b = bh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def _simhash_col(hs_col: Column, bits: int) -> Column:
    """Fold an array<long> of token hashes into the `bits`-bit SimHash.

    Arrow-batched numpy, not column expressions: the expression form is
    `bits` interpreted (CodegenFallback) passes over the token-hash array
    per row — measured at ~1.1 s on the sf0.01 corpus for bits=32, and
    linear in rows at scale. Here the whole batch's hashes concatenate
    into one (total_tokens x bits) bit matrix, per-bit majorities come
    from a cumulative-sum slice per row (exact integer math, identical
    ties — cnt*2 > n — to the expression form and the SQL oracle), and
    empty token lists yield simhash 0 exactly as before.
    """
    pows = (1 << np.arange(bits)).astype(np.int64)

    @F.pandas_udf("bigint")
    def fold(hs: pd.Series) -> pd.Series:
        if len(hs) == 0:
            return pd.Series([], dtype="int64")
        lens = np.fromiter((len(x) for x in hs), dtype=np.int64, count=len(hs))
        flat = (
            np.concatenate([np.asarray(x, dtype=np.int64) for x in hs])
            if lens.sum()
            else np.empty(0, dtype=np.int64)
        )
        bitmat = (flat[:, None] >> np.arange(bits)) & 1  # (tokens, bits)
        csum = np.zeros((len(flat) + 1, bits), dtype=np.int64)
        np.cumsum(bitmat, axis=0, out=csum[1:])
        ends = np.cumsum(lens)
        starts = ends - lens
        cnt = csum[ends] - csum[starts]  # per-row bit counts; empty rows -> 0
        majority = cnt * 2 > lens[:, None]
        return pd.Series((majority * pows[None, :]).sum(axis=1))

    return fold(hs_col)


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Per-doc SimHash over whitespace tokens (term frequency weighted).

    bit b is set iff more than half the tokens have bit b set in their
    60-bit hash; exact ties round down. Per-row math, no shuffle; the
    bit-majority fold is one vectorized pass per Arrow batch
    (see `_simhash_col`).
    """
    hs = F.transform(words_of(text_col), md5_hash64)
    return df.select(F.col(id_col), hs.alias("_hs")).select(
        F.col(id_col), _simhash_col(F.col("_hs"), bits).alias("simhash")
    )


def simhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
    bands: int = SIMHASH_BANDS,
    max_hamming: int = 3,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole banding: a pair within distance d < bands must agree on at
    least one of `bands` disjoint bit-bands, so the join runs on band
    equality and only candidates pay the exact popcount.
    """
    assert max_hamming < bands, "pigeonhole requires max_hamming < bands"
    sh = persist_in(scope, simhash(df, text_col, id_col, bits))  # see lsh note
    width = bits // bands
    mask = (1 << width) - 1
    bandcols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("simhash", b * width).bitwiseAND(F.lit(mask)).alias("bh"),
        )
        for b in range(bands)
    ]
    bh = sh.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*bandcols)).alias("x")
    ).select(id_col, "simhash", F.col("x.band").alias("band"), F.col("x.bh").alias("bh"))
    a, b = bh.alias("a"), bh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def connected_components(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Cluster assignment over candidate-pair edges: each node gets
    ``cluster_id`` = the minimum id reachable through the pair graph.

    Iterative min-label propagation (the standard large-graph CC
    algorithm): per round, every node takes the min of its label and its
    neighbors' labels; converges in O(diameter) rounds. Each round is one
    shuffle keyed by node id; dedup clusters have tiny diameters (2-3
    rounds in practice). Driver only checks the convergence bit.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    # materialize once: edges are re-joined every round, and their lineage
    # (the whole candidate-pair pipeline: shingle -> minhash -> band join)
    # must not re-execute per iteration
    edges = edges.localCheckpoint(eager=True)
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "cluster_id", F.col("id")
    )
    while True:
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("n_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce("n_min", F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        )
        updated = updated.localCheckpoint(eager=True)  # cut lineage per round
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "id")
            .filter(F.col("u.cluster_id") != F.col("l.cluster_id"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            return labels.select(F.col("id").alias("doc_id"), "cluster_id")


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    scope: CacheScope | None = None,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs (the verify stage).

    (id_a, id_b, jaccard) for pairs >= threshold. Joins the (small)
    candidate set back to the shingle arrays, set math per-row.

    ``sets``: precomputed (id, sh) distinct-shingle frame — pass it when
    the caller already materialized shingles (e.g. via
    ``minhash_signatures(keep_shingles=True)``) to skip re-shingling the
    corpus; the caller owns its persistence in that case.
    """
    if sets is None:
        # persisted: joined twice (once per pair side)
        sets = persist_in(
            scope,
            df.select(
                F.col(id_col),
                F.array_distinct(shingles_of(text_col, shingle_n)).alias("sh"),
            ),
        )
    else:
        sets = sets.select(F.col(id_col), F.col("sh"))
    out = (
        pairs.join(sets.withColumnRenamed("sh", "sh_a"), pairs.id_a == sets[id_col])
        .drop(id_col)
        .join(
            sets.withColumnRenamed("sh", "sh_b").alias("s2"),
            pairs.id_b == F.col(f"s2.{id_col}"),
        )
        .drop(id_col)
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        out.select(
            "id_a",
            "id_b",
            F.round(inter.cast("double") / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
