"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation/benchmark set.

The standard pre-training hygiene step (GPT-3 appendix C / PaLM /
Llama-style): a training document is *contaminated* when it shares at
least one word n-gram with any benchmark document, and must be dropped
or audited before training. The scalable shape mirrors the MinHash
pipeline in :mod:`.dedup_text`:

- both sides reduce to DISTINCT ``(doc_id, shingle_hash)`` pairs first —
  the join then carries one row per distinct shingle per doc, never the
  raw token stream;
- the benchmark side is tiny by construction (benchmarks are KBs-MBs
  against a 100 TB corpus), so it broadcasts: the overlap join is
  shuffle-free on the training side and composes with scan pruning;
- output is one row per contaminated training doc — a drop/audit list,
  directly joinable back to the corpus.

Reference parity: the reference (a log importer) has no corpus tooling;
this is the SURVEY "beyond the reference" training-data track.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64
from .dedup_text import shingles_of


def doc_shingle_hashes(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """DISTINCT (id, shingle-hash) pairs — the join-ready form of a
    corpus side. Distinct-ing BEFORE the join bounds the pair expansion
    by document content, not document length."""
    return (
        df.select(
            F.col(id_col),
            F.explode(shingles_of(text_col, n)).alias("_shingle"),
        )
        .select(id_col, md5_hash64("_shingle").alias("shingle_hash"))
        .distinct()
    )


def eval_overlap_report(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per contaminated training doc: how many distinct shingles it
    shares with the benchmark set and how many benchmark docs it touches.

    Returns (doc_id, n_shared_shingles, n_eval_docs); training docs with
    zero overlap are absent (this is a drop list, not a corpus scan
    result). The eval side is broadcast — decontamination of a 100 TB
    corpus is one map-side join over the training shingles.
    """
    tr = doc_shingle_hashes(train, text_col, id_col, n)
    ev = doc_shingle_hashes(eval_docs, text_col, id_col, n).withColumnRenamed(
        id_col, "_eval_id"
    )
    return (
        tr.join(F.broadcast(ev), "shingle_hash")
        .groupBy(id_col)
        .agg(
            F.countDistinct("shingle_hash").alias("n_shared_shingles"),
            F.countDistinct("_eval_id").alias("n_eval_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter contamination screen
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 16  # 64 Ki positions ~ 8 KiB bitset
BLOOM_HASHES = 3
_BLOOM_SEED0 = 1000  # seed family offset (disjoint from MinHash perms)


def bloom_positions(shingle_hash: F.Column | str) -> list[F.Column]:
    """The k bloom bit positions of a shingle hash (portable md5 family:
    seeded re-hash of the hash's decimal string, mod the bitset size) —
    identical derivation in the SQL oracle."""
    from ..functions.hashing import seeded_hash64

    c = F.col(shingle_hash) if isinstance(shingle_hash, str) else shingle_hash
    s = c.cast("string")
    return [
        seeded_hash64(s, _BLOOM_SEED0 + i) % BLOOM_BITS
        for i in range(BLOOM_HASHES)
    ]


def bloom_contamination_report(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    scope=None,
) -> DataFrame:
    """Bloom-screened contamination with an exact self-audit.

    Production path (what runs at 100 TB): the eval set folds into a
    ~8 KiB position set (k positions per distinct eval shingle); a
    training shingle is *bloom-hit* when ALL k of its positions are
    present — three broadcast LEFT SEMI joins against the tiny position
    table, i.e. a map-side filter over one corpus scan, with the
    classic bloom guarantee (no false negatives, bounded false
    positives). This replaces broadcasting the full eval shingle set
    when the benchmark suite is large (the exact join's broadcast side
    grows with eval size; the bloom side is capped at BLOOM_BITS).

    Audit path (the reason this is a report, not just a filter): the
    exact broadcast join runs beside it, and the output exposes the
    false-positive count per doc:

        (doc_id, n_shingles, n_bloom_hits, n_exact_hits, n_false_pos)

    for every training doc with at least one bloom hit. n_false_pos > 0
    rows are the docs a bloom-only screen would over-drop — the
    measured FP rate is the tuning signal for BLOOM_BITS/BLOOM_HASHES.
    """
    from .cache import checkpoint_in

    # tr feeds three consumers (bloom branch, exact audit, totals) and
    # ev two (position set, exact side): materialize both or the shingle
    # explode+distinct pipeline runs 5x (~25% wall at sf0.1 where the
    # pipeline is cheap; at corpus scale the recompute IS the query).
    # r13: checkpoint over persist (A/B bloom_contamination_report 3/3
    # pairwise, min 2.95 -> 2.50 s) — five consumer branches each walk
    # a plan leaf instead of the shingle pipeline
    tr = checkpoint_in(scope, doc_shingle_hashes(train, text_col, id_col, n))
    ev = checkpoint_in(scope, doc_shingle_hashes(eval_docs, text_col, id_col, n))
    evpos = (
        ev.select(F.explode(F.array(*bloom_positions("shingle_hash"))).alias("pos"))
        .distinct()
    )
    cand = tr.select(
        id_col,
        "shingle_hash",
        *[p.alias(f"pos_{i}") for i, p in enumerate(bloom_positions("shingle_hash"))],
    )
    for i in range(BLOOM_HASHES):
        cand = cand.join(
            F.broadcast(evpos.withColumnRenamed("pos", f"pos_{i}")),
            f"pos_{i}",
            "left_semi",
        )
    bloom = cand.groupBy(id_col).agg(F.count("*").alias("n_bloom_hits"))
    exact = (
        tr.join(F.broadcast(ev.select("shingle_hash").distinct()), "shingle_hash")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_exact_hits"))
    )
    totals = tr.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    return (
        totals.join(bloom, id_col)
        .join(exact, id_col, "left")
        .select(
            id_col,
            "n_shingles",
            "n_bloom_hits",
            F.coalesce("n_exact_hits", F.lit(0)).alias("n_exact_hits"),
            (
                F.col("n_bloom_hits") - F.coalesce("n_exact_hits", F.lit(0))
            ).alias("n_false_pos"),
        )
    )
