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
