"""Chunking + bloom-screen operator contracts (values are pinned by the
oracle parity sweep; these pin the semantic invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators import decontamination as DC
from clickhouse_github_log_importer_spark.operators.chunking import chunk_plan
from clickhouse_github_log_importer_spark.plans.queries import t

SF = "/root/testdata/sf0.001"


def _docs(spark, lengths):
    rows = [
        (i, " ".join(f"w{i}t{j}" for j in range(n)))
        for i, n in enumerate(lengths)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_coverage_and_shape(spark):
    # window 8 / stride 5 over assorted lengths incl. edge cases:
    # empty doc, doc == window, doc == window+1, exact stride multiples
    lengths = [0, 1, 5, 8, 9, 13, 18, 40, 100]
    out = chunk_plan(_docs(spark, lengths), window=8, stride=5).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 0 not in by_doc  # empty doc emits no chunks
    for doc_id, n in enumerate(lengths):
        if n == 0:
            continue
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        # chunk count formula: 1 + ceil(max(n-8,0)/5)
        assert len(chunks) == 1 + max(0, -((n - 8) // -5))
        covered = set()
        for i, c in enumerate(chunks):
            assert c["chunk_idx"] == i
            assert c["start_word"] == i * 5
            assert 1 <= c["n_words"] <= 8
            assert c["n_words"] == min(8, n - c["start_word"])
            covered |= set(range(c["start_word"], c["start_word"] + c["n_words"]))
        assert covered == set(range(n))  # every token covered exactly


def test_chunk_hash_distinguishes_content(spark):
    # identical chunks hash equal; different token spans hash different
    df = _docs(spark, [16])
    out = chunk_plan(df, window=8, stride=8).collect()
    assert len(out) == 2
    assert out[0]["chunk_hash"] != out[1]["chunk_hash"]
    again = chunk_plan(df, window=8, stride=8).collect()
    assert sorted(r["chunk_hash"] for r in out) == sorted(
        r["chunk_hash"] for r in again
    )


def test_bloom_no_false_negatives(spark):
    # the bloom guarantee: every exact hit is a bloom hit, per doc
    from clickhouse_github_log_importer_spark.functions.hashing import md5_hash64

    docs = t(spark, SF, "documents")
    h = md5_hash64(F.col("doc_id").cast("string"))
    rep = DC.bloom_contamination_report(
        docs.filter(h % 16 != 0), docs.filter(h % 16 == 0)
    ).collect()
    assert len(rep) > 0
    for r in rep:
        assert r["n_bloom_hits"] >= r["n_exact_hits"]
        assert r["n_false_pos"] == r["n_bloom_hits"] - r["n_exact_hits"]
        assert r["n_bloom_hits"] <= r["n_shingles"]
    # and no contaminated doc is missing: bloom report covers every doc
    # the exact join flags
    exact_docs = {
        r["doc_id"]
        for r in DC.eval_overlap_report(
            docs.filter(h % 16 != 0), docs.filter(h % 16 == 0)
        ).collect()
    }
    assert exact_docs <= {r["doc_id"] for r in rep}
