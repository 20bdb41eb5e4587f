"""Cross-engine hash parity (the foundation for MinHash/SimHash/LSH)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.functions.hashing import (
    md5_hash64,
    md5_hash64_sql,
    seeded_hash64,
    seeded_hash64_sql,
)

WORDS = ["hello", "world", "a b c", "", "ünïcodé", "日本語", "x" * 1000]


def test_md5_hash64_matches_duckdb(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "w string")
    got = [r[0] for r in df.select(md5_hash64("w")).collect()]
    con = duckdb.connect()
    want = [con.execute(f"SELECT {md5_hash64_sql('?')}", [w]).fetchone()[0] for w in WORDS]
    assert got == want
    assert all(v >= 0 for v in got)  # 60-bit, never negative


def test_seeded_hash64_matches_duckdb(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "w string")
    got = [r[0] for r in df.select(seeded_hash64("w", 42)).collect()]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {seeded_hash64_sql('?', 42)}", [w]).fetchone()[0]
        for w in WORDS
    ]
    assert got == want


def test_seeds_decorrelate(spark):
    df = spark.createDataFrame([("abc",)], "w string")
    h0, h1 = df.select(seeded_hash64("w", 0), seeded_hash64("w", 1)).first()
    assert h0 != h1


def test_ivf_topk_recall_vs_brute_force(spark):
    # IVF with nprobe=n_lists must EQUAL brute force (probing every list
    # is exhaustive search); with nprobe=2 it returns a subset ranking
    from clickhouse_github_log_importer_spark.operators import similarity as SIM

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 4")
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in SIM.cosine_topk(emb, q, k=3).collect()
    }
    full_probe = {
        (r.query_id, r.rank): r.neighbor_id
        for r in SIM.ivf_topk(emb, q, k=3, n_lists=8, nprobe=8).collect()
    }
    assert full_probe == exact
    approx = SIM.ivf_topk(emb, q, k=3, n_lists=8, nprobe=2).collect()
    assert 0 < len(approx) <= len(exact)
