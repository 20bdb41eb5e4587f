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
