"""BPE merge learning (operators/bpe.py): the fold must implement
leftmost non-overlapping replacement exactly (the contract the oracle's
separator-string replace reproduces), tie-breaks must be lexicographic,
and the fit must match a hand-run of the algorithm on a tiny corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators import bpe as B


def _fold_once(spark, tokens, left, right):
    df = spark.createDataFrame([(tokens,)], "tokens array<string>")
    return df.select(
        B._merge_fold(F.col("tokens"), left, right).alias("out")
    ).collect()[0]["out"]


def test_fold_is_leftmost_non_overlapping(spark):
    # the three canonical shapes (same pins as the oracle encoding):
    # back-to-back occurrences both merge, chains don't cascade,
    # and non-adjacent occurrences are untouched
    assert _fold_once(spark, ["a", "b", "a", "b"], "a", "b") == ["ab", "ab"]
    assert _fold_once(spark, ["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _fold_once(spark, ["x", "a", "b", "b", "a"], "a", "b") == [
        "x", "ab", "b", "a",
    ]
    # multi-char tokens merge by exact token equality, not substring
    assert _fold_once(spark, ["ab", "a", "b"], "a", "b") == ["ab", "ab"]


def test_word_vocab_counts_and_chars(spark):
    docs = spark.createDataFrame(
        [(0, "aa ab"), (1, "aa  aa")], "doc_id long, text string"
    )
    rows = {r["word"]: (r["cnt"], r["tokens"]) for r in B.word_vocab(docs).collect()}
    assert rows == {"aa": (3, ["a", "a"]), "ab": (1, ["a", "b"])}


def test_bpe_fit_matches_hand_run(spark):
    # corpus: 'abab' x3, 'ab' x2, 'ba' x1
    # step 1: pairs a+b: 3*3 + 2 = 11 ... wait 'abab' has pairs ab,ba,ab
    #   (a,b): 2*3 + 1*2 = 8; (b,a): 1*3 + 1*1 = 4  -> merge (a,b) w=8
    # step 2: 'abab'->[ab,ab], 'ab'->[ab], 'ba'->[b,a]
    #   (ab,ab): 3; (b,a): 1 -> merge (ab,ab) w=3
    # step 3: only (b,a): 1 -> merge (b,a) w=1
    # step 4: no pairs left -> early stop
    docs = spark.createDataFrame(
        [(i, "abab") for i in range(3)]
        + [(10 + i, "ab") for i in range(2)]
        + [(20, "ba")],
        "doc_id long, text string",
    )
    table = B.bpe_fit(docs, merges=4)
    assert table == [
        (1, "a", "b", "ab", 8),
        (2, "ab", "ab", "abab", 3),
        (3, "b", "a", "ba", 1),
    ]


def test_tie_breaks_lexicographic(spark):
    # (a,b) and (c,d) both weigh 1 -> (a,b) wins
    docs = spark.createDataFrame([(0, "ab cd")], "doc_id long, text string")
    table = B.bpe_fit(docs, merges=1)
    assert table == [(1, "a", "b", "ab", 1)]


def test_vocab_after_applies_merges_in_order(spark):
    docs = spark.createDataFrame(
        [(0, "abab ab ba")], "doc_id long, text string"
    )
    table = [(1, "a", "b", "ab", 0), (2, "ab", "ab", "abab", 0)]
    rows = {
        r["word"]: r["tokens"]
        for r in B.bpe_vocab_after(docs, table).collect()
    }
    assert rows == {
        "abab": ["abab"],
        "ab": ["ab"],
        "ba": ["b", "a"],
    }


def test_incremental_fit_is_bit_identical_to_classic(spark):
    # the delta-maintained pair counts must equal a full recount
    # EXACTLY, including argmax tie-breaks (integer arithmetic
    # end-to-end) — same table, same order, same pair_count values
    docs = spark.createDataFrame(
        [
            (0, "low lower lowest low low"),
            (1, "new newer newest new"),
            (2, "wide wider widest"),
            (3, "ab ab abab ba"),
        ],
        "doc_id long, text string",
    )
    assert B.bpe_fit_incremental(docs, merges=6) == B.bpe_fit(
        docs, merges=6
    )


def test_incremental_fit_matches_classic_on_corpus(spark):
    from clickhouse_github_log_importer_spark.plans.queries import t as T

    docs = T(spark, "/root/testdata/sf0.001", "documents")
    assert B.bpe_fit_incremental(docs, merges=8) == B.bpe_fit(
        docs, merges=8
    )


def test_incremental_early_stop_when_merges_exhausted(spark):
    # single-char words fuse to one token quickly; both trainers stop
    # early with the same (short) table
    docs = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    assert B.bpe_fit_incremental(docs, merges=5) == B.bpe_fit(
        docs, merges=5
    )
