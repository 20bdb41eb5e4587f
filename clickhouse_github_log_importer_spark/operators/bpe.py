"""Distributed BPE merge learning over a document corpus.

Byte-pair-encoding training is the tokenizer-construction step of an
LLM data pipeline (Sennrich et al. 2016; the `subword-nmt` /
HuggingFace-tokenizers trainer shape). The scalable structure every
real trainer uses — and the one implemented here — is:

1. aggregate the corpus ONCE into a (word, count) vocabulary — the
   only corpus-scale job (a map-side-combined groupBy; at 100 TB the
   output is millions of vocabulary rows, not terabytes of text);
2. run the merge loop over the bounded vocabulary table: each step is
   a tiny adjacent-pair-count aggregation, a single-row argmax collect
   (control-plane, exactly the k-means centroid-collect pattern in
   :mod:`.clustering`), and a JVM-side token rewrite — zero Python in
   any per-row path, zero corpus rescans after step 1.

Determinism contract (the DuckDB oracle reproduces it bit-exactly):

- initial tokens = the word's characters (no end-of-word marker; the
  corpus contract is single-code-point characters — ASCII in the
  synthetic tables);
- pair weight = sum of word counts over adjacent token pairs;
- best pair = max weight, ties to the lexicographically smallest
  (left, right);
- rewrite = leftmost non-overlapping replacement, greedy
  left-to-right. Spark implements it as an `aggregate` fold over the
  token array; the oracle implements the IDENTICAL scan as a string
  `replace` over a unit-separator encoding
  (``US US tok US US tok US US`` with pattern ``US l US US r US`` →
  ``US lr US``: each match consumes one separator from each side, so
  back-to-back occurrences still match, while partial-token matches
  are impossible).

The loop stops early when no adjacent pair remains (every word fused
to a single token) — fewer than `merges` output rows, same on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cache import CacheScope


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, tokens): the one corpus-scale aggregation.

    `tokens` starts as the word's characters; `split(word, '')` is
    whole-stage-codegen JVM work, and the groupBy happens BEFORE the
    character explode, so the token arrays exist only on vocabulary
    rows.
    """
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    wc = words.groupBy("word").agg(F.count("*").cast("long").alias("cnt"))
    chars = F.expr("filter(split(word, ''), c -> c <> '')")
    return wc.select("word", "cnt", chars.alias("tokens"))


def _merge_fold(tokens_col, left: str, right: str):
    """Leftmost non-overlapping merge of the adjacent pair (left, right)
    as a JVM-side fold. `element_at(acc, -1)` only ever indexes the
    fold's own accumulator (a lambda variable), and the And chain
    short-circuits on the empty accumulator, ANSI-safe."""
    merged = left + right
    return F.aggregate(
        tokens_col,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_fit(
    docs: DataFrame,
    merges: int = 8,
    text_col: str = "text",
    scope: CacheScope | None = None,
) -> list[tuple[int, str, str, str, int]]:
    """Learn `merges` BPE merges; returns [(step, left, right, merged,
    pair_count)] — the merge table, in learned order.

    Per step: ONE aggregation over the vocabulary (pair explode via a
    `transform(sequence(...))` over the plain token column + sum), ONE
    single-row collect, ONE fold projection. Each vocabulary generation
    is persisted and the previous generation dropped — the lineage
    never chains more than one fold deep.
    """
    own_scope = scope is None
    if own_scope:
        scope = CacheScope()
    vocab = scope.persist(word_vocab(docs, text_col))
    table: list[tuple[int, str, str, str, int]] = []
    try:
        for step in range(1, merges + 1):
            pairs = (
                vocab.filter(F.size("tokens") >= 2)
                .select(
                    "cnt",
                    F.explode(
                        F.expr(
                            "transform(sequence(1, size(tokens) - 1), "
                            "i -> struct(element_at(tokens, i) AS l, "
                            "element_at(tokens, i + 1) AS r))"
                        )
                    ).alias("pr"),
                )
                .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
                .agg(F.sum("cnt").alias("c"))
            )
            best = pairs.orderBy(F.desc("c"), "l", "r").limit(1).collect()
            if not best:
                break
            left, right, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
            table.append((step, left, right, left + right, c))
            nxt = scope.persist(
                vocab.select(
                    "word",
                    "cnt",
                    _merge_fold(F.col("tokens"), left, right).alias("tokens"),
                )
            )
            vocab.unpersist()
            vocab = nxt
    finally:
        if own_scope:
            scope.unpersist_all()
    return table


def bpe_vocab_after(
    docs: DataFrame,
    table: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """(word, cnt, tokens) AFTER applying a learned merge table in
    order — the tokenizer's vocabulary lookup. Pure transformations
    (one fold projection per merge, no actions): at apply time the
    corpus tokenizes by a broadcast join against THIS table, never by
    re-running per-document merge scans."""
    vocab = word_vocab(docs, text_col)
    for _, left, right, _, _ in table:
        vocab = vocab.select(
            "word", "cnt", _merge_fold(F.col("tokens"), left, right).alias("tokens")
        )
    return vocab


def merge_table_df(
    spark: SparkSession, table: list[tuple[int, str, str, str, int]]
) -> DataFrame:
    """The learned merge table as a DataFrame — the exact state the
    oracle's unrolled merge stages must reproduce."""
    return spark.createDataFrame(
        [(int(s), l, r, m, int(c)) for (s, l, r, m, c) in table],
        "step int, lhs string, rhs string, merged string, pair_count long",
    )
