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

# lineage-truncation cadence for the incremental trainer: between
# checkpoints the two-branch union doubles the LOGICAL plan per
# generation. r13: EVERY generation checkpoints (was every 3rd) — the
# lazy localCheckpoint adds no job, and keeping both frames at plan
# depth 1 makes each step's eager analyses and per-argmax optimizer run
# walk leaves (interleaved A/B at sf0.1, order-reversed across trials:
# 6/7 pairwise, min 4.55 -> 4.19 s; the r11 3-barrier-jobs cost this
# cadence once guarded against came from EAGER checkpoints, not lazy)
_BPE_CKPT_EVERY = 1


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


def _pair_counts(vocab: DataFrame, sign: int = 1) -> DataFrame:
    """(l, r, c): adjacent-pair weights of a (cnt, tokens) frame —
    sum of word counts over adjacent token pairs, optionally negated
    (the delta-update subtrahend)."""
    return (
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
        .agg((F.sum("cnt") * F.lit(sign)).cast("long").alias("c"))
    )


def _has_adjacent_pair(left: str, right: str):
    """Predicate: the token array contains (left, right) at adjacent
    positions. Built with Column args (never SQL-string interpolation —
    tokens are corpus text). The size guard is a WHEN, not an And:
    Spark's sequence(1, 0) yields [1, 0] (descending), so the exists
    must never evaluate on single-token words."""
    return F.when(
        F.size("tokens") >= 2,
        F.exists(
            F.sequence(F.lit(1), F.size("tokens") - 1),
            lambda i: (F.element_at(F.col("tokens"), i) == F.lit(left))
            & (F.element_at(F.col("tokens"), i + F.lit(1)) == F.lit(right)),
        ),
    ).otherwise(F.lit(False))


def bpe_fit_incremental(
    docs: DataFrame,
    merges: int = 8,
    text_col: str = "text",
    scope: CacheScope | None = None,
) -> list[tuple[int, str, str, str, int]]:
    """`bpe_fit` with INCREMENTALLY MAINTAINED pair counts — the
    classic delta update every real 32k-merge trainer uses (only pairs
    overlapping the merged pair change): instead of re-exploding and
    re-aggregating the WHOLE vocabulary per step, each step

    1. argmaxes the persisted pair-count table (one single-row collect,
       same tie rule: max weight, lexicographically smallest (l, r)),
    2. filters the vocabulary to the AFFECTED words (those containing
       the winning pair adjacently — a predicate scan of the in-memory
       frame, no shuffle),
    3. rewrites only those words and computes the pair-count DELTA as
       (new pairs of rewritten words) − (old pairs of affected words),
    4. folds the delta into the pair-count table (a delta-sized
       aggregation, zeros dropped) and swaps the vocabulary generation
       as unaffected ∪ rewritten.

    Integer arithmetic end-to-end, so the maintained counts equal a
    full recount EXACTLY and the learned table is bit-identical to
    `bpe_fit`'s (pytest-pinned, plus the shared DuckDB refit oracle).
    At scale this turns the per-step shuffle from O(vocabulary) to
    O(words containing the merged pair) — the regime that makes a real
    32k-merge build feasible; the one remaining per-step cost is the
    single-row argmax collect (driver-synchronized, same as every
    production trainer's loop head).

    Job economics (r11): a step schedules exactly ONE Spark job — the
    argmax collect. New generations register LAZILY (persist between
    checkpoints; a lazy localCheckpoint every ``_BPE_CKPT_EVERY`` steps
    truncates the doubling union lineage before analysis cost matters)
    and materialize as a side effect of the NEXT step's argmax, the
    barrier no trainer loop can avoid; the final generation is never
    computed at all. The r10 form eagerly checkpointed both frames per
    step — 3 barrier jobs/step, and the entry's 12.9 s was that
    overhead, not data. Generations accrete in the scope until the fit
    ends (fine for the tens-of-merges regime this entry runs; a 32k
    trainer would add a sliding release window)."""
    own_scope = scope is None
    if own_scope:
        scope = CacheScope()
    # checkpointed generations are tracked separately: their blocks are
    # meaningless outside this fit, so the finally releases them even
    # under a caller-owned scope (the r10 ADVICE leak: a mid-loop
    # exception or the final generation left blocks to ContextCleaner)
    ckpts: list[DataFrame] = []

    def _gen(df: DataFrame, step: int) -> DataFrame:
        if step % _BPE_CKPT_EVERY == 0:
            out = df.localCheckpoint(eager=False)
            ckpts.append(out)
            return out
        return scope.persist(df)

    vocab = scope.persist(word_vocab(docs, text_col))
    pc = scope.persist(_pair_counts(vocab))
    table: list[tuple[int, str, str, str, int]] = []
    try:
        for step in range(1, merges + 1):
            best = (
                pc.filter(F.col("c") > 0)
                .orderBy(F.desc("c"), "l", "r")
                .limit(1)
                .collect()
            )
            if not best:
                break
            left, right, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
            table.append((step, left, right, left + right, c))
            hit = _has_adjacent_pair(left, right)
            affected = vocab.filter(hit)
            rewritten = affected.select(
                "word",
                "cnt",
                _merge_fold(F.col("tokens"), left, right).alias("tokens"),
            )
            delta = _pair_counts(rewritten).unionByName(
                _pair_counts(affected, sign=-1)
            )
            nxt_pc = (
                pc.unionByName(delta)
                .groupBy("l", "r")
                .agg(F.sum("c").cast("long").alias("c"))
                .filter(F.col("c") != 0)
            )
            # coalesce: the two-branch union doubles partition count per
            # generation (2^merges tasks by the loop tail without it)
            nxt_vocab = (
                vocab.filter(~hit)
                .unionByName(rewritten)
                .coalesce(docs.sparkSession.sparkContext.defaultParallelism)
            )
            pc, vocab = _gen(nxt_pc, step), _gen(nxt_vocab, step)
    finally:
        if own_scope:
            scope.unpersist_all()
        for df in ckpts:
            df.unpersist()
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
