"""BM25 keyword search over the documents table.

LLM-pipeline track (not a reference port — the reference delegates text
search to ClickHouse): corpus-statistics keyword relevance is the
standard retrieval baseline a training-data pipeline needs for targeted
corpus slicing ("all docs about X") and eval-set construction.

Scale shape (the 100 TB contract):

- Per-doc term frequencies and document length are a NARROW projection —
  ``size(filter(words, w = term))`` per query term, no explode, no
  shuffle, one pass over each row.
- Corpus statistics (N, total length, per-term document frequencies)
  are ONE single-row aggregate, broadcast back with a 1-row cross join
  (the q11 scalar-threshold pattern) — at any corpus size this is a
  map-side partial agg into one row.
- The only real shuffle is the final top-k (TakeOrderedAndProject-able).

Determinism contract: BM25's log-IDF is replaced by the rational
surrogate ``(N - df + 0.5) / (df + 0.5)`` — the exact argument of the
standard ``ln(1 + x)`` IDF. ``ln`` is NOT correctly-rounded-guaranteed
across libm implementations, while +, *, / are IEEE-exact; the surrogate
is monotone in the true IDF, so per-term ordering is preserved and every
float op here is bit-identical on Spark and DuckDB. Expression
association mirrors the SQL oracle token-for-token.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup_text import words_of

BM25_K1 = 1.2
BM25_B = 0.75

#: the fixed query-term set used by the registered query (mid-frequency
#: members of the synthetic corpus vocabulary)
BM25_TERMS = ("scan", "merge", "window", "spark")


def _tf(words: Column, term: str) -> Column:
    """Occurrences of `term` in the token array (narrow, per-row)."""
    return F.size(F.filter(words, lambda w: w == F.lit(term)))


def bm25_topk(
    df: DataFrame,
    terms: tuple[str, ...] = BM25_TERMS,
    k: int = 15,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by (log-free) BM25 for a fixed term set.

    Returns (doc_id, n_terms_matched, bm25, rank); rank ties break on
    smaller id. A zero-tf term contributes exactly 0 (its numerator is
    0), so no conditional is needed and absent terms cannot perturb the
    float sum.
    """
    w = words_of(text_col)
    d = df.select(
        F.col(id_col),
        F.size(w).alias("dl"),
        *[_tf(w, t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = d.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    j = d.crossJoin(F.broadcast(stats))

    # avgdl and per-term contributions: association mirrors the SQL
    # oracle exactly (idf * (num / denom); left-assoc sum over terms)
    avgdl = j["sum_dl"].cast("double") / j["n"].cast("double")

    def contribution(i: int) -> Column:
        tf = F.col(f"tf_{i}").cast("double")
        dfreq = F.col(f"df_{i}")
        idf = ((j["n"] - dfreq).cast("double") + F.lit(0.5)) / (
            dfreq.cast("double") + F.lit(0.5)
        )
        num = tf * F.lit(k1 + 1)
        denom = tf + F.lit(k1) * (
            F.lit(1) - F.lit(b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
        )
        return idf * (num / denom)

    score = contribution(0)
    for i in range(1, len(terms)):
        score = score + contribution(i)
    matched = F.col("tf_0") > 0
    nmatch = matched.cast("long")
    for i in range(1, len(terms)):
        nmatch = nmatch + (F.col(f"tf_{i}") > 0).cast("long")

    scored = j.select(
        F.col(id_col),
        nmatch.alias("n_terms_matched"),
        score.alias("_score"),
    )
    # top-k via TakeOrderedAndProject (per-partition heaps, no global
    # sort); the ranking window then runs over only k rows. (score, id)
    # is a strict total order, so the cut and the ranks are deterministic.
    top = scored.orderBy(F.desc("_score"), F.asc(id_col)).limit(k)
    win = Window.orderBy(F.desc("_score"), F.asc(id_col))
    return (
        top.withColumn("rank", F.row_number().over(win).cast("long"))
        .select(
            id_col,
            "n_terms_matched",
            F.round("_score", 6).alias("bm25"),
            "rank",
        )
    )
