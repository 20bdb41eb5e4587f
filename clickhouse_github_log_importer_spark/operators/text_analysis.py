"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure column expressions (JVM-side, codegen).

These are the per-document featurizers a training-data pipeline runs over
every record — at 100 TB they must be narrow map work with zero shuffle,
which is exactly what these are.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64, seeded_hash64
from .dedup_text import shingles_of, words_of

#: n-gram-heuristic language markers (tiny stopword sets). Deliberately
#: deterministic and engine-portable; a production pipeline would plug a
#: fastText-style model in via a Pandas UDF at the same call site.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "en": ("the", "and", "is", "of", "to", "a", "in"),
    "es": ("el", "la", "de", "que", "los", "es", "una"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans"),
    "zh": ("的", "是", "了", "在", "我", "有", "和"),
}

EN_STOPWORDS = LANG_MARKERS["en"] + ("that", "it", "for", "on", "with")

#: BPE-ish token pattern: alphanumeric runs or single non-space symbols.
TOKEN_PATTERN = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"


def _marker_score(words: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    # long, matching ANSI engines' list-length type
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w))).cast("long")


def lang_scores(text: Column | str) -> dict[str, Column]:
    w = words_of(text)
    return {lang: _marker_score(w, m) for lang, m in sorted(LANG_MARKERS.items())}


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, score_<lang>..., pred_lang): argmax marker-hit count, ties to
    the alphabetically-first language, all-zero -> 'unknown'."""
    scores = lang_scores(text_col)
    out = df.select(
        F.col(id_col), *[c.alias(f"score_{lang}") for lang, c in scores.items()]
    )
    langs = sorted(scores)
    pred = F.lit("unknown")
    # evaluate in reverse-alphabetical order so the alphabetically-first
    # max wins the CASE chain
    for lang in reversed(langs):
        cond = (F.col(f"score_{lang}") > 0) & F.lit(True)
        for other in langs:
            if other != lang:
                op = (
                    F.col(f"score_{lang}") >= F.col(f"score_{other}")
                    if other > lang
                    else F.col(f"score_{lang}") > F.col(f"score_{other}")
                )
                cond = cond & op
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", pred)


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc quality features + a composite [0,1] score.

    Features mirror the standard pre-training filters (Gopher/C4-style):
    token count, distinct-token ratio (repetition), stopword ratio
    (naturalness), alpha ratio (symbol noise), mean token length.
    """
    w = words_of(text_col)
    n_tokens = F.size(w)
    distinct_ratio = F.size(F.array_distinct(w)).cast("double") / n_tokens
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    stop_ratio = (
        F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x))).cast("double")
        / n_tokens
    )
    n_chars = F.length(text_col)
    alpha_ratio = (
        F.length(F.regexp_replace(text_col, "[^a-zA-Z]", "")).cast("double") / n_chars
    )
    mean_token_len = (
        F.length(F.regexp_replace(text_col, " ", "")).cast("double") / n_tokens
    )
    score = (
        0.35 * distinct_ratio
        + 0.25 * stop_ratio
        + 0.25 * alpha_ratio
        + 0.15 * F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
    )
    return df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(mean_token_len, 4).alias("mean_token_len"),
        F.round(score, 4).alias("quality_score"),
    )


def token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex tokens, chars, and
    the chars/4 heuristic token estimate."""
    return df.select(
        F.col(id_col),
        F.size(words_of(text_col)).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(text_col, F.lit(TOKEN_PATTERN), 0))
        .cast("long")
        .alias("regex_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.ceil(F.length(text_col) / 4.0).cast("long").alias("est_bpe_tokens"),
    )


#: PII-ish patterns, deliberately restricted to syntax identical in Java
#: regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
LONG_DIGIT_PATTERN = "[0-9]{7,}"


def pii_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII-ish pattern counts (emails, long digit runs —
    phone/account-number shaped) and the resulting redaction flag. The
    standard pre-training hygiene scan: narrow map work, zero shuffle;
    swap in heavier recognizers via a Pandas UDF at the same call site.
    """
    emails = F.size(F.regexp_extract_all(text_col, F.lit(EMAIL_PATTERN), 0)).cast(
        "long"
    )
    digits = F.size(
        F.regexp_extract_all(text_col, F.lit(LONG_DIGIT_PATTERN), 0)
    ).cast("long")
    return df.select(
        F.col(id_col),
        emails.alias("email_hits"),
        digits.alias("long_digit_hits"),
        ((emails > 0) | (digits > 0)).alias("needs_review"),
    )


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition signals: duplicate-word
    fraction and the share of the single most frequent word bigram —
    the filters that catch boilerplate/spam documents exact dedup and
    MinHash (cross-document by construction) never see.

    Shape: duplicate-word fraction is pure narrow map work
    (``array_distinct`` is a codegen collection expression, not an
    interpreted lambda); the top-bigram share explodes bigrams and
    aggregates twice on (doc, bigram) then (doc) — shuffle volume is the
    token stream, the intrinsic cost of an exact per-doc mode. Empty
    documents are excluded (every fraction would be 0/0).
    """
    from .dedup_text import shingles_of, words_of

    words = words_of(text_col)
    # two independent branches over the scan: word stats (narrow) and the
    # bigram mode (explode + map-side-combined aggs). Keeping shingle
    # generation out of the join's left lineage matters: a joined plan
    # re-evaluates each side's expressions, and the n-gram build is the
    # expensive one.
    base = df.select(
        F.col(id_col),
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("_n_distinct"),
    ).filter(F.col("n_words") > 0)
    counts = (
        df.select(id_col, F.explode(shingles_of(text_col, 2)).alias("_bg"))
        .groupBy(id_col, "_bg")
        .agg(F.count("*").alias("_c"))
    )
    top = counts.groupBy(id_col).agg(
        F.max("_c").alias("_top_cnt"), F.sum("_c").alias("_n_bigrams")
    )
    return (
        base.join(top, id_col)
        .select(
            id_col,
            "n_words",
            F.round(
                1 - F.col("_n_distinct") / F.col("n_words").cast("double"), 6
            ).alias("dup_word_frac"),
            F.round(
                F.col("_top_cnt") / F.col("_n_bigrams").cast("double"), 6
            ).alias("top_bigram_frac"),
        )
    )


def fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    shingle_n: int = 4,
) -> DataFrame:
    """Bottom-k document fingerprint over hashed word n-grams.

    The k smallest 60-bit hashes of the doc's 4-gram shingles — a compact
    order-invariant sketch (winnowing-style); equal fingerprints with
    k=4 imply high shingle overlap. Output fp_1..fp_k (null-padded for
    very short docs).
    """
    hashed = F.array_sort(
        F.array_distinct(
            F.transform(shingles_of(text_col, shingle_n), md5_hash64)
        )
    )
    return df.select(
        F.col(id_col),
        *[F.try_element_at(hashed, F.lit(i + 1)).alias(f"fp_{i + 1}") for i in range(k)],
    )


def token_rarity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-statistics rarity score per document — the integer-exact
    perplexity proxy of a unigram LM.

    For each token occurrence, rarity = total_tokens - corpus_count(token)
    (0 for a token that IS the whole corpus, near total_tokens for a
    hapax). Per doc: the exact integer SUM of occurrence rarities and
    the one-division mean. High mean -> unusual vocabulary (OOD or
    noise); low mean -> stopword-heavy boilerplate. Monotone in unigram
    surprisal without log/float sums, so both engines agree bit-for-bit
    (the only float op is the final division; see bm25.py for the
    no-ln rationale).

    Scale shape: token explode -> (token) count with map-side combine
    (one uniform shuffle), token-count table re-joined to the token
    stream — vocabulary is tiny relative to the corpus (Heaps' law), so
    the join broadcasts; per-doc rollup is the second keyed shuffle.

    Output: (doc_id, n_tokens, rarity_sum, mean_rarity).
    """
    toks = df.select(
        F.col(id_col), F.explode(words_of(text_col)).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("tok_count"))
    total = vocab.agg(F.sum("tok_count").alias("total_tokens"))
    return (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.col("total_tokens") - F.col("tok_count")).alias(
                "rarity_sum"
            ),
        )
        .select(
            id_col,
            "n_tokens",
            "rarity_sum",
            F.round(
                F.col("rarity_sum").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("mean_rarity"),
        )
    )
