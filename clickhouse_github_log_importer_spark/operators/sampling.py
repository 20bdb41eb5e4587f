"""Deterministic sampling operators for training-data pipelines.

RNG-based sampling (``df.sample``, reservoir) is neither reproducible
across engines nor stable under retries/re-partitioning — unacceptable
for dataset curation where a sample must be re-derivable bit-for-bit.
The scalable deterministic alternative is HASH sampling: a row is kept
iff ``hash(key) % denominator == remainder``. Properties:

- exact reproducibility on any engine that shares the hash (the md5
  family in :mod:`..functions.hashing` has a DuckDB SQL twin);
- uniform rate 1/denominator per stratum without a shuffle (narrow map);
- consistent sampling across tables: the same key always lands in the
  same bucket, so joining two hash-sampled tables on the key keeps the
  full joint sample (the classic consistent-sampling trick);
- zero coordination at 100 TB — no global count, no pass to size strata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64


def hash_sample(
    df: DataFrame,
    key_col: str,
    denominator: int = 8,
    remainder: int = 0,
) -> DataFrame:
    """Keep rows whose 60-bit md5 key-hash falls in the selected residue
    class: a deterministic 1/denominator sample."""
    if not 0 <= remainder < denominator:
        raise ValueError(f"remainder {remainder} outside [0, {denominator})")
    h = md5_hash64(F.col(key_col).cast("string"))
    return df.filter(h % denominator == remainder)


def pack_plan(
    df: DataFrame,
    size_col: str,
    id_col: str,
    strata_col: str,
    capacity: int = 2048,
) -> DataFrame:
    """Sequence-packing plan: stream documents in ``id_col`` order into
    fixed-capacity token bins, per stratum — the batching step that turns
    a curated corpus into training sequences. A document's bin is the bin
    of its starting token offset (documents may straddle bins; the
    trainer splits at the boundary).

    The running sum is the distributed prefix sum of
    :func:`..operators.ranking.prefix_sum` — range-partition on
    (stratum, id), local cumsum per contiguous slice, tiny per-slice
    offset table broadcast back. A plain per-stratum window would
    serialize each stratum's cumsum onto ONE task (the classic
    low-cardinality-window scale-killer: strata are languages/domains,
    there may be only a handful). All arithmetic is exact integers: the
    plan is bit-reproducible on any engine, which RNG- or
    partition-dependent packing never is.

    Returns (strata, bin_id, n_docs, bin_tokens, fill_ratio) — one row
    per bin with how many documents start in it.
    """
    from .ranking import prefix_sum
    from .temporal import floor_div

    size = F.col(size_col).cast("long")
    with_prefix = prefix_sum(
        df.select(F.col(strata_col), F.col(id_col), size.alias("_sz")),
        [strata_col],
        [id_col],
        "_sz",
    )
    start = F.col("_prefix") - F.col("_sz")
    return (
        with_prefix.select(
            F.col(strata_col),
            floor_div(start, capacity).alias("bin_id"),
            F.col("_sz"),
        )
        .groupBy(strata_col, "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_sz").alias("bin_tokens"),
            F.round(F.sum("_sz") / float(capacity), 4).alias("fill_ratio"),
        )
    )


def temperature_mixture(
    df: DataFrame,
    strata_col: str,
    tau: float = 0.7,
) -> DataFrame:
    """Temperature-scaled mixture weights per stratum: ``w_s ∝ n_s^tau``
    normalized (tau=1 reproduces natural sampling, tau=0 uniform) — the
    standard multilingual/domain re-balancing rule for training mixes.

    One aggregation pass plus a global window over the (tiny) stratum
    table: the window runs on |strata| rows, never on the corpus.
    Shares are rounded to 6 decimals so the cross-engine comparison is
    insensitive to pow()/summation last-ulp differences.
    """
    counts = df.groupBy(strata_col).agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy()
    n = F.col("n_docs").cast("double")
    scaled = F.pow(n, F.lit(tau))
    return counts.select(
        strata_col,
        "n_docs",
        F.round(n / F.sum(n).over(w), 6).alias("raw_share"),
        F.round(scaled / F.sum(scaled).over(w), 6).alias("temp_share"),
    )


def per_stratum_cap(
    df: DataFrame,
    strata_col: str,
    order_col: str,
    id_col: str,
    cap: int = 100,
) -> DataFrame:
    """Cap rows kept per stratum, preferring the largest ``order_col``
    (ties -> smallest ``id_col``): the C4/RefinedWeb-style per-domain cap
    that stops one giant source from dominating a training mix.

    Two-phase top-cap, exact: phase 1 ranks within (input slice, stratum)
    — fully parallel, no stratum ever sorts on one task — and drops
    everything past ``cap``, which is lossless (a row beaten by >= cap
    rows in its OWN slice is beaten by >= cap rows globally). Phase 2
    ranks the survivors (<= cap x slices per stratum, independent of
    corpus size) exactly. A single stratum-keyed window would serialize
    each stratum's sort onto one task — fatal when strata are few and
    huge, and strictly worse even when they aren't. The deterministic
    (order, id) tiebreak makes the kept set bit-stable under any
    partitioning — RNG caps are not re-derivable.
    """
    order = [F.col(order_col).desc(), F.col(id_col).asc()]
    w_local = Window.partitionBy("_slice", strata_col).orderBy(*order)
    w_final = Window.partitionBy(strata_col).orderBy(*order)
    return (
        df.withColumn("_slice", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= cap)
        .withColumn("_rn", F.row_number().over(w_final))
        .filter(F.col("_rn") <= cap)
        .drop("_slice", "_lr", "_rn")
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    val_pct: int = 1,
    test_pct: int = 1,
) -> DataFrame:
    """Deterministic train/val/test assignment by hash residue class
    (default 98/1/1): ``split`` column derived from ``md5(key) % 100``.

    The split is a narrow map — no shuffle, no global count, no RNG state
    — and consistent across tables (same key ⇒ same split), so features
    joined later can never leak a train row into the eval split. The
    standard held-out protocol for corpus-scale training data.
    """
    if val_pct + test_pct >= 100:
        raise ValueError("val+test must leave room for train")
    bucket = md5_hash64(F.col(key_col).cast("string")) % 100
    train_hi = 100 - val_pct - test_pct
    return df.withColumn(
        "split",
        F.when(bucket < train_hi, F.lit("train"))
        .when(bucket < train_hi + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample_summary(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    denominator: int = 8,
) -> DataFrame:
    """Per-stratum audit of the hash sample: totals, kept counts, and the
    smallest kept key (a spot-checkable witness). One aggregation pass —
    membership is a map-side expression, so the only shuffle is the
    stratum rollup."""
    h = md5_hash64(F.col(key_col).cast("string"))
    kept = (h % denominator == 0).cast("long")
    return (
        df.select(F.col(strata_col), F.col(key_col), kept.alias("_kept"))
        .groupBy(strata_col)
        .agg(
            F.count("*").alias("n_total"),
            F.sum("_kept").alias("n_sampled"),
            F.min(F.when(F.col("_kept") == 1, F.col(key_col))).alias("min_sampled_key"),
        )
    )
