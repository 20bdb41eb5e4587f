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

from pyspark.sql import DataFrame
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
