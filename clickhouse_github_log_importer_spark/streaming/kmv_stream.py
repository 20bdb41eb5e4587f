"""Streaming KMV distinct sketch (uniqState over a stream).

Streaming twin of the batch ``uniq_kmv_sketch`` query (plans/queries.py)
and the hour→day ``uniq_state_rollup``: per group, the k smallest
distinct 60-bit md5 hashes — and therefore the distinct estimate
(k-1)*2^60/h_k — maintained incrementally in the state store via
``applyInPandasWithState``.

Why this is the right streaming distinct counter: the sketch IS the
state, O(k) longs per group BY CONSTRUCTION no matter how long the
stream runs — no watermark, no eviction policy, no growth. Each
micro-batch merges its hashes into the k-array (KMV union = k smallest
of the union, the same mergeability the batch rollup exploits) and emits
the group's refreshed estimate, so the sink always holds the up-to-date
approximate distinct per group.

The hash is computed JVM-side with the SAME portable md5 family as the
batch sketch (``functions.hashing.md5_hash64``) before the stateful op,
so the streaming estimate is bit-identical to the batch query's on the
same data — pytest-pinned stream==batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KMV_STREAM_K = 64

SKETCH_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("nk", T.LongType()),
        T.StructField("hk", T.LongType()),
        T.StructField("kmv_estimate", T.LongType()),
    ]
)

_TWO60 = 1152921504606846976.0  # 2^60, exact as a double


def _estimate(uniq: list[int], k: int) -> tuple[int, int, int]:
    """(nk, h_k, estimate) from the sorted k-smallest distinct hashes."""
    nk = len(uniq)
    hk = uniq[-1] if nk == k else 0
    if nk < k:
        est = nk
    else:
        # HALF-UP rounding (int(x + 0.5)), matching Spark F.round and the
        # DuckDB round() the batch oracles use — Python round() is
        # half-to-even and would diverge when (k-1)*2^60/hk lands on .5
        est = int((k - 1) * _TWO60 / hk + 0.5)
    return nk, hk, est


def kmv_merge(arr, hashes, k: int = KMV_STREAM_K):
    """The streaming update's exact merge step, extracted pure so the
    driver fold entry (plans/queries.stream_kmv_fold) and the stateful
    ``update`` below run the SAME code: KMV union = the k smallest of
    the union of the carried k-array and the micro-batch's hashes."""
    uniq = set(int(h) for h in arr)
    uniq.update(int(h) for h in hashes)
    return sorted(uniq)[:k]


def kmv_distinct_stream(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int = KMV_STREAM_K,
) -> DataFrame:
    """(key, id) stream -> per-key refreshed KMV sketch rows.

    Batch frames take the stateless twin path (same fold, one pass via
    ``applyInPandas`` — Spark rejects the stateful API outside a
    stream), which is what lets the test pin stream == batch == the
    registry's oracle-checked sketch. Output: one row per key per batch
    that touched it, with the current (nk, h_k, estimate).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions.hashing import md5_hash64

    hashed = df.select(
        F.col(key_col).cast("string").alias("key"),
        md5_hash64(F.col(id_col).cast("string")).alias("h"),
    )

    if not df.isStreaming:

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            merged = sorted(set(int(h) for h in pdf["h"]))[:k]
            nk, hk, est = _estimate(merged, k)
            return pd.DataFrame(
                {
                    "key": [pdf["key"].iloc[0]],
                    "nk": [nk],
                    "hk": [hk],
                    "kmv_estimate": [est],
                }
            )

        return hashed.groupBy("key").applyInPandas(
            fold, SKETCH_SCHEMA
        )

    def update(key, pdfs, state):
        (merged,) = state.get if state.exists else ([],)
        for pdf in pdfs:
            merged = kmv_merge(merged, pdf["h"], k)
        state.update((merged,))
        nk, hk, est = _estimate(merged, k)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "nk": [nk],
                "hk": [hk],
                "kmv_estimate": [est],
            }
        )

    return hashed.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=SKETCH_SCHEMA,
        stateStructType="hs array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
