"""Chunked packed-bitmap set cardinalities (groupBitmap* analog).

ClickHouse's groupBitmap / groupBitmapAnd / groupBitmapOr family
(AggregateFunctionGroupBitmap.h over RoaringBitmap) folds integer id sets
into compressed bitmaps so set algebra (audience overlap, cohort
intersection) is popcounts instead of joins. Spark has no bitmap
aggregate, so this module re-creates the *container* design that makes
roaring bitmaps distributable:

- ids are split into fixed-width buckets (``id >> BUCKET_BITS``); each
  (key, bucket) group packs its <=2^BUCKET_BITS member offsets into a
  dense ``2^BUCKET_BITS / 8``-byte bitmap in ONE Arrow batch
  (``applyInPandas`` + ``numpy.packbits``);
- set algebra between keys is an equi-join on the bucket id followed by
  vectorized byte-wise AND + popcount, so no shuffle row is ever wider
  than one container and a billion-id key is ~122k independent
  containers spread over the cluster, never one giant blob on one task;
- OR cardinalities come from inclusion-exclusion (|A|+|B|-|A AND B|),
  never from materializing the union.

The containers are mergeable state in the -State/-Merge sense: two
sub-bitmaps for the same (key, bucket) OR together losslessly, so
incremental maintenance is a byte-wise OR, not a recount.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .ranking import grouped_kernel

# 8192 ids per container -> 1 KiB packed sub-bitmap. Wide enough that the
# bucket join stays tiny, small enough that one container is always one
# comfortable Arrow batch.
BUCKET_BITS = 13
_BUCKET_SIZE = 1 << BUCKET_BITS

_BITMAP_SCHEMA = "key string, bucket long, bitmap binary, n long"


def audience_bitmaps(
    df: DataFrame, key_col: str, id_col: str
) -> DataFrame:
    """(key, id) rows -> one packed sub-bitmap per (key, id-bucket).

    Output: ``key, bucket, bitmap (2^BUCKET_BITS/8 bytes), n`` where
    ``n`` is the container popcount. One distinct shuffle (map-side
    combined) then one Arrow fold per container; ids must be
    non-negative integers.
    """

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        offs = pdf["_off"].to_numpy()
        # numpy negative indexing would silently set the WRONG bit; fail
        # loudly instead (nulls are filtered out before the shuffle)
        if offs.size and (offs.min() < 0 or offs.max() >= _BUCKET_SIZE):
            raise ValueError(
                "audience_bitmaps: id out of container domain "
                f"[0, {_BUCKET_SIZE}) — ids must be non-negative integers"
            )
        bits = np.zeros(_BUCKET_SIZE, dtype=bool)
        bits[offs] = True
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]],
                "bucket": [int(pdf["_bucket"].iloc[0])],
                "bitmap": [np.packbits(bits).tobytes()],
                "n": [int(bits.sum())],
            }
        )

    d = (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(id_col).cast("long").alias("_id"),
        )
        # domain contract: ids are non-negative integers (ClickHouse
        # groupBitmap is UInt-typed). Nulls carry no set membership and
        # are dropped; negatives would corrupt bit offsets downstream,
        # so they are dropped here AND re-checked loudly in the fold.
        .filter(F.col("_id").isNotNull() & (F.col("_id") >= 0))
        .distinct()
        .select(
            "key",
            F.shiftright(F.col("_id"), BUCKET_BITS).alias("_bucket"),
            (F.col("_id") % _BUCKET_SIZE).alias("_off"),
        )
    )
    return grouped_kernel(d, ["key", "_bucket"], build, _BITMAP_SCHEMA)


def _and_popcount():
    # built lazily: pandas_udf parses its DDL return type against the
    # active session, so decorating at import time would require one
    @pandas_udf("long")
    def pop(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        out = [
            int(
                np.unpackbits(
                    np.frombuffer(x, dtype=np.uint8)
                    & np.frombuffer(y, dtype=np.uint8)
                ).sum()
            )
            for x, y in zip(a, b)
        ]
        return pd.Series(out, dtype="int64")

    return pop


def bitmap_pair_overlap(
    bm: DataFrame, scope: "CacheScope | None" = None
) -> DataFrame:
    """All key pairs (a < b): exact AND/OR cardinalities from containers.

    The pair join is keyed on the bucket id (containers of different
    keys co-locate per bucket); buckets present on only one side cannot
    intersect and are correctly absent from the inner join. Totals come
    from the container popcounts; OR is inclusion-exclusion. The
    container frame feeds three consumers (both pair-join legs and the
    totals), so it is persisted — register with ``scope`` to control
    the lifetime. The per-pair AND counts and per-key totals are
    O(#keys^2) / O(#keys) rows and broadcast into the spine joins.
    """
    from .cache import checkpoint_in

    # r13: checkpoint over persist (A/B bitmap_audience_overlap 2/3
    # pairwise) — the a/b spine sides walk a plan leaf
    bm = checkpoint_in(scope, bm)
    a = bm.select(
        F.col("key").alias("type_a"),
        F.col("bucket").alias("bucket"),
        F.col("bitmap").alias("_ba"),
    )
    b = bm.select(
        F.col("key").alias("type_b"),
        F.col("bucket").alias("bucket"),
        F.col("bitmap").alias("_bb"),
    )
    ands = (
        a.join(b, "bucket")
        .filter(F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            _and_popcount()(F.col("_ba"), F.col("_bb")).alias("_p"),
        )
        .groupBy("type_a", "type_b")
        .agg(F.sum("_p").cast("long").alias("n_and"))
    )
    tot = bm.groupBy("key").agg(F.sum("n").cast("long").alias("n"))
    ta = tot.select(F.col("key").alias("type_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("key").alias("type_b"), F.col("n").alias("n_b"))
    spine = ta.crossJoin(F.broadcast(tb)).filter(
        F.col("type_a") < F.col("type_b")
    )
    return spine.join(
        F.broadcast(ands), ["type_a", "type_b"], "left"
    ).select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        F.coalesce(F.col("n_and"), F.lit(0)).cast("long").alias("n_and"),
        (
            F.col("n_a")
            + F.col("n_b")
            - F.coalesce(F.col("n_and"), F.lit(0))
        )
        .cast("long")
        .alias("n_or"),
    )


def merge_bitmaps(bm: DataFrame, out_key) -> DataFrame:
    """-Merge step of the bitmap -State family: OR sub-bitmaps of the
    same (merged key, bucket) into one container and re-popcount.

    ``out_key`` is a Column mapping the state's ``key`` to the coarser
    rollup key (e.g. hour -> day). Lossless by construction — a bitmap
    OR is the exact union — so merged popcounts equal a direct distinct
    count over the finer states' inputs (the pytest-pinned
    merge == direct contract shared with uniq/quantile/CMS states).
    One keyed shuffle over container rows (state-bounded, never raw
    ids); the OR fold is one Arrow batch per merged container.
    """

    def orfold(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        want = _BUCKET_SIZE // 8
        lens = pdf["bitmap"].map(len)
        if (lens != want).any():
            # corrupt persisted state: fail with the domain contract,
            # not an opaque numpy broadcast error (mirrors the
            # audience_bitmaps id-domain guard); report every offending
            # width so the bad producer is identifiable from the message
            bad = sorted(set(lens[lens != want].tolist()))
            raise ValueError(
                "merge_bitmaps: container(s) for (key="
                f"{pdf['key'].iloc[0]!r}, bucket="
                f"{int(pdf['bucket'].iloc[0])}) have byte length(s) "
                f"{bad}, expected {want} (_BUCKET_SIZE={_BUCKET_SIZE})"
            )
        acc = np.frombuffer(pdf["bitmap"].iloc[0], dtype=np.uint8).copy()
        for buf in pdf["bitmap"].iloc[1:]:
            acc |= np.frombuffer(buf, dtype=np.uint8)
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]],
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bitmap": [acc.tobytes()],
                "n": [int(np.unpackbits(acc).sum())],
            }
        )

    re_keyed = bm.withColumn("key", out_key.cast("string"))
    return grouped_kernel(
        re_keyed, ["key", "bucket"], orfold, _BITMAP_SCHEMA
    )
