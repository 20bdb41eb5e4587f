"""Streaming count-min sketch (the incremental frequency-sketch state).

Streaming twin of the batch ``heavy_hitters_cms`` grid
(:func:`..operators.cms.cms_cells`, oracle-checked through the
registry): the depth x width counter grid maintained incrementally via
``applyInPandasWithState``, grouped by sketch ROW — depth groups, each
holding its width-array of counters.

Why this is the right streaming frequency sketch: the grid IS the
state, O(depth x width) longs BY CONSTRUCTION no matter how long the
stream runs — no watermark, no eviction, no growth (the same
bounded-state argument as :mod:`.kmv_stream`). Each micro-batch's
events hash to (row, pos) cells JVM-side (the SAME portable md5 family
as the batch grid — ``operators.cms.cms_pos`` — so stream == batch
bit-for-bit, pytest-pinned), and the per-row update is one
``np.bincount`` merge into the counter array. Every update emits the
row's refreshed non-zero cells, so the sink always holds a queryable
sketch; downstream, estimates are ``min`` over the depth rows exactly
as the batch audit computes them, and grids from different streams or
corpora merge cellwise (+) — the CMS mergeability the day-rollup entry
exploits.

At scale the fan-in is depth groups regardless of event volume; the
shuffle is the same (row)-keyed one the batch grid pays, and each
task's state is one width-length long array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.cms import CMS_DEPTH, CMS_WIDTH, cms_pos

GRID_SCHEMA = T.StructType(
    [
        T.StructField("row", T.IntegerType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("cell_count", T.LongType()),
    ]
)


def cms_grid_stream(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Event stream -> incrementally maintained (row, pos, cell_count)
    sketch grid (non-zero cells only, refreshed per micro-batch).

    Batch frames take the stateless twin path (same bincount fold via
    ``applyInPandas`` — Spark rejects the stateful API outside a
    stream), which is what lets the test pin stream == batch == the
    registry grid.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    cells = df.select(
        F.posexplode(
            F.array(
                *[cms_pos(key_col, j, width).cast("int") for j in range(depth)]
            )
        ).alias("row", "pos")
    )

    def _emit(row_id: int, counts: "np.ndarray") -> "pd.DataFrame":
        nz = np.flatnonzero(counts)
        return pd.DataFrame(
            {
                "row": np.full(len(nz), row_id, dtype=np.int32),
                "pos": nz.astype(np.int32),
                "cell_count": counts[nz].astype(np.int64),
            }
        )

    if not df.isStreaming:

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            counts = np.bincount(pdf["pos"], minlength=width).astype(np.int64)
            return _emit(int(pdf["row"].iloc[0]), counts)

        return cells.groupBy("row").applyInPandas(fold, GRID_SCHEMA)

    def update(key, pdfs, state):
        (arr,) = state.get if state.exists else ([0] * width,)
        counts = np.asarray(arr, dtype=np.int64)
        for pdf in pdfs:
            counts += np.bincount(pdf["pos"], minlength=width).astype(np.int64)
        state.update((counts.tolist(),))
        yield _emit(int(key[0]), counts)

    return cells.groupBy("row").applyInPandasWithState(
        update,
        outputStructType=GRID_SCHEMA,
        stateStructType="cells array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
