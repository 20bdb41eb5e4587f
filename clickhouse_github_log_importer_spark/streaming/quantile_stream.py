"""Streaming exact-quantile state (quantileState over a stream).

Streaming twin of the batch ``quantile_state_rollup`` (plans/queries.py)
and the ``operators/quantile_state.py`` -State/-Merge primitives: per
group, the exact VALUE HISTOGRAM maintained incrementally in the state
store via ``applyInPandasWithState``, with the refreshed quantileExactLow
p25/p50/p75 emitted for every group a micro-batch touches — the
continuous percentile-drift monitor, with no re-read of history.

Why this is the right streaming quantile: the histogram IS the state,
bounded by the group's VALUE DOMAIN (cents-valued metrics have <=~1e6
distinct values) no matter how long the stream runs — no watermark, no
eviction, no sketch error. Merging a micro-batch is a counter add (the
same associative SUM ``merge_state`` exploits), and the quantile pick is
the identical integer rule the batch side uses (idx = (n-1)*num // den,
smallest value whose cumulative count reaches idx+1), so stream == batch
== the oracle-checked registry rollup — pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

QUANTILE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("p25", T.LongType()),
        T.StructField("p50", T.LongType()),
        T.StructField("p75", T.LongType()),
    ]
)

LEVELS = ((1, 4), (1, 2), (3, 4))


def _quantile_row(key: str, vals, cnts):
    """quantileExactLow picks from a sorted histogram — the same integer
    index rule as operators/quantile_state.quantiles_from_state."""
    import numpy as np

    cum = np.cumsum(cnts)
    n = int(cum[-1])
    picks = []
    for num, den in LEVELS:
        idx = (n - 1) * num // den
        picks.append(int(vals[int(np.searchsorted(cum, idx + 1))]))
    import pandas as pd

    return pd.DataFrame(
        {
            "key": [key],
            "n_events": [n],
            "p25": [picks[0]],
            "p50": [picks[1]],
            "p75": [picks[2]],
        }
    )


def _merge_hist(vals, cnts, pdfs):
    """Add the micro-batch's per-value counts into the histogram."""
    hist = dict(zip((int(v) for v in vals), (int(c) for c in cnts)))
    for pdf in pdfs:
        for v, c in pdf["v"].value_counts().items():
            v = int(v)
            hist[v] = hist.get(v, 0) + int(c)
    items = sorted(hist.items())
    return [v for v, _ in items], [c for _, c in items]


def quantile_state_stream(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """(key, value) stream -> per-key refreshed exact p25/p50/p75 rows.

    ``value`` is folded to integer cents JVM-side before the stateful op
    (the same domain discipline as the batch histogram). Batch frames
    take the stateless twin path (same fold via ``applyInPandas``) so
    tests can pin stream == batch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    cents = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.round(F.col(value_col) * 100).cast("long").alias("v"),
    )

    if not df.isStreaming:

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            vals, cnts = _merge_hist([], [], [pdf])
            return _quantile_row(pdf["key"].iloc[0], vals, cnts)

        return cents.groupBy("key").applyInPandas(fold, QUANTILE_SCHEMA)

    def update(key, pdfs, state):
        (vals, cnts) = state.get if state.exists else ([], [])
        vals, cnts = _merge_hist(vals, cnts, pdfs)
        state.update((vals, cnts))
        yield _quantile_row(key[0], vals, cnts)

    return cents.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=QUANTILE_SCHEMA,
        stateStructType="vs array<long>, cs array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
