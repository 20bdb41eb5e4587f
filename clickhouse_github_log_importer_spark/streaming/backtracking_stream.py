"""Streaming sequenceCount BACKTRACKING twin (stateful operator).

Closes the last semantics seam in the sequence family (r11 verdict
missing #1): the bounded-state streaming folds
(adjacency_count_stream.py) run the GREEDY product automaton, while
the CH-exact batch entry ``sequence_count(matcher='backtracking')``
(operators/sequence_backtracking.py) counts leftmost backtracking
matches. Backtracking can bind an arbitrarily old declared event, so
an exact streaming twin cannot keep O(1) state — but it CAN keep the
declared-event buffer SINCE THE LAST COUNTED MATCH (ClickHouse's own
aggregate state is the full per-group event list; this buffer is the
suffix of it that can still matter) and decide matches exactly as
events become watermark-final.

The decision core is :func:`..operators.sequence_backtracking.
bt_count_final`: a watermark-aware O(n·k) DP that counts only FINAL
matches — matches no event arriving at or after the watermark could
displace from the lexicographically-smallest assignment — and reports
how much of the buffer is consumed (countAll semantics: through the
match's last event). Incremental == batch is fuzz-pinned in
tests/test_sequence_backtracking.py across random chunkings; the
end-to-end applyInPandasWithState pin is in
tests/test_backtracking_stream.py.

Emission: counts are monotone — a (user_id, seq_count) row is emitted
each time a user's FINAL count increases (the running cumulative
count); downstream takes the per-user max/latest. Events decide only
behind the watermark; buffered events whose finality is still open
('<'/'==' windows reaching past the watermark, a trailing 'adj' edge,
or an uncompleted 'any'/'>' chain that a future event could extend)
defer, exactly as the finality DP prescribes. A user idle past the
timeout horizon is FLUSHED: the remaining buffer is counted under
"no more events ever" (``wm_us=None``) and the state evicted — the
same bounded-state trade the other folds make, sized by the timeout;
a post-eviction event would recount from an empty buffer.

State is the unconsumed declared-event suffix, NOT the full history:
every counted match trims the buffer through its last event. Worst
case (a pattern whose first step never completes) is the declared
events within one idle-timeout horizon.
"""

from __future__ import annotations

from pyspark.sql import types as T

COUNT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("seq_count", T.LongType()),
    ]
)


def compile_bt(pattern: str, conds, semantics: str = "clickhouse"):
    """(type_codes, gaps) for the finality DP, conditions as codes."""
    from ..operators.sequence_backtracking import compile_backtracking

    types, gaps = compile_backtracking(pattern, conds, semantics)
    sym = {c: a for a, c in enumerate(conds)}
    return tuple(sym[ty] for ty in types), gaps, sym


def fold_final(buf, tcodes, gaps, wm_us):
    """Pure decision core shared with the pytest pins: ``buf`` is the
    user's unconsumed declared events as (ts_us, event_id, event_type
    CODE) tuples in any order; returns (n_new_final_matches,
    remaining_buf). ``wm_us=None`` flushes (eviction / end of stream).
    Only events with ts_us < wm_us participate; later-arrived buffer
    entries are withheld from the DP exactly as unknown future events.
    """
    import numpy as np

    from ..operators.sequence_backtracking import bt_count_final

    buf = sorted(buf)
    if wm_us is None:
        fin, rest = buf, []
    else:
        cut = 0
        for cut, e in enumerate(buf + [(wm_us, 0, 0)]):
            if e[0] >= wm_us:
                break
        fin, rest = buf[:cut], buf[cut:]
    if not fin:
        return 0, buf
    codes = np.fromiter((e[2] for e in fin), dtype=np.int64, count=len(fin))
    tsv = np.fromiter((e[0] for e in fin), dtype=np.int64, count=len(fin))
    cnt, consumed = bt_count_final(codes, tsv, tcodes, gaps, wm_us)
    return cnt, fin[consumed:] + rest


MATCH_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("matched", T.BooleanType()),
    ]
)


def sequence_match_backtracking_streaming(
    events,
    pattern: str,
    conds: tuple[str, ...],
    idle_timeout_minutes: int = 24 * 60,
    semantics: str = "clickhouse",
):
    """``sequenceMatch`` (existence) under the CH-exact BACKTRACKING
    matcher, streaming: a match exists iff the backtracking COUNT is
    >= 1, so this rides :func:`sequence_count_backtracking_streaming`
    and keeps only each user's FIRST emission — the moment the first
    watermark-final leftmost match is decided (or the idle-timeout
    flush decides it). Emits (user_id, matched=true) at most once per
    user per state lifetime; stream == batch
    ``sequence_match(matcher='backtracking')`` is pinned on the
    DIVERGENCE_PINS patterns (tests/test_backtracking_stream.py)."""
    from pyspark.sql import functions as F

    counts = sequence_count_backtracking_streaming(
        events, pattern, conds, idle_timeout_minutes, semantics
    )
    # counts are emitted on increase only: the first row per user IS
    # the existence signal; dropDuplicates keeps exactly one
    return counts.select(
        "user_id", F.lit(True).alias("matched")
    ).dropDuplicates(["user_id"])


def sequence_count_backtracking_streaming(
    events,
    pattern: str,
    conds: tuple[str, ...],
    idle_timeout_minutes: int = 24 * 60,
    semantics: str = "clickhouse",
):
    """Stateful streaming backtracking counter over (user_id long,
    ts timestamp, event_type string, event_id long) with a watermark
    already applied on ts. Emits (user_id, seq_count) on every FINAL
    count increase; after the idle timeout the remaining buffer is
    flushed under no-more-events semantics and the user evicted."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    tcodes, gaps, sym = compile_bt(pattern, conds, semantics)
    timeout_ms = idle_timeout_minutes * 60 * 1000
    declared = set(conds)

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        rows = []
        wm_ms = state.getCurrentWatermarkMs()

        def unpack():
            if state.exists:
                cnt, bt, beid, bc = state.get
                return int(cnt), list(zip(bt, beid, bc))
            return 0, []

        def emit_and_store(cnt, new, buf, last_us):
            if new > 0:
                cnt += new
                rows.append((user_id, cnt))
            if state.hasTimedOut and not buf:
                state.remove()
                return
            state.update(
                (
                    cnt,
                    [b[0] for b in buf],
                    [b[1] for b in buf],
                    [b[2] for b in buf],
                )
            )
            last_ms = max(
                last_us // 1000, max((b[0] for b in buf), default=0) // 1000
            )
            # wake when the watermark next advances (pending finality)
            # or, if nothing is pending, at the idle-flush horizon
            wake = wm_ms + 1 if buf else last_ms + timeout_ms
            state.setTimeoutTimestamp(max(wake, wm_ms + 1))

        cnt, buf = unpack()
        if state.hasTimedOut:
            last_ms = max((b[0] for b in buf), default=0) // 1000
            if not buf:
                state.remove()
            elif wm_ms >= last_ms + timeout_ms:
                # idle horizon passed: flush under no-more-events
                new, buf = fold_final(buf, tcodes, gaps, None)
                if new > 0:
                    rows.append((user_id, cnt + new))
                state.remove()
            else:
                new, buf = fold_final(buf, tcodes, gaps, wm_ms * 1000)
                emit_and_store(cnt, new, buf, last_ms * 1000)
        else:
            last_us = 0
            for pdf in pdfs:
                ts_us = (
                    pd.to_datetime(pdf["ts"]).astype("int64") // 1000
                ).tolist()
                for t_us, et, eid in zip(
                    ts_us,
                    pdf["event_type"].tolist(),
                    pdf["event_id"].tolist(),
                ):
                    last_us = max(last_us, t_us)
                    if et in declared:
                        buf.append((int(t_us), int(eid), sym[et]))
            new, buf = fold_final(buf, tcodes, gaps, wm_ms * 1000)
            emit_and_store(cnt, new, buf, last_us)
        yield pd.DataFrame(rows, columns=["user_id", "seq_count"])

    src = events.select("user_id", "ts", "event_type", "event_id").filter(
        F.col("event_type").isin(*declared)
    )
    return src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=COUNT_SCHEMA,
        stateStructType=(
            "cnt long, bt array<long>, beid array<long>, bc array<int>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
