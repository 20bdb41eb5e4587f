"""Third-implementation cross-checks.

The oracle sweep proves Spark == DuckDB, but both sides share constants
and expression structure — a spec bug could make both wrong together.
These tests recompute three operators from scratch in plain Python
(different code path, different author-model of the spec) and compare
exactly. Plus a hypothesis fuzz of the WAV codec round-trip.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_github_log_importer_spark.operators import bm25 as BM
from clickhouse_github_log_importer_spark.plans.queries import REGISTRY, t

SF = "/root/testdata/sf0.001"


def test_bm25_matches_pure_python(spark):
    docs = {
        r["doc_id"]: (r["text"] or "").split(" ")
        for r in t(spark, SF, "documents").select("doc_id", "text").collect()
    }
    docs = {k: [w for w in v if w != ""] for k, v in docs.items()}
    n = len(docs)
    sum_dl = sum(len(v) for v in docs.values())
    avgdl = sum_dl / n
    k1, b = BM.BM25_K1, BM.BM25_B
    dfreq = {
        term: sum(1 for v in docs.values() if term in v) for term in BM.BM25_TERMS
    }
    scored = []
    for did, words in docs.items():
        dl = len(words)
        s = 0.0
        nm = 0
        for term in BM.BM25_TERMS:
            tf = sum(1 for w in words if w == term)
            nm += 1 if tf > 0 else 0
            idf = ((n - dfreq[term]) + 0.5) / (dfreq[term] + 0.5)
            num = tf * (k1 + 1)
            denom = tf + k1 * (1 - b + b * (dl / avgdl))
            s = s + idf * (num / denom)
        scored.append((did, nm, s))
    scored.sort(key=lambda x: (-x[2], x[0]))
    expect = [
        (did, nm, s, rank + 1) for rank, (did, nm, s) in enumerate(scored[:15])
    ]
    got = sorted(
        (
            (r["doc_id"], r["n_terms_matched"], r["bm25"], r["rank"])
            for r in REGISTRY["bm25_keyword_search"].spark(spark, SF).collect()
        ),
        key=lambda x: x[3],
    )
    assert [(g[0], g[1], g[3]) for g in got] == [
        (e[0], e[1], e[3]) for e in expect
    ]
    for g, e in zip(got, expect):
        # the operator emits round(score, 6); the reference keeps the raw
        # float — equal iff they differ by at most half an ulp of the
        # 6-decimal grid (plus rounding-mode slack at the boundary)
        assert abs(g[2] - e[2]) <= 5.01e-7, (g, e)


def test_token_rarity_matches_pure_python(spark):
    docs = {
        r["doc_id"]: [w for w in (r["text"] or "").split(" ") if w != ""]
        for r in t(spark, SF, "documents").select("doc_id", "text").collect()
    }
    counts: dict[str, int] = {}
    for words in docs.values():
        for w in words:
            counts[w] = counts.get(w, 0) + 1
    total = sum(counts.values())
    expect = {}
    for did, words in docs.items():
        if not words:
            continue
        rs = sum(total - counts[w] for w in words)
        expect[did] = (len(words), rs, round(rs / len(words), 6))
    got = {
        r["doc_id"]: (r["n_tokens"], r["rarity_sum"], r["mean_rarity"])
        for r in REGISTRY["doc_token_rarity"].spark(spark, SF).collect()
    }
    assert got == expect


def test_cms_estimate_matches_pure_python(spark):
    from clickhouse_github_log_importer_spark.operators import cms

    rows = t(spark, SF, "events").select("user_id").collect()
    per_key: dict[int, int] = {}
    for r in rows:
        per_key[r["user_id"]] = per_key.get(r["user_id"], 0) + 1

    def pos(key: int, row: int) -> int:
        h = hashlib.md5(f"{cms._CMS_SEED0 + row}:{key}".encode()).hexdigest()
        return int(h[:15], 16) % cms.CMS_WIDTH

    grid: dict[tuple[int, int], int] = {}
    for k, c in per_key.items():
        for j in range(cms.CMS_DEPTH):
            cell = (j, pos(k, j))
            grid[cell] = grid.get(cell, 0) + c
    top = sorted(per_key.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expect = {
        k: (c, min(grid[(j, pos(k, j))] for j in range(cms.CMS_DEPTH)))
        for k, c in top
    }
    got = {
        r["user_id"]: (r["exact_count"], r["cms_estimate"])
        for r in cms.heavy_hitter_audit(
            t(spark, SF, "events"), "user_id", top=10
        ).collect()
    }
    assert got == expect


@settings(max_examples=200, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=400
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
    junk=st.binary(max_size=9),
)
def test_wav_roundtrip_fuzz(samples, rate, junk):
    import struct

    import numpy as np

    from clickhouse_github_log_importer_spark.operators import multimodal as MM

    arr = np.array(samples, dtype=np.int16)
    payload = MM.encode_wav(rate, arr)
    wav = MM.decode_wav(payload)
    assert wav["sample_rate"] == rate
    assert np.array_equal(wav["samples"], arr)
    # arbitrary foreign chunk injected before data must be skipped
    # (word-aligned per RIFF)
    chunk = b"JUNK" + struct.pack("<I", len(junk)) + junk + (b"\x00" * (len(junk) & 1))
    patched = payload[:12] + chunk + payload[12:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    wav2 = MM.decode_wav(patched)
    assert wav2["sample_rate"] == rate
    assert np.array_equal(wav2["samples"], arr)


def test_lttb_matches_pure_python(spark):
    # independent reimplementation of the Steinarsson LTTB spec: build
    # the hourly series from the raw parquet via pandas (not the Spark
    # plan), run the greedy bucket walk with the same cross-multiplied
    # integer-anchor scoring, compare the selected points exactly
    from clickhouse_github_log_importer_spark.plans.queries import (
        _LTTB_B as B,
    )

    ev = t(spark, SF, "events").select("ts_us", "value").toPandas()
    ev["x"] = ev["ts_us"] // 3600000000
    ev["y"] = (ev["value"] * 100).round().astype("int64")
    series = sorted(
        (int(x), int(y))
        for x, y in ev.groupby("x")["y"].sum().items()
    )
    n = len(series)
    assert n > B + 2
    buckets = [[] for _ in range(B)]
    for j, p in enumerate(series[1:-1]):
        buckets[(j * B) // (n - 2)].append(p)
    sel = [series[0]]
    for k in range(B):
        if k < B - 1:
            nxt = buckets[k + 1]
            c = len(nxt)
            sx = sum(p[0] for p in nxt)
            sy = sum(p[1] for p in nxt)
        else:
            c, sx, sy = 1, series[-1][0], series[-1][1]
        px, py = sel[-1]
        best = None
        for x, y in buckets[k]:
            s = abs(
                float(px * c - sx) * float(y - py)
                - float(px - x) * float(sy - py * c)
            )
            if best is None or s > best[0]:
                best = (s, (x, y))
        sel.append(best[1])
    sel.append(series[-1])
    expect = [(i, p[0], p[1]) for i, p in enumerate(sel)]
    got = [
        (r["rank"], r["hour_id"], r["cents"])
        for r in REGISTRY["lttb_downsample_hourly"]
        .spark(spark, SF)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect
