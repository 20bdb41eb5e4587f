"""Behavioral tests for the training-data operators (planted duplicates,
planted neighbors) — the oracle-parity suite covers cross-engine equality;
these cover semantics."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators import (
    dedup_text as DT,
    multimodal as MM,
    similarity as SIM,
    text_analysis as TA,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup of 1
    (4, "completely different content about spark query engines and shuffles everywhere"),
    (5, "el la de que los es una palabra en otra lengua"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r["kept_id"]: r["dup_count"] for r in DT.exact_dedup(docs).collect()}
    assert out[1] == 2  # doc 2 collapsed into doc 1
    assert 2 not in out
    assert out[3] == 1 and out[4] == 1


def test_lsh_finds_near_dup(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in DT.lsh_candidate_pairs(docs).collect()}
    assert (1, 2) in pairs  # exact dup always collides
    assert (1, 3) in pairs  # 1-word edit shares bands
    assert (1, 4) not in pairs and (3, 4) not in pairs


def test_minhash_seeds_differ(docs):
    sig = DT.minhash_signatures(docs).filter(F.col("doc_id") == 1).first()
    values = [sig[f"mh_{s}"] for s in range(DT.MINHASH_PERMS)]
    assert len(set(values)) > 1  # seeds actually decorrelate


def test_jaccard_verify(docs):
    pairs = DT.lsh_candidate_pairs(docs)
    ver = {(r["id_a"], r["id_b"]): r["jaccard"] for r in DT.jaccard_verify(docs, pairs).collect()}
    assert ver[(1, 2)] == 1.0
    assert 0.5 <= ver[(1, 3)] < 1.0


def test_simhash_near_dup_pairs(docs):
    sh = {r["doc_id"]: r["simhash"] for r in DT.simhash(docs).collect()}
    assert sh[1] == sh[2]
    ham13 = bin(sh[1] ^ sh[3]).count("1")
    ham14 = bin(sh[1] ^ sh[4]).count("1")
    assert ham13 < ham14
    pairs = {(r["id_a"], r["id_b"]) for r in DT.simhash_candidate_pairs(docs).collect()}
    assert (1, 2) in pairs


VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [1.0, 0.001, 0.0, 0.0]),  # nearly identical to 0
    (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal to 0
    (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
    (4, [0.9, 0.1, 0.0, 0.0]),
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(vecs):
    out = SIM.cosine_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=4).collect()
    ranked = [(r["neighbor_id"], r["cos_sim"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked[0][0] == 1 and ranked[0][1] == pytest.approx(1.0, abs=1e-5)
    assert ranked[1][0] == 4
    assert ranked[-1] == (3, -1.0, 4)  # opposite vector last, exact -1


def test_lsh_buckets_group_similars(vecs):
    b = {r["vec_id"]: r["bucket"] for r in SIM.lsh_buckets(vecs, dims=4).collect()}
    assert b[0] == b[1]  # near-identical vectors share the sketch
    assert b[0] != b[3]  # opposite vectors cannot share all sign bits


def test_lsh_topk_subset_of_exact(vecs):
    exact = SIM.cosine_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=4)
    approx = SIM.lsh_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=4)
    exact_pairs = {(r["query_id"], r["neighbor_id"], r["cos_sim"]) for r in exact.collect()}
    for r in approx.collect():
        assert (r["query_id"], r["neighbor_id"], r["cos_sim"]) in exact_pairs


def test_lang_id(docs):
    out = {r["doc_id"]: r["pred_lang"] for r in TA.lang_id(docs).collect()}
    assert out[1] == "en" and out[5] == "es"


def test_quality_features(docs):
    q = {r["doc_id"]: r for r in TA.quality_features(docs).collect()}
    assert q[1]["n_tokens"] == 14
    assert q[1]["distinct_ratio"] < 1.0  # 'the' repeats
    assert q[4]["distinct_ratio"] == 1.0
    assert 0.0 <= q[1]["quality_score"] <= 1.0


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "hello, world! x2")], "doc_id long, text string")
    r = TA.token_stats(df).first()
    assert r["ws_tokens"] == 3
    # hello , world ! x2 -> 6 regex tokens (x2 splits alnum run? no: [A-Za-z0-9]+ keeps x2 whole)
    assert r["regex_tokens"] == 5
    assert r["n_chars"] == 16 and r["est_bpe_tokens"] == 4


def test_fingerprints_identical_docs_match(docs):
    fp = {r["doc_id"]: (r["fp_1"], r["fp_2"], r["fp_3"], r["fp_4"]) for r in TA.fingerprints(docs).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[4]


def test_multimodal_features(docs):
    media = MM.as_media_table(docs)
    feats = {r["doc_id"]: r for r in MM.extract_features(media).collect()}
    text1 = DOCS[0][1]
    assert feats[1]["n_bytes"] == len(text1.encode())
    assert feats[1]["head_md5"] == hashlib.md5(text1.encode()[:16]).hexdigest()
    frames = MM.frame_sample(media).groupBy("doc_id").count().collect()
    by_id = {r["doc_id"]: r["count"] for r in frames}
    import math

    assert by_id[1] == math.ceil(len(text1.encode()) / MM.FRAME_STRIDE)


def test_decode_unknown_magic_raises():
    with pytest.raises(ValueError):
        MM.decode_image(b"\x89PNG....")


def test_ppm_roundtrip():
    import numpy as np

    rgb = bytes(range(16 * 3)) * 2  # 16x2 image
    payload = MM.encode_ppm(16, 2, rgb)
    img = MM.decode_image(payload)
    assert (img["format"], img["width"], img["height"]) == ("ppm", 16, 2)
    assert img["pixels"].tobytes() == rgb
    # netpbm comment + arbitrary whitespace in the header still parse
    commented = b"P6\n# a comment\n 16\t2 # trailing\n255\n" + rgb
    assert MM.decode_ppm(commented)["pixels"].tobytes() == rgb
    assert np.array_equal(MM.decode_ppm(commented)["pixels"], img["pixels"])


def test_bmp_roundtrip_padding_and_channel_order():
    # width 3 -> 9-byte rows pad to 12: exercises both padding and the
    # BGR + bottom-up conversions; round-trip must restore flat RGB
    rgb = bytes(range(3 * 2 * 3))
    payload = MM.encode_bmp(3, 2, rgb)
    assert payload[:2] == b"BM"
    img = MM.decode_image(payload)
    assert (img["format"], img["width"], img["height"]) == ("bmp", 3, 2)
    assert img["pixels"].tobytes() == rgb


def test_corrupt_payloads_rejected():
    rgb = bytes(48)
    with pytest.raises(ValueError):
        MM.decode_ppm(MM.encode_ppm(4, 4, rgb)[:-5])  # truncated pixels
    with pytest.raises(ValueError):
        MM.decode_bmp(MM.encode_bmp(4, 4, rgb)[:2] + b"\x00" * 52)  # bad bpp
    with pytest.raises(ValueError):
        MM.encode_ppm(5, 5, rgb)  # wrong byte count


def test_image_media_roundtrip_features(spark):
    import numpy as np

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    media = MM.as_image_media_table(docs)
    feats = {r["doc_id"]: r for r in MM.extract_image_features(media).collect()}
    for d in range(6):
        px = MM.synth_pixels(d).astype(np.int64).reshape(-1, 3)
        r = feats[d]
        assert r["format"] == ("ppm" if d % 2 == 0 else "bmp")
        assert (r["width"], r["height"]) == (MM.IMG_WIDTH, MM.img_height(d))
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (
            px[:, 0].sum(), px[:, 1].sum(), px[:, 2].sum(),
        )


def test_connected_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (10, 11), (11, 12), (3, 10)],
        "id_a long, id_b long",
    )
    out = {r["doc_id"]: r["cluster_id"] for r in DT.connected_components(pairs).collect()}
    # {1,2,3,10,11,12} all connected through 3-10; {7,8} separate
    assert out[1] == out[2] == out[3] == out[10] == out[11] == out[12] == 1
    assert out[7] == out[8] == 7


def test_near_dup_pairs_finds_planted(vecs):
    out = SIM.near_dup_pairs(vecs, threshold=0.99, dims=4).collect()
    pairs = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in out}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.999  # planted near-identical
    assert all(a != 3 and b != 3 for a, b in pairs)  # opposite vector excluded


# --- sampling / decontamination / repetition (curation operators) ---------


def test_hash_sample_deterministic_and_partitioning(docs):
    from clickhouse_github_log_importer_spark.operators.sampling import hash_sample

    parts = [
        set(r["doc_id"] for r in hash_sample(docs, "doc_id", 4, rem).collect())
        for rem in range(4)
    ]
    # residue classes partition the table exactly
    assert sorted(i for p in parts for i in p) == [1, 2, 3, 4, 5]
    # re-derivable bit-for-bit
    again = set(r["doc_id"] for r in hash_sample(docs, "doc_id", 4, 0).collect())
    assert again == parts[0]
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 4, 4)


def test_temperature_mixture_shares(spark):
    from clickhouse_github_log_importer_spark.operators.sampling import (
        temperature_mixture,
    )

    df = spark.createDataFrame(
        [(i, "en") for i in range(80)] + [(i, "fr") for i in range(20)],
        "doc_id long, lang string",
    )
    rows = {r["lang"]: r for r in temperature_mixture(df, "lang").collect()}
    assert rows["en"]["raw_share"] == 0.8
    # temperature flattens: minority share rises above natural rate
    assert rows["fr"]["temp_share"] > rows["fr"]["raw_share"]
    assert abs(rows["en"]["temp_share"] + rows["fr"]["temp_share"] - 1) < 1e-5
    # tau=1 reproduces natural sampling
    nat = {r["lang"]: r for r in temperature_mixture(df, "lang", tau=1.0).collect()}
    assert nat["en"]["temp_share"] == nat["en"]["raw_share"]


def test_dup_span_profile(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),  # shares span a..f with doc 2
            (2, "a b c d e f x y"),
            (3, "p q r s t u v w"),  # unique content
            (4, "m m m m m m m m"),  # self-repeating: dup within one doc
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in DT.dup_span_profile(docs, n=6).collect()}
    # 8 words -> 3 spans of 6 words each
    assert all(out[d]["n_spans"] == 3 for d in (1, 2, 3, 4))
    # docs 1/2 share exactly the span "a b c d e f"
    assert out[1]["dup_spans"] == 1 and out[2]["dup_spans"] == 1
    assert out[1]["dup_frac"] == round(1 / 3, 6)
    # unique doc: nothing duplicated
    assert out[3]["dup_spans"] == 0 and out[3]["dup_frac"] == 0.0
    # within-doc repetition counts as duplication (all 3 spans identical)
    assert out[4]["dup_spans"] == 3 and out[4]["dup_frac"] == 1.0


def test_per_stratum_cap(spark):
    from clickhouse_github_log_importer_spark.operators.sampling import (
        per_stratum_cap,
    )

    df = spark.createDataFrame(
        [(i, "big", 1000 - i) for i in range(10)]
        + [(100 + i, "small", 50) for i in range(2)],
        "doc_id long, source string, n_chars long",
    )
    kept = per_stratum_cap(df, "source", "n_chars", "doc_id", cap=3).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    # big source capped at 3, keeping the 3 largest n_chars (ids 0,1,2)
    assert by_src["big"] == {0, 1, 2}
    # under-cap stratum passes through whole
    assert by_src["small"] == {100, 101}
    # ties break by smallest id: both 'small' rows tie at 50 and both fit,
    # but with cap=1 the smaller id wins deterministically
    one = per_stratum_cap(df, "source", "n_chars", "doc_id", cap=1).collect()
    assert {r["doc_id"] for r in one if r["source"] == "small"} == {100}


def test_split_assign_partitions_and_consistency(spark):
    from clickhouse_github_log_importer_spark.operators.sampling import (
        split_assign,
    )

    df = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id long"
    )
    rows = split_assign(df, "doc_id").collect()
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    # every row assigned, rates near 98/1/1 (hash-uniformity tolerance)
    assert sum(counts.values()) == 2000
    assert counts["train"] > 1900
    assert 0 < counts.get("val", 0) < 100 and 0 < counts.get("test", 0) < 100
    # consistent across tables: the same keys in another frame land in
    # the same split (the no-leakage property)
    again = {
        r["doc_id"]: r["split"]
        for r in split_assign(
            spark.createDataFrame([(i, "x") for i in range(2000)],
                                  "doc_id long, other string"),
            "doc_id",
        ).collect()
    }
    for r in rows:
        assert again[r["doc_id"]] == r["split"]
    with pytest.raises(ValueError):
        split_assign(df, "doc_id", val_pct=60, test_pct=40)


def test_eval_overlap_report(spark):
    from clickhouse_github_log_importer_spark.operators.decontamination import (
        eval_overlap_report,
    )

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),  # shares 3-grams with eval 10
            (2, "totally unrelated words in here"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(10, "alpha beta gamma delta zeta")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in eval_overlap_report(train, ev).collect()}
    assert set(got) == {1}  # doc 2 is clean -> absent from the drop list
    # shared 3-grams: "alpha beta gamma", "beta gamma delta"
    assert got[1]["n_shared_shingles"] == 2
    assert got[1]["n_eval_docs"] == 1


def test_repetition_profile(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "all words here are distinct tokens"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in TA.repetition_profile(df).collect()}
    assert set(got) == {1, 2}  # empty doc excluded
    assert got[1]["dup_word_frac"] == 0.75  # 4 words, 1 distinct
    assert got[1]["top_bigram_frac"] == 1.0  # "spam spam" is every bigram
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["n_words"] == 6


def test_pii_features(spark):
    df = spark.createDataFrame(
        [
            (1, "contact me at a.user@example.com or b@test.org please"),
            (2, "call 12345678 maybe"),
            (3, "clean text no identifiers 123"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in TA.pii_features(df).collect()}
    assert (got[1]["email_hits"], got[1]["needs_review"]) == (2, True)
    assert (got[2]["long_digit_hits"], got[2]["needs_review"]) == (1, True)
    assert (got[3]["email_hits"], got[3]["long_digit_hits"], got[3]["needs_review"]) == (0, 0, False)


def test_pack_plan(spark):
    from clickhouse_github_log_importer_spark.operators.sampling import pack_plan

    df = spark.createDataFrame(
        [
            ("en", 1, 1500),
            ("en", 2, 1000),  # starts at 1500 -> bin 0, straddles into 1
            ("en", 3, 600),   # starts at 2500 -> bin 1
            ("fr", 4, 100),   # strata are packed independently
        ],
        "lang string, doc_id long, n_tokens long",
    )
    rows = {
        (r["lang"], r["bin_id"]): (r["n_docs"], r["bin_tokens"], r["fill_ratio"])
        for r in pack_plan(df, "n_tokens", "doc_id", "lang", capacity=2048).collect()
    }
    assert rows == {
        ("en", 0): (2, 2500, round(2500 / 2048.0, 4)),
        ("en", 1): (1, 600, round(600 / 2048.0, 4)),
        ("fr", 0): (1, 100, round(100 / 2048.0, 4)),
    }


def test_wav_codec_roundtrip_and_chunk_walk():
    import struct

    import numpy as np

    from clickhouse_github_log_importer_spark.operators import multimodal as MM

    s = MM.synth_samples(7)
    payload = MM.encode_wav(MM.AUD_RATE, s)
    wav = MM.decode_wav(payload)
    assert wav["sample_rate"] == MM.AUD_RATE
    assert np.array_equal(wav["samples"], s)

    # a real-world file often carries extra chunks (LIST/INFO) before
    # data — the chunk walk must skip them, including odd-length padding
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded odd chunk
    with_junk = payload[:12] + junk + payload[12:]
    with_junk = b"RIFF" + struct.pack("<I", len(with_junk) - 8) + with_junk[8:]
    wav2 = MM.decode_wav(with_junk)
    assert np.array_equal(wav2["samples"], s)

    import pytest

    with pytest.raises(ValueError):
        MM.decode_wav(b"RIFX" + payload[4:])  # bad magic
    with pytest.raises(ValueError):
        # stereo contract violation
        bad_fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
        MM.decode_wav(
            b"RIFF"
            + struct.pack("<I", 4 + 8 + len(bad_fmt) + 8)
            + b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(bad_fmt))
            + bad_fmt
            + b"data"
            + struct.pack("<I", 0)
        )
