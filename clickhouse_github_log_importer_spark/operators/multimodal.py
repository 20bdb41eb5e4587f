"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque
``binary`` column with a typed metadata struct next to it; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators over ``mapInPandas`` so bytes cross the JVM<->Python boundary
once per batch, never per row, and the output schema is declared up
front (no schema inference over binaries).

Two real pure-stdlib codecs are implemented (:func:`decode_image`
dispatches on magic bytes): binary PPM (P6) and uncompressed 24-bit BMP
(BI_RGB, bottom-up, 4-byte row padding) — formats simple enough to
parse with ``struct``/numpy and still exercise every real-codec concern
(header parse, channel order, row padding, round-trip). Compressed
formats (JPEG/PNG/video) would slot into the same dispatch via
PIL/ffmpeg, which are not in this container; ``_fake_decode`` remains as
the codec-agnostic plumbing test double.
"""

from __future__ import annotations

import hashlib
import math
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FRAME_STRIDE = 16  # bytes per sampled "frame" in the deterministic fake

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("head_md5", T.StringType()),
    ]
)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6), maxval 255. `rgb` is flat top-down RGB."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"expected {width * height * 3} bytes, got {len(rgb)}")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_ppm(payload: bytes) -> dict:
    """Parse binary PPM (P6): whitespace-separated header tokens with
    ``#`` comment support per the netpbm spec, then raw RGB samples."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = magic + 3 ints (width, height, maxval), tokens separated by
    # whitespace, '#' starts a comment through end-of-line
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos : pos + 1]
        if c == b"#":
            pos = payload.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tokens.append(int(payload[pos:end]))
            pos = end
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    pos += 1  # single whitespace byte after maxval
    n = width * height * 3
    rgb = payload[pos : pos + n]
    if len(rgb) != n:
        raise ValueError("truncated PPM pixel data")
    return {
        "format": "ppm",
        "width": width,
        "height": height,
        "channels": 3,
        "pixels": np.frombuffer(rgb, dtype=np.uint8),
    }


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Uncompressed 24-bit BMP (BI_RGB): BGR samples, bottom-up rows,
    each row padded to a 4-byte boundary. `rgb` is flat top-down RGB."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"expected {width * height * 3} bytes, got {len(rgb)}")
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    bgr = arr[::-1, :, ::-1]  # bottom-up rows, RGB -> BGR
    row_size = (width * 3 + 3) & ~3
    rows = np.zeros((height, row_size), dtype=np.uint8)
    rows[:, : width * 3] = bgr.reshape(height, width * 3)
    data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + data


def decode_bmp(payload: bytes) -> dict:
    """Parse uncompressed 24-bit BMP; returns flat top-down RGB pixels."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=height * row_size, offset=off
    ).reshape(height, row_size)[:, : width * 3]
    if bottom_up:
        rows = rows[::-1]
    rgb = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
    return {
        "format": "bmp",
        "width": width,
        "height": height,
        "channels": 3,
        "pixels": np.ascontiguousarray(rgb).reshape(-1),
    }


def decode_image(payload: bytes) -> dict:
    """Real codec entry point: dispatch on magic bytes (P6 PPM / BMP).

    Returns {format, width, height, channels, pixels(flat top-down RGB
    uint8)}. Compressed formats would plug in here (PIL/ffmpeg — not in
    this container); unknown magics raise ValueError so corrupt payloads
    quarantine instead of miscounting.
    """
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError(f"unsupported image magic {payload[:2]!r}")


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for decode: byte-level 'frames' + digest."""
    n = len(payload)
    return {
        "n_bytes": n,
        "n_frames": math.ceil(n / FRAME_STRIDE) if n else 0,
        "head_md5": hashlib.md5(payload[:FRAME_STRIDE]).hexdigest(),
    }


def as_media_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize a media-shaped table from the documents fixture:
    payload = utf-8 bytes of the text (a stand-in blob), typed metadata."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        ).alias("media_meta"),
    )


# deterministic synthetic-image parameters: pixel k of doc d is
# (d * PIX_A + k * PIX_B) mod 256 — closed-form integer arithmetic both
# engines reproduce exactly (the DuckDB oracle recomputes channel sums
# from the same formula, so the parity check covers REAL decoded bytes)
PIX_A = 2654435761  # Knuth multiplicative-hash constant
PIX_B = 40503
IMG_WIDTH = 16


def img_height(doc_id: int) -> int:
    return 4 + doc_id % 5


def synth_pixels(doc_id: int) -> np.ndarray:
    """Flat top-down RGB uint8 pixels of the synthetic image for a doc."""
    n = IMG_WIDTH * img_height(doc_id) * 3
    k = np.arange(n, dtype=np.int64)
    return ((doc_id * PIX_A + k * PIX_B) % 256).astype(np.uint8)


IMAGE_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def as_image_media_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode one real image per doc: even ids -> P6 PPM, odd -> 24-bit
    BMP, pixels from the deterministic formula. mapInPandas so the encode
    (the codec boundary — inherently Python/binary work) runs once per
    Arrow batch partition; everything downstream is a normal binary
    column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads, metas = [], []
            for d in ids:
                rgb = synth_pixels(int(d)).tobytes()
                enc = encode_ppm if d % 2 == 0 else encode_bmp
                p = enc(IMG_WIDTH, img_height(int(d)), rgb)
                payloads.append(p)
                metas.append(
                    {
                        "media_type": "image/x-portable-pixmap"
                        if d % 2 == 0
                        else "image/bmp",
                        "n_bytes": len(p),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": ids.values, "payload": payloads, "media_meta": metas}
            )

    return docs.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, IMAGE_MEDIA_SCHEMA
    )


def extract_image_features(media: DataFrame) -> DataFrame:
    """REAL decode over the binary payload column: parse the container
    (PPM or BMP per magic), recover top-down RGB pixels, reduce to typed
    features (dims + exact per-channel integer sums). Arrow-batched
    mapInPandas — bytes cross the boundary once per batch; the decode is
    embarrassingly parallel per input partition (the 100 TB shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                px = img["pixels"].astype(np.int64).reshape(-1, 3)
                rows.append(
                    {
                        "doc_id": int(d),
                        "format": img["format"],
                        "width": img["width"],
                        "height": img["height"],
                        "n_pixels": img["width"] * img["height"],
                        "sum_r": int(px[:, 0].sum()),
                        "sum_g": int(px[:, 1].sum()),
                        "sum_b": int(px[:, 2].sum()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA])

    return media.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def extract_features(media: DataFrame, batch_decoder=_fake_decode) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    One pandas iterator per partition; the decoder sees raw bytes and
    returns the typed feature dict. This is the real 100 TB shape: the
    expensive Python/codec work is embarrassingly parallel per input
    partition and the exchange is Arrow, not pickled rows.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [batch_decoder(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                    "head_md5": [f["head_md5"] for f in feats],
                }
            )
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Deterministic frame sampling: one row per sampled frame offset.

    Column-expression implementation (no Python): at scale this is a
    lateral explode of offset sequences, shuffle-free.
    """
    n = F.col("media_meta.n_bytes")
    offsets = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(n - 1, F.lit(0).cast("long")),
        F.lit(stride).cast("long"),
    )
    return (
        media.select(
            "doc_id",
            n.alias("_n"),
            F.posexplode(offsets).alias("frame_idx", "byte_offset"),
        )
        .filter(F.col("byte_offset") < F.col("_n"))
        .withColumn("frame_idx", F.col("frame_idx").cast("long"))
        .drop("_n")
    )


# ---------------------------------------------------------------------------
# Audio: real pure-stdlib PCM WAV codec (RIFF chunk walk, no wave module
# dependency on file paths — bytes in, bytes out)
# ---------------------------------------------------------------------------

AUD_A = 2246822519  # xxhash prime — decorrelated from the image formula
AUD_B = 374761393
AUD_RATE = 8000


def aud_n_samples(doc_id: int) -> int:
    return 256 + doc_id % 64


def synth_samples(doc_id: int) -> np.ndarray:
    """Deterministic int16 mono samples: s_k = ((id*A + k*B) mod 2^16) - 2^15."""
    k = np.arange(aud_n_samples(doc_id), dtype=np.int64)
    return ((doc_id * AUD_A + k * AUD_B) % 65536 - 32768).astype(np.int16)


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """Minimal canonical PCM WAV: RIFF header + fmt + data chunks."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict:
    """Chunk-walking PCM WAV parser (16-bit mono little-endian): skips
    unknown chunks (LIST/INFO etc.), validates the fmt contract, returns
    rate + int16 samples. Raises ValueError on malformed input."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    rate, bits, channels, data = None, None, None, None
    while pos + 8 <= min(end, len(payload)):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise ValueError(f"not PCM (fmt tag {audio_fmt})")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if bits != 16 or channels != 1:
        raise ValueError(f"expected 16-bit mono, got {bits}-bit x{channels}")
    return {
        "sample_rate": int(rate),
        "samples": np.frombuffer(data, dtype="<i2"),
    }


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_samples", T.LongType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("max_abs", T.LongType()),
    ]
)


def as_audio_media_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode one real WAV per doc from the deterministic sample formula
    (same media-table schema as the image path)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads, metas = [], []
            for d in ids:
                p = encode_wav(AUD_RATE, synth_samples(int(d)))
                payloads.append(p)
                metas.append({"media_type": "audio/wav", "n_bytes": len(p)})
            yield pd.DataFrame(
                {"doc_id": ids.values, "payload": payloads, "media_meta": metas}
            )

    return docs.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, IMAGE_MEDIA_SCHEMA
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL WAV decode -> exact integer features (sum, abs-sum, peak):
    every value closed-form recomputable by the SQL oracle, so a codec
    bug (endianness, sign, chunk walk, padding) breaks hash parity."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                wav = decode_wav(bytes(payload))
                s = wav["samples"].astype(np.int64)
                rows.append(
                    {
                        "doc_id": int(d),
                        "sample_rate": wav["sample_rate"],
                        "n_samples": len(s),
                        "sum_samples": int(s.sum()),
                        "sum_abs": int(np.abs(s).sum()),
                        "max_abs": int(np.abs(s).max()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA])

    return media.mapInPandas(run, AUDIO_FEATURE_SCHEMA)
