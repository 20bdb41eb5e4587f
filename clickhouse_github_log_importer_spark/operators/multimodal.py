"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque
``binary`` column with a typed metadata struct next to it; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators over ``mapInPandas`` so bytes cross the JVM<->Python boundary
once per batch, never per row, and the output schema is declared up
front (no schema inference over binaries).

The actual codec step is STUBBED (:func:`decode_image` raises
NotImplementedError — PIL/ffmpeg are not in this container); everything
around it — schema, batch iteration, partitioning, deterministic
frame-sampling arithmetic — is real and tested. Swap ``_fake_decode``
for a real decoder and nothing else changes.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

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


def decode_image(payload: bytes):  # pragma: no cover - documented stub
    """Real codec entry point. Not available in this container."""
    raise NotImplementedError(
        "image/audio codecs are not installed; use _fake_decode (deterministic) "
        "or plug PIL/ffmpeg here — the mapInPandas plumbing is codec-agnostic"
    )


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
