"""Sliding-window document chunking — the context-length splitter of a
training-data pipeline (docs longer than the model context are split
into overlapping token windows; RAG corpora chunk the same way).

LLM-pipeline track (the reference, a log importer, has no corpus
tooling). Scale shape: pure per-row work — tokenize, derive the chunk
count arithmetically, explode the chunk index, slice. No shuffle, no
join, no Python; output size is Theta(total tokens / stride), i.e.
linear in the corpus with a constant governed by the overlap ratio.

Chunk spec (mirrored exactly by the SQL oracle):

- tokens = whitespace words (operators.dedup_text.words_of); empty docs
  (0 tokens) produce no chunks;
- chunk i covers tokens [i*stride, i*stride + window) (0-based,
  truncated at the doc end);
- n_chunks = 1 + ceil(max(dl - window, 0) / stride) — every token is
  covered, the last chunk may be short, and a doc never emits a chunk
  fully contained in the previous one.

The ceil is computed with integer-only arithmetic (v - v % s) / s so
both engines agree bit-for-bit without float floors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64
from .dedup_text import words_of

CHUNK_WINDOW = 64
CHUNK_STRIDE = 48


def chunk_plan(
    df: DataFrame,
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_idx, start_word, n_words, chunk_hash) — one row
    per chunk. chunk_hash fingerprints the chunk's joined tokens
    (md5 family) so chunks dedup/join downstream without carrying text."""
    assert 0 < stride <= window
    w = words_of(text_col)
    d = df.select(F.col(id_col), w.alias("_w"), F.size(w).alias("_dl")).filter(
        F.col("_dl") > 0
    )
    v = F.greatest(F.col("_dl") - window, F.lit(0)) + (stride - 1)
    n_chunks = (F.lit(1) + (v - v % stride) / stride).cast("long")
    c = d.select(
        id_col,
        "_w",
        "_dl",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("_w"), F.col("chunk_idx") * stride + 1, window)
    return c.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("chunk_idx") * stride).cast("long").alias("start_word"),
        F.size(chunk).cast("long").alias("n_words"),
        md5_hash64(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )
