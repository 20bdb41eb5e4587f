"""Deterministic, engine-portable hashing primitives.

Everything downstream (MinHash, SimHash, LSH, fingerprints) needs hash
functions that produce *identical* values in Spark and in any ANSI-SQL
oracle (DuckDB). Spark's ``xxhash64``/``hash`` and DuckDB's ``hash`` are
different algorithms, so we standardize on md5:

    h(s)      = int(hex(md5(s))[:15], 16)          -- 60-bit, non-negative
    h_seed(s) = h(concat(seed, ':', s))            -- seeded family

15 hex digits = 60 bits, fits comfortably in a signed 64-bit int on both
engines. md5 is overkill cryptographically but it is the one hash both
engines (and every other engine worth targeting) share bit-for-bit.

Performance: md5 + conv are JVM intrinsics inside whole-stage codegen —
no Python, no shuffle. At 100 TB the hash cost is embarrassingly parallel
scan work; fine. If oracle-parity were not required, ``xxhash64`` is the
faster drop-in (same call shape), so the swap is one line.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_HEX_DIGITS = 15  # 60 bits < 2^63 on both engines


def md5_hash64(col: Column | str) -> Column:
    """60-bit integer hash of a string column (portable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, HASH_HEX_DIGITS), 16, 10).cast("long")


def seeded_hash64(col: Column | str, seed: int) -> Column:
    """Seeded member of the md5 hash family (for MinHash permutations)."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_hash64(F.concat(F.lit(f"{seed}:"), c))


def md5_hash64_sql(expr: str) -> str:
    """DuckDB-SQL twin of :func:`md5_hash64` (string expr in, SQL out)."""
    return (
        f"CAST(concat('0x', substr(md5({expr}), 1, {HASH_HEX_DIGITS})) AS BIGINT)"
    )


def seeded_hash64_sql(expr: str, seed: int) -> str:
    """DuckDB-SQL twin of :func:`seeded_hash64`."""
    return md5_hash64_sql(f"concat('{seed}:', {expr})")
