"""ReplacingMergeTree semantics (SURVEY 4.3).

The reference's events table is ``ENGINE = ReplacingMergeTree(from_api)``
(``app/service/log_importer.ts:123``): rows sharing the full ORDER BY tuple
(``:125-126``) are duplicates, and at background-merge time only the row
with max ``from_api`` survives (API data beats log data); until merged,
queries may see duplicates. ``OPTIMIZE TABLE ... DEDUPLICATE`` forces the
collapse (``app/service/gitee_importer.ts:426``).

We make this *deterministic*: :func:`replacing_dedup` is the canonical view
of the events relation (read-time dedup), and :func:`compact` is the
``OPTIMIZE`` analog (partition-wise rewrite). Strictly cleaner than
ClickHouse's eventually-deduped visibility.

Scale notes: the dedup is one hash-partitioned window over the key tuple —
identical shuffle shape to what any per-key reduction would need, nothing
extra. ``compact`` rewrites only the partitions present in the new batch
(month granularity), never the whole table, so compaction cost tracks batch
size, not table size — that's what keeps it viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schema import DEDUP_KEY, VERSION_COLUMN


def _with_key_components(df: DataFrame) -> DataFrame:
    out = df
    if "created_year" not in df.columns:
        out = out.withColumn("created_year", F.year("created_at"))
    if "created_month" not in df.columns:
        out = out.withColumn(
            "created_month", F.date_format("created_at", "yyyyMM").cast("int")
        )
    return out


def replacing_dedup(df: DataFrame, tiebreaker: str = "id") -> DataFrame:
    """Collapse duplicate ORDER-BY-key rows keeping max ``from_api``.

    ``row_number() OVER (PARTITION BY <key> ORDER BY from_api DESC)``;
    ``tiebreaker`` makes equal-version duplicates deterministic (ClickHouse
    keeps an arbitrary one; we keep max id).
    """
    keyed = _with_key_components(df)
    added = [c for c in ("created_year", "created_month") if c not in df.columns]
    w = Window.partitionBy(*[F.col(k) for k in DEDUP_KEY]).orderBy(
        F.col(VERSION_COLUMN).desc(), F.col(tiebreaker).desc()
    )
    out = keyed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return out.drop("_rn", *added)


def compact(spark, table_path: str, months: list[int] | None = None) -> None:
    """``OPTIMIZE TABLE ... DEDUPLICATE`` analog: partition-wise rewrite.

    Reads only the affected month partitions, window-dedups, and overwrites
    them (dynamic partition overwrite so untouched months are preserved).
    """
    reader = spark.read.parquet(table_path)
    if months:
        reader = reader.filter(F.col("created_month").isin(months))
    deduped = replacing_dedup(reader)
    (
        deduped.repartition("created_month")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("created_month")
        .parquet(table_path)
    )
