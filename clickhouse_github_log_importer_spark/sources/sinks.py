"""Write-side connectors (S5/S7/S8/X3 analogs).

- :func:`write_events_table` — the native store: month-partitioned parquet
  with the ClickHouse sort-key clustering applied within partitions (R2:
  scan locality + parquet min/max pruning on the dedup-key prefix).
- :func:`write_jdbc` — the literal ClickHouse/any-DB sink via JDBC
  (``df.write.format('jdbc')``), availability-gated: the container has no
  JDBC driver, callers get a clear error instead of an import crash.
- :func:`foreach_partition_batched` — the generic batched push sink that
  the Neo4j (5000/batch, ``app/service/neo4j.ts:47-68``) and TuGraph
  (500/chunk, ``app/service/log_tugraph_importer.ts:417-425``) writers
  instantiate: per-partition iterator -> fixed-size batches -> user
  callable. Executor-side, so the push parallelism is the partition
  count, exactly like the reference's batch loops but cluster-wide.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, Row

#: ClickHouse ORDER BY prefix used for within-partition clustering (R2).
SORT_KEY = ("platform", "org_id", "repo_id", "actor_id", "type", "action")


def write_events_table(events: DataFrame, path: str, mode: str = "append") -> None:
    """Append a batch to the native events store.

    Month partitioning (R1) + sort-within-partitions on the ClickHouse
    sort-key prefix (R2): parquet row-group min/max stats then prune
    scans filtered on those columns, the analog of MergeTree's primary
    index granules.
    """
    (
        events.sortWithinPartitions(*[c for c in SORT_KEY if c in events.columns])
        .write.mode(mode)
        .partitionBy("created_month")
        .parquet(path)
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
    mode: str = "append",
) -> None:
    """JDBC sink (S5 parity target: ClickHouse over jdbc:clickhouse://).

    Raises a clear RuntimeError when no driver is on the classpath (this
    container ships none); on a real deployment add the clickhouse-jdbc
    jar via spark.jars and this works unchanged.
    """
    props = {"batchsize": str(batchsize), **(properties or {})}
    try:
        df.write.format("jdbc").option("url", url).option("dbtable", table).options(
            **props
        ).mode(mode).save()
    except Exception as e:  # pragma: no cover - driver-missing path
        raise RuntimeError(
            f"JDBC sink unavailable (driver missing for {url}?): {e}"
        ) from e


def foreach_partition_batched(
    df: DataFrame,
    send: Callable[[list[dict[str, Any]]], None],
    batch_size: int = 5000,
) -> None:
    """X3: batched push sink. ``send`` receives lists of row-dicts of at
    most ``batch_size``; called on executors, once per batch, per
    partition."""

    def run(it: Iterator[Row]) -> None:
        batch: list[dict[str, Any]] = []
        for row in it:
            batch.append(row.asDict(recursive=True))
            if len(batch) >= batch_size:
                send(batch)
                batch = []
        if batch:
            send(batch)

    df.foreachPartition(run)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...] = ("user_id",),
    n_buckets: int = 64,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed parquet table: pay the shuffle ONCE at write time.

    Hive-style bucketing hashes ``bucket_cols`` into ``n_buckets`` files
    per partition at write, and records the layout in the catalog — so
    every later equi-join or aggregation on those keys reads the
    co-located layout and SKIPS its exchange entirely (the plan gate in
    tests/test_bucketed_sink.py pins: bucketed-vs-bucketed join and
    groupBy on the bucket key run with ZERO Exchange nodes). This is the
    storage-side answer to the brief's "pre-partitioning / bucketing for
    co-located joins": at 100 TB the event log is written once and
    joined/aggregated by user thousands of times — one write-side
    shuffle amortized over every downstream query. The analog of
    ClickHouse's sharding key, but per-table and catalog-enforced.

    ``sort_cols`` additionally sorts within each bucket file (parquet
    min/max pruning + sort-merge joins without a sort step).
    ``n_buckets`` sizes ONE bucket file's share of a key's data: pick
    buckets ~= cluster cores at the expected per-partition volume so a
    bucket fits an executor's memory; both sides of a co-located join
    must use the SAME bucket count (Spark refuses to elide the exchange
    otherwise — it falls back to shuffling the mismatched side).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)
