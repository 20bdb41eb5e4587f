"""Local twin of the driver's DuckDB-oracle correctness gate.

Runs every registered query's Spark plan and DuckDB oracle side by side on
the same parquet tables, sorts columns by name, sorts rows, and compares
values exactly (after canonical string normalization).

CAVEAT vs the driver's hasher: this gate canonicalizes through pandas, so
it is value-exact but *dtype-blind* — a DuckDB HUGEINT (int128, e.g. from
``SUM(<integer>)``) and a Spark BIGINT with identical values compare equal
here but hash differently in a type-tagged hasher.  The companion guard
``tests/test_oracle_parity.py::test_no_hugeint_oracle_columns`` DESCRIBEs
every registered oracle and rejects HUGEINT/UHUGEINT output columns, so
oracles must ``CAST(SUM(..) AS BIGINT)``.  With that guard green, passing
here implies the driver's value-hash matches.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from .queries import REGISTRY, TABLES


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (pd.Timestamp,)):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_canon_cell(x) for x in seq) + "]"
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(out)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare_query(spark, con, name: str, sf_dir: str) -> CompareResult:
    spec = REGISTRY[name]
    sdf = spec.spark(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return CompareResult(name, len(sdf) >= 0, len(sdf), -1, "rows-only (no oracle)")
    odf = con.execute(spec.oracle).fetchdf()
    if sorted(sdf.columns) != sorted(odf.columns):
        return CompareResult(
            name, False, len(sdf), len(odf),
            f"schema mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}",
        )
    s_rows, o_rows = canonicalize(sdf), canonicalize(odf)
    if len(s_rows) != len(o_rows):
        return CompareResult(name, False, len(s_rows), len(o_rows), "row count mismatch")
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        if a != b:
            return CompareResult(
                name, False, len(s_rows), len(o_rows),
                f"value mismatch at sorted row {i}: spark={a} oracle={b}",
            )
    return CompareResult(name, True, len(s_rows), len(o_rows))


def compare_all(spark, sf_dir: str, names: list[str] | None = None) -> list[CompareResult]:
    con = duckdb_connection(sf_dir)
    results = []
    for name in names or REGISTRY:
        try:
            results.append(compare_query(spark, con, name, sf_dir))
        except Exception as e:  # noqa: BLE001 — harness must report, not die
            results.append(CompareResult(name, False, -1, -1, f"error: {e}"))
    return results
