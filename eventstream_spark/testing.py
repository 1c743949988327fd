"""DuckDB-differential correctness harness.

Mirrors the driver's t2 gate: run a Spark DataFrame builder and the matching
ANSI-SQL oracle on duckdb over the same parquet files, canonicalize both
results (sort columns by name, sort rows by all values), and require exact
equality. Used by pytest (sf0.001) and scripts/check_correctness.py (sf0.01).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from .catalog import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connection(sf_dir)
    try:
        return con.sql(sql).df()
    finally:
        con.close()


def _norm_cell(v: Any) -> Any:
    """Normalize one cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, pd.Timestamp):
        return v.to_datetime64().astype("datetime64[us]").item()
    if hasattr(v, "tolist"):  # numpy arrays / list columns
        return tuple(v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(v)
    return v


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions; empty list == match."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    # Integer-vs-float column drift (e.g. duckdb SUM(BIGINT) → HUGEINT →
    # float64) compares equal cell-by-cell in Python but fails the driver's
    # typed value-hash gate — flag it here so local runs catch it first.
    for c in spark_pdf.columns:
        ks, ko = spark_pdf[c].dtype.kind, oracle_pdf[c].dtype.kind
        if {ks, ko} <= {"i", "u", "f"} and (ks == "f") != (ko == "f"):
            problems.append(f"numeric kind mismatch on '{c}': spark={ks} oracle={ko}")
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            problems.append(f"first differing row #{i}: spark={ra!r} oracle={rb!r}")
            break
    return problems


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    spark_pdf = spark_df.toPandas()
    oracle_pdf = run_oracle(oracle_sql, sf_dir)
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, "; ".join(problems)
