"""Batch readers: multi-format ingest plus the reference's historical-read
surface (A21 `XRANGE`/`XREVRANGE`, A22 `XLEN` — reference
event_stream/handlers/master.py:53-58, close_local.py:124).

All readers return unexecuted DataFrames so Catalyst keeps predicate pushdown
and column pruning; `read_range`/`read_tail` are plain filter/orderBy-limit
plans that compile to pushed parquet filters and TakeOrderedAndProject.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col
from pyspark.sql.types import StructType

_FORMAT_BY_EXT = {
    ".parquet": "parquet",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".csv": "csv",
    ".orc": "orc",
    ".txt": "text",
}


def infer_format(path: str) -> str:
    """Pick a reader format from the file extension; directories default to
    parquet (the lakehouse layout)."""
    ext = os.path.splitext(path)[1].lower()
    return _FORMAT_BY_EXT.get(ext, "parquet")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Format-dispatching batch reader.

    CSV defaults to header=true and, when no schema is given, a one-time
    inference pass — at 100 TB always pass an explicit schema so the scan is
    single-pass (inference reads the data twice).
    """
    fmt = fmt or infer_format(path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    for key, value in options.items():
        reader = reader.option(key, value)
    return reader.format(fmt).load(path)


def read_range(
    df: DataFrame,
    ts_col: str = "ts",
    start=None,
    end=None,
) -> DataFrame:
    """Historical range read (A21: `XRANGE stream start end`). Bounds are
    inclusive, matching Redis ID-range semantics; either side may be open.

    The filter is a plain comparison on the time column, so on a
    date-partitioned table it prunes partitions and row groups for free.
    """
    out = df
    if start is not None:
        out = out.where(col(ts_col) >= start)
    if end is not None:
        out = out.where(col(ts_col) <= end)
    return out


def read_tail(
    df: DataFrame,
    n: int,
    ts_col: str = "ts",
    id_col: str | None = "message_id",
) -> DataFrame:
    """Last-N read (A21 `XREVRANGE ... COUNT n`, reference close_local.py:124
    reads the last 15 control messages). Deterministic: ties on the timestamp
    break on the id column. Plans as TakeOrderedAndProject — no full sort."""
    keys = [col(ts_col).desc()]
    if id_col is not None and id_col in df.columns:
        keys.append(col(id_col).desc())
    return df.orderBy(*keys).limit(n)


def stream_length(df: DataFrame) -> int:
    """Length probe (A22 `XLEN`, reference handlers/master.py:53) — drives
    the trim decision in the retention job."""
    return df.count()
