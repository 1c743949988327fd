"""Event-time window aggregations (batch- and stream-polymorphic).

Reference parity: the reference has NO window semantics (explicit negative,
SURVEY §2 Part A) — these are the standard Structured Streaming surface the
rebuild must provide: tumbling / sliding / session windows with optional
watermarks for late data (the watermark generalizes the reference's
idle-reclaim timeout, A17).

Scale: windowed aggs shuffle on (window, keys); state is bounded by the
watermark horizon. On a cluster use the RocksDB state store
(spark.sql.streaming.stateStore.providerClass) so state spills off-heap.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import col


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    # withWatermark is legal on batch DataFrames (ignored) — keeps the
    # helpers polymorphic.
    return df.withWatermark(ts_col, watermark) if watermark else df


def tumbling_counts(
    df: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    return (
        _with_watermark(df, ts_col, watermark)
        .groupBy(F.window(col(ts_col), window).alias("w"), col(key_col))
        .agg(F.count("*").alias("cnt"), F.round(F.sum(value_col), 2).alias("sum_value"))
        .select(col("w.start").alias("w_start"), key_col, "cnt", "sum_value")
    )


def sliding_counts(
    df: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str | None = None,
) -> DataFrame:
    return (
        _with_watermark(df, ts_col, watermark)
        .groupBy(F.window(col(ts_col), window, slide).alias("w"), col(key_col))
        .agg(F.count("*").alias("cnt"))
        .select(col("w.start").alias("w_start"), key_col, "cnt")
    )


def session_counts(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows keyed by user: a session closes after ``gap`` of
    inactivity (streaming requires a watermark; batch computes directly)."""
    return (
        _with_watermark(df, ts_col, watermark)
        .groupBy(F.session_window(col(ts_col), gap).alias("w"), col(key_col))
        .agg(F.count("*").alias("cnt"))
        .select(col("w.start").alias("w_start"), col("w.end").alias("w_end"), key_col, "cnt")
    )
