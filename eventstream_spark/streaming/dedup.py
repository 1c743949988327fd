"""Streaming deduplication.

Batch: plain dropDuplicates. Streaming: dropDuplicates scoped by a
watermark so state stays bounded — the streaming twin of q22
(events dedup on user_id/event_type/ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events(
    df: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    keys = keys or ["user_id", "event_type", "ts"]
    if watermark:
        df = df.withWatermark(ts_col, watermark)
        # dropDuplicatesWithinWatermark keeps state only inside the horizon.
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
