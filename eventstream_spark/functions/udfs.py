"""User-function surface (reference A6/A23/A24: handler application,
dynamic code loading, signature enforcement — SURVEY §2B last row).

The reference's handler is an arbitrary Python callable applied per message
(event_stream/utilities/common.py:422-479). Spark offers a ladder of
equivalents, fastest first:

1. built-in column expressions (JVM codegen — always prefer);
2. `pandas_udf` (Arrow-batched, vectorized Python);
3. `applyInPandas` / `mapInPandas` (grouped / partition-wise pandas);
4. row-at-a-time `udf` (last resort — per-row Python round trip);
5. Python UDTF (one row in, many rows out — table function).

`response_event_*` below implement the SAME response-derivation transform
(A8: event + '_response') at each rung, and the test suite pins them equal
— the smoke the rebuild declares for this row of SURVEY §2B.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import col, pandas_udf, udf


def response_event_builtin(c: Column) -> Column:
    """Rung 1: pure Catalyst expression."""
    return F.concat(c, F.lit("_response"))


def response_event_udf() -> "udf":
    """Rung 4: row-at-a-time Python UDF (the anti-pattern, kept for surface
    parity and as the perf contrast in tests). Factory, not module-level
    decorator: the DDL return type needs an active session to parse."""

    def fn(event: str) -> str:
        return None if event is None else event + "_response"

    return udf(fn, "string")


def response_event_pandas() -> "pandas_udf":
    """Rung 2: Arrow-vectorized. Factory for the same session-at-import
    reason as `response_event_udf`."""

    def fn(events: pd.Series) -> pd.Series:
        return events + "_response"

    return pandas_udf(fn, "string")


def response_events_map_in_pandas(df: DataFrame) -> DataFrame:
    """Rung 3: whole-partition pandas transform; keeps the input schema but
    rewrites the event column. Batch shape: one pandas frame per Arrow batch."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["event"] = pdf["event"] + "_response"
            yield pdf

    return df.mapInPandas(fn, df.schema)


def weighted_mean_udaf() -> "pandas_udf":
    """UDAF rung: a grouped-aggregate pandas_udf (weighted mean) — the
    vectorized custom-aggregate surface. Factory for the same
    session-at-import reason as the scalar factories."""

    def fn(values: pd.Series, weights: pd.Series) -> float:
        total = float(weights.sum())
        if total == 0.0:
            return float("nan")
        return float((values * weights).sum() / total)

    # Series→scalar type hints make this a GROUPED_AGG udf.
    return pandas_udf(fn, "double")


def register_explode_props_udtf(spark) -> None:
    """Rung 5: a Python UDTF — one envelope row in, one row per props entry
    out (the table-function shape the reference has no analog for; its
    handlers are scalar, SURVEY §2A negatives). Registered as
    ``explode_props(map_as_json)``."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="key: string, value: string")
    class ExplodeProps:
        def eval(self, props_json: str):
            import json

            if props_json:
                for k, v in json.loads(props_json).items():
                    yield str(k), str(v)

    spark.udtf.register("explode_props", ExplodeProps)
