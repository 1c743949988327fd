"""Built-in route transforms — the analog of the reference's stock handlers
(event_stream/handlers/: echo, forwarding, master ops).

Every transform is ``(DataFrame, **kwargs) -> DataFrame`` (enforced by
config compilation, reference enforce_handler) and pure DataFrame API, so a
route pipeline stays a single Catalyst plan end to end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import col, lit

from ..codec import create_response, props_get


def identity(df: DataFrame) -> DataFrame:
    """Echo (reference handlers/echo.py): pass-through; pair with a console
    sink for the debug behavior."""
    return df


def respond(
    df: DataFrame, application_name: str = "engine", application_instance: str = "0"
) -> DataFrame:
    """Response derivation (reference A8)."""
    return create_response(df, application_name, application_instance)


def forward(df: DataFrame, target_stream: str = "forwarded") -> DataFrame:
    """Forwarding (reference handlers/basic.py:13-20): re-publish unchanged,
    stamped with the target; the sink routes on ``target_stream``."""
    return df.withColumn("target_stream", lit(target_stream))


def extract_prop(df: DataFrame, path: str = "k", alias: str = "prop_value") -> DataFrame:
    """Open-payload projection: pull one props path into a typed column."""
    return df.withColumn(alias, props_get(path).cast("long"))


def tag_workflow(df: DataFrame, workflow_id: str = "wf-0") -> DataFrame:
    """Stamp the workflow grouping field (reference base.py:515)."""
    return df.withColumn("workflow_id", F.coalesce(col("workflow_id"), lit(workflow_id)))


def observe_route(df: DataFrame, observation, include_value: bool = False) -> DataFrame:
    """Piggyback route health metrics on whatever action consumes the
    frame: row count, null-event count, and distinct-event sketch ride the
    existing scan via ``observe()`` — a second pass over 100 TB just to
    count rows is the anti-pattern. ``observation`` is a pyspark
    ``Observation`` (batch: read ``.get`` after the action) or a string
    name (streaming: read ``progress.observedMetrics[name]`` per
    micro-batch — the A11 instance-info surface, as data)."""
    metrics = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(col("event").isNull(), 1).otherwise(0)).alias("n_null_event"),
        F.approx_count_distinct("event").alias("n_event_types"),
    ]
    if include_value:
        metrics.append(F.sum("value").alias("sum_value"))
    return df.observe(observation, *metrics)
