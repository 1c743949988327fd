"""Exactly-once file sinks for ``foreachBatch``.

Structured Streaming replays a micro-batch after a failure; a plain append
sink then writes the batch twice. The reference tolerates this as
at-least-once (ack-after-process, SURVEY §4.1); the rebuild upgrades to
exactly-once with the standard idempotent-batch pattern: each micro-batch
lands in its own ``batch_id=N`` directory, the write is atomic at the
directory level (_SUCCESS marker), and a replayed batch that finds its
marker is a no-op. A transactional table format (Delta/Iceberg) subsumes
this with versioned commits; this is the dependency-free parquet form.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def idempotent_parquet_sink(output_dir: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch function writing each micro-batch exactly once.

    Replay-safe: a batch whose ``batch_id=N/_SUCCESS`` marker exists is
    skipped; a partially-written batch (no marker) is overwritten whole.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        target = os.path.join(output_dir, f"batch_id={batch_id}")
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            return
        batch_df.write.mode("overwrite").parquet(target)

    return write


def read_sink(spark: SparkSession, output_dir: str) -> DataFrame:
    """Read everything the sink has committed. ``batch_id`` surfaces as a
    partition column; drop it for the logical view of the stream."""
    return spark.read.parquet(output_dir).drop("batch_id")
