"""Completion barrier on the transformWithStateInPandas API (Spark 4).

Same semantics as :mod:`eventstream_spark.streaming.barrier` (reference A19,
event_stream/utilities/communication.py:991-1101): state keyed by
``message_id`` accumulates the set of required consumers that have
acknowledged; when the set is covered, ONE ``complete`` row is emitted and
the state becomes a tombstone so replayed or late duplicate acks cannot
double-fire.

Why a second implementation: ``transformWithState`` is the successor of
``applyInPandasWithState`` — typed per-key state handles (value/list/map),
explicit timers, state-schema evolution, and the RocksDB state store as a
hard requirement (which is also the right store at 100 TB: state spills
off-heap and snapshots incrementally). Keeping both demonstrates the same
operator semantics on both stateful APIs; the older variant additionally
carries the idle-timeout (A17) behavior via processing-time timeouts.

The processor is Arrow-batched like everything else: ``handleInputRows``
receives pandas batches per key and yields fixed-schema pandas frames.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from .barrier import BARRIER_OUTPUT_SCHEMA

_TWS_STATE_SCHEMA = StructType(
    [
        StructField("seen", ArrayType(StringType())),
        StructField("done", BooleanType()),
    ]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class BarrierProcessor(StatefulProcessor):
    """Per-message ack accumulator with a completion tombstone."""

    def __init__(self, required_consumers: list[str]):
        self._required = frozenset(required_consumers)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("barrier", _TWS_STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        current = self._state.get() if self._state.exists() else None
        seen: set[str] = set(current[0]) if current else set()
        done = bool(current[1]) if current else False
        if done:
            # Completed barrier: ignore late duplicates, keep the tombstone.
            return
        for pdf in rows:
            seen.update(c for c in pdf["consumer"] if c in self._required)
        if self._required <= seen:
            self._state.update((list(seen), True))
            yield pd.DataFrame(
                {
                    "message_id": [key[0]],
                    "n_consumers": [len(self._required)],
                    "status": ["complete"],
                }
            )
        else:
            self._state.update((list(seen), False))

    def close(self) -> None:
        pass


def completion_barrier_tws(
    acks: DataFrame,
    required_consumers: list[str],
    id_col: str = "message_id",
    consumer_col: str = "consumer",
) -> DataFrame:
    """acks(message_id, consumer, ...) → one ``complete`` row per message
    once every required consumer has acknowledged — transformWithState
    form. Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass = ROCKSDB_PROVIDER``).
    """
    # The transformWithState Python↔JVM state protocol rides on protobuf +
    # gRPC; fail loud (and early, before a deep streaming-query stack) when
    # they are absent rather than crashing the TWS driver worker.
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(pip install protobuf grpcio); use streaming.completion_barrier "
            "(applyInPandasWithState) in environments without it"
        ) from exc

    # transformWithState runs the processor in a dedicated Python driver
    # worker that unpickles it OUTSIDE this interpreter — by-reference
    # pickling would require this package on that worker's import path
    # (spark-submit --py-files territory). Registering the module for
    # by-value serialization makes the processor self-contained, so the
    # operator works wherever the session does.
    import sys

    import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    return (
        acks.select(
            acks[id_col].alias("message_id"), acks[consumer_col].alias("consumer")
        )
        .groupBy("message_id")
        .transformWithStateInPandas(
            statefulProcessor=BarrierProcessor(required_consumers),
            outputStructType=BARRIER_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
