"""Multi-consumer completion barrier (reference A19) with idle reclamation
(reference A17).

The reference keeps a per-message Redis hash ``{group}:{message_id}`` of
consumer→done flags and XACKs + deletes only when EVERY consumer finished
(event_stream/utilities/communication.py:991-1101); messages idle past a
threshold are reclaimed so a crashed consumer cannot wedge the group
(``get_idle_messages``, communication.py:756-807, default 10 min,
system/system.py:35). The Spark rebuild keys streaming state by
``message_id`` and tracks the set of consumers that have acknowledged; when
the required set is covered, ONE completion row is emitted and the state
becomes a tombstone (late duplicate acks are ignored; the idle timer, when
configured, garbage-collects it). With ``idle_timeout_ms`` set, a barrier that stops receiving acks
fires a processing-time timer instead and emits a ``timed_out`` row with the
partial ack count — the idle-reclaim signal, surfaced as data.

Semantics under micro-batch retries (SURVEY §7 hard part 3): state updates
are idempotent — re-adding an already-seen consumer is a no-op, and the
completion row is emitted exactly when the still-open state first covers the
required set, so a replayed batch cannot double-fire a completed barrier.

Implemented with ``applyInPandasWithState`` (Arrow-batched, partitioned by
message_id — at scale this shuffles once on a well-distributed key and the
per-key state is a tiny string set).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BARRIER_OUTPUT_SCHEMA = StructType(
    [
        StructField("message_id", StringType()),
        StructField("n_consumers", LongType()),
        StructField("status", StringType()),  # complete | timed_out
    ]
)

# seen = consumers acknowledged so far; done = completion tombstone. The
# tombstone outlives the 'complete' emission so late duplicate acks are
# ignored rather than resurrecting the barrier (and a full duplicate ack
# set cannot re-emit a second 'complete' row). With idle_timeout_ms set the
# timer garbage-collects tombstones; without it they persist — callers with
# unbounded message-id domains should set idle_timeout_ms.
_STATE_SCHEMA = StructType(
    [
        StructField("seen", ArrayType(StringType())),
        StructField("done", BooleanType()),
    ]
)


def completion_barrier(
    acks: DataFrame,
    required_consumers: list[str],
    id_col: str = "message_id",
    consumer_col: str = "consumer",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """acks(message_id, consumer, ...) → one row per message once every
    required consumer has acknowledged it — or, with ``idle_timeout_ms``, a
    ``timed_out`` row carrying the partial ack count once the barrier has
    been idle that long (the A17 reclaim analog).

    Works on a streaming DataFrame (stateful) — use
    ``barrier_batch_oracle`` for the batch-equivalence check.
    """
    required = frozenset(required_consumers)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if idle_timeout_ms is not None and state.hasTimedOut:
            seen = set(state.get[0]) if state.exists else set()
            done = bool(state.get[1]) if state.exists else False
            state.remove()
            if done:
                return  # tombstone GC — barrier already completed, emit nothing
            yield pd.DataFrame(
                {
                    "message_id": [key[0]],
                    "n_consumers": [len(seen)],
                    "status": ["timed_out"],
                }
            )
            return
        seen: set[str] = set(state.get[0]) if state.exists else set()
        done = bool(state.get[1]) if state.exists else False
        if done:
            # Late duplicate acks on a completed barrier: ignore, keep the
            # tombstone, and re-arm the GC timer.
            state.update((list(seen), True))
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)
            return
        for pdf in pdfs:
            seen.update(c for c in pdf[consumer_col] if c in required)
        if required <= seen:
            # Barrier complete (the XACK+DEL analog) — leave a tombstone so
            # replayed/late acks cannot double-fire.
            state.update((list(seen), True))
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)
            yield pd.DataFrame(
                {
                    "message_id": [key[0]],
                    "n_consumers": [len(required)],
                    "status": ["complete"],
                }
            )
        else:
            state.update((list(seen), False))
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)

    keyed = acks.select(id_col, consumer_col).groupBy(id_col)
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.applyInPandasWithState(
        update,
        outputStructType=BARRIER_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def barrier_batch_oracle(
    acks: DataFrame,
    required_consumers: list[str],
    id_col: str = "message_id",
    consumer_col: str = "consumer",
) -> DataFrame:
    """Batch recompute of the same semantics: messages whose distinct
    acknowledged consumers cover the required set."""
    import pyspark.sql.functions as F
    from pyspark.sql.functions import col, lit

    n = len(required_consumers)
    return (
        acks.where(col(consumer_col).isin(*required_consumers))
        .groupBy(id_col)
        .agg(F.countDistinct(consumer_col).alias("n_seen"))
        .where(col("n_seen") == n)
        .select(
            col(id_col).alias("message_id"),
            lit(n).cast("long").alias("n_consumers"),
            lit("complete").alias("status"),
        )
    )
