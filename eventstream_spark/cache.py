"""Tracked persistence for operator-internal intermediates.

Several operators (PPJoin shingles, LSH band/bucket tables, IVF
assignments) persist an intermediate DataFrame that both sides of a
self-join read — the persist is what keeps the expensive text-parse /
signature pipeline from running twice. Because the returned plan is lazy,
the operator cannot unpersist before the caller materializes it; callers
own cleanup. This module makes that contract explicit: operators register
every persisted handle here, and long-lived sessions (bench loops,
correctness harnesses, notebooks) call :func:`release_cached` between
queries so cached blocks do not accumulate.

At scale the same contract holds: a job materializes the query, then frees
the operator's working set before the next query claims executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_PERSISTED: list[DataFrame] = []

# Plan-keyed memo caches (e.g. similarity._DIM_CACHE) register a clearer
# here so release_cached() is the ONE lifecycle hook a harness calls:
# semanticHash keys a plan, not the data under it, so a memo outlives a
# landing-dir rewrite unless flushed at the same boundary as the persists.
_MEMO_CLEARERS: list = []


def register_memo_clearer(fn) -> None:
    """Register a zero-arg callable flushed by :func:`release_cached`."""
    _MEMO_CLEARERS.append(fn)


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df`` and register the handle for later bulk release."""
    handle = df.persist(level)
    _PERSISTED.append(handle)
    return handle


def release_cached() -> int:
    """Unpersist every tracked intermediate; returns how many were freed.

    Safe to call at any time — plans already materialized are unaffected
    (they simply recompute if re-run), and double-release is a no-op.
    """
    n = 0
    while _PERSISTED:
        handle = _PERSISTED.pop()
        try:
            # blocking: the default async unpersist lets block eviction
            # bleed into whatever runs next — in the bench that is the
            # NEXT query's timed region (round 12, measurement hygiene).
            handle.unpersist(blocking=True)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
    for fn in _MEMO_CLEARERS:
        try:
            fn()
        except Exception:
            pass
    return n
