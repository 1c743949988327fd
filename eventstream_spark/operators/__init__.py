"""Operator library.

Each module exposes ``QUERIES: dict[str, Callable[(spark, sf_dir), DataFrame]]``
and ``ORACLES: dict[str, str]`` (duckdb SQL). ``all_queries()`` /
``all_oracles()`` aggregate them for __spark_entry__ and the test harness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from . import (
        analytics,
        asof,
        dedup,
        merge,
        multimodal,
        pipeline,
        relational,
        similarity,
        sketch,
        skew,
        stats,
        streaming_queries,
        text,
        tpch,
    )

    return (
        relational,
        analytics,
        asof,
        text,
        dedup,
        similarity,
        sketch,
        skew,
        stats,
        multimodal,
        tpch,
        merge,
        pipeline,
        streaming_queries,
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out
