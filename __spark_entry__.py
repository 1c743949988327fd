"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus
the north-star extensions for the duckdb-differential correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from eventstream_spark.operators import all_oracles, all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the composed training-data pipeline
    (fingerprint dedup → quality filter → language filter → weighted
    mixing → token-budget packing) as ONE declarative plan — scan, regex
    tokenization, window dedup, hash gates, running-sum packing, rollup."""
    from eventstream_spark.operators.pipeline import q89_training_pipeline

    return q89_training_pipeline(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 Part B + north-star)."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query key; omissions fall back to the driver's
    rows-only check (none currently omitted)."""
    return all_oracles()
