"""Oracle-differential tests (SURVEY §5.2 item 1): every declared query runs
on Spark and duckdb over the same parquet and must match exactly after
canonicalization — the local twin of the driver's t2 gate."""

from __future__ import annotations

import pytest

from eventstream_spark.operators import all_oracles, all_queries
from eventstream_spark.testing import assert_matches_oracle

QUERIES = all_queries()
ORACLES = all_oracles()


def test_every_query_has_oracle():
    missing = sorted(set(QUERIES) - set(ORACLES))
    assert not missing, f"queries missing oracles: {missing}"
    dangling = sorted(set(ORACLES) - set(QUERIES))
    assert not dangling, f"oracles without queries: {dangling}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ORACLES[name], sf_dir)


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    """approx_count_distinct (HLL++) lands within 5% of the exact count —
    the scale path for q11-style distincts when exactness isn't required.
    (No duckdb hash-parity is possible for sketches, so this is a
    tolerance test, not an oracle query.)"""
    import pyspark.sql.functions as F

    from eventstream_spark.catalog import load

    row = (
        load(spark, sf_dir, "orders")
        .agg(
            F.countDistinct("o_custkey").alias("exact"),
            F.approx_count_distinct("o_custkey", 0.02).alias("approx"),
        )
        .first()
    )
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """approx_percentile lands near the exact interpolated quantile — the
    sketch path for q66-style percentiles at scale (same caveat as HLL:
    no cross-engine hash parity for sketches)."""
    import pyspark.sql.functions as F

    from eventstream_spark.catalog import load

    row = (
        load(spark, sf_dir, "lineitem")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
            F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("approx"),
        )
        .first()
    )
    assert abs(row.approx - row.exact) / row.exact < 0.02
