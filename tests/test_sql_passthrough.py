"""SQL entry-point parity: for oracles written in engine-portable ANSI SQL,
the SAME string runs through ``spark.sql`` over the registered views and
returns exactly what the DataFrame builder returns. Proves spark.sql is a
first-class entry point (SURVEY §3.4), not just the duckdb side-channel."""

from __future__ import annotations

import pytest

from eventstream_spark.catalog import register_views
from eventstream_spark.operators import all_oracles, all_queries
from eventstream_spark.testing import compare

# Oracles that parse in BOTH dialects (no duckdb-only functions like
# list_transform/strlen/epoch_us, no INTERVAL-arith or // divergences).
PORTABLE = [
    "q01_scan_count",
    "q02_scan_checksum",
    "q04_event_routing",
    "q05_join_rollup",
    "q06_anti_join",
    "q07_semi_join",
    "q10_pricing_summary",
    "q11_count_distinct",
    "q12_rollup",
    "q12b_cube",
    "q12c_grouping_sets",
    "q13_topk_per_group",
    "q15_topn",
    "q16_intersect",
    "q16b_except",
    "q17_string_fns",
    "q22_dedup_count",
    "q24_lang_stats",
    "q47_pivot",
    "q48_correlated_subquery",
    "q49_distribution_windows",
    "q184_recursive_rollup",
    "q62_exists_subquery",
    "q63_not_exists_anti",
    "q65_first_last_value",
    "q67_conditional_agg",
    "q127_length_histogram",
    "q129_quality_report",
    "q130_value_outliers",
    "q136_bloom_semi_join",
    "q145_stream_topk",
    "q155_fuzzy_blocked_match",  # levenshtein is built-in in BOTH dialects
    "q159_zorder_layout",  # ntile + >>/& bit ops parse in both dialects
    "q161_zorder_pruning",
]


@pytest.fixture(scope="module", autouse=True)
def _views(spark, sf_dir):
    register_views(spark, sf_dir)


@pytest.mark.parametrize("name", PORTABLE)
def test_same_sql_both_engines(spark, sf_dir, name):
    via_sql = spark.sql(all_oracles()[name]).toPandas()
    via_df = all_queries()[name](spark, sf_dir).toPandas()
    problems = compare(via_sql, via_df)
    assert not problems, problems
