"""scalable_ntile / global_row_number: bit-identical to the single-task
window forms, with no single-task window in the plan."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window
from pyspark.sql.functions import col

import pytest

from eventstream_spark.catalog import load
from eventstream_spark.operators.ranking import (
    exact_value_at_ranks,
    global_row_number,
    scalable_ntile,
)


def test_scalable_ntile_equals_window_ntile(spark, sf_dir):
    """scalable_ntile == F.ntile over the same total order, for a k that
    does NOT divide n (exercising the ceil/floor bucket-size split)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    order = [col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")]
    w = Window.orderBy(*order)
    want = {
        (r.l_orderkey, r.l_linenumber): r.t
        for r in li.select(
            "l_orderkey", "l_linenumber", F.ntile(7).over(w).alias("t")
        ).collect()
    }
    got = {
        (r.l_orderkey, r.l_linenumber): r.t
        for r in scalable_ntile(li, order, 7, "t").collect()
    }
    assert got == want


def test_global_row_number_equals_window(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    order = [col("l_orderkey").desc(), col("l_linenumber").desc()]
    w = Window.orderBy(*order)
    want = {
        (r.l_orderkey, r.l_linenumber): r.rn
        for r in li.select(
            "l_orderkey", "l_linenumber", F.row_number().over(w).alias("rn")
        ).collect()
    }
    got = {
        (r.l_orderkey, r.l_linenumber): r.rn
        for r in global_row_number(li, order, "rn").collect()
    }
    assert got == want


def test_scalable_ntile_has_no_single_task_window(spark, sf_dir):
    """The plan must range-partition and window WITHIN partitions — a bare
    (empty-partition) Window would be the single-task scale wall."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    plan = (
        scalable_ntile(li, [col("l_extendedprice"), col("l_orderkey"),
                            col("l_linenumber")], 8, "b")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()
    assert "_pid" in plan  # the window partitions on the range-partition id


def test_exact_value_at_ranks_equals_sorted_pick(spark, sf_dir):
    """Bucketed rank-pick == the value at the same 1-based rank of the
    fully sorted column, across ranks that land in different buckets —
    including rank 1, rank n, and the deciles. Duplicated values
    (l_quantity has ~50 distinct) exercise the heavy-bucket/tie path."""
    li = load(spark, sf_dir, "lineitem")
    for vcol in ("l_extendedprice", "l_quantity"):
        vals = sorted(r[0] for r in li.select(vcol).collect())
        n = len(vals)
        ranks = sorted({1, n, *(((n - 1) * d) // 10 + 1 for d in range(1, 10))})
        got_n, got = exact_value_at_ranks(
            li, vcol, lambda nn: ranks, n_buckets=64, what="lineitem"
        )
        assert got_n == n
        assert got == {r: vals[r - 1] for r in ranks}


def test_exact_value_at_ranks_empty_and_constant(spark):
    """Empty input fails LOUD with the table name (the embedding_dim
    convention — ADVICE r7); an all-equal column short-circuits without
    the histogram pass."""
    empty = spark.range(0).select(col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="mytable is empty"):
        exact_value_at_ranks(empty, "v", lambda n: [1], what="mytable")
    const = spark.range(7).select(F.lit(3.5).alias("v"))
    n, picked = exact_value_at_ranks(const, "v", lambda n: [1, 4, n])
    assert n == 7 and picked == {1: 3.5, 4: 3.5, 7: 3.5}


def test_exact_value_at_ranks_tie_col_and_nulls(spark):
    """With tie_col the result is the exact BOUNDARY TUPLE under
    (value, tie); NULL values are filtered up front (ADVICE r8 — a NULL
    used to land in a None histogram bucket and break sorted())."""
    df = spark.range(1, 10001).select(
        (col("id") % 10).cast("double").alias("v"), col("id").alias("t")
    )
    nulls = spark.range(5).select(
        F.lit(None).cast("double").alias("v"), (col("id") + 100000).alias("t")
    )
    rows = sorted((r.v, r.t) for r in df.collect())
    ranks = [1, 1234, 5000, 9999, 10000]
    n, picked = exact_value_at_ranks(
        df.unionAll(nulls), "v", lambda nn: ranks, tie_col="t"
    )
    assert n == 10000  # nulls excluded from n, histogram, and window alike
    assert picked == {r: rows[r - 1] for r in ranks}


def test_exact_value_at_ranks_skew_recursion_on_tie(spark):
    """A single-value-dominated bucket above the skew threshold recurses —
    and because the bucket holds ONE distinct value, the recursion buckets
    on the numeric tie column (within equal values the order IS the tie).
    20k identical values against an explicit 4096-row threshold force the
    path (the default threshold is the 2M absolute single-task budget)."""
    big = spark.range(20000).select(F.lit(5.0).alias("v"), col("id").alias("t"))
    small = spark.range(100).select(
        (col("id") / 10.0 + 100.0).alias("v"), (col("id") + 1_000_000).alias("t")
    )
    rows = sorted(
        [(5.0, t) for t in range(20000)]
        + [(i / 10.0 + 100.0, i + 1_000_000) for i in range(100)]
    )
    ranks = [1, 10000, 20000, 20050, 20100]
    n, picked = exact_value_at_ranks(
        big.unionAll(small), "v", lambda nn: ranks, tie_col="t",
        skew_threshold=4096,
    )
    assert n == 20100
    assert picked == {r: rows[r - 1] for r in ranks}


def test_exact_value_at_ranks_skew_recursion_on_value(spark):
    """A dense many-distinct-value cluster crammed into one equi-width
    bucket by an outlier recurses with a fresh histogram INSIDE the
    bucket (the equi-width re-bucket level the r8 ADVICE asked for)."""
    dense = spark.range(20000).select((col("id") / 1e7).alias("v"))
    outlier = spark.range(1).select(F.lit(1000.0).alias("v"))
    n, picked = exact_value_at_ranks(
        dense.unionAll(outlier), "v", lambda nn: [1, 9999, 20001],
        skew_threshold=4096,
    )
    assert n == 20001
    assert picked == {1: 0.0, 9999: 9998 / 1e7, 20001: 1000.0}
