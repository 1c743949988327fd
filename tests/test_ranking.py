"""scalable_ntile / global_row_number: bit-identical to the single-task
window forms, with no single-task window in the plan."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window
from pyspark.sql.functions import col

from eventstream_spark.catalog import load
from eventstream_spark.operators.ranking import (
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
