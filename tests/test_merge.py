"""Unit semantics of the MERGE/upsert and compaction operators (the oracle
queries exercise the aggregate shape; these pin the row-level contract)."""

from __future__ import annotations

import pyspark.sql.functions as F

from eventstream_spark.operators.merge import latest_per_key, merge_upsert


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_merge_upsert_update_insert_carryover(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, s string, v double"
    )
    source = spark.createDataFrame(
        [(2, "B", 200.0), (4, "d", 40.0)], "k int, s string, v double"
    )
    got = _rows(merge_upsert(target, source, keys=["k"]))
    assert got == {
        (1, "a", 10.0),  # target-only carries over
        (2, "B", 200.0),  # matched: source wins
        (3, "c", 30.0),
        (4, "d", 40.0),  # source-only inserts
    }


def test_merge_upsert_null_source_field_falls_back_to_target(spark):
    """Partial updates: a NULL source column keeps the target's value —
    the column-level MERGE WHEN MATCHED THEN UPDATE SET semantics."""
    target = spark.createDataFrame([(1, "a", 10.0)], "k int, s string, v double")
    source = spark.createDataFrame([(1, None, 99.0)], "k int, s string, v double")
    got = _rows(merge_upsert(target, source, keys=["k"]))
    assert got == {(1, "a", 99.0)}


def test_latest_per_key_total_order(spark):
    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")],
        "k int, seq int, payload string",
    )
    got = _rows(latest_per_key(df, keys=["k"], order_cols=["seq"]))
    assert got == {(1, 20, "new"), (2, 5, "only")}


def test_latest_per_key_tiebreak_is_deterministic(spark):
    """Equal primary order column: the secondary column must decide."""
    df = spark.createDataFrame(
        [(1, 10, 100, "a"), (1, 10, 200, "b")], "k int, seq int, sub int, p string"
    )
    got = _rows(latest_per_key(df, keys=["k"], order_cols=["seq", "sub"]))
    assert got == {(1, 10, 200, "b")}
