"""Salted-join equivalence: same rows as the plain join, spread over
(key, salt) sub-keys."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from eventstream_spark.catalog import load
from eventstream_spark.operators.skew import key_skew_stats, salted_join, with_salt


def _user_dim(spark, sf_dir):
    return (
        load(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("tier", F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd"))
    )


def test_salted_inner_join_equals_plain(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    dim = _user_dim(spark, sf_dir)
    plain = events.join(dim, "user_id").groupBy("tier").count()
    salted = salted_join(events, dim, "user_id", salt_buckets=8).groupBy("tier").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    dim = _user_dim(spark, sf_dir).where(F.col("user_id") < 5)
    plain = events.join(dim, "user_id", "left")
    salted = salted_join(events, dim, "user_id", how="left", salt_buckets=4)
    assert salted.count() == plain.count()
    assert (
        salted.where(F.col("tier").isNull()).count()
        == plain.where(F.col("tier").isNull()).count()
    )


def test_salt_is_deterministic_and_spread(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    s1 = with_salt(events, 8).groupBy("_salt").count().collect()
    s2 = with_salt(events, 8).groupBy("_salt").count().collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))  # rerun-stable
    assert len(s1) == 8  # every bucket used at this row count


def test_unsupported_join_type_rejected(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(events, events, "user_id", how="right")


def test_key_skew_stats_shape(spark, sf_dir):
    stats = key_skew_stats(load(spark, sf_dir, "events"), "event_type", top_n=3)
    rows = stats.collect()
    assert len(rows) == 3
    assert rows[0].cnt >= rows[1].cnt >= rows[2].cnt
    assert all(0 < r.share <= 1 for r in rows)
