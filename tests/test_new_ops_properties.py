"""Property-style checks for the round-4-cont.-3 helpers: the two-level
sweep-line against a brute-force overlap counter on randomized intervals,
and the Morton interleave's structural guarantees."""

from __future__ import annotations

import random

import pytest


@pytest.mark.parametrize("seed", [7, 42, 99])
def test_sweep_concurrency_matches_brute_force(spark, seed):
    """sweep_concurrency's max prefix sum per type == the O(n²)-checkable
    max overlap count of the interval set (end-exclusive), on random
    intervals that straddle bucket boundaries."""
    import pyspark.sql.functions as F

    from eventstream_spark.operators.analytics import sweep_concurrency

    rng = random.Random(seed)
    rows = []
    intervals: dict[str, list[tuple[int, int]]] = {"a": [], "b": []}
    for _ in range(200):
        typ = rng.choice(["a", "b"])
        s = rng.randrange(0, 10_000)
        e = s + rng.randrange(1, 3_000)
        intervals[typ].append((s, e))
        rows.append((typ, s, 1))
        rows.append((typ, e, -1))
    pts = spark.createDataFrame(rows, "event_type string, t long, delta int")
    got = {
        r.event_type: r.mx
        for r in sweep_concurrency(pts, bucket_width_us=1_000)
        .groupBy("event_type")
        .agg(F.max("conc").alias("mx"))
        .collect()
    }

    def brute(iv: list[tuple[int, int]]) -> int:
        best = 0
        for s, _ in iv:  # max overlap is attained at some interval start
            best = max(best, sum(1 for s2, e2 in iv if s2 <= s < e2))
        return best

    assert got == {t: brute(iv) for t, iv in intervals.items()}


def test_morton_interleave_is_bijective_and_positional():
    """_interleave_bits maps 32x32 bucket pairs to 1024 DISTINCT z-values,
    and bit j of x lands at z bit 2j (y at 2j+1) — the property that makes
    z-range prefixes axis-aligned boxes."""
    import pyspark.sql.functions as F

    from eventstream_spark.operators.merge import _interleave_bits
    from eventstream_spark.session import get_spark

    spark = get_spark()
    df = (
        spark.range(32)
        .select(F.col("id").alias("x"))
        .crossJoin(spark.range(32).select(F.col("id").alias("y")))
        .select("x", "y", _interleave_bits(F.col("x"), F.col("y"), 5).alias("z"))
    )
    rows = df.collect()
    assert len({r.z for r in rows}) == 1024
    for r in rows:
        for j in range(5):
            assert (r.z >> (2 * j)) & 1 == (r.x >> j) & 1
            assert (r.z >> (2 * j + 1)) & 1 == (r.y >> j) & 1
