"""Sketch-operator guarantees (q136 bloom semi-join, q137 heavy hitters):
the sketch phase must PRUNE without ever changing the exact result, so the
tests pin the two properties exactness rests on — bloom no-false-negatives
(with real pruning), and Misra-Gries candidate-superset under an
adversarial partition layout."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.functions import col

from eventstream_spark.catalog import load
from eventstream_spark.operators.sketch import (
    _HH_PHI,
    _MG_COUNTERS,
    bigram_stream,
    bloom_might_contain,
    build_bloom_bytes,
    q136_bloom_semi_join,
)


def test_bloom_no_false_negatives_and_prunes(spark, sf_dir):
    """Every build key passes its own bloom (no false negatives — the
    exactness precondition), and the probe-side candidate set is a strict
    subset of the full table (the pruning actually happens)."""
    build = (
        load(spark, sf_dir, "orders")
        .where(col("o_totalprice") > 495000.0)
        .select("o_custkey")
        .distinct()
    )
    bmp = build_bloom_bytes(build, "o_custkey")

    n_build = build.count()
    n_build_pass = build.where(bloom_might_contain(bmp, col("o_custkey"))).count()
    assert n_build_pass == n_build  # no false negatives

    cust = load(spark, sf_dir, "customer")
    n_all = cust.count()
    n_candidates = cust.where(bloom_might_contain(bmp, col("c_custkey"))).count()
    assert n_build <= n_candidates < n_all  # superset of matches, real pruning


def test_bloom_build_is_distributed_and_bit_identical(spark):
    """The distributed build (distinct positions -> per-byte BIT_OR fold,
    <= m/8 rows to the driver regardless of key count) must produce the
    EXACT bitmap a sequential reference construction does — bit-identity
    is what guarantees the probe path (and therefore q136's oracle) is
    untouched by the build-path change. 20k keys exercise the m-growth
    ladder well past the 2^13 floor; a fact-sized build differs only in
    the (distributed) position-dedup volume, never in driver transfer."""
    import hashlib

    keys = list(range(1, 20_001))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = build_bloom_bytes(df, "k")

    positions = {
        int(hashlib.md5(f"b{s}:{k}".encode()).hexdigest()[:12], 16) % (1 << 20)
        for k in keys
        for s in range(3)
    }
    m = 8192
    while m < (1 << 20) and m < 8 * len(positions):
        m *= 2
    want = bytearray(m // 8)
    for p in positions:
        p %= m
        want[p // 8] |= 1 << (p % 8)
    assert got == bytes(want)


def test_bloom_filter_is_map_side(spark, sf_dir):
    """The bloom membership test must sit in the probe's scan-side Filter,
    before any Exchange — pruning after the shuffle would defeat it."""
    plan = q136_bloom_semi_join(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # all three bitmap probes (one conv(hex(substring(...))) per hash, on a
    # BINARY literal) compile into Filter expressions, i.e. the test runs in
    # codegen before the join
    assert plan.lower().count("conv(hex(substring") >= 3, plan


def test_misra_gries_superset_adversarial(spark):
    """MG candidate union contains every phi-heavy item even when one
    partition is flooded with unique junk tokens (the layout that defeats
    naive per-partition top-k)."""
    import pandas as pd

    from eventstream_spark.operators.sketch import _mg_candidates

    heavy = ["hot pair"] * 300  # phi-heavy overall
    junk = [f"junk {i}" for i in range(5000)]  # one-off tokens
    # partition = heavy items diluted in junk: naive top-k by local count
    # still finds it, but MG's guarantee is what we pin — survives with
    # k counters even when distinct junk far exceeds k
    part = pd.DataFrame({"bigram": junk[:2500] + heavy + junk[2500:]})
    out = list(_mg_candidates(iter([part])))[0]
    assert "hot pair" in set(out["bigram"])
    assert len(out) <= _MG_COUNTERS


def test_heavy_hitters_recount_is_exact(spark, sf_dir):
    """The MG + recount pipeline equals the naive full groupBy answer —
    the sketch prunes shuffle volume, never the result."""
    from eventstream_spark.operators.sketch import q137_heavy_hitters

    docs = load(spark, sf_dir, "documents")
    grams = bigram_stream(docs)
    total = grams.count()
    naive = {
        (r.bigram, r.cnt)
        for r in grams.groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .where(col("cnt").cast("double") >= _HH_PHI * total)
        .collect()
    }
    ours = {(r.bigram, r.cnt) for r in q137_heavy_hitters(spark, sf_dir).collect()}
    assert ours == naive


def test_bloom_grows_bits_with_build_side(spark):
    """The grow-bits-with-N rule: a 40k-key build side must get a bitmap
    larger than the 8192-bit floor, and the false-positive rate on a
    disjoint probe set must stay bounded — the property that keeps the
    pre-filter useful as the build side scales."""
    build = spark.range(0, 40_000).withColumnRenamed("id", "k")
    bmp = build_bloom_bytes(build, "k")
    m = len(bmp) * 8
    assert m > 8192
    probe = spark.range(1_000_000, 1_010_000).withColumnRenamed("id", "k")
    fp = probe.where(bloom_might_contain(bmp, col("k"))).count()
    assert fp / 10_000 < 0.25
    # and still zero false negatives at this size
    hits = build.where(bloom_might_contain(bmp, col("k"))).count()
    assert hits == 40_000
