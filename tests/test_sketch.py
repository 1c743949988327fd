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


def test_bottomk_sample_merge_property(spark):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — the
    mergeability that lets shards sketch independently and a coordinator
    merge K-row states (q210's scale contract). Pinned on adversarial
    splits: every global bottom-k row concentrated in ONE shard, an
    interleaved split, an extreme-skew split, and an empty shard."""
    from pyspark.sql.functions import lit

    from eventstream_spark.functions import hash48
    from eventstream_spark.operators.sketch import bottomk_sample

    k = 64
    rows = [(i, j, float(i * 7 + j)) for i in range(400) for j in range(1, 4)]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber long, l_extendedprice double"
    )
    pri = hash48(F.concat_ws(":", col("l_orderkey"), col("l_linenumber")))

    def rowset(d):
        return sorted(
            (r.l_orderkey, r.l_linenumber, r.l_extendedprice)
            for r in d.select(
                "l_orderkey", "l_linenumber", "l_extendedprice"
            ).collect()
        )

    expected = rowset(bottomk_sample(df, k))
    assert len(expected) == k

    # priority cut placing ALL of the global bottom-k inside shard A —
    # the split where a buggy merge silently agrees unless B's sketch is
    # truly redundant
    pris = sorted(r[0] for r in df.select(pri).collect())
    cut = pris[3 * k]
    splits = [
        (df.where(pri <= lit(cut)), df.where(pri > lit(cut))),
        (df.where(col("l_orderkey") % 2 == 0), df.where(col("l_orderkey") % 2 == 1)),
        (df.limit(5), df.subtract(df.limit(5))),
        (df.where(lit(False)), df),  # empty shard merges as identity
    ]
    for a, b in splits:
        merged = bottomk_sample(
            bottomk_sample(a, k)
            .drop("pri")
            .unionByName(bottomk_sample(b, k).drop("pri")),
            k,
        )
        assert rowset(merged) == expected

    # k larger than the data: the sketch degrades to the exact rowset
    tiny = df.limit(10)
    assert rowset(bottomk_sample(tiny, k)) == rowset(tiny)
