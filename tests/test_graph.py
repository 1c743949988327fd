"""Graph-operator properties (q133 triangles share their edge builder with
q139 PageRank). The oracle tests pin exact values; these pin the algebraic
invariants that make the integer PageRank trustworthy."""

from __future__ import annotations

import pyspark.sql.functions as F

from eventstream_spark.catalog import load
from eventstream_spark.operators.analytics import (
    _PR_MASS,
    cooccurrence_edges,
    q139_pagerank,
)


def test_pagerank_mass_conserved_up_to_floor_leak(spark, sf_dir):
    """Total rank mass stays within the floor-division leak budget: each
    iteration loses < 1 unit per directed edge (contrib div) plus < 2 per
    vertex (base div + damped div), damping never amplifies it — the
    invariant that catches a dropped vertex, a doubled edge direction, or
    a bad damping split."""
    ranks = q139_pagerank(spark, sf_dir).collect()
    n = len(ranks)
    assert n > 0  # fixture graph is non-trivial
    n_directed = 2 * cooccurrence_edges(
        load(spark, sf_dir, "events")
    ).count()
    total = sum(r.rank_e12 for r in ranks)
    assert total <= _PR_MASS
    assert total > _PR_MASS - 2 * (n_directed + 2 * n) - 1

    # every vertex keeps at least the undamped base share
    base = (3 * _PR_MASS) // (20 * n)
    assert min(r.rank_e12 for r in ranks) >= base


def test_cooccurrence_graph_has_no_dangling_vertices(spark, sf_dir):
    """The symmetrized co-occurrence graph gives every vertex out-degree
    >= 1 — the precondition for skipping PageRank's dangling-mass term."""
    und = cooccurrence_edges(load(spark, sf_dir, "events"))
    srcs = und.select(F.col("u").alias("x")).union(und.select("v")).distinct()
    edges = und.select(F.col("u").alias("s")).union(
        und.select(F.col("v").alias("s"))
    )
    deg0 = srcs.join(edges, srcs.x == edges.s, "left_anti").count()
    assert deg0 == 0
