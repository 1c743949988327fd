"""Graph-operator properties (q133 triangles share their edge builder with
q139 PageRank). The oracle tests pin exact values; these pin the algebraic
invariants that make the integer PageRank trustworthy."""

from __future__ import annotations

import pyspark.sql.functions as F

from eventstream_spark.catalog import load
from eventstream_spark.operators.analytics import (
    _PR_MASS,
    cooccurrence_edges,
    orient_edges_by_degree,
    q139_pagerank,
    triangle_count_df,
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


def _hub_graph(spark, n_leaves: int = 200):
    """Star graph: hub 0 joined to leaves 1..n, plus a chain of leaf-leaf
    edges (i, i+1) for i in 1..60 closing 60 hub-leaf-leaf triangles.
    Hub id 0 sorts FIRST by id — the worst case for id-ordered
    orientation (every star edge would point out of the hub)."""
    rows = [(0, v) for v in range(1, n_leaves + 1)]
    rows += [(i, i + 1) for i in range(1, 61)]
    return spark.createDataFrame(rows, "u long, v long")


def test_degree_orientation_bounds_hub_wedges(spark):
    """On a 200-leaf star the degree-200 hub must generate ZERO wedges
    (every neighbor has lower (degree, id) rank, so the hub's out-degree
    is 0) — id orientation would give it C(200, 2) = 19900. Total wedge
    count sum(C(out_deg, 2)) stays chain-sized. This is the quadratic
    hub fan-out the degree-ordered wedge join exists to prevent."""
    edges = _hub_graph(spark)
    o = orient_edges_by_degree(edges)
    out = {r.a: r.cnt for r in o.groupBy("a").agg(F.count("*").alias("cnt")).collect()}
    assert out.get(0, 0) == 0  # hub has zero out-edges
    wedge_total = sum(c * (c - 1) // 2 for c in out.values())
    # chain vertices have out-degree <= 3 (next-chain + hub never counts:
    # the hub outranks everyone) -> a few hundred wedges, not 19900
    assert wedge_total < 4 * len(out)


def test_degree_ordered_triangle_count_exact(spark):
    """Triangle count via the degree-ordered wedge join matches the
    brute-force count on the hub graph: 60 hub-leaf-leaf triangles from
    the chain closures, no double counting, none missed."""
    edges = _hub_graph(spark)
    n = triangle_count_df(edges).collect()[0].n_triangles
    assert n == 60

    # brute force over the collected edge set (251 edges — test-only)
    es = {(r.u, r.v) for r in edges.collect()}
    adj = es | {(v, u) for u, v in es}
    brute = sum(
        1
        for (u, v) in es
        for w in range(0, 262)
        if w > v and (u, w) in adj and (v, w) in adj
    )
    assert n == brute


def test_orientation_is_a_permutation_of_the_edge_set(spark):
    """Orientation must neither drop nor duplicate edges: the oriented
    set, read back as unordered pairs, equals the input edge set."""
    edges = _hub_graph(spark)
    o = orient_edges_by_degree(edges)
    got = {
        (min(r.a, r.b), max(r.a, r.b)) for r in o.select("a", "b").collect()
    }
    want = {(r.u, r.v) for r in edges.collect()}
    assert got == want
