"""Relational surface extensions: subquery shapes, window frames,
percentiles, conditional/ordered-set aggregation, sliding windows.

Same contract as ``relational.py``: every builder is pure DataFrame API
(Catalyst owns the physical plan) and every query has a duckdb oracle with
IDENTICAL column names/types. The shapes here round out SURVEY §2 Part B
coverage with the query families a warehouse user reaches for next:
EXISTS / NOT EXISTS decorrelation, RANGE window frames over event time,
first/last_value frames, exact interpolated percentiles, FILTER-style
conditional aggregation, ordered string aggregation, and the sliding-window
batch twin of the streaming ``window(ts, len, slide)`` operator.

Scale notes: the EXISTS/NOT EXISTS forms compile to semi/anti joins (one
shuffle on the join key, AQE-broadcastable); the RANGE frame is linear state
within each user partition (sum via DECIMAL so partial order cannot change
the value); the sliding window expands each row to len/slide windows
map-side before one aggregation shuffle — the standard streaming plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import col, lit

from ..cache import persist_tracked
from ..catalog import load, spread
from ..functions import hash48, hash48_sql


def q62_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one deep-discount line, per priority (TPC-H Q4
    shape). EXISTS decorrelates to a left-semi join — the scalable form."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(col("l_discount") > 0.09)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .orderBy("o_orderpriority")
    )


def q63_not_exists_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with NO line shipped more than 60 days after the order date,
    per status. Correlated NOT EXISTS == left-anti with the residual theta
    condition riding on the equi-join."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    late = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > F.expr("o_orderdate + INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, late, "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("cnt"))
        .orderBy("o_orderstatus")
    )


def q64_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour sum over event time — a RANGE frame keyed on
    epoch seconds, the batch twin of a sliding stateful aggregation.

    The frame sum runs over DECIMAL(18,2) so the result is identical no
    matter how either engine orders or segments the frame (duckdb uses
    segment trees, Spark a sliding buffer — float folds would differ in
    the last ulp); the output is cast back to double.
    """
    ev = load(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    vdec = F.round(col("value"), 2).cast("decimal(18,2)")
    w = Window.partitionBy("user_id").orderBy("sec").rangeBetween(-3600, 0)
    return (
        ev.select("user_id", "event_id", sec.alias("sec"), vdec.alias("v"))
        .select(
            "user_id",
            "event_id",
            F.sum("v").over(w).cast("double").alias("roll_1h"),
        )
        .orderBy("user_id", "event_id")
    )


def q65_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First and last order price per customer via full-partition frames
    (first_value / last_value / count over UNBOUNDED..UNBOUNDED)."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        orders.select(
            "o_custkey",
            F.first_value("o_totalprice").over(w).alias("first_price"),
            F.last_value("o_totalprice").over(w).alias("last_price"),
            F.count("*").over(w).alias("n_orders"),
        )
        .distinct()
        .orderBy("o_custkey")
    )


def q66_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles of l_quantity per return flag
    (percentile == duckdb quantile_cont: linear interpolation)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("p75"),
            F.count("*").alias("cnt"),
        )
        .orderBy("l_returnflag")
    )


def q67_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-style conditional aggregation per order status: big-ticket
    counts and their share, as CASE-WHEN sums (identical in both engines)."""
    orders = load(spark, sf_dir, "orders")
    big = F.when(col("o_totalprice") > 200000.0, 1).otherwise(0)
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(big).cast("long").alias("n_big"),
            F.round(F.sum(big) / F.count("*"), 4).alias("big_share"),
        )
        .orderBy("o_orderstatus")
    )


def q68_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: comma-joined sorted nation list per
    region (collect_list → array_sort → array_join == string_agg ORDER BY)."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
        .orderBy("r_name")
    )


def q21b_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour / 30-minute window counts — the batch twin of the
    streaming ``window(ts, '1 hour', '30 minutes')`` aggregation. Each event
    lands in len/slide = 2 windows (map-side expansion, one shuffle)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(col("w.start").alias("w_start"), "event_type", "cnt")
        .orderBy("w_start", "event_type")
    )


def q70_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample to a 1-hour grid with gap fill: every
    (event_type, hour) cell of the full spine gets its event count (0 when
    empty) and the last non-empty hourly value sum carried forward — the
    hypertable-rollup + locf shape.

    The spine is generated, not scanned: sequence() over the global hour
    bounds exploded per type — rows = types × hours, independent of event
    volume. One aggregation shuffle + one window shuffle on event_type.
    """
    ev = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", col("ts"))
    hourly = (
        ev.groupBy(col("event_type"), hour.alias("h"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sv"))
    )
    bounds = ev.agg(
        F.min(hour).alias("h_min"), F.max(hour).alias("h_max")
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("h_min", "h_max", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.coalesce("cnt", lit(0)).alias("cnt"),
            F.last("sv", ignorenulls=True).over(w).alias("sv_locf"),
        )
        .orderBy("event_type", "h")
    )


def q80_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (argmax) per group. Ties on o_totalprice are broken
    by o_orderkey through one exact composite BIGINT ordering key —
    round(price*100)*1e10 + orderkey — because duckdb's arg_max/arg_min
    cannot order by a struct; prices have 2 decimals and keys < 1e10, so
    the encoding is collision-free and identical in both engines."""
    orders = load(spark, sf_dir, "orders")
    composite = (
        F.round(col("o_totalprice") * 100).cast("long") * lit(10_000_000_000)
        + col("o_orderkey")
    )
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", composite).alias("max_order"),
            F.min_by("o_orderkey", composite).alias("min_order"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


def q83_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per return flag: sample stddev/variance of
    quantity and the quantity↔extendedprice correlation. Quantities are
    small integers (sums exact in double at this scale) and the outputs
    are rounded, so partial-aggregation fold order cannot flip a digit."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        )
        .orderBy("l_returnflag")
    )


def q101_vector_hof_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector statistics computed entirely with higher-order
    array functions (aggregate/filter/array_max) — no explode, so the
    (label, stats) aggregation shuffles one row per vector, not one per
    component. Norms are rounded per row and summed as DECIMAL so the
    cross-row fold order cannot flip a digit."""
    from ..functions import as_double_array

    emb = load(spark, sf_dir, "embeddings")
    v = as_double_array(col("embedding"))
    sumsq = F.aggregate(v, lit(0.0), lambda a, x: a + x * x)
    norm = F.round(F.sqrt(sumsq), 6).cast("decimal(18,6)")
    n_pos = F.size(F.filter(v, lambda x: x > 0))
    return (
        emb.select(
            "label",
            norm.alias("norm"),
            n_pos.alias("n_pos"),
            F.array_max(v).alias("max_c"),
            F.size(v).alias("dim"),
        )
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vec"),
            F.round((F.sum("norm") / F.count("*")).cast("double"), 4).alias("avg_norm"),
            F.sum(F.when(col("n_pos") * 2 > col("dim"), 1).otherwise(0)).alias(
                "n_pos_heavy"
            ),
            F.round(F.max("max_c"), 6).alias("max_component"),
        )
        .orderBy("label")
    )


def q102_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of three lineitem measures, then one
    aggregation over the long form. Spark's unpivot is a zero-shuffle
    Expand (each input row emits 3), so the only exchange is the final
    groupBy — the same plan shape a sliding window uses."""
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("val"), 2).alias("total"),
        )
        .orderBy("l_returnflag", "measure")
    )


_SCRUB_RE = r"\b(a|the)\b"


def q103_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-cleaning accounting: strip filler words and report, per source,
    how many documents changed and how many characters were removed — the
    boilerplate-scrub step of a corpus pipeline. Pure JVM regexp_replace
    (no UDF); the duckdb mirror uses the identical RE2-compatible pattern."""
    docs = spread(load(spark, sf_dir, "documents"))
    cleaned_len = F.length(F.regexp_replace(col("text"), _SCRUB_RE, ""))
    removed = (F.length("text") - cleaned_len).cast("long")
    return (
        docs.select("source", removed.alias("removed"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(col("removed") > 0, 1).otherwise(0)).alias("n_changed"),
            F.sum("removed").alias("chars_removed"),
        )
        .orderBy("source")
    )


def q118_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition matrix: per-user adjacent event pairs counted over
    the whole stream (the Markov-chain view of user behavior — the
    complement of q46's fixed funnel). One window shuffle on user_id (lag
    over the (ts, event_id) total order), then a small pair aggregation.

    Scale: per-user state in the lag window is one row; the pair space is
    #event_types², so the final aggregation is tiny no matter the corpus."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "user_id",
        col("event_type").alias("to_event"),
        F.lag("event_type").over(w).alias("from_event"),
    )
    return (
        t.where(col("from_event").isNotNull())
        .groupBy("from_event", "to_event")
        .agg(F.count("*").alias("cnt"), F.count_distinct("user_id").alias("n_users"))
        .orderBy("from_event", "to_event")
    )


def q119_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted active
    per week offset — the standard growth-analytics matrix.

    Scale: two shuffles on user_id (first-seen agg, then the distinct
    activity join — co-partitioned, so AQE can reuse the exchange) and one
    small (cohort, offset) aggregation. No window, no skew beyond user
    activity itself."""
    ev = load(spark, sf_dir, "events")
    week = F.date_trunc("week", col("ts"))
    first = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    active = ev.select("user_id", week.alias("week")).distinct()
    j = active.join(first, "user_id")
    return (
        j.groupBy(
            "cohort_week",
            (F.datediff(col("week"), col("cohort_week")) / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


_QUALITY_COLS = ("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice")


def q129_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile (the Deequ/expectations pattern): one pass over
    the table computes per-column null counts, distinct counts, and a
    uniqueness verdict, emitted in long form — the pre-ingest validation
    report every pipeline runs before trusting a new drop.

    Scale: ONE aggregation over the scan (multi-distinct plans as Expand +
    partial aggregation — still a single shuffle family); the long-form
    explode happens on the single result row."""
    o = load(spark, sf_dir, "orders")
    agg = o.agg(
        F.count("*").alias("n"),
        *[F.sum(F.isnull(c).cast("long")).alias(f"nn_{c}") for c in _QUALITY_COLS],
        *[F.countDistinct(c).alias(f"nd_{c}") for c in _QUALITY_COLS],
    )
    metrics = F.array(
        *[
            F.struct(
                lit(c).alias("col_name"),
                col(f"nn_{c}").alias("n_nulls"),
                col(f"nd_{c}").alias("n_distinct"),
            )
            for c in _QUALITY_COLS
        ]
    )
    return (
        agg.select(col("n").alias("n_rows"), F.explode(metrics).alias("m"))
        .select(
            "m.col_name",
            "n_rows",
            "m.n_nulls",
            "m.n_distinct",
            (col("m.n_distinct") == col("n_rows")).cast("long").alias("is_unique"),
        )
        .orderBy("col_name")
    )


def q130_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly flagging per event type: group stats (mean,
    population stddev — ROUNDED to 6 decimals so both engines flag against
    bit-identical thresholds), then count events beyond 3 sigma. Two
    passes over events: the stats aggregate, then a broadcast join back —
    the standard two-pass anomaly scan (stats are per-GROUP scalars and
    always broadcastable)."""
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_pop("value"), 6).alias("sd"),
    )
    flagged = (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                (F.abs(col("value") - col("mu")) / col("sd") > 3).cast("long")
            ).alias("n_outliers"),
        )
    )
    return (
        stats.join(flagged, "event_type")
        .select("event_type", "n_events", "mu", "sd", "n_outliers")
        .orderBy("event_type")
    )


def q134_trend_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates per event type: the trend of event
    value over time via the built-in ordinary-least-squares family
    (regr_slope / regr_intercept / regr_r2 — single-pass co-moment
    aggregation, partial+final like any hash agg). The x axis is hours
    since epoch computed as ONE division from integer microseconds, so
    both engines see bit-identical inputs; outputs round to 4.

    Scale: one aggregation over the scan — the co-moments combine
    map-side, so this is the cheapest possible per-group model fit. The
    applyInPandas twin (per-group np.polyfit) is pinned approximately
    equal in tests/test_grouped_map.py — the escape hatch for model fits
    the built-in aggregate family can't express."""
    ev = load(spark, sf_dir, "events")
    x = (F.unix_micros(col("ts")) / lit(3600000000.0)).alias("x")
    return (
        ev.select("event_type", x, col("value").alias("y"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.regr_slope("y", "x"), 4).alias("slope"),
            F.round(F.regr_intercept("y", "x"), 4).alias("intercept"),
            F.round(F.regr_r2("y", "x"), 4).alias("r2"),
        )
        .orderBy("event_type")
    )


_TRI_MIN_COOC = 3  # co-occurrences required before two users share an edge


def cooccurrence_edges(ev: DataFrame) -> DataFrame:
    """Undirected user co-occurrence edges (u < v): two users share an edge
    when they act in the same (event_type, hour) window at least
    ``_TRI_MIN_COOC`` times. Blocking join on the (event_type, hour) key —
    never all-pairs over users. Shared by q133 (triangles) and q139
    (PageRank)."""
    from ..cache import persist_tracked

    # Persist the distinct occurrence table: the self-join's two legs are
    # planned as independent subtrees (the build side goes through a
    # BroadcastExchange, so Spark's exchange reuse cannot deduplicate
    # them) and without the persist each leg pays its own full scan +
    # two-phase distinct over the event log (measured at sf0.1: the
    # second distinct pass is ~0.8 s of the 3.2 s stage).
    occ = persist_tracked(
        ev.select(
            "user_id", "event_type", F.date_trunc("hour", col("ts")).alias("h")
        ).distinct()
    )
    a = occ.alias("a")
    b = occ.alias("b")
    return (
        a.join(
            b,
            (col("a.event_type") == col("b.event_type"))
            & (col("a.h") == col("b.h"))
            & (col("a.user_id") < col("b.user_id")),
        )
        .groupBy(col("a.user_id").alias("u"), col("b.user_id").alias("v"))
        .agg(F.count("*").alias("c"))
        .where(col("c") >= _TRI_MIN_COOC)
        .select("u", "v")
    )


def vertex_degrees(edges: DataFrame) -> DataFrame:
    """(x, d): degree of every endpoint of an undirected (u, v) edge list.
    Vertex-class output — the distinct keys ARE the vertex set, so callers
    that also need vertices/counts read this one table instead of running
    a separate union + distinct over the edge list (measured 0.6 s at
    sf0.1 for q133's former verts pass)."""
    return (
        edges.select(col("u").alias("x"))
        .unionAll(edges.select(col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )


def orient_edges_by_degree(
    edges: DataFrame,
    broadcast_degrees: bool = True,
    deg: DataFrame | None = None,
) -> DataFrame:
    """Orient each undirected edge (u, v) from its lower-(degree, id)
    endpoint to its higher one: columns (a, b, db) with
    (deg(a), a) < (deg(b), b) lexicographically, db = deg(b). The
    (degree, id) pair is a total order over vertices, so the orientation
    is acyclic and every vertex's OUT-degree is bounded by O(sqrt(m))
    (the arboricity argument of Chiba–Nishizeki / Schank–Wagner): a
    vertex only points at neighbors of equal-or-higher degree, and there
    can be at most 2·sqrt(m) vertices of degree >= sqrt(m). This is what
    bounds the wedge-join fan-out on hub vertices — a degree-10⁶ hub has
    out-degree ~0 because every neighbor ranks below it, where id
    orientation could give it 10⁶ out-edges and 10¹² wedges.
    Property-tested on a hub graph in tests/test_graph.py.

    The degree table is vertex-class — orders of magnitude smaller than
    the edge list it annotates (two (x, d) longs per vertex) — so by
    default both annotation joins BROADCAST it and the orientation rides
    the edge list without re-shuffling it (this is what reclaimed the
    3 s the r5 degree-ordering change had cost at sf0.1). On a graph
    whose vertex set itself exceeds the broadcast budget (billions of
    vertices), pass ``broadcast_degrees=False`` to fall back to shuffle
    joins — the arboricity bound on the wedge join is unaffected either
    way."""
    if deg is None:
        from ..cache import persist_tracked

        # The two broadcast legs below are independent subtrees — exchange
        # reuse cannot deduplicate a BroadcastExchange build — so without
        # a persist the degree aggregation runs TWICE (measured: the
        # orientation pass was 1.4 s of q133's 4 s at sf0.1).
        deg = persist_tracked(vertex_degrees(edges))
    du = deg.select(col("x").alias("u"), col("d").alias("du"))
    dv = deg.select(col("x").alias("v"), col("d").alias("dv"))
    if broadcast_degrees:
        du, dv = F.broadcast(du), F.broadcast(dv)
    e = edges.join(du, "u").join(dv, "v")
    fwd = F.struct(col("du"), col("u")) < F.struct(col("dv"), col("v"))
    return e.select(
        F.when(fwd, col("u")).otherwise(col("v")).alias("a"),
        F.when(fwd, col("v")).otherwise(col("u")).alias("b"),
        F.when(fwd, col("dv")).otherwise(col("du")).alias("db"),
    )


def triangle_count_df(edges: DataFrame, deg: DataFrame | None = None) -> DataFrame:
    """Exact triangle count over an undirected edge list (u < v, distinct)
    via the degree-ordered wedge join: orient edges by (degree, id)
    (``orient_edges_by_degree``), form wedges a→b, a→c with
    (deg(b), b) < (deg(c), c), and close them against the oriented edge
    b→c. Each triangle {x, y, z} with rank x < y < z is counted exactly
    once — as the wedge at its LOWEST-ranked vertex x — and the wedge
    count per vertex is C(out-degree, 2), bounded by arboricity instead
    of hub degree. Returns a 1-row count frame.

    The oriented list is persisted: three plan legs read it (both wedge
    sides + the closing probe), and without the persist each leg would
    redo the degree aggregation + annotation joins."""
    from ..cache import persist_tracked

    o = persist_tracked(orient_edges_by_degree(edges, deg=deg))
    o1, o2, o3 = o.alias("o1"), o.alias("o2"), o.alias("o3")
    wedges = o1.join(
        o2,
        (col("o1.a") == col("o2.a"))
        & (
            F.struct(col("o1.db"), col("o1.b"))
            < F.struct(col("o2.db"), col("o2.b"))
        ),
    )
    tri = wedges.join(
        o3, (col("o3.a") == col("o1.b")) & (col("o3.b") == col("o2.b"))
    )
    return tri.agg(F.count("*").alias("n_triangles"))


def q133_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics over the event log: build the user co-occurrence
    graph (an edge when two users act in the same (event_type, hour)
    window at least ``_TRI_MIN_COOC`` times) and count triangles — the
    clustering-structure primitive behind community/cohesion metrics.

    Scale: co-occurrence pairs block on the (event_type, hour) key — the
    standard blocking join, never all-pairs over users; the triangle pass
    is the canonical edge-edge wedge join with DEGREE-ORDERED orientation
    (``orient_edges_by_degree``): edges point from low- to high-(degree,
    id) endpoint, so per-vertex wedge fan-out is C(out-degree, 2) and
    out-degree is arboricity-bounded — a hub vertex generates ~zero
    wedges instead of deg² of them (hub property pinned in
    tests/test_graph.py; 100x measured in SCALE_SMOKE.json against the
    block-disjoint graph replica set). Each triangle counts exactly once
    at its lowest-ranked vertex."""
    from ..cache import persist_tracked

    ev = load(spark, sf_dir, "events")
    edges = persist_tracked(cooccurrence_edges(ev))
    # The degree table's keys ARE the vertex set: one persisted aggregation
    # serves n_vertices AND both orientation broadcast legs (formerly a
    # separate union+distinct pass plus two independent degree subtrees).
    deg = persist_tracked(vertex_degrees(edges))
    return (
        deg.agg(F.count("*").alias("n_vertices"))
        .crossJoin(edges.agg(F.count("*").alias("n_edges")))
        .crossJoin(triangle_count_df(edges, deg=deg))
    )


def q138_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly flagging per event type: median / MAD instead of
    mean / stddev (q130's z-score breaks down when the outliers themselves
    inflate sigma; MAD has a 50% breakdown point). Flags events where
    |value - median| > 3 * 1.4826 * MAD (1.4826 scales MAD to sigma for
    normal data).

    Determinism: median and MAD round to 6 decimals before the threshold
    (the q130 pattern — both engines flag against bit-identical numbers);
    Spark percentile == duckdb quantile_cont (linear interpolation).

    Scale: three passes over events (median, MAD, flag count), each a
    per-group aggregate; the per-group stats are scalars and broadcast
    back. Exact medians need a full sort per group — at 100 TB swap in
    approx_percentile (tolerance-tested in test_queries_vs_oracle.py) for
    one-pass sketched medians."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad"),
            F.first("med").alias("med"),
        )
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            # literal 4.4478 (= 3 * 1.4826) spelled the same in both engines
            # so the parsed double is bit-identical
            F.sum(
                (F.abs(col("value") - col("med")) > lit(4.4478) * col("mad")).cast(
                    "long"
                )
            ).alias("n_outliers"),
        )
        .select("event_type", "n_events", "med", "mad", "n_outliers")
        .orderBy("event_type")
    )


_PR_MASS = 1_000_000_000_000  # total rank mass in integer units (1e12)


def q139_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled PageRank iterations over the user co-occurrence graph
    (damping 0.85), computed ENTIRELY in integer arithmetic: ranks carry
    1e12 units of mass, every division is floor-division, so partial-sum
    order cannot perturb a single bit on either engine — no float folds,
    no rounding coupling.

    r0 = M div n;  contrib(u->v) = r(u) div deg(u)
    r'(v) = (3M div 20n) + (17 * sum(contrib)) div 20      [0.15/0.85 damping]

    Scale: each iteration is one join of the edge list against the rank
    vector (shuffle on vertex id) plus one aggregation — the standard
    sparse-matvec plan; the symmetric co-occurrence graph has no dangling
    vertices so no mass-redistribution term. At a trillion edges the same
    plan holds with the edge list bucketed by src so the rank join
    co-locates; more iterations = a driver loop over the same two-shuffle
    step (the q54b iterative pattern).

    Round-13 replan (guide §2.4 — remove joins the algebra doesn't need;
    the former shape carried FOUR join legs for two iterations):

    - the symmetrized edge list makes every vertex both a source and a
      destination, so the per-iteration ``verts LEFT JOIN summed`` was an
      identity: keys(summed) == the vertex set exactly, and the
      ``coalesce(sc, 0)`` never saw a NULL. The rank frontier is now a
      pure PROJECTION of the contribution aggregate — the two left-outer
      joins (and their verts-side sorts/broadcasts) are gone, provably
      row-identical.
    - iteration 1's rank join was a join against a CONSTANT frontier
      (r0 = M div n for every vertex), so its contributions read straight
      off the persisted edges_deg (r0 div deg) — no join at all. Only
      iteration 2+ pays the one rank join the sparse matvec actually
      requires."""
    from ..cache import persist_tracked

    ev = load(spark, sf_dir, "events")
    # persist the UNDIRECTED set (the expensive blocking join) so the
    # symmetrized union below reads the cache twice instead of running the
    # co-occurrence join twice
    und = persist_tracked(cooccurrence_edges(ev))
    edges = und.select(col("u").alias("s"), col("v").alias("d")).union(
        und.select(col("v").alias("s"), col("u").alias("d"))
    )
    # degree rides ON the edge list (one groupBy + join, done ONCE) so each
    # iteration pays at most a single rank join instead of rank + degree
    # joins. The degree table's keys ARE the vertex set (the symmetrized
    # list has every vertex as a source), which is also what proves the
    # frontier projection below covers every vertex.
    deg = persist_tracked(edges.groupBy("s").agg(F.count("*").alias("deg")))
    edges_deg = persist_tracked(edges.join(deg, "s"))
    n = deg.count()  # scalar graph size (drives the integer base rank)
    if n == 0:
        return spark.createDataFrame([], "user_id long, rank_e12 long")
    base = (3 * _PR_MASS) // (20 * n)

    def next_ranks(summed: DataFrame) -> DataFrame:
        # every vertex receives contributions (symmetric graph), so the
        # new frontier is a projection — no verts join, no coalesce
        return summed.select(
            col("d").alias("x"),
            (lit(base) + F.expr("(17 * sc) div 20")).alias("r"),
        )

    # iteration 1: the initial frontier is uniform (r0 = M div n), so the
    # contributions are a map-side expression over edges_deg — zero joins
    ranks = next_ranks(
        edges_deg.select(
            col("d"), F.expr(f"{_PR_MASS // n} div deg").alias("c")
        )
        .groupBy("d")
        .agg(F.sum("c").alias("sc"))
    )
    # iteration 2: the one rank join the sparse matvec requires
    ranks = next_ranks(
        edges_deg.join(ranks, edges_deg.s == ranks.x)
        .select(col("d"), F.expr("r div deg").alias("c"))
        .groupBy("d")
        .agg(F.sum("c").alias("sc"))
    )
    return ranks.select(
        col("x").alias("user_id"), col("r").alias("rank_e12")
    ).orderBy(col("rank_e12").desc(), "user_id")


def q150_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-height) histogram of l_extendedprice in 8 buckets
    — the ANALYZE-statistics primitive behind selectivity estimation and
    skew-aware range partitioning (equi-WIDTH is q127; equi-depth is what
    an optimizer actually stores). ntile ties break on the full row key
    (l_orderkey, l_linenumber) so both engines bucket identically.

    Scale — the round-7 audit verdict, reclaimed: every output cell is
    determined by values at KNOWN global ranks. NTILE(k) bucket b is the
    contiguous rank range [start_b, end_b] with closed-form boundaries
    (first n mod k buckets take ceil(n/k) rows), cnt_b = end_b−start_b+1
    needs no data at all, and because ntile ties carry equal values,
    lo_b/hi_b are the values AT ranks start_b/end_b — tie-break
    independent. So the whole histogram is one exact_value_at_ranks call
    (bucketed rank-pick: stats agg + 1024-bucket histogram + a window
    over only the ≤16 target buckets) instead of the former
    scalable_ntile range exchange + groupBy re-read. Measured A/B,
    results asserted equal (sf0.1 median-of-3 steady, degraded-probe
    host): 1.62 s vs 1.96 s former plan — and the full-table range
    exchange is GONE, which is the term that grows at 100 TB (three
    single-column scans with map-side-combined aggs is the floor-bound
    spelling). The r6 one-pass ask is closed with a number. The k-row
    assembly is driver-side by construction (k = 8 rows)."""
    from .ranking import exact_value_at_ranks

    li = load(spark, sf_dir, "lineitem")
    k = 8

    def boundaries(n: int) -> list[tuple[int, int, int]]:
        q, rem = divmod(n, k)
        out, start = [], 1
        for b in range(1, k + 1):
            size = (q + 1) if b <= rem else q
            if size > 0:
                out.append((b, start, start + size - 1))
                start += size
        return out

    n, picked = exact_value_at_ranks(
        li,
        "l_extendedprice",
        lambda n: [r for _, s, e in boundaries(n) for r in (s, e)],
        what="lineitem",
    )
    rows = [
        (b, e - s + 1, float(picked[s]), float(picked[e]))
        for b, s, e in boundaries(n)
    ]
    return (
        spark.createDataFrame(rows, "bucket int, cnt long, lo double, hi double")
        .select(
            "bucket",
            "cnt",
            F.round("lo", 2).alias("lo"),
            F.round("hi", 2).alias("hi"),
        )
        .orderBy("bucket")
    )


def q151_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem numeric columns in
    one aggregation pass (corr is a co-moment aggregate like q134's
    regr_* family — partials merge map-side), emitted in long form. The
    profiling step before feature selection / drift dashboards.

    Outputs round to 4 (the regr_* discipline: co-moment folds differ in
    the last ulp across engines; 4 decimals is far above that noise)."""
    li = load(spark, sf_dir, "lineitem")
    pairs = [
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_extendedprice", "l_discount"),
        ("l_extendedprice", "l_tax"),
    ]
    agg = li.agg(
        F.count("*").alias("n"),
        *[
            F.round(F.corr(a, b), 4).alias(f"c_{a}__{b}")
            for a, b in pairs
        ],
    )
    metrics = F.array(
        *[
            F.struct(
                lit(a).alias("col_a"),
                lit(b).alias("col_b"),
                col(f"c_{a}__{b}").alias("pearson"),
            )
            for a, b in pairs
        ]
    )
    return (
        agg.select(col("n").alias("n_rows"), F.explode(metrics).alias("m"))
        .select("m.col_a", "m.col_b", "n_rows", "m.pearson")
        .orderBy("col_a", "col_b")
    )


def sweep_concurrency(
    pts: DataFrame, bucket_width_us: int = 21_600_000_000
) -> DataFrame:
    """Running sum of ±1 deltas over (t, delta) order per event_type —
    TWO-LEVEL, so a dominant event type is not one task (the pack_shards
    pattern applied to the sweep-line).

    Level 1 splits each type's timeline into contiguous fixed-width
    t-ranges (``bucket = t div width``, default 6 h — data-independent, so
    no extra min/max scan of the input; tie groups share a t, so a tie can
    never straddle buckets) and runs the running sum per (type, bucket).
    Level 2 adds each bucket's exclusive prefix of delta totals, computed
    by a window over the tiny (type, bucket) summary. Because buckets are
    contiguous in the order column, offset + local sum EQUALS the
    single-window running sum exactly (equality pinned in
    tests/test_plans.py), which is why q156's single-window oracle keeps
    passing unchanged. Parallelism scales with timeline length; pick the
    width so a bucket's endpoints fit one task (6 h of a firehose that
    emits 1M intervals/s is ~4×10^10 rows per type — shrink the width for
    that regime).

    Input: (event_type, t, delta[, ...]); adds ``conc``."""
    b = pts.withColumn("_bucket", (col("t") / lit(bucket_width_us)).cast("long"))
    w_local = (
        Window.partitionBy("event_type", "_bucket")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = b.withColumn("_cum", F.sum("delta").over(w_local))
    w_bucket = (
        Window.partitionBy("event_type")
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        b.groupBy("event_type", "_bucket")
        .agg(F.sum("delta").alias("_bd"))
        .withColumn("_off", F.coalesce(F.sum("_bd").over(w_bucket), lit(0)))
        .drop("_bd")
    )
    return (
        local.join(offsets, ["event_type", "_bucket"])
        .withColumn("conc", (col("_cum") + col("_off")).cast("long"))
        .drop("_bucket", "_cum", "_off")
    )


def q156_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval max-concurrency via the sweep-line trick: each event holds a
    resource for (event_id % 7 + 1) minutes; how many overlap at peak, per
    type? No interval-overlap join exists in either engine — the classical
    reduction is endpoints → ±1 deltas → running sum, and the peak is the
    max prefix sum (ends sort before starts at equal t, so intervals are
    end-exclusive). All arithmetic on integer microseconds.

    Scale: the ±1 expansion is map-side (explode, ONE scan — the oracle's
    UNION ALL twin scans twice); the running sum is sweep_concurrency's
    TWO-LEVEL form, so a dominant event type never serializes into one
    task — parallelism scales with the timeline, not the type count
    (equality with the single-window form pinned in tests/test_plans.py).
    Ties (equal t, equal delta) commute through the prefix sum, so the
    result is deterministic under any partition order."""
    ev = load(spark, sf_dir, "events")
    s = F.unix_micros(col("ts"))
    e = s + (col("event_id") % 7 + 1) * lit(60_000_000)
    pts = ev.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(s.alias("t"), lit(1).alias("delta")),
                F.struct(e.alias("t"), lit(-1).alias("delta")),
            )
        ).alias("p"),
    ).select("event_type", col("p.t").alias("t"), col("p.delta").alias("delta"))
    run = sweep_concurrency(pts).select("event_type", "t", "conc")
    run = run.withColumn(
        "mx", F.max("conc").over(Window.partitionBy("event_type"))
    )
    return (
        run.groupBy("event_type")
        .agg(
            (F.count("*") / 2).cast("long").alias("n_intervals"),
            F.max("conc").alias("max_concurrency"),
            F.min(F.when(col("conc") == col("mx"), col("t"))).alias(
                "first_peak_us"
            ),
        )
        .orderBy("event_type")
    )


def q157_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from an event log: collapse each user's
    event stream into validity intervals of their current event_type state
    (valid_from/valid_to, version, is_current) — the slowly-changing-
    dimension history table every warehouse derives from CDC feeds (q88 is
    the SCD1 latest-per-key twin). Change rows are where lag(state) differs;
    valid_to is the next change's timestamp, NULL on the open version.

    Scale: two windows over the same (user_id, ts, event_id) partitioning —
    one exchange, user partitions are small by construction (per-entity
    history), and timestamps stay integer micros end to end."""
    ev = load(spark, sf_dir, "events").where(col("user_id") % 50 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(col("prev_type").isNull() | (col("prev_type") != col("event_type")))
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w2)
    return ch.select(
        "user_id",
        F.row_number().over(w2).cast("long").alias("version"),
        "event_type",
        F.unix_micros(col("ts")).alias("valid_from_us"),
        F.unix_micros(nxt).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    ).orderBy("user_id", "version")


def q170_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal AS OF) join against the q157 SCD2 history:
    each purchase joins the state version VALID AT its timestamp
    (valid_from ≤ t < valid_to, open version = ∞) — the lookup that makes
    offline feature retrieval leak-free (a training example must see the
    dimension as it was, not as it is). Rolled up per joined state.

    Scale: equi-join on user_id with the validity range as a residual —
    per-user history is small by construction (change rows only), so the
    fanout is bounded; the same composite-key discipline as q09. Output
    counts are integers; revenue sums in micro-units.

    The dimension here is the user's last NON-purchase activity (q157's
    derivation over the non-purchase stream) — joining purchases against
    a state that includes purchases would mostly match the state each
    purchase itself created, which is the self-lookup, not the feature
    lookup."""
    ev = load(spark, sf_dir, "events").where(
        (col("user_id") % 50 == 0) & (col("event_type") != "purchase")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(col("prev_type").isNull() | (col("prev_type") != col("event_type")))
    nxt = F.lead("ts").over(w)
    hist = ch.select(
        "user_id",
        col("event_type").alias("state_type"),
        F.unix_micros(col("ts")).alias("valid_from_us"),
        F.unix_micros(nxt).alias("valid_to_us"),
    )
    p = (
        load(spark, sf_dir, "events")
        .where((col("user_id") % 50 == 0) & (col("event_type") == "purchase"))
        .select(
            "user_id",
            F.unix_micros(col("ts")).alias("t_us"),
            F.round(col("value") * 1e6).cast("long").alias("v_micro"),
        )
    )
    j = p.join(
        hist,
        (p.user_id == hist.user_id)
        & (col("t_us") >= col("valid_from_us"))
        & (col("valid_to_us").isNull() | (col("t_us") < col("valid_to_us"))),
    )
    return (
        j.groupBy("state_type")
        .agg(
            F.count("*").alias("n_purchases"),
            F.countDistinct(p.user_id).alias("n_users"),
            (F.sum("v_micro") / lit(1e6)).alias("revenue"),
        )
        .orderBy("state_type")
    )


def q160_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: credit each purchase to the user's
    most recent PRIOR click/view within a 7-day lookback, then roll up
    conversions and attributed revenue per touch type. The carry-forward is
    last_value(... IGNORE NULLS) over rows-preceding — the standard
    sessionless attribution scan.

    Scale: one window exchange on user_id (linear state per user); revenue
    sums in integer micro-units so partial-sum order can't change the
    answer (q125's discipline)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = col("event_type").isin("click", "view")
    touched = ev.select(
        "event_type",
        "ts",
        "value",
        F.last(F.when(is_touch, col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    return (
        touched.where(
            (col("event_type") == "purchase")
            & col("touch_type").isNotNull()
            & (
                F.unix_micros(col("ts")) - F.unix_micros(col("touch_ts"))
                <= lit(604_800_000_000)
            )
        )
        .groupBy("touch_type")
        .agg(
            F.count("*").alias("n_conversions"),
            (
                F.sum(F.round(col("value") * 1e6).cast("long")) / lit(1e6)
            ).alias("attributed_value"),
        )
        .orderBy("touch_type")
    )


def q164_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling into OHLC bars: per (event_type, hour) the
    open/high/low/close of ``value`` plus row count and an exact integer
    volume — the financial candlestick / telemetry-rollup primitive. Open
    and close are first/last by the TOTAL order (ts, event_id), so ties
    can't flip bars between engines.

    Scale: two row_number windows and the aggregation share ONE
    (event_type, hour) partitioning — a single exchange; volume sums in
    integer micro-units (q125 discipline)."""
    ev = load(spark, sf_dir, "events")
    h = F.date_trunc("hour", col("ts"))
    w_a = Window.partitionBy("event_type", "h").orderBy("ts", "event_id")
    w_d = Window.partitionBy("event_type", "h").orderBy(
        col("ts").desc(), col("event_id").desc()
    )
    e = ev.select("event_type", h.alias("h"), "ts", "event_id", "value").select(
        "event_type",
        "h",
        "value",
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
    )
    return (
        e.groupBy("event_type", "h")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min(F.when(col("rn_a") == 1, col("value"))), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.min(F.when(col("rn_d") == 1, col("value"))), 4).alias("close"),
            F.sum(F.round(col("value") * 1e6).cast("long")).alias("vol_micro"),
        )
        .select(
            "event_type",
            F.unix_micros(col("h")).alias("h_us"),
            "n",
            "open",
            "high",
            "low",
            "close",
            "vol_micro",
        )
        .orderBy("event_type", "h_us")
    )


def q168_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU + stickiness per day — the growth-metrics rollup next
    to q119's cohort retention. ONE trailing-window contribution explode
    serves all three horizons: each (day, user) activity row contributes
    (target_day, user, offset) for offsets 0..29; the per-(target_day,
    user) MIN offset then classifies the user into every window at once
    (0 → active today, <7 → in the trailing week, <30 → in the trailing
    month), so dau/wau/mau are conditional counts over one deduped table
    — no countDistinct, no per-horizon passes, no join of three
    aggregates (the r6 form ran 1×/7×/30× explodes through three
    distinct-aggs and two joins). Days are integer epoch-days end to end.

    Scale (round-12 replan; the round-6 form put the 30x exploded
    contribution table through a (day, user) MIN aggregation, and the
    100x triage read 9.7 GB of partial-agg sort spill on the default 32
    partitions — growing the exchange killed the spill but paid the
    30x rows as raw shuffle): the MIN is computable WITHOUT any
    exchange of exploded rows, because min(t - d0) over active days
    d0 <= t is t minus the LATEST active day <= t. One lead() window
    per user over the deduped activity table bounds each active day's
    target range at the next active day, so the explode emits every
    (day, user) row EXACTLY ONCE with its final mk — no (day, user)
    aggregation at all. The 30x volume now exists only inside the
    pipelined explode -> per-day rollup, whose partial agg compresses
    each task to |days| rows map-side. Exchanges: the dedup, one
    user_id window exchange over the DEDUPED table (1x rows), and the
    |days|-bounded rollup. Nothing 30x-sized ever crosses a shuffle —
    the shape that holds when the activity table is 100 TB."""
    ev = load(spark, sf_dir, "events")
    ud = persist_tracked(
        ev.select(
            F.floor(F.unix_micros(col("ts")) / lit(86_400_000_000)).alias("day"),
            "user_id",
        ).distinct()
    )
    spine = ud.select("day").distinct()
    wu = Window.partitionBy("user_id").orderBy("day")
    hi = F.least(
        col("day") + lit(29),
        F.coalesce(F.lead("day").over(wu) - lit(1), col("day") + lit(29)),
    )
    per_user_day = (
        ud.withColumn("hi", hi)
        .select(
            "user_id",
            col("day").alias("d0"),
            F.explode(F.sequence(col("day"), col("hi"))).alias("day"),
        )
        .select("day", "user_id", (col("day") - col("d0")).alias("mk"))
    )
    return (
        per_user_day.join(spine, "day")
        .groupBy("day")
        .agg(
            F.sum((col("mk") == 0).cast("long")).alias("dau"),
            F.sum((col("mk") < 7).cast("long")).alias("wau"),
            F.count("*").alias("mau"),
        )
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            F.round(col("dau").cast("double") / col("wau"), 4).alias("stickiness"),
        )
        .orderBy("day")
    )


_JK_G = 32


def q172_jackknife_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error bars on a distributed aggregate: delete-one-GROUP jackknife
    standard error of mean(l_extendedprice) over 32 deterministic hash
    buckets, next to the closed-form SE — the resampling machinery that
    prices any statistic (ratios, regressions) where no closed form
    exists, demonstrated on one where the answer is checkable.

    Determinism: bucket sums are exact integers (micro-units), the
    sum-of-squares is an exact DECIMAL, and the 32 leave-one-out means
    fold through the ordered-array aggregate (functions._fold_sum ≡
    duckdb list_reduce, fp-identical) — no unordered float sums anywhere.

    Scale: one groupBy(bucket) with map-side partials + one global
    aggregate; everything after is scalar algebra over 32 rows. The
    jackknife costs ONE extra pass regardless of statistic."""
    li = load(spark, sf_dir, "lineitem")
    key = F.concat(
        col("l_orderkey").cast("string"),
        lit("-"),
        col("l_linenumber").cast("string"),
    )
    x = li.select(
        F.round(col("l_extendedprice") * 1e6).cast("long").alias("vm"),
        col("l_extendedprice").cast("decimal(18,2)").alias("vd"),
        (hash48(key) % _JK_G).alias("b"),
    )
    pb = x.groupBy("b").agg(F.sum("vm").alias("s"), F.count("*").alias("n"))
    tot = x.agg(
        F.sum("vm").alias("st"),
        F.count("*").alias("nt"),
        F.sum(col("vd") * col("vd")).alias("sq"),
    )
    j = pb.crossJoin(F.broadcast(tot)).select(
        "b",
        (((col("st") - col("s")) / (col("nt") - col("n"))) / lit(1e6)).alias("m"),
        "st",
        "nt",
        "sq",
    )
    agg = j.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("b", "m"))), lambda s: s["m"]
        ).alias("ms"),
        F.max("st").alias("st"),
        F.max("nt").alias("nt"),
        F.max("sq").alias("sq"),
    )
    withm = agg.withColumn(
        "mbar",
        F.aggregate(col("ms"), lit(0.0), lambda a, v: a + v) / lit(_JK_G),
    )
    var_jk = lit((_JK_G - 1) / _JK_G) * F.aggregate(
        F.transform(col("ms"), lambda v: (v - col("mbar")) * (v - col("mbar"))),
        lit(0.0),
        lambda a, v: a + v,
    )
    std = col("st").cast("double") / lit(1e6)
    se_cf = F.sqrt(
        (
            (col("nt") * col("sq").cast("double") - std * std)
            / (col("nt") * (col("nt") - lit(1.0)))
        )
        / col("nt")
    )
    return withm.select(
        F.round((col("st") / col("nt")) / lit(1e6), 4).alias("mean_price"),
        F.round(F.sqrt(var_jk), 4).alias("se_jackknife"),
        F.round(se_cf, 4).alias("se_closed_form"),
    )


def q174_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation analytics: a two-sample z-test on purchase value
    between hash-split cohorts A/B — run twice, on the NULL split (no
    effect; z ≈ 0) and with a +20% effect injected into B (detected,
    z ≈ 4) — so both the no-false-positive and the detection side of the
    test are visible in one result. The deterministic hash split is the
    assignment a real experiment framework uses.

    Determinism: group sums are exact integer micro-units, sums of squares
    exact DECIMALs, and every float op after is a fixed expression tree
    (q172's discipline) — the z-statistic is bit-identical across engines.

    Scale: one groupBy over (variant, cohort) with map-side partials;
    everything after is scalar algebra over 4 rows."""
    ev = load(spark, sf_dir, "events").where(col("event_type") == "purchase")
    base = ev.select(
        (hash48(col("user_id").cast("string")) % 2).alias("grp"),
        F.round(col("value") * 1e6).cast("long").alias("vm"),
    )
    v = base.select(lit("null").alias("variant"), "grp", "vm").unionByName(
        base.select(
            lit("injected").alias("variant"),
            "grp",
            F.when(col("grp") == 1, F.round(col("vm") * 1.2).cast("long"))
            .otherwise(col("vm"))
            .alias("vm"),
        )
    )
    vmd = col("vm").cast("decimal(19,0)")
    g = v.groupBy("variant", "grp").agg(
        F.count("*").alias("n"),
        F.sum("vm").alias("s"),
        F.sum(vmd * vmd).alias("sq"),
    )

    def pick(c: str, grp: int):
        return F.max(F.when(col("grp") == grp, col(c)))

    w = g.groupBy("variant").agg(
        pick("n", 0).alias("n_a"),
        pick("n", 1).alias("n_b"),
        pick("s", 0).alias("s_a"),
        pick("s", 1).alias("s_b"),
        pick("sq", 0).alias("sq_a"),
        pick("sq", 1).alias("sq_b"),
    )

    def var(n: str, s: str, sq: str):
        sd = col(s).cast("double")
        return (col(n) * col(sq).cast("double") - sd * sd) / (
            col(n) * (col(n) - lit(1.0))
        )

    m = w.select(
        "variant",
        "n_a",
        "n_b",
        (col("s_a") / col("n_a")).alias("ma"),
        (col("s_b") / col("n_b")).alias("mb"),
        var("n_a", "s_a", "sq_a").alias("va"),
        var("n_b", "s_b", "sq_b").alias("vb"),
    )
    z = (col("mb") - col("ma")) / F.sqrt(
        col("va") / col("n_a") + col("vb") / col("n_b")
    )
    return m.select(
        "variant",
        "n_a",
        "n_b",
        F.round(col("ma") / lit(1e6), 4).alias("mean_a"),
        F.round(col("mb") / lit(1e6), 4).alias("mean_b"),
        F.round((col("mb") - col("ma")) / lit(1e6), 4).alias("lift"),
        F.round(z, 4).alias("z_score"),
        (F.abs(z) > lit(1.96)).alias("significant"),
    ).orderBy("variant")


def q175_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules: part pairs co-purchased in the
    same order, with support / confidence / lift — the frequent-itemset
    pass behind recommendations ("customers who bought X..."). Top-10
    pairs by lift at min-support 3.

    Scale: ONE shuffle builds the basket arrays (collect_set dedups
    map-side, fusing the r6 form's distinct + groupBy double exchange);
    pair generation is then a per-basket array expansion — C(k,2) rows,
    bounded by basket size squared (baskets are order-sized, never
    corpus-sized), with no self-join machinery. The HAVING floor prunes
    before the statistics joins; item supports are a dimension-class
    table (AQE sizes those joins). The basket table persists — three
    consumers (N, supports, pairs)."""
    arr = persist_tracked(
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    n = arr.agg(F.count("*").alias("n_orders"))
    s1 = (
        arr.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("s"))
    )
    pair_arr = F.flatten(
        F.transform(
            col("ps"),
            lambda x, i: F.transform(
                F.slice(col("ps"), i + 2, F.size(col("ps"))),
                lambda y: F.struct(x.alias("p1"), y.alias("p2")),
            ),
        )
    )
    pairs = (
        arr.select(F.explode(pair_arr).alias("pr"))
        .select("pr.p1", "pr.p2")
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("sup"))
        .where(col("sup") >= 3)
    )
    sa = s1.select(col("l_partkey").alias("p1"), col("s").alias("s_a"))
    sb = s1.select(col("l_partkey").alias("p2"), col("s").alias("s_b"))
    return (
        pairs.join(sa, "p1")
        .join(sb, "p2")
        .crossJoin(F.broadcast(n))
        .select(
            "p1",
            "p2",
            "sup",
            F.round(col("sup").cast("double") / col("s_a"), 4).alias("confidence"),
            F.round(
                col("sup").cast("double") * col("n_orders")
                / (col("s_a") * col("s_b")),
                4,
            ).alias("lift"),
        )
        .orderBy(col("lift").desc(), "p1", "p2")
        .limit(10)
    )


_DECAY_LAMBDA = 0.0990210257942779  # ln(2)/7: 7-day half-life
_US_PER_DAY = 86400000000.0


def q176_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay weighted aggregation: exponentially decayed value sums
    per event type (7-day half-life anchored at the corpus max timestamp)
    next to the raw sums — the recency-weighted feature engineering every
    ranking/LTV model uses. Per-row decayed terms quantize to integer
    micro-units before summation (each is ONE exp over exact integer age),
    so the decayed sum is partial-order-proof.

    Scale: the max-ts anchor is one tiny agg broadcast back; everything
    else is map-side + one groupBy."""
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.unix_micros(col("ts"))).alias("m"))
    age_days = (col("m") - F.unix_micros(col("ts"))) / lit(_US_PER_DAY)
    dv = F.round(
        col("value") * F.exp(-age_days * lit(_DECAY_LAMBDA)) * lit(1e6)
    ).cast("long")
    d = ev.crossJoin(F.broadcast(mx)).select(
        "event_type",
        dv.alias("dv"),
        F.round(col("value") * 1e6).cast("long").alias("vm"),
    )
    return (
        d.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("vm") / lit(1e6), 2).alias("raw_sum"),
            F.round(F.sum("dv") / lit(1e6), 2).alias("decayed_sum"),
            F.round(F.sum("dv") / F.sum("vm").cast("double"), 4).alias(
                "retention_factor"
            ),
        )
        .orderBy("event_type")
    )


def q177_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the Gini coefficient of per-user purchase
    revenue via the rank formula G = 2·Σ(i·vᵢ)/(n·Σv) − (n+1)/n over
    ascending-sorted values — the inequality metric behind "top X% of
    users drive Y%" dashboards and corpus-source concentration checks.

    Scale: the global ascending rank uses global_row_number (range
    partition + prefix offsets — no single-task window); Σ(i·v) is an
    integer sum (swap to DECIMAL when n·v approaches 2^63). One shuffle
    for the per-user rollup, one range exchange for the rank."""
    from .ranking import global_row_number

    u = (
        load(spark, sf_dir, "events")
        .where(col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.round(col("value") * 1e6).cast("long")).alias("v"))
    )
    rk = global_row_number(u, ["v", "user_id"], "i")
    t = rk.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sv"),
        F.sum(col("i") * col("v")).alias("siv"),
    )
    return t.select(
        "n",
        F.round(col("sv") / lit(1e6), 2).alias("total_revenue"),
        F.round(
            lit(2.0) * col("siv") / (col("n") * col("sv").cast("double"))
            - (col("n") + lit(1.0)) / col("n"),
            4,
        ).alias("gini"),
    )


def _quality_report_sql() -> str:
    m = ["COUNT(*) AS n"]
    for c in _QUALITY_COLS:
        m.append(f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nn_{c}")
        m.append(f"COUNT(DISTINCT {c}) AS nd_{c}")
    parts = [
        f"""SELECT '{c}' AS col_name, n AS n_rows, CAST(nn_{c} AS BIGINT) AS n_nulls,
       nd_{c} AS n_distinct,
       CAST(CASE WHEN nd_{c} = n THEN 1 ELSE 0 END AS BIGINT) AS is_unique FROM m"""
        for c in _QUALITY_COLS
    ]
    return (
        "WITH m AS (SELECT " + ", ".join(m) + " FROM orders)\n"
        + "\nUNION ALL\n".join(parts)
        + "\nORDER BY col_name"
    )


def _corr_matrix_sql() -> str:
    pairs = [
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_extendedprice", "l_discount"),
        ("l_extendedprice", "l_tax"),
    ]
    m = ["COUNT(*) AS n"] + [
        f"ROUND(corr({a}, {b}), 4) AS c_{a}__{b}" for a, b in pairs
    ]
    parts = [
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, n AS n_rows, c_{a}__{b} AS pearson FROM m"
        for a, b in pairs
    ]
    return (
        "WITH m AS (SELECT " + ", ".join(m) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(parts)
        + "\nORDER BY col_a, col_b"
    )


_JACKKNIFE_SQL = f"""
WITH x AS (
  SELECT CAST(ROUND(l_extendedprice * 1e6) AS BIGINT) AS vm,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS vd,
         {hash48_sql("CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)")}
           % {_JK_G} AS b
  FROM lineitem),
pb AS (SELECT b, CAST(SUM(vm) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
       FROM x GROUP BY 1),
tot AS (SELECT CAST(SUM(vm) AS BIGINT) AS st, CAST(COUNT(*) AS BIGINT) AS nt,
               SUM(vd * vd) AS sq FROM x),
ml AS (SELECT list(((t.st - s) / (t.nt - n)) / 1e6 ORDER BY b) AS ms,
              MAX(t.st) AS st, MAX(t.nt) AS nt, MAX(t.sq) AS sq
       FROM pb, tot t),
mb AS (SELECT ms, st, nt, sq,
              list_reduce(ms, (x, y) -> x + y) / {_JK_G} AS mbar FROM ml)
SELECT ROUND((st / nt) / 1e6, 4) AS mean_price,
       ROUND(sqrt({_JK_G - 1}.0 / {_JK_G} * list_reduce(
               list_transform(ms, x -> (x - mbar) * (x - mbar)),
               (x, y) -> x + y)), 4) AS se_jackknife,
       ROUND(sqrt(((nt * CAST(sq AS DOUBLE)
                    - CAST(st AS DOUBLE) / 1e6 * (CAST(st AS DOUBLE) / 1e6))
                   / (nt * (nt - 1.0))) / nt), 4) AS se_closed_form
FROM mb
"""


_AB_TEST_SQL = f"""
WITH base AS (
  SELECT {hash48_sql("CAST(user_id AS VARCHAR)")} % 2 AS grp,
         CAST(ROUND(value * 1e6) AS BIGINT) AS vm
  FROM events WHERE event_type = 'purchase'),
v AS (
  SELECT 'null' AS variant, grp, vm FROM base
  UNION ALL
  SELECT 'injected', grp,
         CASE WHEN grp = 1 THEN CAST(ROUND(vm * 1.2) AS BIGINT) ELSE vm END
  FROM base),
g AS (
  SELECT variant, grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(vm) AS BIGINT) AS s,
         SUM(CAST(vm AS DECIMAL(19,0)) * CAST(vm AS DECIMAL(19,0))) AS sq
  FROM v GROUP BY 1, 2),
w AS (
  SELECT variant,
         MAX(CASE WHEN grp = 0 THEN n END) AS n_a,
         MAX(CASE WHEN grp = 1 THEN n END) AS n_b,
         MAX(CASE WHEN grp = 0 THEN s END) AS s_a,
         MAX(CASE WHEN grp = 1 THEN s END) AS s_b,
         MAX(CASE WHEN grp = 0 THEN sq END) AS sq_a,
         MAX(CASE WHEN grp = 1 THEN sq END) AS sq_b
  FROM g GROUP BY 1),
m AS (
  SELECT variant, n_a, n_b, s_a / n_a AS ma, s_b / n_b AS mb,
         (n_a * CAST(sq_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))
           / (n_a * (n_a - 1.0)) AS va,
         (n_b * CAST(sq_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE))
           / (n_b * (n_b - 1.0)) AS vb
  FROM w)
SELECT variant, n_a, n_b,
       ROUND(ma / 1e6, 4) AS mean_a, ROUND(mb / 1e6, 4) AS mean_b,
       ROUND((mb - ma) / 1e6, 4) AS lift,
       ROUND((mb - ma) / sqrt(va / n_a + vb / n_b), 4) AS z_score,
       (ABS((mb - ma) / sqrt(va / n_a + vb / n_b)) > 1.96) AS significant
FROM m ORDER BY variant
"""


ORACLES: dict[str, str] = {
    "q129_quality_report": _quality_report_sql(),
    "q150_equidepth_histogram": """
WITH b AS (
  SELECT l_extendedprice,
         NTILE(8) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bucket
  FROM lineitem)
SELECT bucket, COUNT(*) AS cnt,
       ROUND(MIN(l_extendedprice), 2) AS lo,
       ROUND(MAX(l_extendedprice), 2) AS hi
FROM b GROUP BY bucket ORDER BY bucket
""",
    "q151_corr_matrix": _corr_matrix_sql(),
    "q156_interval_concurrency": """
WITH iv AS (
  SELECT event_type, epoch_us(ts) AS s,
         epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS e
  FROM events),
pts AS (
  SELECT event_type, s AS t, 1 AS delta FROM iv
  UNION ALL SELECT event_type, e, -1 FROM iv),
run AS (
  SELECT event_type, t,
         CAST(SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
  FROM pts),
peak AS (
  SELECT event_type, t, conc,
         MAX(conc) OVER (PARTITION BY event_type) AS mx
  FROM run)
SELECT event_type,
       CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals,
       MAX(conc) AS max_concurrency,
       MIN(CASE WHEN conc = mx THEN t END) AS first_peak_us
FROM peak GROUP BY event_type ORDER BY event_type
""",
    "q157_scd2_history": """
WITH h AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events WHERE user_id % 50 = 0),
ch AS (
  SELECT user_id, event_type, ts, event_id FROM h
  WHERE prev_type IS NULL OR prev_type <> event_type)
SELECT user_id,
       CAST(row_number() OVER w AS BIGINT) AS version,
       event_type,
       epoch_us(ts) AS valid_from_us,
       epoch_us(lead(ts) OVER w) AS valid_to_us,
       (lead(ts) OVER w IS NULL) AS is_current
FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version
""",
    "q168_active_users": """
WITH ud AS (
  SELECT DISTINCT CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
         user_id
  FROM events),
spine AS (SELECT DISTINCT day FROM ud),
contrib7 AS (
  SELECT t.d AS day, u.user_id
  FROM ud u, LATERAL (SELECT unnest(generate_series(u.day, u.day + 6)) AS d) t),
contrib30 AS (
  SELECT t.d AS day, u.user_id
  FROM ud u, LATERAL (SELECT unnest(generate_series(u.day, u.day + 29)) AS d) t),
wau AS (SELECT c.day, COUNT(DISTINCT c.user_id) AS wau
        FROM contrib7 c JOIN spine s ON s.day = c.day GROUP BY 1),
mau AS (SELECT c.day, COUNT(DISTINCT c.user_id) AS mau
        FROM contrib30 c JOIN spine s ON s.day = c.day GROUP BY 1),
dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY 1)
SELECT d.day, d.dau, w.wau, m.mau,
       ROUND(CAST(d.dau AS DOUBLE) / w.wau, 4) AS stickiness
FROM dau d JOIN wau w ON d.day = w.day JOIN mau m ON d.day = m.day
ORDER BY d.day
""",
    "q164_ohlc_bars": """
WITH e AS (
  SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS h, value,
         row_number() OVER (PARTITION BY event_type, time_bucket(INTERVAL 1 HOUR, ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, time_bucket(INTERVAL 1 HOUR, ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events)
SELECT event_type, epoch_us(h) AS h_us,
       COUNT(*) AS n,
       ROUND(MIN(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
       ROUND(MAX(value), 4) AS high,
       ROUND(MIN(value), 4) AS low,
       ROUND(MIN(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
       CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) AS vol_micro
FROM e GROUP BY 1, 2 ORDER BY 1, 2
""",
    "q172_jackknife_se": _JACKKNIFE_SQL,
    "q174_ab_test": _AB_TEST_SQL,
    "q175_association_rules": """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM b),
s1 AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS s FROM b GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS p1, c.l_partkey AS p2, CAST(COUNT(*) AS BIGINT) AS sup
  FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
                   AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
SELECT p1, p2, sup,
       ROUND(CAST(sup AS DOUBLE) / sa.s, 4) AS confidence,
       ROUND(CAST(sup AS DOUBLE) * n.n_orders / (sa.s * sb.s), 4) AS lift
FROM pairs JOIN s1 sa ON sa.l_partkey = p1 JOIN s1 sb ON sb.l_partkey = p2
CROSS JOIN n
ORDER BY lift DESC, p1, p2 LIMIT 10
""",
    "q176_decay_score": """
WITH mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events),
d AS (SELECT event_type,
        CAST(ROUND(value * exp(-((mx.m - epoch_us(ts)) / 86400000000.0)
                               * 0.0990210257942779) * 1e6) AS BIGINT) AS dv,
        CAST(ROUND(value * 1e6) AS BIGINT) AS vm
      FROM events, mx)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(vm) / 1e6, 2) AS raw_sum,
       ROUND(SUM(dv) / 1e6, 2) AS decayed_sum,
       ROUND(SUM(dv) / CAST(SUM(vm) AS DOUBLE), 4) AS retention_factor
FROM d GROUP BY 1 ORDER BY 1
""",
    "q177_gini": """
WITH u AS (SELECT user_id,
                  CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) AS v
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
rk AS (SELECT v, row_number() OVER (ORDER BY v, user_id) AS i FROM u),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv,
             CAST(SUM(i * v) AS BIGINT) AS siv FROM rk)
SELECT n, ROUND(sv / 1e6, 2) AS total_revenue,
       ROUND(2.0 * siv / (n * CAST(sv AS DOUBLE)) - (n + 1.0) / n, 4) AS gini
FROM t
""",
    "q170_temporal_join": """
WITH h AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events WHERE user_id % 50 = 0 AND event_type <> 'purchase'),
ch AS (
  SELECT user_id, event_type, ts, event_id FROM h
  WHERE prev_type IS NULL OR prev_type <> event_type),
scd AS (
  SELECT user_id, event_type AS state_type,
         epoch_us(ts) AS valid_from_us,
         epoch_us(lead(ts) OVER w) AS valid_to_us
  FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
p AS (
  SELECT user_id, epoch_us(ts) AS t_us,
         CAST(ROUND(value * 1e6) AS BIGINT) AS v_micro
  FROM events WHERE user_id % 50 = 0 AND event_type = 'purchase')
SELECT s.state_type,
       COUNT(*) AS n_purchases,
       COUNT(DISTINCT p.user_id) AS n_users,
       SUM(v_micro) / 1e6 AS revenue
FROM p JOIN scd s
  ON p.user_id = s.user_id
 AND p.t_us >= s.valid_from_us
 AND (s.valid_to_us IS NULL OR p.t_us < s.valid_to_us)
GROUP BY s.state_type ORDER BY s.state_type
""",
    "q160_attribution": """
WITH e AS (
  SELECT user_id, ts, event_id, event_type, value,
    last_value(CASE WHEN event_type IN ('click','view') THEN event_type END
               IGNORE NULLS) OVER w AS touch_type,
    last_value(CASE WHEN event_type IN ('click','view') THEN ts END
               IGNORE NULLS) OVER w AS touch_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT touch_type,
       COUNT(*) AS n_conversions,
       SUM(CAST(ROUND(value * 1e6) AS BIGINT)) / 1e6 AS attributed_value
FROM e
WHERE event_type = 'purchase' AND touch_type IS NOT NULL
  AND epoch_us(ts) - epoch_us(touch_ts) <= 604800000000
GROUP BY touch_type ORDER BY touch_type
""",
    "q138_mad_outliers": """
WITH med AS (
  SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
  FROM events GROUP BY 1),
mad AS (
  SELECT e.event_type, ROUND(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY 1),
s AS (SELECT med.event_type, med.med, mad.mad FROM med JOIN mad USING (event_type))
SELECT s.event_type, COUNT(*) AS n_events, s.med, s.mad,
       CAST(SUM(CASE WHEN abs(e.value - s.med) > 4.4478 * s.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN s USING (event_type)
GROUP BY s.event_type, s.med, s.mad
ORDER BY s.event_type
""",
    "q139_pagerank": f"""
WITH occ AS (SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h FROM events),
e0 AS (SELECT a.user_id AS u, b.user_id AS v FROM occ a JOIN occ b
       ON a.event_type = b.event_type AND a.h = b.h AND a.user_id < b.user_id
       GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_MIN_COOC}),
e AS (SELECT u AS s, v AS d FROM e0 UNION ALL SELECT v, u FROM e0),
verts AS (SELECT DISTINCT s AS x FROM e),
nn AS (SELECT COUNT(*) AS n FROM verts),
deg AS (SELECT s, COUNT(*) AS deg FROM e GROUP BY 1),
r0 AS (SELECT x, {_PR_MASS} // n AS r FROM verts CROSS JOIN nn),
c1 AS (SELECT e.d, SUM(r0.r // deg.deg) AS sc FROM e
       JOIN r0 ON e.s = r0.x JOIN deg ON e.s = deg.s GROUP BY 1),
r1 AS (SELECT v.x, ((3 * {_PR_MASS}) // (20 * nn.n)) + (17 * COALESCE(c1.sc, 0)) // 20 AS r
       FROM verts v CROSS JOIN nn LEFT JOIN c1 ON v.x = c1.d),
c2 AS (SELECT e.d, SUM(r1.r // deg.deg) AS sc FROM e
       JOIN r1 ON e.s = r1.x JOIN deg ON e.s = deg.s GROUP BY 1),
r2 AS (SELECT v.x, ((3 * {_PR_MASS}) // (20 * nn.n)) + (17 * COALESCE(c2.sc, 0)) // 20 AS r
       FROM verts v CROSS JOIN nn LEFT JOIN c2 ON v.x = c2.d)
SELECT x AS user_id, CAST(r AS BIGINT) AS rank_e12 FROM r2
ORDER BY rank_e12 DESC, user_id
""",
    "q134_trend_per_type": """
WITH d AS (SELECT event_type, epoch_us(ts) / 3600000000.0 AS x, value AS y FROM events)
SELECT event_type, COUNT(*) AS n,
       ROUND(regr_slope(y, x), 4) AS slope,
       ROUND(regr_intercept(y, x), 4) AS intercept,
       ROUND(regr_r2(y, x), 4) AS r2
FROM d GROUP BY 1 ORDER BY 1
""",
    "q133_triangle_count": f"""
WITH occ AS (SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h FROM events),
e AS (SELECT a.user_id AS u, b.user_id AS v FROM occ a JOIN occ b
      ON a.event_type = b.event_type AND a.h = b.h AND a.user_id < b.user_id
      GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_MIN_COOC}),
verts AS (SELECT u AS x FROM e UNION SELECT v FROM e),
tri AS (SELECT COUNT(*) AS n FROM e e1 JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
SELECT (SELECT COUNT(*) FROM verts) AS n_vertices,
       (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT n FROM tri) AS n_triangles
""",
    "q130_value_outliers": """
WITH s AS (SELECT event_type, ROUND(AVG(value), 6) AS mu,
                  ROUND(stddev_pop(value), 6) AS sd
           FROM events GROUP BY 1),
f AS (SELECT e.event_type, COUNT(*) AS n_events,
             CAST(SUM(CASE WHEN ABS(value - mu) / sd > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM events e JOIN s USING (event_type) GROUP BY 1)
SELECT s.event_type, f.n_events, s.mu, s.sd, f.n_outliers
FROM s JOIN f USING (event_type) ORDER BY 1
""",
    "q119_cohort_retention": """
WITH f AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY 1),
a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events)
SELECT f.cohort_week,
       CAST(FLOOR(datediff('day', f.cohort_week, a.week) / 7.0) AS INT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM a JOIN f ON a.user_id = f.user_id
GROUP BY 1, 2 ORDER BY 1, 2
""",
    "q118_event_transitions": """
WITH o AS (
  SELECT user_id, event_type AS to_event,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_event
  FROM events)
SELECT from_event, to_event, COUNT(*) AS cnt,
       COUNT(DISTINCT user_id) AS n_users
FROM o WHERE from_event IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
""",
    "q101_vector_hof_stats": """
WITH per AS (
  SELECT label,
         CAST(ROUND(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS DECIMAL(18,6)) AS norm,
         len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS n_pos,
         list_max(CAST(embedding AS DOUBLE[])) AS max_c,
         len(embedding) AS dim
  FROM embeddings)
SELECT label, COUNT(*) AS n_vec,
       ROUND(CAST(SUM(norm) / COUNT(*) AS DOUBLE), 4) AS avg_norm,
       CAST(SUM(CASE WHEN n_pos * 2 > dim THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_heavy,
       ROUND(MAX(max_c), 6) AS max_component
FROM per GROUP BY 1 ORDER BY 1
""",
    "q102_unpivot": """
SELECT l_returnflag, measure, COUNT(*) AS cnt, ROUND(SUM(val), 2) AS total
FROM (
  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem) long
GROUP BY 1, 2 ORDER BY 1, 2
""",
    "q103_boilerplate_scrub": r"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN removed > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(SUM(removed) AS BIGINT) AS chars_removed
FROM (
  SELECT source,
         len(text) - len(regexp_replace(text, '\b(a|the)\b', '', 'g')) AS removed
  FROM documents) scrubbed
GROUP BY 1 ORDER BY 1
""",
    "q80_argmax": """
SELECT o_orderstatus,
       arg_max(o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000000000 + o_orderkey) AS max_order,
       arg_min(o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000000000 + o_orderkey) AS min_order,
       ROUND(MAX(o_totalprice), 2) AS max_price
FROM orders GROUP BY 1 ORDER BY 1
""",
    "q83_stats_agg": """
SELECT l_returnflag, COUNT(*) AS cnt,
       ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
       ROUND(var_samp(l_quantity), 4) AS var_qty,
       ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
FROM lineitem GROUP BY 1 ORDER BY 1
""",
    "q70_resample_gapfill": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sv
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT MIN(date_trunc('hour', ts)) AS h_min,
         MAX(date_trunc('hour', ts)) AS h_max
  FROM events),
spine AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM events) t,
       bounds, UNNEST(generate_series(h_min, h_max, INTERVAL 1 HOUR)) AS g(h))
SELECT s.event_type, s.h,
       COALESCE(hourly.cnt, 0) AS cnt,
       LAST_VALUE(hourly.sv IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sv_locf
FROM spine s LEFT JOIN hourly ON s.event_type = hourly.event_type AND s.h = hourly.h
ORDER BY 1, 2
""",
    "q62_exists_subquery": """
SELECT o_orderpriority, COUNT(*) AS cnt
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.09)
GROUP BY 1 ORDER BY 1
""",
    "q63_not_exists_anti": """
SELECT o_orderstatus, COUNT(*) AS cnt
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1 ORDER BY 1
""",
    "q64_range_frame": """
SELECT user_id, event_id,
       CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) OVER (
         PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_1h
FROM events ORDER BY user_id, event_id
""",
    "q65_first_last_value": """
SELECT DISTINCT o_custkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice) OVER w AS last_price,
       COUNT(*) OVER w AS n_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey
""",
    "q66_percentiles": """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
       ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75,
       COUNT(*) AS cnt
FROM lineitem GROUP BY 1 ORDER BY 1
""",
    "q67_conditional_agg": """
SELECT o_orderstatus, COUNT(*) AS cnt,
       CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       ROUND(SUM(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 4) AS big_share
FROM orders GROUP BY 1 ORDER BY 1
""",
    "q68_string_agg": """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM region JOIN nation ON r_regionkey = n_regionkey
GROUP BY 1 ORDER BY 1
""",
    # Each event belongs to the two 1h windows starting at its 30-minute
    # bucket and 30 minutes earlier (len/slide = 2) — Spark's window()
    # alignment origin (epoch) and time_bucket agree for divisor intervals.
    "q21b_sliding_window": """
WITH x AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS w_start, event_type FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, event_type FROM events)
SELECT w_start, event_type, COUNT(*) AS cnt
FROM x GROUP BY 1, 2 ORDER BY 1, 2
""",
}

# Evaluate-once CTE pinning (see functions.materialize_ctes): the
# PageRank oracle re-inlined its out-degree edge CTE per iteration term.
from ..functions import materialize_ctes as _mat

ORACLES["q139_pagerank"] = _mat(ORACLES["q139_pagerank"])

QUERIES = {
    "q129_quality_report": q129_quality_report,
    "q130_value_outliers": q130_value_outliers,
    "q138_mad_outliers": q138_mad_outliers,
    "q139_pagerank": q139_pagerank,
    "q150_equidepth_histogram": q150_equidepth_histogram,
    "q151_corr_matrix": q151_corr_matrix,
    "q133_triangle_count": q133_triangle_count,
    "q134_trend_per_type": q134_trend_per_type,
    "q62_exists_subquery": q62_exists_subquery,
    "q63_not_exists_anti": q63_not_exists_anti,
    "q64_range_frame": q64_range_frame,
    "q65_first_last_value": q65_first_last_value,
    "q66_percentiles": q66_percentiles,
    "q67_conditional_agg": q67_conditional_agg,
    "q68_string_agg": q68_string_agg,
    "q21b_sliding_window": q21b_sliding_window,
    "q70_resample_gapfill": q70_resample_gapfill,
    "q80_argmax": q80_argmax,
    "q83_stats_agg": q83_stats_agg,
    "q101_vector_hof_stats": q101_vector_hof_stats,
    "q102_unpivot": q102_unpivot,
    "q103_boilerplate_scrub": q103_boilerplate_scrub,
    "q118_event_transitions": q118_event_transitions,
    "q119_cohort_retention": q119_cohort_retention,
    "q156_interval_concurrency": q156_interval_concurrency,
    "q157_scd2_history": q157_scd2_history,
    "q160_attribution": q160_attribution,
    "q164_ohlc_bars": q164_ohlc_bars,
    "q168_active_users": q168_active_users,
    "q170_temporal_join": q170_temporal_join,
    "q172_jackknife_se": q172_jackknife_se,
    "q174_ab_test": q174_ab_test,
    "q175_association_rules": q175_association_rules,
    "q176_decay_score": q176_decay_score,
    "q177_gini": q177_gini,
}
