"""Relational query surface (SURVEY.md §2 Part B, Q01–Q24).

Every builder is pure DataFrame API — no RDDs, no Python UDFs — so Catalyst
owns predicate pushdown, column pruning, join selection and AQE owns runtime
re-planning. Small dimension tables are explicitly ``broadcast()``-hinted
where a 100 TB fact side would otherwise shuffle.

Each query has a duckdb oracle in ``ORACLES`` with IDENTICAL column names and
types (bigint vs int casts are aligned explicitly — the driver hash-compares).
Aggregated floats are rounded per FIXTURES.md determinism rules.

Reference parity notes (christophertubbs/EventStream):
- q04 is the event-name router as a relational query
  (reference: event_stream/streams/bus.py:24-82, dict-lookup dispatch).
- q09 is the batch form of request/response correlation
  (reference: messages/base.py:593-609 response_to stamping).
- q21/q22 are the batch twins of the streaming window/dedup semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast, col, lit

from ..catalog import load


# --- scans -----------------------------------------------------------------

def q01_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan row count (A21/A22 analog: XLEN probe)."""
    return load(spark, sf_dir, "lineitem").agg(F.count("*").alias("cnt"))


def q02_scan_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("cnt"),
        F.sum("l_quantity").alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


def q03_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + filter; both predicates reach the parquet scan
    (verify: PushedFilters in .explain)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
            & col("l_discount").between(0.05, 0.07)
        )
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


# --- event routing (reference A4/A5) --------------------------------------

def q04_event_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy("event_type")
    )


# --- joins -----------------------------------------------------------------

def q05_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer ⋈ nation ⋈ region regional rollup.

    customer/nation/region are broadcast: at 100 TB the orders fact table
    must not shuffle for dimension joins.
    """
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        orders.join(broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
        .orderBy("r_name")
    )


def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders — left_anti join, the scalable form of
    NOT IN (no nulls in o_custkey, so semantics align)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count("*").alias("cnt"))
    )


def q07_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").where(col("l_quantity") > 45)
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .agg(F.count("*").alias("cnt"))
    )


def q08_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join on orderkey with a non-equi residual (theta) condition —
    stays a hash/SMJ join with a post-filter, never a cartesian."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    joined = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
    )
    return joined.agg(F.count("*").alias("cnt"))


def q09_request_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch request↔response correlation: first purchase within 1 hour
    after each click, per user (reference A8: response_to ↔ message_id
    pairing — a response answers promptly or lands in the DLQ, q45).

    Scale: the equi-key is (user_id, hour_bucket), not user_id alone — a
    click explodes to its own bucket and the next (any purchase within the
    1-hour horizon lands in exactly one of the two, so each qualifying pair
    matches exactly once), and the time-range check rides as a residual on
    the hash/SMJ join. Per-key fanout is bounded by a user's events per
    HOUR, not their whole history — the unbounded hot-key quadratic blowup
    of a bare user_id join can't occur."""
    ev = load(spark, sf_dir, "events")
    hour_bucket = F.floor(F.unix_timestamp(col("ts")) / 3600)
    clicks = (
        ev.where(col("event_type") == "click")
        .select(
            col("event_id"),
            col("user_id"),
            col("ts"),
            F.explode(F.array(hour_bucket, hour_bucket + 1)).alias("bucket"),
        )
    )
    purchases = ev.where(col("event_type") == "purchase").select(
        col("event_id").alias("p_event_id"),
        col("user_id").alias("p_user_id"),
        col("ts").alias("p_ts"),
        hour_bucket.alias("p_bucket"),
    )
    return (
        clicks.join(
            purchases,
            (clicks.user_id == purchases.p_user_id)
            & (col("bucket") == col("p_bucket"))
            & (purchases.p_ts > clicks.ts)
            & (purchases.p_ts <= clicks.ts + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("event_id")
        .agg(F.min("p_event_id").alias("response_id"))
        .orderBy("event_id")
    )


def q45_unanswered_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter view (reference A15/A16 inbox semantics, batch form):
    clicks with no purchase by the same user within 1 hour — a left_anti
    join whose equi-key (user_id) carries the non-equi time bound as a
    residual, so it plans as hash/SMJ, never a cartesian."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(col("event_type") == "purchase").select(
        col("user_id").alias("p_user_id"), col("ts").alias("p_ts")
    )
    dlq = clicks.join(
        purchases,
        (clicks.user_id == purchases.p_user_id)
        & (purchases.p_ts > clicks.ts)
        & (purchases.p_ts <= clicks.ts + F.expr("INTERVAL 1 HOUR")),
        "left_anti",
    )
    return dlq.select("event_id", "user_id").orderBy("event_id")


# --- aggregation -----------------------------------------------------------

def q10_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: hash aggregation with partial (map-side) combine."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q11_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_cust")
    )


def q12_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .orderBy(col("o_orderstatus").asc_nulls_first(), col("o_orderpriority").asc_nulls_first())
    )


def q12b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .orderBy(col("o_orderstatus").asc_nulls_first(), col("o_orderpriority").asc_nulls_first())
    )


def q12c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the two one-column sets — neither rollup nor
    cube expresses exactly this)."""
    return (
        load(spark, sf_dir, "orders")
        .groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy(col("o_orderstatus").asc_nulls_first(), col("o_orderpriority").asc_nulls_first())
    )


# --- window functions ------------------------------------------------------

def q13_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc(), col("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .where(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


def q14_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(w), 2).alias("running_value"),
        )
        .orderBy("user_id", "event_id")
    )


def q15_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N — planned as TakeOrderedAndProject (no full sort)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc(), col("o_orderkey"))
        .limit(10)
    )


# --- set operations --------------------------------------------------------

def q16_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_nationkey").withColumnRenamed(
        "c_nationkey", "nationkey"
    )
    s = load(spark, sf_dir, "supplier").select("s_nationkey").withColumnRenamed(
        "s_nationkey", "nationkey"
    )
    return c.intersect(s).orderBy("nationkey")


def q16b_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")


def q16c_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): per nation key, min(customer
    multiplicity, supplier multiplicity) copies survive — summarized as a
    count per key so the result is deterministic."""
    c = load(spark, sf_dir, "customer").select(col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(col("s_nationkey").alias("nationkey"))
    return (
        c.intersectAll(s)
        .groupBy("nationkey")
        .agg(F.count("*").alias("copies"))
        .orderBy("nationkey")
    )


def q16d_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): customer multiplicity minus
    supplier multiplicity per nation key, counted per key."""
    c = load(spark, sf_dir, "customer").select(col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(col("s_nationkey").alias("nationkey"))
    return (
        c.exceptAll(s)
        .groupBy("nationkey")
        .agg(F.count("*").alias("copies"))
        .orderBy("nationkey")
    )


# --- scalar function surface ----------------------------------------------

def q17_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .where(col("p_type").like("%BRASS%"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("cnt"))
        .orderBy("p_brand")
    )


def q18_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("long").alias("y"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("y")
    )


def q19_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(
            F.count("*").alias("cnt"),
            F.min(F.size("embedding").cast("long")).alias("min_dim"),
        )
        .orderBy("label")
    )


def q20_json_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-payload access: the reference's __extra_data dict becomes a JSON
    props column read via get_json_object (SURVEY §1.5)."""
    return (
        load(spark, sf_dir, "events")
        .select(F.get_json_object("props", "$.k").cast("long").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("cnt"))
        .orderBy("k")
    )


def q86_envelope_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read promotion (SURVEY §1.4→§1.5): the open props payload
    parsed ONCE with a declared schema via from_json (the registry path —
    never per-row inference), then aggregated as typed data. Complements
    q20's path-access form: from_json materializes the whole typed struct
    in one parse, which is the right shape when several fields are read."""
    ev = load(spark, sf_dir, "events")
    typed = ev.select(
        "event_type",
        F.from_json(col("props"), "k BIGINT").alias("p"),
    )
    return (
        typed.groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(col("p.k")).alias("sum_k"),
            F.round(F.avg(col("p.k")), 4).alias("avg_k"),
            F.max(col("p.k")).alias("max_k"),
        )
        .orderBy("event_type")
    )


def q113_nested_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive value inference over a nested payload (reference
    interpret_value recursion, event_stream/utilities/common.py:366-404):
    a nested JSON document with all-string leaves parses ONCE against the
    string-shadow schema and every leaf promotes by the lenient
    int/float/bool/null rules (codec.interpret_nested) — struct, array,
    and nested-struct-in-array levels all exercised — then aggregates as
    typed data. The payload is constructed from event columns so the
    duckdb oracle mirrors both the construction and the promotion rules.

    Scale: one from_json + transform folds per row, no shuffle beyond the
    final small aggregation; zero Python in the row path."""
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        LongType,
        StringType as _Str,
        StructField,
        StructType,
    )

    from ..codec import interpret_nested

    ev = load(spark, sf_dir, "events")
    flag = (
        F.when(col("user_id") % 5 == 0, "yes")
        .when(col("user_id") % 5 == 1, "no")
        .when(col("user_id") % 5 == 2, "1")
        .when(col("user_id") % 5 == 3, "0.2")
        .otherwise("none")
    )
    payload = F.format_string(
        '{"meta": {"id": "%s", "flag": "%s", "score": "%s"},'
        ' "tags": ["%s", "nan", "3.5e1"]}',
        col("event_id"),
        flag,
        F.format_string("%.2f", col("value")),
        col("user_id"),
    )
    schema = StructType(
        [
            StructField(
                "meta",
                StructType(
                    [
                        StructField("id", LongType()),
                        StructField("flag", BooleanType()),
                        StructField("score", DoubleType()),
                    ]
                ),
            ),
            StructField("tags", ArrayType(DoubleType())),
        ]
    )
    t = ev.select("event_type", interpret_nested(payload, schema).alias("p"))
    return (
        t.groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("p.meta.id").alias("sum_id"),
            # centi-units: fold-order-proof integer sum of the float leaf
            F.sum(F.round(col("p.meta.score") * 100).cast("long")).alias("score_c"),
            F.count(F.when(col("p.meta.flag"), 1)).alias("n_true"),
            F.count(F.when(~col("p.meta.flag"), 1)).alias("n_false"),
            F.count(F.when(col("p.meta.flag").isNull(), 1)).alias("n_null_flag"),
            F.sum(F.element_at(col("p.tags"), 1).cast("long")).alias("sum_tag0"),
            F.count(F.when(F.isnan(F.element_at(col("p.tags"), 2)), 1)).alias("n_nan"),
            F.max(F.element_at(col("p.tags"), 3)).alias("max_tag2"),
        )
        .orderBy("event_type")
    )


# --- time windows / dedup (batch twins of streaming semantics) -------------

def q21_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", col("ts")).alias("h"),
            col("event_type"),
        )
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("h", "event_type")
    )


def q22_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .dropDuplicates(["user_id", "event_type", "ts"])
        .agg(F.count("*").alias("cnt"))
    )


def q27_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: per-user deltas between consecutive event values
    and the time to the next event, one window spec for both directions."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(col("value") - F.lag("value").over(w), 2).alias("delta_prev"),
            # Exact integer microseconds: epoch-seconds casts disagree
            # between engines on fractional parts (truncate vs round).
            (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(col("ts"))).alias(
                "micros_to_next"
            ),
        )
        .orderBy("user_id", "event_id")
    )


def q28_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (adapted to fixture columns): segment-filtered
    customer ⋈ orders ⋈ lineitem, revenue rollup, deterministic top-10.
    Exercises the composite join→agg→TakeOrdered pipeline under one oracle."""
    cust = (
        load(spark, sf_dir, "customer")
        .where(col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load(spark, sf_dir, "orders").where(
        col("o_orderdate") < lit("1995-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        col("l_shipdate") > lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(col("l_extendedprice") * (1 - col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q49_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartile (NTILE) sizes and the max
    percent_rank per quartile within each order priority."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pr"),
        )
        .groupBy("o_orderpriority", "quartile")
        .agg(F.count("*").alias("n"), F.round(F.max("pr"), 6).alias("max_pr"))
        .orderBy("o_orderpriority", "quartile")
    )


_CORRELATED_SQL = (
    "SELECT o_orderpriority, COUNT(*) AS n_above FROM orders o"
    " WHERE o_totalprice > (SELECT AVG(i.o_totalprice) FROM orders i"
    " WHERE i.o_orderpriority = o.o_orderpriority)"
    " GROUP BY o_orderpriority ORDER BY o_orderpriority"
)


def q48_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL entry point: orders above
    their priority class's average price. Catalyst decorrelates this into
    an aggregate + join (no per-row re-execution) — the oracle runs the
    IDENTICAL SQL string in duckdb."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_CORRELATED_SQL)


_RECURSIVE_SQL = """
WITH RECURSIVE
u AS (SELECT DISTINCT user_id FROM events),
rev AS (
  SELECT user_id,
         CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) AS rev_micro
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
anc AS (
  SELECT user_id AS node, user_id AS anc FROM u
  UNION ALL
  SELECT node, CAST(FLOOR(anc / 2.0) AS BIGINT) FROM anc WHERE anc > 1
)
SELECT a.anc AS node,
       CAST(LENGTH(BIN(a.anc)) - 1 AS INT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_desc,
       ROUND(COALESCE(SUM(r.rev_micro), 0) / 1e6, 2) AS subtree_rev
FROM anc a LEFT JOIN rev r ON a.node = r.user_id
WHERE a.anc <= 15
GROUP BY a.anc
ORDER BY node
"""

# Closed-form Spark-side twin of _RECURSIVE_SQL (see q184's docstring):
# the binary hierarchy's ancestor chain is shiftright(id, i), emitted with
# the recursion's exact guard (i = 0, or the previous ancestor was > 1)
# and pre-filtered to the ≤ 15 report set inside the lambda. The duckdb
# oracle stays the genuine WITH RECURSIVE above.
_CLOSED_ROLLUP_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
rev AS (
  SELECT user_id,
         CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) AS rev_micro
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
anc AS (
  SELECT user_id AS node, a AS anc
  FROM u
  LATERAL VIEW explode(
    filter(
      transform(sequence(0, 63),
                i -> CASE WHEN i = 0 OR shiftright(user_id, i - 1) > 1
                          THEN shiftright(user_id, i) END),
      x -> x IS NOT NULL AND x <= 15)) AS a
)
SELECT a.anc AS node,
       CAST(LENGTH(BIN(a.anc)) - 1 AS INT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_desc,
       ROUND(COALESCE(SUM(r.rev_micro), 0) / 1e6, 2) AS subtree_rev
FROM anc a LEFT JOIN rev r ON a.node = r.user_id
GROUP BY a.anc
ORDER BY node
"""


def q184_recursive_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, new in Spark 4.x — SPARK-24497):
    hierarchical subtree rollup, the org-chart / bill-of-materials /
    category-tree pattern no finite self-join chain can express. Users
    form a deterministic binary hierarchy (parent = floor(id/2)); each
    user's ancestor chain is enumerated recursively and purchase revenue
    rolls up to every ancestor — reported for the top 4 levels. The
    IDENTICAL SQL string runs in both engines (this is also a
    SQL-passthrough entry: duckdb oracle ≡ spark.sql ≡ result).

    Scale: recursion depth is log₂(max id) (~30 levels at 10⁹ users),
    and each step is ONE narrow projection+filter over the previous
    frontier — the iterative-union plan Spark materializes per level,
    same cost class as q54b's driver-coordinated Lloyd rounds but fully
    inside one SQL statement. The ancestor table is |users|·depth rows;
    the rollup is one hash aggregate over it (revenue is micro-quantized
    integers, so partial order cannot change the sums).

    Round-13 replan (guide §8 — use what you know that the optimizer does
    not): the hierarchy is DETERMINISTIC (parent = floor(id/2)), so the
    ancestor chain has the closed form anc_i = shiftright(id, i) — the
    Spark side now enumerates it MAP-SIDE as one array explode (guarded
    to reproduce the recursion's emit rule exactly: emit id >> i for
    i = 0 or while id >> (i-1) > 1, so ids ≤ 1 contribute only their
    seed row, and the ≤ 15 report filter prunes inside the lambda).
    Iterated FLOOR(x/2.0) ≡ shiftright for |x| < 2^53 — the same bound
    under which the oracle's own float halving is exact. This replaces
    log₂(max id) sequential frontier materializations (35 Spark jobs at
    sf0.1: each UnionLoop level is a barrier) and the recursion-limit
    probe job with ONE pass; measured 1.03 → 0.65 s steady, 35 → 5 jobs.
    The duckdb oracle keeps the recursive SQL verbatim — the differential
    gate proves the closed form against the genuine recursion at two SFs
    (general recursive rollups without a closed parent form still need
    the WITH RECURSIVE plan; this operator's hierarchy is the documented
    deterministic one)."""
    ev = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events")
    return spark.sql(_CLOSED_ROLLUP_SQL)


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q47_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (PivotFirst): per-user event-type count matrix. The value list
    is explicit — at scale never let pivot() infer it (that is an extra
    distinct scan) — and the oracle is the equivalent conditional
    aggregation."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
        .na.fill(0, list(_EVENT_TYPES))
        .orderBy("user_id")
    )


def q46_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel on first-event times: users whose first view
    precedes their first click precedes their first purchase, all within 7
    days of the view — one hash aggregate, three conditional mins."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(col("event_type") == "view", col("ts"))).alias("v"),
        F.min(F.when(col("event_type") == "click", col("ts"))).alias("c"),
        F.min(F.when(col("event_type") == "purchase", col("ts"))).alias("p"),
    )
    converted = firsts.where(
        col("v").isNotNull()
        & col("c").isNotNull()
        & col("p").isNotNull()
        & (col("v") < col("c"))
        & (col("c") < col("p"))
        & (col("p") <= col("v") + F.expr("INTERVAL 7 DAYS"))
    )
    return converted.agg(F.count("*").alias("n_converted"))


def q26_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via the native session_window operator (30-min
    inactivity gap per user). The duckdb oracle is the gaps-and-islands
    formulation (lag + cumulative break-sum), which has identical semantics:
    a session breaks when the gap is >= the timeout. Streaming twin covered
    by streaming.windows.session_counts."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            col("sw.start").alias("session_start"),
            "cnt",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


# --- oracles ---------------------------------------------------------------

def q149_jsonl_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source with an EXPLICIT schema: events export to JSONL
    once (landing-zone style), then read back via spark.read.schema(...)
    .json — never schema inference, which would scan twice and let types
    drift per batch (the same discipline file_stream enforces for
    streaming sources). Timestamps travel as integer microseconds so the
    JSON hop is lossless and timezone-free.

    The aggregate equals the same rollup over the parquet original — the
    oracle proves the format hop preserved every row and value. Scale:
    JSONL is the interchange format crawl pipelines land in; the read is
    splittable per line, so the scan parallelizes like any text source
    (at 100 TB you convert to parquet once — this operator IS that
    conversion's read side)."""
    import os
    import tempfile

    tag = sf_dir.strip("/").replace("/", "_")
    d = os.path.join(tempfile.gettempdir(), f"es_jsonl_{tag}")
    marker = os.path.join(d, "_READY")
    if not os.path.exists(marker):
        ev = load(spark, sf_dir, "events").select(
            "event_id",
            F.unix_micros(col("ts")).alias("ts_us"),
            "event_type",
            "value",
        )
        ev.coalesce(4).write.mode("overwrite").json(d)
        open(marker, "w").close()
    back = spark.read.schema(
        "event_id long, ts_us long, event_type string, value double"
    ).json(d)
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("ts_us").alias("first_us"),
            F.max("ts_us").alias("last_us"),
        )
        .orderBy("event_type")
    )


ORACLES: dict[str, str] = {
    "q149_jsonl_source": """
SELECT event_type, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_value,
       MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us
FROM events GROUP BY 1 ORDER BY 1
""",
    "q01_scan_count": "SELECT COUNT(*) AS cnt FROM lineitem",
    "q02_scan_checksum": (
        "SELECT COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty,"
        " ROUND(SUM(l_extendedprice), 2) AS sum_price FROM lineitem"
    ),
    "q03_filter_project": (
        "SELECT l_orderkey, l_linenumber FROM lineitem"
        " WHERE l_shipdate >= TIMESTAMP '1995-01-01'"
        " AND l_discount BETWEEN 0.05 AND 0.07 ORDER BY 1, 2"
    ),
    "q04_event_routing": (
        "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1 ORDER BY 1"
    ),
    "q05_join_rollup": (
        "SELECT r_name, COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS sum_price"
        " FROM orders JOIN customer ON o_custkey = c_custkey"
        " JOIN nation ON c_nationkey = n_nationkey"
        " JOIN region ON n_regionkey = r_regionkey GROUP BY 1 ORDER BY 1"
    ),
    "q06_anti_join": (
        "SELECT COUNT(*) AS cnt FROM customer"
        " WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"
    ),
    "q07_semi_join": (
        "SELECT COUNT(*) AS cnt FROM part WHERE p_partkey IN"
        " (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)"
    ),
    "q08_range_join": (
        "SELECT COUNT(*) AS cnt FROM orders o JOIN lineitem l"
        " ON o.o_orderkey = l.l_orderkey AND l.l_shipdate > o.o_orderdate"
    ),
    "q09_request_response": (
        "SELECT e1.event_id AS event_id, MIN(e2.event_id) AS response_id"
        " FROM events e1 JOIN events e2"
        " ON e1.user_id = e2.user_id AND e2.ts > e1.ts"
        " AND e2.ts <= e1.ts + INTERVAL 1 HOUR"
        " AND e1.event_type = 'click' AND e2.event_type = 'purchase'"
        " GROUP BY 1 ORDER BY 1"
    ),
    "q10_pricing_summary": (
        "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,"
        " ROUND(SUM(l_extendedprice), 2) AS sum_base_price,"
        " ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,"
        " ROUND(AVG(l_quantity), 4) AS avg_qty, COUNT(*) AS count_order"
        " FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'"
        " GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    "q11_count_distinct": "SELECT COUNT(DISTINCT o_custkey) AS n_cust FROM orders",
    "q12_rollup": (
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt FROM orders"
        " GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"
        " ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3"
    ),
    "q12b_cube": (
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt FROM orders"
        " GROUP BY CUBE(o_orderstatus, o_orderpriority)"
        " ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3"
    ),
    "q12c_grouping_sets": (
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt FROM orders"
        " GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))"
        " ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3"
    ),
    "q45_unanswered_requests": (
        "SELECT event_id, user_id FROM events e1"
        " WHERE event_type = 'click' AND NOT EXISTS ("
        " SELECT 1 FROM events e2 WHERE e2.user_id = e1.user_id"
        " AND e2.event_type = 'purchase' AND e2.ts > e1.ts"
        " AND e2.ts <= e1.ts + INTERVAL 1 HOUR)"
        " ORDER BY event_id"
    ),
    "q13_topk_per_group": (
        "SELECT o_custkey, o_orderkey, rn FROM ("
        " SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER"
        " (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn"
        " FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn"
    ),
    "q14_running_sum": (
        "SELECT user_id, event_id, ROUND(SUM(value) OVER ("
        " PARTITION BY user_id ORDER BY ts, event_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value"
        " FROM events ORDER BY user_id, event_id"
    ),
    "q15_topn": (
        "SELECT o_orderkey, o_totalprice FROM orders"
        " ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
    "q16_intersect": (
        "SELECT c_nationkey AS nationkey FROM customer INTERSECT"
        " SELECT s_nationkey AS nationkey FROM supplier ORDER BY 1"
    ),
    "q16b_except": (
        "SELECT c_nationkey AS nationkey FROM customer EXCEPT"
        " SELECT s_nationkey AS nationkey FROM supplier ORDER BY 1"
    ),
    "q86_envelope_typed": """
SELECT event_type, COUNT(*) AS cnt,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       ROUND(AVG(CAST(json_extract(props, '$.k') AS BIGINT)), 4) AS avg_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY 1 ORDER BY 1
""",
    "q113_nested_inference": r"""
WITH j AS (
  SELECT event_type,
         printf('{"meta": {"id": "%s", "flag": "%s", "score": "%s"}, "tags": ["%s", "nan", "3.5e1"]}',
                CAST(event_id AS VARCHAR),
                CASE user_id % 5 WHEN 0 THEN 'yes' WHEN 1 THEN 'no' WHEN 2 THEN '1'
                                 WHEN 3 THEN '0.2' ELSE 'none' END,
                printf('%.2f', value),
                CAST(user_id AS VARCHAR)) AS payload
  FROM events),
x AS (
  SELECT event_type,
         json_extract_string(payload, '$.meta.id') AS id_s,
         json_extract_string(payload, '$.meta.flag') AS flag_s,
         json_extract_string(payload, '$.meta.score') AS score_s,
         json_extract_string(payload, '$.tags[0]') AS tag0_s,
         json_extract_string(payload, '$.tags[1]') AS tag1_s,
         json_extract_string(payload, '$.tags[2]') AS tag2_s
  FROM j),
p AS (
  SELECT event_type,
         CAST(id_s AS BIGINT) AS id,
         CASE
           WHEN regexp_matches(flag_s, '^[+-]?\d+$') THEN CAST(flag_s AS BIGINT) <> 0
           WHEN regexp_matches(flag_s, '^[+-]?(\d+\.\d*|\.\d+)$') THEN CAST(flag_s AS DOUBLE) > 0.3
           WHEN lower(flag_s) IN ('true','yes','on','y','t') THEN TRUE
           WHEN lower(flag_s) IN ('false','no','off','n','f') THEN FALSE
           ELSE NULL END AS flag,
         CAST(score_s AS DOUBLE) AS score,
         CAST(tag0_s AS DOUBLE) AS tag0,
         CAST(tag1_s AS DOUBLE) AS tag1,
         CAST(tag2_s AS DOUBLE) AS tag2
  FROM x)
SELECT event_type, COUNT(*) AS cnt,
       CAST(SUM(id) AS BIGINT) AS sum_id,
       CAST(SUM(CAST(ROUND(score * 100) AS BIGINT)) AS BIGINT) AS score_c,
       COUNT(CASE WHEN flag THEN 1 END) AS n_true,
       COUNT(CASE WHEN NOT flag THEN 1 END) AS n_false,
       COUNT(CASE WHEN flag IS NULL THEN 1 END) AS n_null_flag,
       CAST(SUM(CAST(tag0 AS BIGINT)) AS BIGINT) AS sum_tag0,
       COUNT(CASE WHEN isnan(tag1) THEN 1 END) AS n_nan,
       MAX(tag2) AS max_tag2
FROM p GROUP BY 1 ORDER BY 1
""",
    "q16c_intersect_all": """
SELECT nationkey, COUNT(*) AS copies FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT ALL
  SELECT s_nationkey AS nationkey FROM supplier)
GROUP BY 1 ORDER BY 1
""",
    "q16d_except_all": """
SELECT nationkey, COUNT(*) AS copies FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT ALL
  SELECT s_nationkey AS nationkey FROM supplier)
GROUP BY 1 ORDER BY 1
""",
    "q17_string_fns": (
        "SELECT p_brand, COUNT(*) AS cnt FROM part"
        " WHERE p_type LIKE '%BRASS%' GROUP BY 1 ORDER BY 1"
    ),
    "q18_date_fns": (
        "SELECT EXTRACT(YEAR FROM o_orderdate) AS y, COUNT(*) AS cnt"
        " FROM orders GROUP BY 1 ORDER BY 1"
    ),
    "q19_array_fns": (
        "SELECT label, COUNT(*) AS cnt, MIN(len(embedding)) AS min_dim"
        " FROM embeddings GROUP BY 1 ORDER BY 1"
    ),
    "q20_json_fns": (
        "SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,"
        " COUNT(*) AS cnt FROM events GROUP BY 1 ORDER BY 1"
    ),
    "q21_hourly_window": (
        "SELECT DATE_TRUNC('hour', ts) AS h, event_type, COUNT(*) AS cnt,"
        " ROUND(SUM(value), 2) AS sum_value FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    "q22_dedup_count": (
        "SELECT COUNT(*) AS cnt FROM"
        " (SELECT DISTINCT user_id, event_type, ts FROM events) t"
    ),
    "q27_lag_lead": (
        "SELECT user_id, event_id,"
        " ROUND(value - LAG(value) OVER w, 2) AS delta_prev,"
        " epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS micros_to_next"
        " FROM events"
        " WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        " ORDER BY user_id, event_id"
    ),
    "q28_shipping_priority": (
        "SELECT l_orderkey, o_orderdate,"
        " ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue"
        " FROM customer, orders, lineitem"
        " WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey"
        " AND l_orderkey = o_orderkey"
        " AND o_orderdate < TIMESTAMP '1995-03-15'"
        " AND l_shipdate > TIMESTAMP '1995-03-15'"
        " GROUP BY l_orderkey, o_orderdate"
        " ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"
    ),
    "q48_correlated_subquery": _CORRELATED_SQL,
    "q184_recursive_rollup": _RECURSIVE_SQL,
    "q49_distribution_windows": (
        "SELECT o_orderpriority, quartile, COUNT(*) AS n,"
        " ROUND(MAX(pr), 6) AS max_pr FROM ("
        " SELECT o_orderpriority,"
        " NTILE(4) OVER w AS quartile, PERCENT_RANK() OVER w AS pr"
        " FROM orders"
        " WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)) t"
        " GROUP BY o_orderpriority, quartile ORDER BY o_orderpriority, quartile"
    ),
    "q47_pivot": (
        "SELECT user_id,"
        + ", ".join(
            f" COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}"
            for t in _EVENT_TYPES
        )
        + " FROM events GROUP BY user_id ORDER BY user_id"
    ),
    "q46_funnel": (
        "SELECT COUNT(*) AS n_converted FROM ("
        " SELECT user_id,"
        " MIN(CASE WHEN event_type = 'view' THEN ts END) AS v,"
        " MIN(CASE WHEN event_type = 'click' THEN ts END) AS c,"
        " MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p"
        " FROM events GROUP BY user_id) t"
        " WHERE v IS NOT NULL AND c IS NOT NULL AND p IS NOT NULL"
        " AND v < c AND c < p AND p <= v + INTERVAL 7 DAY"
    ),
    "q26_sessionization": (
        "WITH o AS (SELECT user_id, event_id, ts, value,"
        " LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts"
        " FROM events),"
        " m AS (SELECT *, CASE WHEN pts IS NULL OR ts - pts >= INTERVAL 30 MINUTE"
        " THEN 1 ELSE 0 END AS brk FROM o),"
        " s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id"
        " ROWS UNBOUNDED PRECEDING) AS sid FROM m)"
        " SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS cnt,"
        " ROUND(SUM(value), 2) AS sum_value"
        " FROM s GROUP BY user_id, sid ORDER BY user_id, session_start"
    ),
}

QUERIES = {
    "q149_jsonl_source": q149_jsonl_source,
    "q01_scan_count": q01_scan_count,
    "q02_scan_checksum": q02_scan_checksum,
    "q03_filter_project": q03_filter_project,
    "q04_event_routing": q04_event_routing,
    "q05_join_rollup": q05_join_rollup,
    "q06_anti_join": q06_anti_join,
    "q07_semi_join": q07_semi_join,
    "q08_range_join": q08_range_join,
    "q09_request_response": q09_request_response,
    "q10_pricing_summary": q10_pricing_summary,
    "q11_count_distinct": q11_count_distinct,
    "q12_rollup": q12_rollup,
    "q12b_cube": q12b_cube,
    "q12c_grouping_sets": q12c_grouping_sets,
    "q45_unanswered_requests": q45_unanswered_requests,
    "q13_topk_per_group": q13_topk_per_group,
    "q14_running_sum": q14_running_sum,
    "q15_topn": q15_topn,
    "q16_intersect": q16_intersect,
    "q16c_intersect_all": q16c_intersect_all,
    "q16d_except_all": q16d_except_all,
    "q16b_except": q16b_except,
    "q17_string_fns": q17_string_fns,
    "q18_date_fns": q18_date_fns,
    "q19_array_fns": q19_array_fns,
    "q20_json_fns": q20_json_fns,
    "q86_envelope_typed": q86_envelope_typed,
    "q113_nested_inference": q113_nested_inference,
    "q21_hourly_window": q21_hourly_window,
    "q22_dedup_count": q22_dedup_count,
    "q26_sessionization": q26_sessionization,
    "q27_lag_lead": q27_lag_lead,
    "q28_shipping_priority": q28_shipping_priority,
    "q46_funnel": q46_funnel,
    "q47_pivot": q47_pivot,
    "q48_correlated_subquery": q48_correlated_subquery,
    "q184_recursive_rollup": q184_recursive_rollup,
    "q49_distribution_windows": q49_distribution_windows,
}
