"""Statistical / governance operators — the data-science pass a warehouse
team runs AFTER the relational surface is in place: k-anonymity audit
(q179), mutual information (q180), two-sample Kolmogorov-Smirnov (q181),
session path mining (q182), autocorrelation (q183), rolling median filter
(q185), INT8 quantization audit (q186), winsorized mean (q187), CUSUM
change-point (q188), conversion-lag cohorts (q189), CUPED variance
reduction (q191), chi-square keywords (q192), incremental rollup
maintenance (q193), the bucketed co-located join (q194), and water-filling
budget allocation (q196).

Same contract as the rest of the operator library: pure DataFrame builders
(Catalyst owns physics) with exactly-mirrored duckdb oracles. Floating-point
results are made partial-order-proof the established way — per-row terms
quantize to integer micro-units before any distributed sum, and final
ratios/roots are a single scalar expression evaluated identically by both
engines.

Reference parity note: the reference engine (christophertubbs/EventStream)
has no statistics surface — these are north-star extensions in the same
family as q174 (A/B z-test) / q172 (jackknife), rounding out the
hypothesis-testing, information-theory, and privacy-audit shapes.

Scale notes per operator live on the docstrings; the common discipline:
  - k-anonymity: one groupBy on the quasi-identifier + a 3-row threshold
    explode — shuffle bounded by |QI combinations|.
  - mutual information: the contingency table is |lang|x|source| cells; one
    groupBy builds it, everything after is dimension-table algebra.
  - KS: cumulative counts use the TWO-LEVEL running sum (data-independent
    value buckets + tiny offset window) so the CDF scan parallelizes; the
    max-gap reduction is exact integer arithmetic (|cum1*n2 - cum2*n1|),
    so no float comparison can flip the argmax across partitions.
  - session paths: one per-user window (lag), one count shuffle,
    WindowGroupLimit-class top-k.
  - ACF: the daily series is an aggregate (rows = timeline days), lag pairs
    come from an equi-join on date arithmetic — never a global-sort window.
"""

from __future__ import annotations

import os
import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import col, lit

from ..cache import persist_tracked
from ..catalog import load
from ..functions import hash48_sql

# --- q179: k-anonymity audit ------------------------------------------------

_KANON_THRESHOLDS = [2, 5, 10]


def q179_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer table: with quasi-identifier
    (nation, market segment, account-balance band), how many equivalence
    classes fall below k, and what fraction of rows is re-identifiable?
    The standard privacy gate before releasing a dataset (Sweeney '02) —
    a group of size < k means an attacker who knows the QI values pins a
    row to fewer than k candidates.

    Scale: one groupBy on the QI (hash-partitioned; |classes| bounded by
    the QI domain, not the row count) then a 3-row threshold explode over
    the class-size table. No joins, no windows."""
    g = (
        load(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(col("c_acctbal") / lit(1000.0)).cast("long").alias("bal_band"),
        )
        .agg(F.count("*").alias("sz"))
    )
    ks = g.select(
        F.explode(lit(_KANON_THRESHOLDS)).alias("k"), col("sz")
    )
    return (
        ks.groupBy("k")
        .agg(
            F.count("*").alias("n_groups"),
            F.sum(F.when(col("sz") < col("k"), 1).otherwise(0)).alias(
                "n_violating_groups"
            ),
            F.sum(F.when(col("sz") < col("k"), col("sz")).otherwise(0)).alias(
                "rows_at_risk"
            ),
            F.round(
                F.sum(F.when(col("sz") < col("k"), col("sz")).otherwise(0))
                * lit(100.0)
                / F.sum("sz"),
                4,
            ).alias("risk_pct"),
        )
        .orderBy("k")
    )


_K_ANONYMITY_SQL = """
WITH g AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         CAST(COUNT(*) AS BIGINT) AS sz
  FROM customer GROUP BY 1, 2, 3),
k AS (SELECT UNNEST([2, 5, 10]) AS k)
SELECT k.k AS k,
       COUNT(*) AS n_groups,
       CAST(SUM(CASE WHEN sz < k.k THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(SUM(CASE WHEN sz < k.k THEN sz ELSE 0 END) AS BIGINT)
         AS rows_at_risk,
       ROUND(SUM(CASE WHEN sz < k.k THEN sz ELSE 0 END) * 100.0 / SUM(sz), 4)
         AS risk_pct
FROM g CROSS JOIN k
GROUP BY 1 ORDER BY 1
"""


# --- q180: mutual information ------------------------------------------------


def q180_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between document language and source:
    I(lang; source) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))), plus the marginal
    entropies and the normalized MI (MI / √(H(x)H(y))) — the
    dependence-detection pass behind "is this source language-skewed?"
    corpus audits and feature-selection scans.

    Per-cell terms quantize to integer micro-nats before summation, so the
    distributed sums are partial-order-proof; the final normalization is
    one scalar expression over three integers.

    Scale: ONE groupBy((lang, source)) builds the contingency table —
    |cells| is bounded by the attribute domains, not the corpus. Marginals
    and totals re-aggregate the cell table (dimension-class, AQE
    broadcasts the join-backs). The corpus text is scanned once and only
    two small columns survive the scan (column pruning).
    100 TB caveat: per-cell products cxy·n must fit int64 — beyond ~3·10⁹
    rows swap the micro-nat quantization to DECIMAL(38,0).

    Round-12 replan: the marginals (cx, cy), the grand total n, and the
    cell count all derive from the bounded cell table, so they compute as
    window sums in ONE pass instead of three groupBy legs + four
    broadcast crossJoins (the original launched ~30 driver jobs — AQE
    materialized every broadcast subtree separately). Entropy terms sum
    over ONE representative row per marginal (row_number = 1), so every
    integer micro-nat term — per cell and per marginal — is the same
    expression over the same operands as before and the distributed sums
    stay partial-order-proof; results are bit-identical."""
    cells = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").alias("cxy"))
    )
    w_all = Window.partitionBy()
    t = cells.select(
        "cxy",
        F.sum("cxy").over(Window.partitionBy("lang")).alias("cx"),
        F.sum("cxy").over(Window.partitionBy("source")).alias("cy"),
        F.sum("cxy").over(w_all).alias("n"),
        F.row_number()
        .over(Window.partitionBy("lang").orderBy("source"))
        .alias("rl"),
        F.row_number()
        .over(Window.partitionBy("source").orderBy("lang"))
        .alias("rs"),
    )

    mi_term = F.round(
        (col("cxy").cast("double") / col("n"))
        * F.log(
            (col("cxy") * col("n")).cast("double") / (col("cx") * col("cy"))
        )
        * lit(1e6)
    ).cast("long")

    def _h_term(cnt: str) -> F.Column:
        return F.round(
            -(col(cnt).cast("double") / col("n"))
            * F.log(col(cnt).cast("double") / col("n"))
            * lit(1e6)
        ).cast("long")

    return (
        t.agg(
            F.sum("cxy").alias("n"),
            F.count(lit(1)).alias("n_cells"),
            F.sum(mi_term).alias("mi_micro"),
            F.sum(F.when(col("rl") == 1, _h_term("cx"))).alias("h_cx"),
            F.sum(F.when(col("rs") == 1, _h_term("cy"))).alias("h_cy"),
        )
        .select(
            col("n").alias("n_docs"),
            "n_cells",
            F.round(col("mi_micro") / lit(1e6), 6).alias("mi_nats"),
            F.round(col("h_cx") / lit(1e6), 6).alias("h_lang"),
            F.round(col("h_cy") / lit(1e6), 6).alias("h_source"),
            F.round(
                col("mi_micro").cast("double")
                / F.sqrt(col("h_cx").cast("double") * col("h_cy")),
                4,
            ).alias("nmi"),
        )
    )


_MUTUAL_INFO_SQL = """
WITH cells AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS cxy
  FROM documents GROUP BY 1, 2),
t AS (SELECT CAST(SUM(cxy) AS BIGINT) AS n, COUNT(*) AS n_cells FROM cells),
cl AS (SELECT lang, CAST(SUM(cxy) AS BIGINT) AS cx FROM cells GROUP BY 1),
cs AS (SELECT source, CAST(SUM(cxy) AS BIGINT) AS cy FROM cells GROUP BY 1),
mi AS (
  SELECT CAST(SUM(CAST(ROUND(
           (CAST(cxy AS DOUBLE) / n)
           * ln(CAST(cxy * n AS DOUBLE) / (cx * cy)) * 1e6
         ) AS BIGINT)) AS BIGINT) AS mi_micro
  FROM cells JOIN cl USING (lang) JOIN cs USING (source) CROSS JOIN t),
hl AS (
  SELECT CAST(SUM(CAST(ROUND(
           -(CAST(cx AS DOUBLE) / n) * ln(CAST(cx AS DOUBLE) / n) * 1e6
         ) AS BIGINT)) AS BIGINT) AS h_cx
  FROM cl CROSS JOIN t),
hs AS (
  SELECT CAST(SUM(CAST(ROUND(
           -(CAST(cy AS DOUBLE) / n) * ln(CAST(cy AS DOUBLE) / n) * 1e6
         ) AS BIGINT)) AS BIGINT) AS h_cy
  FROM cs CROSS JOIN t)
SELECT t.n AS n_docs, t.n_cells AS n_cells,
       ROUND(mi_micro / 1e6, 6) AS mi_nats,
       ROUND(h_cx / 1e6, 6) AS h_lang,
       ROUND(h_cy / 1e6, 6) AS h_source,
       ROUND(CAST(mi_micro AS DOUBLE) / sqrt(CAST(h_cx AS DOUBLE) * h_cy), 4)
         AS nmi
FROM t CROSS JOIN mi CROSS JOIN hl CROSS JOIN hs
"""


# --- q181: two-sample Kolmogorov-Smirnov -------------------------------------

_KS_BUCKET_W = 1 << 26  # 67.1M micro-units (~67 value units) per CDF bucket
_KS_CRIT_05 = 1.358  # c(alpha) at alpha = 0.05, large-sample approximation


def q181_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov: do purchase and click values come
    from the same distribution? D = max over x of |F₁(x) − F₂(x)| at the
    pooled distinct value points; the scaled statistic √(n₁n₂/(n₁+n₂))·D
    rejects at α=0.05 above 1.358 — the standard nonparametric drift gate
    (same family as q146's KL monitor, but a hypothesis TEST with a
    critical value, not a divergence score).

    Determinism: the max-gap reduction runs on |cum1·n2 − cum2·n1| in
    EXACT integers — no float comparison can flip the argmax across
    partitions; division and √ happen once, on the already-reduced scalar.

    Scale: values bucket by a data-independent width (2²⁶ micro-units) and
    the CDF running sum is TWO-LEVEL — local cumsum per bucket + a tiny
    exclusive-prefix offset window over the bucket summary (the
    sweep_concurrency / pack_shards pattern), so the scan parallelizes
    with the value range instead of serializing into one task.
    100 TB caveat: cum·n products need n₁·n₂ < 2⁶³ — beyond ~3·10⁹ rows
    per sample swap to DECIMAL(38,0)."""
    ev = load(spark, sf_dir, "events").where(
        col("event_type").isin("purchase", "click")
    )
    g = (
        ev.select(
            F.round(col("value") * lit(1e6)).cast("long").alias("vm"),
            F.when(col("event_type") == "purchase", 1).otherwise(0).alias("i1"),
            F.when(col("event_type") == "click", 1).otherwise(0).alias("i2"),
        )
        .groupBy("vm")
        .agg(F.sum("i1").alias("c1"), F.sum("i2").alias("c2"))
    )
    b = g.withColumn("_b", (col("vm") / lit(_KS_BUCKET_W)).cast("long"))
    w_local = (
        Window.partitionBy("_b")
        .orderBy("vm")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = b.withColumn("_l1", F.sum("c1").over(w_local)).withColumn(
        "_l2", F.sum("c2").over(w_local)
    )
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        b.groupBy("_b")
        .agg(F.sum("c1").alias("_b1"), F.sum("c2").alias("_b2"))
        .select(
            "_b",
            F.coalesce(F.sum("_b1").over(w_off), lit(0)).alias("_o1"),
            F.coalesce(F.sum("_b2").over(w_off), lit(0)).alias("_o2"),
        )
    )
    cum = local.join(offsets, "_b").select(
        (col("_l1") + col("_o1")).alias("cum1"),
        (col("_l2") + col("_o2")).alias("cum2"),
    )
    t = g.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    d = cum.crossJoin(F.broadcast(t)).agg(
        F.max(F.abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).alias(
            "di"
        )
    )
    ks_raw = (col("di").cast("double") / (col("n1") * col("n2"))) * F.sqrt(
        col("n1") * col("n2").cast("double") / (col("n1") + col("n2"))
    )
    return t.crossJoin(F.broadcast(d)).select(
        "n1",
        "n2",
        F.round(col("di").cast("double") / (col("n1") * col("n2")), 6).alias(
            "d_stat"
        ),
        F.round(ks_raw, 4).alias("ks_stat"),
        (ks_raw > lit(_KS_CRIT_05)).alias("reject_05"),
    )


_KS_TEST_SQL = """
WITH e AS (
  SELECT CAST(ROUND(value * 1e6) AS BIGINT) AS vm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS i1,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS i2
  FROM events WHERE event_type IN ('purchase', 'click')),
g AS (SELECT vm, CAST(SUM(i1) AS BIGINT) AS c1, CAST(SUM(i2) AS BIGINT) AS c2
      FROM e GROUP BY 1),
c AS (SELECT CAST(SUM(c1) OVER w AS BIGINT) AS cum1,
             CAST(SUM(c2) OVER w AS BIGINT) AS cum2
      FROM g WINDOW w AS (ORDER BY vm
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM g),
d AS (SELECT CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS BIGINT) AS di
      FROM c CROSS JOIN t)
SELECT n1, n2,
       ROUND(CAST(di AS DOUBLE) / (n1 * n2), 6) AS d_stat,
       ROUND((CAST(di AS DOUBLE) / (n1 * n2))
             * sqrt(n1 * CAST(n2 AS DOUBLE) / (n1 + n2)), 4) AS ks_stat,
       ((CAST(di AS DOUBLE) / (n1 * n2))
        * sqrt(n1 * CAST(n2 AS DOUBLE) / (n1 + n2)) > 1.358) AS reject_05
FROM t CROSS JOIN d
"""


# --- q182: session path mining -----------------------------------------------

_PATH_TOPK = 10


def q182_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event PATHS: the most frequent 3-step event-type sequences per
    user timeline (lag-2, lag-1, current) — the path-mining view behind
    "how do users reach purchase?" product analytics. Extends q118's
    single-step transition matrix to order-3 n-grams over the event
    stream.

    Scale: ONE per-user window (two lags in the same frame — one shuffle
    on user_id, same partitioning q118/q160 already use), one count
    shuffle bounded by |event_types|³, then a TakeOrdered-class top-k."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lag("event_type", 2).over(w).alias("p2"),
        F.lag("event_type", 1).over(w).alias("p1"),
    )
    return (
        e.where(col("p2").isNotNull())
        .select(
            F.concat_ws(">", col("p2"), col("p1"), col("event_type")).alias(
                "path"
            )
        )
        .groupBy("path")
        .agg(F.count("*").alias("cnt"))
        .orderBy(col("cnt").desc(), "path")
        .limit(_PATH_TOPK)
    )


_SESSION_PATHS_SQL = """
WITH e AS (
  SELECT lag(event_type, 2) OVER w AS p2,
         lag(event_type, 1) OVER w AS p1,
         event_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT p2 || '>' || p1 || '>' || event_type AS path,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM e WHERE p2 IS NOT NULL
GROUP BY 1 ORDER BY cnt DESC, path LIMIT 10
"""


# --- q183: autocorrelation ---------------------------------------------------

_ACF_MAX_LAG = 7


def q183_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily purchase-revenue series at lags 1–7:
    Pearson r between the series and its k-day shift — the seasonality /
    momentum diagnostic behind forecasting and anomaly baselines (a
    weekly cycle shows up as a lag-7 peak).

    Daily revenue quantizes to whole units (micro sums divided out once),
    and every co-moment is an exact integer sum, so the per-lag Pearson
    is one scalar expression over six integers — partial-order-proof.

    Scale: the series is an AGGREGATE (rows = timeline days — one groupBy
    shuffle over the events scan); lag pairs come from an equi-join on
    date arithmetic, never a global-sort window, so nothing serializes.
    100 TB caveat: co-moment products need (days · v²) < 2⁶³ — for
    daily revenue beyond ~10⁹ units, swap the moment sums to
    DECIMAL(38,0)."""
    ev = load(spark, sf_dir, "events").where(col("event_type") == "purchase")
    s = persist_tracked(
        ev.groupBy(F.date_trunc("day", col("ts")).cast("date").alias("d")).agg(
            F.round(
                F.sum(F.round(col("value") * lit(1e6)).cast("long")) / lit(1e6)
            )
            .cast("long")
            .alias("v")
        )
    )
    a = s.select(
        col("d"), col("v").alias("x"), F.explode(F.sequence(lit(1), lit(_ACF_MAX_LAG))).alias("k")
    )
    b = s.select(col("d").alias("bd"), col("v").alias("y"))
    j = a.join(b, F.date_add(col("d"), col("k")) == col("bd"))
    g = j.groupBy("k").agg(
        F.count("*").alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(col("x") * col("x")).alias("sxx"),
        F.sum(col("y") * col("y")).alias("syy"),
        F.sum(col("x") * col("y")).alias("sxy"),
    )
    num = col("n_pairs") * col("sxy") - col("sx") * col("sy")
    den = F.sqrt(
        (col("n_pairs") * col("sxx") - col("sx") * col("sx")).cast("double")
        * (col("n_pairs") * col("syy") - col("sy") * col("sy"))
    )
    return g.select(
        col("k").alias("lag"),
        "n_pairs",
        F.round(num.cast("double") / den, 4).alias("acf"),
    ).orderBy("lag")


_ACF_SQL = """
WITH s AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(ROUND(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) / 1e6) AS BIGINT)
           AS v
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
k AS (SELECT UNNEST(range(1, 8)) AS k),
j AS (
  SELECT k.k, a.v AS x, b.v AS y
  FROM s a CROSS JOIN k JOIN s b ON a.d + k.k * INTERVAL 1 DAY = b.d),
g AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM j GROUP BY 1)
SELECT k AS lag, n_pairs,
       ROUND(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                    * (n_pairs * syy - sy * sy)), 4) AS acf
FROM g ORDER BY lag
"""


# --- q185: rolling median ----------------------------------------------------

_ROLL_WINDOW = 7  # days


def q185_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day MEDIAN of daily revenue per event type — the robust
    smoothing baseline behind time-series anomaly detection (a median
    filter shrugs off single-day spikes that wreck a rolling mean), with
    a spike flag where the day exceeds 2x its trailing median.

    Spark's ``percentile`` as a WINDOW function is exactly duckdb's
    ``quantile_cont`` over the same ROWS frame (linear interpolation —
    the q66 parity), and the daily series is integer units, so the
    interpolated midpoints agree bit-for-bit.

    Scale: the windowed percentile buffers one FRAME (7 values) per row
    over series whose length is bounded by timeline days, partitioned by
    entity — the same discipline as q164's bars. The day rollup is the
    only full-data shuffle."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", col("ts")).alias("d"),
        )
        .agg(
            F.round(
                F.sum(F.round(col("value") * lit(1e6)).cast("long")) / lit(1e6)
            )
            .cast("long")
            .alias("v")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-(_ROLL_WINDOW - 1), 0)
    )
    med = F.expr("percentile(v, 0.5)").over(w)
    return s.select(
        "event_type",
        "d",
        "v",
        F.round(med, 2).alias("roll_med"),
        (col("v") > lit(2.0) * med).alias("spike"),
    ).orderBy("event_type", "d")


_ROLLING_MEDIAN_SQL = """
WITH s AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         CAST(ROUND(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) / 1e6) AS BIGINT)
           AS v
  FROM events GROUP BY 1, 2)
SELECT event_type, d, v,
       ROUND(quantile_cont(v, 0.5) OVER w, 2) AS roll_med,
       (v > 2.0 * quantile_cont(v, 0.5) OVER w) AS spike
FROM s
WINDOW w AS (PARTITION BY event_type ORDER BY d
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY event_type, d
"""


# --- q186: int8 embedding quantization audit ---------------------------------


def q186_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INT8 embedding quantization audit: symmetric absmax quantization
    per dimension (scale_d = max|x_d| / 127 — the standard scheme for
    4x-compressed vector indexes and int8 GEMM inference), reporting the
    reconstruction RMSE and the worst per-element error. The quantize /
    reconstruct / error chain runs in EXPLODED space — the audit never
    re-assembles vectors, so there is no per-vector state.

    Error terms quantize to integers before the distributed sums (err² in
    pico-units, |err| in nano-units), so the reduction is
    partial-order-proof; scales divide once per element from the same
    broadcast per-dim absmax both engines compute identically.

    Scale: one map-side posexplode (rows x 64, no shuffle), a 64-row dim
    aggregate, an AQE-broadcast join-back, and one global agg. The
    per-dim state is |dims| integers regardless of corpus size — the
    PQ-family discipline (q85) applied to flat quantization."""
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.posexplode(col("embedding")).alias("p", "xf"),
    ).select(
        "vec_id",
        (col("p") + 1).alias("dim"),
        col("xf").cast("double").alias("x"),
    )
    sc = e.groupBy("dim").agg(
        (F.greatest(F.max(F.abs(col("x"))), lit(1e-12)) / lit(127.0)).alias(
            "scale"
        )
    )
    qv = F.least(
        F.greatest(F.round(col("x") / col("scale")), lit(-127.0)),
        lit(127.0),
    )
    err = col("x") - qv * col("scale")
    terms = e.join(sc, "dim").select(
        "vec_id",
        "dim",
        F.round(err * err * lit(1e12)).cast("long").alias("e2_pico"),
        F.round(F.abs(err) * lit(1e9)).cast("long").alias("ea_nano"),
    )
    # n_vecs / dim are DERIVED from the data (distinct vec ids, max
    # subscript) — not a mirrored fixture literal, so a fixture-dimension
    # change surfaces as a real differential instead of silently agreeing.
    return terms.agg(
        F.count_distinct("vec_id").alias("n_vecs"),
        F.max("dim").cast("int").alias("dim"),
        F.round(
            F.sqrt(F.sum("e2_pico") / lit(1e12) / F.count("*")), 8
        ).alias("rmse"),
        F.round(F.max("ea_nano") / lit(1e9), 6).alias("max_abs_err"),
    )


_INT8_QUANT_SQL = """
WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
sc AS (
  SELECT dim, GREATEST(MAX(ABS(x)), 1e-12) / 127.0 AS scale
  FROM e GROUP BY 1),
terms AS (
  SELECT vec_id, dim,
         CAST(ROUND(
           (x - LEAST(GREATEST(ROUND(x / scale), -127.0), 127.0) * scale)
           * (x - LEAST(GREATEST(ROUND(x / scale), -127.0), 127.0) * scale)
           * 1e12) AS BIGINT) AS e2_pico,
         CAST(ROUND(ABS(
           x - LEAST(GREATEST(ROUND(x / scale), -127.0), 127.0) * scale)
           * 1e9) AS BIGINT) AS ea_nano
  FROM e JOIN sc USING (dim))
SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vecs,
       CAST(MAX(dim) AS INTEGER) AS dim,
       ROUND(sqrt(SUM(e2_pico) / 1e12 / COUNT(*)), 8) AS rmse,
       ROUND(MAX(ea_nano) / 1e9, 6) AS max_abs_err
FROM terms
"""


# --- q187: winsorized mean ---------------------------------------------------


def q187_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type: clip values into the exact
    [p05, p95] band, then average — the outlier-robust location estimate
    behind revenue/engagement dashboards that one whale would otherwise
    dominate. Clipped terms micro-quantize before the sum (exact
    integers), and the percentile cut points are the interpolated exact
    form both engines share (q66 parity), so every clip decision is
    identical.

    Scale: exact per-group percentiles buffer the group (q138's
    documented caveat — approx_percentile is the one-pass sketch swap at
    100 TB); everything else is one conditional aggregation after an
    AQE-broadcast join-back of the 5-row cut-point table."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    cuts = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clipped = F.least(F.greatest(col("value"), col("p05")), col("p95"))
    return (
        ev.join(cuts, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.round(col("value") * lit(1e6)).cast("long"))
                / lit(1e6)
                / F.count("*"),
                4,
            ).alias("raw_mean"),
            F.round(
                F.sum(F.round(clipped * lit(1e6)).cast("long"))
                / lit(1e6)
                / F.count("*"),
                4,
            ).alias("wins_mean"),
            F.sum(
                F.when(
                    (col("value") < col("p05")) | (col("value") > col("p95")),
                    1,
                ).otherwise(0)
            ).alias("n_clipped"),
        )
        .orderBy("event_type")
    )


_WINSORIZED_SQL = """
WITH cuts AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS p05,
         quantile_cont(value, 0.95) AS p95
  FROM events GROUP BY 1)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) / 1e6 / COUNT(*), 4)
         AS raw_mean,
       ROUND(SUM(CAST(ROUND(LEAST(GREATEST(value, p05), p95) * 1e6)
                      AS BIGINT)) / 1e6 / COUNT(*), 4) AS wins_mean,
       CAST(SUM(CASE WHEN value < p05 OR value > p95 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped
FROM events e JOIN cuts USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
"""


# --- q188: CUSUM change-point ------------------------------------------------


def q188_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: the day where the
    cumulative deviation of daily revenue from the type's mean peaks —
    the classical offline change-point estimate (Page '54; the argmax of
    |CUSUM| is the most likely level-shift location). All arithmetic is
    EXACT integers: the deviation term is scaled by n (n·v_i − S), so no
    per-row division ever happens and the running sum is
    partial-order-proof; the argmax tie-breaks toward the earliest day
    through an explicit rank.

    Scale: the series is the same day-rollup aggregate as q183/q185 —
    rows = timeline days per type; the CUSUM window partitions by entity.
    One full-data shuffle (the day rollup), then dimension-class work."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.groupBy("event_type", F.date_trunc("day", col("ts")).alias("d"))
        .agg(
            F.sum(F.round(col("value") * lit(1e6)).cast("long")).alias("vm")
        )
    )
    tot = s.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("vm").alias("stot")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        s.join(tot, "event_type")
        .withColumn(
            "cusum", F.sum(col("n") * col("vm") - col("stot")).over(w_cum)
        )
    )
    w_rank = Window.partitionBy("event_type").orderBy(
        F.abs(col("cusum")).desc(), col("d")
    )
    return (
        cum.withColumn("rn", F.row_number().over(w_rank))
        .where(col("rn") == 1)
        .select(
            "event_type",
            col("n").alias("n_days"),
            col("d").alias("cp_day"),
            F.round(F.abs(col("cusum")) / (col("n") * lit(1e6)), 2).alias(
                "max_abs_cusum"
            ),
            (col("cusum") > 0).alias("shift_down"),
        )
        .orderBy("event_type")
    )


_CUSUM_SQL = """
WITH s AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) AS vm
  FROM events GROUP BY 1, 2),
tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(vm) AS BIGINT) AS stot
        FROM s GROUP BY 1),
cum AS (
  SELECT s.event_type, s.d, t.n,
         CAST(SUM(t.n * s.vm - t.stot) OVER w AS BIGINT) AS cusum
  FROM s JOIN tot t USING (event_type)
  WINDOW w AS (PARTITION BY s.event_type ORDER BY s.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY ABS(cusum) DESC, d) AS rn
  FROM cum)
SELECT event_type, n AS n_days, d AS cp_day,
       ROUND(ABS(cusum) / (n * 1e6), 2) AS max_abs_cusum,
       (cusum > 0) AS shift_down
FROM r WHERE rn = 1 ORDER BY event_type
"""


# --- q189: conversion lag cohorts --------------------------------------------


def q189_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion funnel with TIME-TO-CONVERT: per signup
    week cohort, how many users converted and the median / p90 minutes
    from first signup to first subsequent purchase — the growth metric
    behind activation dashboards (q46's funnel counts; this adds the
    latency distribution).

    Lag minutes are exact integers (floored micros/60e6), and the
    percentiles are the interpolated exact form both engines share.

    Scale: two per-user min-aggregations (hash on user_id), one
    user-keyed equi-join with the signup-time residual, one cohort
    rollup. Exact per-cohort percentiles buffer the cohort's converts
    (q138's documented approx_percentile swap at 100 TB)."""
    ev = load(spark, sf_dir, "events")
    su = (
        ev.where(col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros(col("ts"))).alias("s_us"))
    )
    pu = ev.where(col("event_type") == "purchase").select(
        "user_id", F.unix_micros(col("ts")).alias("p_us")
    )
    conv = (
        su.join(pu, "user_id")
        .where(col("p_us") >= col("s_us"))
        .groupBy("user_id", "s_us")
        .agg(F.min("p_us").alias("fp_us"))
        .select(
            "user_id",
            "s_us",
            F.floor((col("fp_us") - col("s_us")) / lit(60_000_000)).alias(
                "lag_min"
            ),
        )
    )
    week = F.date_trunc("week", F.timestamp_micros(col("s_us"))).alias(
        "cohort_week"
    )
    base = su.select(week, "user_id")
    cstats = (
        conv.select(
            F.date_trunc("week", F.timestamp_micros(col("s_us"))).alias(
                "cohort_week"
            ),
            "lag_min",
        )
        .groupBy("cohort_week")
        .agg(
            F.count("*").alias("n_converted"),
            F.round(F.expr("percentile(lag_min, 0.5)"), 2).alias("med_minutes"),
            F.round(F.expr("percentile(lag_min, 0.9)"), 2).alias("p90_minutes"),
        )
    )
    return (
        base.groupBy("cohort_week")
        .agg(F.count("*").alias("n_signups"))
        .join(cstats, "cohort_week", "left")
        .select(
            "cohort_week",
            "n_signups",
            F.coalesce(col("n_converted"), lit(0)).alias("n_converted"),
            F.round(
                F.coalesce(col("n_converted"), lit(0)) * lit(100.0)
                / col("n_signups"),
                2,
            ).alias("conv_pct"),
            "med_minutes",
            "p90_minutes",
        )
        .orderBy("cohort_week")
    )


_CONVERSION_LAG_SQL = """
WITH su AS (
  SELECT user_id, MIN(epoch_us(ts)) AS s_us
  FROM events WHERE event_type = 'signup' GROUP BY 1),
pu AS (
  SELECT user_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'),
conv AS (
  SELECT su.user_id, su.s_us,
         CAST(FLOOR((MIN(p_us) - su.s_us) / 60000000) AS BIGINT) AS lag_min
  FROM su JOIN pu ON su.user_id = pu.user_id AND pu.p_us >= su.s_us
  GROUP BY su.user_id, su.s_us),
base AS (
  SELECT date_trunc('week', make_timestamp(s_us)) AS cohort_week,
         CAST(COUNT(*) AS BIGINT) AS n_signups
  FROM su GROUP BY 1),
cs AS (
  SELECT date_trunc('week', make_timestamp(s_us)) AS cohort_week,
         CAST(COUNT(*) AS BIGINT) AS n_converted,
         ROUND(quantile_cont(lag_min, 0.5), 2) AS med_minutes,
         ROUND(quantile_cont(lag_min, 0.9), 2) AS p90_minutes
  FROM conv GROUP BY 1)
SELECT b.cohort_week, b.n_signups,
       COALESCE(cs.n_converted, 0) AS n_converted,
       ROUND(COALESCE(cs.n_converted, 0) * 100.0 / b.n_signups, 2) AS conv_pct,
       cs.med_minutes, cs.p90_minutes
FROM base b LEFT JOIN cs USING (cohort_week)
ORDER BY cohort_week
"""


# --- q191: CUPED covariate adjustment ---------------------------------------


def q191_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the A/B test (Deng et al., WSDM'13):
    adjust each user's post-period purchase revenue by their PRE-period
    revenue (adj = post − θ·(pre − mean_pre), θ = cov(pre,post)/var(pre)
    pooled) — the standard experimentation trick that shrinks metric
    variance using pre-experiment behavior, tightening q174's z-test
    without touching the treatment effect. Reports per-variant raw vs
    adjusted means, the pooled θ, and the achieved variance reduction.

    The timeline midpoint splits pre/post (data-driven integer micros),
    per-user sums are whole units (exact integers), and every moment is
    an integer co-moment — θ and the variance ratio are single scalar
    expressions over six integers, the q134/q174 discipline. Per-user
    adjusted values re-quantize to milli-units before the second-pass
    sums. 100 TB caveat: unit-scale co-moments need n·Σx² < 2⁶³ —
    beyond ~10⁸ users swap the moment sums to DECIMAL(38,0).

    Scale: two shuffles on user_id (the per-user rollup), one tiny
    scalar broadcast between passes; variants never shuffle separately."""
    from ..functions import hash48

    ev = load(spark, sf_dir, "events").where(col("event_type") == "purchase")
    mid = ev.agg(
        ((F.min(F.unix_micros(col("ts"))) + F.max(F.unix_micros(col("ts")))) / 2)
        .cast("long")
        .alias("mid_us")
    )
    vm = F.round(col("value") * lit(1e6)).cast("long")
    per_user = (
        ev.crossJoin(F.broadcast(mid))
        .select(
            "user_id",
            F.when(F.unix_micros(col("ts")) < col("mid_us"), vm)
            .otherwise(0)
            .alias("pre_m"),
            F.when(F.unix_micros(col("ts")) >= col("mid_us"), vm)
            .otherwise(0)
            .alias("post_m"),
        )
        .groupBy("user_id")
        .agg(
            F.round(F.sum("pre_m") / lit(1e6)).cast("long").alias("x"),
            F.round(F.sum("post_m") / lit(1e6)).cast("long").alias("y"),
        )
    )
    u = persist_tracked(
        per_user.withColumn(
            "grp", hash48(col("user_id").cast("string")) % 2
        )
    )
    mom = u.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(col("x") * col("x")).alias("sxx"),
        F.sum(col("y") * col("y")).alias("syy"),
        F.sum(col("x") * col("y")).alias("sxy"),
    )
    theta = (
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
        / (col("n") * col("sxx") - col("sx") * col("sx"))
    )
    mean_x = col("sx").cast("double") / col("n")
    scal = mom.select(
        theta.alias("theta"),
        mean_x.alias("mx"),
        (
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
            / (col("n") * (col("n") - 1))
        ).alias("var_y"),
        col("n").alias("n_all"),
    )
    adj_milli = F.round(
        (col("y") - col("theta") * (col("x") - col("mx"))) * lit(1e3)
    ).cast("long")
    g = (
        u.crossJoin(F.broadcast(scal))
        .select("grp", "theta", "var_y", adj_milli.alias("am"), col("y"))
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("y") / F.count("*").cast("double"), 4).alias(
                "mean_post"
            ),
            F.round(F.sum("am") / lit(1e3) / F.count("*"), 4).alias("mean_adj"),
            F.round(F.max("theta"), 4).alias("theta"),
            F.max("var_y").alias("_vy"),
            # DECIMAL(38) keeps n·Σam² exact far past int64 (the duckdb
            # mirror uses HUGEINT; both reduce the same integer, so the
            # final double conversion rounds identically).
            F.sum(col("am").cast("decimal(20,0)") * col("am")).alias("_saa"),
            F.sum("am").alias("_sa"),
        )
    )
    var_adj = (
        (
            col("n").cast("decimal(38,0)") * col("_saa")
            - col("_sa").cast("decimal(38,0)") * col("_sa")
        ).cast("double")
        / (col("n") * (col("n") - 1))
        / lit(1e6)
    )
    return (
        g.select(
            "grp",
            "n",
            "mean_post",
            "mean_adj",
            "theta",
            F.round((lit(1.0) - var_adj / col("_vy")) * 100.0, 2).alias(
                "var_reduction_pct"
            ),
        )
        .orderBy("grp")
    )


_CUPED_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t_us,
         CAST(ROUND(value * 1e6) AS BIGINT) AS vm
  FROM events WHERE event_type = 'purchase'),
mid AS (SELECT CAST((MIN(t_us) + MAX(t_us)) / 2 AS BIGINT) AS mid_us FROM ev),
u0 AS (
  SELECT user_id,
         CAST(ROUND(SUM(CASE WHEN t_us < mid_us THEN vm ELSE 0 END) / 1e6)
              AS BIGINT) AS x,
         CAST(ROUND(SUM(CASE WHEN t_us >= mid_us THEN vm ELSE 0 END) / 1e6)
              AS BIGINT) AS y
  FROM ev CROSS JOIN mid GROUP BY 1),
u AS (SELECT *, {hash48_sql("CAST(user_id AS VARCHAR)")} % 2 AS grp FROM u0),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM u),
scal AS (
  SELECT CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) AS theta,
         CAST(sx AS DOUBLE) / n AS mx,
         CAST(n * syy - sy * sy AS DOUBLE) / (n * (n - 1)) AS var_y
  FROM mom),
a AS (
  SELECT grp, theta, var_y, y,
         CAST(ROUND((y - theta * (x - mx)) * 1e3) AS BIGINT) AS am
  FROM u CROSS JOIN scal),
g AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(SUM(y) / CAST(COUNT(*) AS DOUBLE), 4) AS mean_post,
         ROUND(SUM(am) / 1e3 / COUNT(*), 4) AS mean_adj,
         ROUND(MAX(theta), 4) AS theta,
         MAX(var_y) AS vy,
         SUM(CAST(am AS HUGEINT) * am) AS saa,
         CAST(SUM(am) AS BIGINT) AS sa
  FROM a GROUP BY 1)
SELECT grp, n, mean_post, mean_adj, theta,
       ROUND((1.0 - (CAST(CAST(n AS HUGEINT) * saa
                          - CAST(sa AS HUGEINT) * sa AS DOUBLE)
                     / (n * (n - 1)) / 1e6)
              / vy) * 100.0, 2) AS var_reduction_pct
FROM g ORDER BY grp
"""


# --- q192: chi-square keyword extraction -------------------------------------

_CHI2_MIN_COUNT = 5
_CHI2_TOPK = 5


def q192_chi2_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic keywords per source by chi-square association: for
    each (source, term), test token occurrence against the rest of the
    corpus via the 2×2 chi² statistic and keep the top-5 over-represented
    terms — the corpus-slicing diagnostic behind "what is this source
    about?" audits and stop-list curation (same contingency machinery as
    q180, pointed at vocabulary instead of labels).

    All four cell counts are exact integers; the chi² score is one scalar
    expression per (source, term) evaluated identically in both engines
    (doubles only in the final expression — no distributed float sums).

    Scale: one (source, term) count shuffle bounded by per-source
    vocabulary, term totals re-aggregate that table, the source/grand
    totals are dimension-class broadcasts, and the top-k is a
    WindowGroupLimit. The corpus text is scanned once."""
    from ..functions import tokens

    docs = load(spark, sf_dir, "documents")
    st = persist_tracked(
        docs.select("source", F.explode(tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("a"))
    )
    src_tot = st.groupBy("source").agg(F.sum("a").alias("s_tot"))
    term_tot = st.groupBy("term").agg(F.sum("a").alias("t_tot"))
    grand = st.agg(F.sum("a").alias("n_tot"))
    j = (
        st.where(col("a") >= _CHI2_MIN_COUNT)
        .join(src_tot, "source")
        .join(term_tot, "term")
        .crossJoin(F.broadcast(grand))
    )
    a = col("a").cast("double")
    b = (col("s_tot") - col("a")).cast("double")
    c = (col("t_tot") - col("a")).cast("double")
    d = (col("n_tot") - col("s_tot") - col("t_tot") + col("a")).cast("double")
    n = col("n_tot").cast("double")
    chi2 = (
        n
        * (a * d - b * c)
        * (a * d - b * c)
        / ((a + b) * (c + d) * (a + c) * (b + d))
    )
    scored = j.where(a * d > b * c).select(
        "source", "term", col("a").alias("cnt"), F.round(chi2, 4).alias("chi2")
    )
    w = Window.partitionBy("source").orderBy(
        col("chi2").desc(), col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(col("rank") <= _CHI2_TOPK)
        .select("source", "rank", "term", "cnt", "chi2")
        .orderBy("source", "rank")
    )


def _chi2_sql() -> str:
    from ..functions import tokens_sql

    return f"""
WITH tok AS (
  SELECT source, unnest({tokens_sql("text")}) AS term FROM documents),
st AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS a FROM tok GROUP BY 1, 2),
src AS (SELECT source, CAST(SUM(a) AS BIGINT) AS s_tot FROM st GROUP BY 1),
tt AS (SELECT term, CAST(SUM(a) AS BIGINT) AS t_tot FROM st GROUP BY 1),
g AS (SELECT CAST(SUM(a) AS BIGINT) AS n_tot FROM st),
sc AS (
  SELECT st.source, st.term, st.a AS cnt,
         ROUND(CAST(n_tot AS DOUBLE)
               * (CAST(st.a AS DOUBLE) * (n_tot - s_tot - t_tot + st.a)
                  - CAST(s_tot - st.a AS DOUBLE) * (t_tot - st.a))
               * (CAST(st.a AS DOUBLE) * (n_tot - s_tot - t_tot + st.a)
                  - CAST(s_tot - st.a AS DOUBLE) * (t_tot - st.a))
               / (CAST(s_tot AS DOUBLE)
                  * (CAST(n_tot AS DOUBLE) - s_tot)
                  * t_tot
                  * (CAST(n_tot AS DOUBLE) - t_tot)), 4) AS chi2
  FROM st JOIN src USING (source) JOIN tt USING (term) CROSS JOIN g
  WHERE st.a >= {_CHI2_MIN_COUNT}
    AND CAST(st.a AS DOUBLE) * (n_tot - s_tot - t_tot + st.a)
        > CAST(s_tot - st.a AS DOUBLE) * (t_tot - st.a)),
r AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY chi2 DESC, term) AS rank
  FROM sc)
SELECT source, rank, term, cnt, chi2
FROM r WHERE rank <= {_CHI2_TOPK}
ORDER BY source, rank
"""


# --- q193: incremental rollup maintenance ------------------------------------

_LATE_MOD = 37  # event_id % 37 == 0 simulates the late-arriving slice


def q193_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a daily
    (day, event_type) rollup refreshed by MERGING a late-arriving delta
    instead of recomputing — base groups the delta does not touch pass
    through byte-identical, touched groups combine by coalesced addition
    (counts and micro-unit sums are associative partials, the property
    that makes the rollup incrementally maintainable at all). The oracle
    is the FULL recompute over base ∪ delta, so the gate proves
    merge ≡ recompute.

    Scale: this is how a 100 TB daily rollup absorbs a late partition —
    per-refresh cost is O(|delta| + |touched groups|), never the standing
    fact table. The full-outer merge joins two aggregate tables
    (group-cardinality-sized, AQE-broadcastable when the delta is small);
    the base fact scan happens once to build the standing rollup, exactly
    as the materialized view it models."""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("day", col("ts")).alias("d"),
        "event_type",
        F.round(col("value") * lit(1e6)).cast("long").alias("vm"),
        (col("event_id") % _LATE_MOD == 0).alias("late"),
    )

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("d", "event_type").agg(
            F.count("*").alias("cnt"), F.sum("vm").alias("svm")
        )

    base = rollup(ev.where(~col("late")))
    delta = rollup(ev.where(col("late")))
    b = base.select("d", "event_type", col("cnt").alias("bc"), col("svm").alias("bs"))
    dl = delta.select("d", "event_type", col("cnt").alias("dc"), col("svm").alias("ds"))
    merged = b.join(dl, ["d", "event_type"], "full_outer").select(
        "d",
        "event_type",
        (F.coalesce(col("bc"), lit(0)) + F.coalesce(col("dc"), lit(0))).alias(
            "cnt"
        ),
        F.round(
            (F.coalesce(col("bs"), lit(0)) + F.coalesce(col("ds"), lit(0)))
            / lit(1e6),
            2,
        ).alias("revenue"),
    )
    return merged.orderBy("d", "event_type")


_INCR_ROLLUP_SQL = """
SELECT date_trunc('day', ts) AS d, event_type,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) / 1e6, 2) AS revenue
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- q194: bucketed co-located join ------------------------------------------

_BUCKETS = 16
_BUCKET_TARGET_BYTES = 32 << 20  # ~32 MB of source parquet per bucket


def _bucket_count(sf_dir: str, table: str) -> int:
    """Size the bucket count from the big side's on-disk bytes: one bucket
    per ~32 MB of source parquet, floor 16, capped at 1024, rounded up to a
    power of two (so a later 2x table can still co-join via
    coalesceBucketsInJoin). A FIXED count is the scale trap the 100x smoke
    exposed: 16 buckets cap the join read at 16 tasks forever, so the
    bucketed plan that exists to win at scale loses exactly there."""
    p = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(p):
        total = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p)
            for f in fs
        )
    else:
        total = os.path.getsize(p) if os.path.exists(p) else 0
    n = _BUCKETS
    while n < 1024 and total > n * _BUCKET_TARGET_BYTES:
        n *= 2
    return n


def q194_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact⋈dim join via BUCKETED tables: orders and
    customer are written bucketed (+sorted) on the join key, then joined
    and rolled up per market segment — the join reads co-located buckets
    and plans with ZERO exchanges before the SortMergeJoin (plan-pinned
    in tests/test_plans.py). This is the write-once/join-forever layout
    that removes the dominant shuffle of repeated big joins at 100 TB
    (sources/bucketed.py documents bucket-count sizing); like q159, the
    one-time layout write is deliberately part of the measured query.

    Oracle: the plain join SQL — layout must never change results."""
    from ..sources.bucketed import read_bucketed, write_bucketed

    import shutil

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    # Table names carry BOTH the sf_dir and the Spark applicationId: two
    # suites running concurrently on the same sf_dir (each its own session)
    # get disjoint table paths instead of racing on one DROP/rmtree/write
    # cycle (an observed failure mode). Within one session the name is
    # stable, so re-runs still hit the drop-and-rewrite path below.
    app = "".join(c if c.isalnum() else "_" for c in spark.sparkContext.applicationId)
    sftag = "".join(c if c.isalnum() else "_" for c in sf_dir)
    tag = sftag + "_" + app
    to, tc = f"t_orders_bk{tag}", f"t_cust_bk{tag}"
    # A fresh session can find the managed location on disk without the
    # table in its catalog (saveAsTable then refuses the name) — drop both.
    # Also age out PRIOR sessions' tables for this sf_dir (their app id
    # differs, so nothing else ever drops them and warehouse data would
    # accumulate unboundedly across runs). Only dirs untouched for >1h are
    # removed: a LIVE concurrent suite's tables are seconds old (q194
    # writes then immediately joins), so the age guard keeps the
    # per-app-id isolation the names were introduced for.
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    if os.path.isdir(wh):
        import time

        cutoff = time.time() - 3600
        # Only names matching the exact sanitized shape we generate are
        # touched (a stray dir with non-identifier chars would otherwise
        # break the DROP parse), and cleanup must never fail the query.
        ident = re.compile(r"^[a-z0-9_]+$")
        for d in os.listdir(wh):
            for pref in (f"t_orders_bk{sftag}_", f"t_cust_bk{sftag}_"):
                p = os.path.join(wh, d)
                try:
                    stale = (
                        d.startswith(pref)
                        and d != pref + app
                        and ident.match(d)
                        and os.path.getmtime(p) < cutoff
                    )
                except OSError:
                    stale = False  # pruned by a concurrent session already
                if stale:
                    try:
                        spark.sql(f"DROP TABLE IF EXISTS `{d}`")
                        shutil.rmtree(p, ignore_errors=True)
                    except Exception:
                        pass  # stale-table GC is best-effort by design
    for t in (to, tc):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    nb = _bucket_count(sf_dir, "orders")
    write_bucketed(orders.select("o_custkey", "o_totalprice"), to, "o_custkey", nb)
    write_bucketed(cust.select("c_custkey", "c_mktsegment"), tc, "c_custkey", nb)
    ob, cb = read_bucketed(spark, to), read_bucketed(spark, tc)
    return (
        ob.join(cb, ob.o_custkey == cb.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.round(col("o_totalprice") * 100).cast("long")) / lit(100),
                2,
            ).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


_BUCKETED_JOIN_SQL = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100, 2)
         AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


# --- q196: water-filling budget allocation -----------------------------------

_WF_BUDGET_PCT = 60  # allocate 60% of the corpus's tokens


def q196_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocation across sources by WATER-FILLING: give every
    source an equal share λ of the training-token budget, capped at what
    the source actually has — the standard fair-allocation rule behind
    corpus mixing when small sources must not be over-asked (max-min
    fairness; the same algorithm as link-capacity fair queuing). A source
    is capped iff filling every source up to its capacity level fits the
    budget (prefix condition over the capacity-sorted list); survivors
    split the remainder evenly, with the integer remainder going to the
    alphabetically-first uncapped sources so the allocation is exact and
    deterministic.

    Everything is integer arithmetic over the per-source capacity table —
    the windows run over |sources| rows (a dimension, not the corpus; the
    corpus is touched once for the token counts).

    Scale: one token-count shuffle bounded by |sources|; the water-level
    search is a prefix-sum window over the tiny sorted capacity table."""
    from ..functions import tokens

    docs = load(spark, sf_dir, "documents")
    caps = docs.groupBy("source").agg(
        F.sum(F.size(tokens("text"))).alias("cap")
    )
    tot = caps.agg(
        F.sum("cap").alias("total"), F.count("*").alias("n_src")
    )
    # integer division end-to-end: duckdb CAST(double) rounds where Spark
    # truncates, so no double may touch the budget arithmetic.
    budget = F.expr(f"total * {_WF_BUDGET_PCT} div 100")
    w = Window.orderBy("cap", "source")
    c = (
        caps.crossJoin(F.broadcast(tot.select(budget.alias("b"), "n_src")))
        .withColumn("i", F.row_number().over(w))
        .withColumn(
            "prefix", F.coalesce(F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0))
        )
        .withColumn(
            "capped",
            col("prefix") + col("cap") * (col("n_src") - col("i") + 1)
            <= col("b"),
        )
    )
    m = c.agg(
        F.sum(F.when(col("capped"), 1).otherwise(0)).alias("m"),
        F.sum(F.when(col("capped"), col("cap")).otherwise(0)).alias("filled"),
    )
    j = c.crossJoin(F.broadcast(m)).withColumn(
        "lam",
        F.when(
            col("n_src") > col("m"),
            F.expr("(b - filled) div (n_src - m)"),
        ).otherwise(lit(0)),
    ).withColumn(
        "rem",
        F.when(
            col("n_src") > col("m"),
            (col("b") - col("filled")) % (col("n_src") - col("m")),
        ).otherwise(lit(0)),
    )
    wu = Window.orderBy("source")
    uncapped_rank = F.sum(F.when(~col("capped"), 1).otherwise(0)).over(
        wu.rowsBetween(Window.unboundedPreceding, 0)
    )
    alloc = F.when(col("capped"), col("cap")).otherwise(
        col("lam")
        + F.when(uncapped_rank <= col("rem"), 1).otherwise(0)
    )
    return (
        j.select(
            "source",
            col("cap").alias("capacity"),
            alloc.cast("long").alias("allocated"),
            col("capped").alias("at_capacity"),
        )
        .orderBy("source")
    )


def _waterfill_sql() -> str:
    from ..functions import tokens_sql

    return f"""
WITH caps AS (
  SELECT source, CAST(SUM(len({tokens_sql("text")})) AS BIGINT) AS cap
  FROM documents GROUP BY 1),
tot AS (SELECT CAST(SUM(cap) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_src FROM caps),
c AS (
  SELECT caps.source, caps.cap,
         CAST(total * {_WF_BUDGET_PCT} // 100 AS BIGINT) AS b, n_src,
         CAST(row_number() OVER w AS BIGINT) AS i,
         CAST(COALESCE(SUM(cap) OVER (ORDER BY cap, source
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS prefix
  FROM caps CROSS JOIN tot
  WINDOW w AS (ORDER BY cap, source)),
cc AS (
  SELECT *, (prefix + cap * (n_src - i + 1) <= b) AS capped FROM c),
m AS (
  SELECT CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS m,
         CAST(SUM(CASE WHEN capped THEN cap ELSE 0 END) AS BIGINT) AS filled
  FROM cc),
j AS (
  SELECT cc.*,
         CASE WHEN n_src > m.m
              THEN CAST((b - filled) // (n_src - m.m) AS BIGINT)
              ELSE 0 END AS lam,
         CASE WHEN n_src > m.m
              THEN (b - filled) % (n_src - m.m) ELSE 0 END AS rem,
         CAST(SUM(CASE WHEN capped THEN 0 ELSE 1 END)
              OVER (ORDER BY source
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS urank
  FROM cc CROSS JOIN m)
SELECT source, cap AS capacity,
       CAST(CASE WHEN capped THEN cap
                 ELSE lam + CASE WHEN urank <= rem THEN 1 ELSE 0 END
            END AS BIGINT) AS allocated,
       capped AS at_capacity
FROM j ORDER BY source
"""


# --- q197: Kaplan-Meier survival ---------------------------------------------


def q197_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier retention curve: treat each user's LAST active day as
    their churn time, right-censored for users still active on the final
    corpus day, and estimate S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) — the survival
    curve behind "how long do users stay?" product analytics (KM '58).
    Censoring guarantees dᵢ < nᵢ on every churn day (the censored cohort
    is always at risk), so the product never hits zero.

    The running product is computed as exp of a cumulative sum of
    nano-quantized ln(1 − d/n) terms — each term is ONE ln both engines
    evaluate identically, and the cumulative sum is exact integers, so
    the curve is partial-order-proof.

    Scale: one per-user max (hash shuffle on user_id), then everything
    runs on the |days| dimension table — the risk-set window is a prefix
    sum over timeline days, never the user table."""
    ev = load(spark, sf_dir, "events")
    last = ev.groupBy("user_id").agg(
        F.max(F.date_trunc("day", col("ts"))).alias("ld")
    )
    end = last.agg(F.max("ld").alias("end_d"))
    per_day = (
        last.crossJoin(F.broadcast(end))
        .groupBy("ld")
        .agg(
            F.count("*").alias("n_at"),
            F.sum(F.when(col("ld") < col("end_d"), 1).otherwise(0)).alias(
                "d_churn"
            ),
        )
    )
    w = Window.orderBy("ld")
    prior = F.coalesce(
        F.sum("n_at").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0),
    )
    tot = per_day.agg(F.sum("n_at").alias("n_users"))
    risk = (
        per_day.crossJoin(F.broadcast(tot))
        .withColumn("n_risk", col("n_users") - prior)
        .where(col("d_churn") > 0)
    )
    term = F.round(
        F.log(lit(1.0) - col("d_churn").cast("double") / col("n_risk"))
        * lit(1e9)
    ).cast("long")
    ws = Window.orderBy("ld").rowsBetween(Window.unboundedPreceding, 0)
    return (
        risk.withColumn("cum", F.sum(term).over(ws))
        .select(
            col("ld").alias("day"),
            "n_risk",
            col("d_churn").alias("n_churned"),
            F.round(F.exp(col("cum") / lit(1e9)), 4).alias("survival"),
        )
        .orderBy("day")
    )


_SURVIVAL_KM_SQL = """
WITH last AS (
  SELECT user_id, MAX(date_trunc('day', ts)) AS ld FROM events GROUP BY 1),
e AS (SELECT MAX(ld) AS end_d FROM last),
per_day AS (
  SELECT ld, CAST(COUNT(*) AS BIGINT) AS n_at,
         CAST(SUM(CASE WHEN ld < end_d THEN 1 ELSE 0 END) AS BIGINT)
           AS d_churn
  FROM last CROSS JOIN e GROUP BY 1),
t AS (SELECT CAST(SUM(n_at) AS BIGINT) AS n_users FROM per_day),
risk AS (
  SELECT ld, d_churn,
         n_users - CAST(COALESCE(SUM(n_at) OVER (ORDER BY ld
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_risk
  FROM per_day CROSS JOIN t),
f AS (
  SELECT ld, n_risk, d_churn,
         CAST(SUM(CAST(ROUND(ln(1.0 - CAST(d_churn AS DOUBLE) / n_risk) * 1e9)
                       AS BIGINT)) OVER (ORDER BY ld
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM risk WHERE d_churn > 0)
SELECT ld AS day, n_risk, d_churn AS n_churned,
       ROUND(exp(cum / 1e9), 4) AS survival
FROM f ORDER BY day
"""


# --- q198: population stability index ----------------------------------------

_PSI_BUCKETS = 10


def q198_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of the
    purchase-value timeline: bucket the ACTUAL period by the EXPECTED
    period's deciles and score PSI = Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ) — the
    model-monitoring drift gate every scoring pipeline runs (<0.1 stable,
    0.1–0.25 moderate, >0.25 shifted). Complements KL (q146: divergence
    score on categorical sources) and KS (q181: hypothesis test) with the
    industry-standard BUCKETED form.

    Laplace smoothing ((c+1)/(n+B)) keeps empty buckets finite and exact;
    per-bucket terms micro-quantize before the 10-row sum. The decile cut
    points are exact interpolated percentiles (q66 parity), and bucket
    assignment compares each value against the 9 shared cut points — both
    engines see identical doubles.

    Scale: the cut points are one exact-percentile aggregate over the
    expected half (approx_percentile is the documented 100 TB swap —
    q138's caveat); bucketing is map-side; the PSI reduction is 10 rows."""
    ev = load(spark, sf_dir, "events").where(col("event_type") == "purchase")
    mid = ev.agg(
        ((F.min(F.unix_micros(col("ts"))) + F.max(F.unix_micros(col("ts")))) / 2)
        .cast("long")
        .alias("mid_us")
    )
    tagged = ev.crossJoin(F.broadcast(mid)).select(
        "value",
        (F.unix_micros(col("ts")) < col("mid_us")).alias("is_exp"),
    )
    pct = [i / _PSI_BUCKETS for i in range(1, _PSI_BUCKETS)]
    cuts = tagged.where(col("is_exp")).agg(
        *[
            F.expr(f"percentile(value, {p!r})").alias(f"c{i}")
            for i, p in enumerate(pct)
        ]
    )
    bucket = sum(
        (F.when(col("value") > col(f"c{i}"), 1).otherwise(0) for i in range(len(pct))),
        lit(0),
    ).alias("b")
    bc = (
        tagged.crossJoin(F.broadcast(cuts))
        .select("is_exp", bucket)
        .groupBy("b")
        .agg(
            F.sum(F.when(col("is_exp"), 1).otherwise(0)).alias("ce"),
            F.sum(F.when(~col("is_exp"), 1).otherwise(0)).alias("ca"),
        )
    )
    tots = bc.agg(F.sum("ce").alias("ne"), F.sum("ca").alias("na"))
    p = (col("ce") + 1).cast("double") / (col("ne") + lit(_PSI_BUCKETS))
    q = (col("ca") + 1).cast("double") / (col("na") + lit(_PSI_BUCKETS))
    term = F.round((p - q) * F.log(p / q) * lit(1e6)).cast("long")
    s = bc.crossJoin(F.broadcast(tots)).agg(
        F.max("ne").alias("n_expected"),
        F.max("na").alias("n_actual"),
        F.sum(term).alias("psi_micro"),
    )
    psi = col("psi_micro") / lit(1e6)
    return s.select(
        "n_expected",
        "n_actual",
        F.round(psi, 4).alias("psi"),
        F.when(psi < 0.1, "stable")
        .when(psi < 0.25, "moderate")
        .otherwise("shifted")
        .alias("verdict"),
    )


def _psi_sql() -> str:
    pct = [i / _PSI_BUCKETS for i in range(1, _PSI_BUCKETS)]
    cut_cols = ", ".join(
        f"quantile_cont(value, {p!r}) AS c{i}" for i, p in enumerate(pct)
    )
    bucket = " + ".join(
        f"CASE WHEN value > c{i} THEN 1 ELSE 0 END" for i in range(len(pct))
    )
    return f"""
WITH ev AS (
  SELECT value, epoch_us(ts) AS t_us FROM events
  WHERE event_type = 'purchase'),
mid AS (SELECT CAST((MIN(t_us) + MAX(t_us)) / 2 AS BIGINT) AS mid_us FROM ev),
tagged AS (
  SELECT value, (t_us < mid_us) AS is_exp FROM ev CROSS JOIN mid),
cuts AS (SELECT {cut_cols} FROM tagged WHERE is_exp),
bc AS (
  SELECT ({bucket}) AS b,
         CAST(SUM(CASE WHEN is_exp THEN 1 ELSE 0 END) AS BIGINT) AS ce,
         CAST(SUM(CASE WHEN is_exp THEN 0 ELSE 1 END) AS BIGINT) AS ca
  FROM tagged CROSS JOIN cuts GROUP BY 1),
t AS (SELECT CAST(SUM(ce) AS BIGINT) AS ne, CAST(SUM(ca) AS BIGINT) AS na
      FROM bc),
s AS (
  SELECT MAX(ne) AS n_expected, MAX(na) AS n_actual,
         CAST(SUM(CAST(ROUND(
           (CAST(ce + 1 AS DOUBLE) / (ne + {_PSI_BUCKETS})
            - CAST(ca + 1 AS DOUBLE) / (na + {_PSI_BUCKETS}))
           * ln((CAST(ce + 1 AS DOUBLE) / (ne + {_PSI_BUCKETS}))
                / (CAST(ca + 1 AS DOUBLE) / (na + {_PSI_BUCKETS})))
           * 1e6) AS BIGINT)) AS BIGINT) AS psi_micro
  FROM bc CROSS JOIN t)
SELECT n_expected, n_actual,
       ROUND(psi_micro / 1e6, 4) AS psi,
       CASE WHEN psi_micro / 1e6 < 0.1 THEN 'stable'
            WHEN psi_micro / 1e6 < 0.25 THEN 'moderate'
            ELSE 'shifted' END AS verdict
FROM s
"""


QUERIES = {
    "q179_k_anonymity": q179_k_anonymity,
    "q180_mutual_info": q180_mutual_info,
    "q181_ks_test": q181_ks_test,
    "q182_session_paths": q182_session_paths,
    "q183_acf": q183_acf,
    "q185_rolling_median": q185_rolling_median,
    "q186_int8_quant": q186_int8_quant,
    "q187_winsorized_mean": q187_winsorized_mean,
    "q188_cusum_changepoint": q188_cusum_changepoint,
    "q189_conversion_lag": q189_conversion_lag,
    "q191_cuped": q191_cuped,
    "q192_chi2_keywords": q192_chi2_keywords,
    "q193_incremental_rollup": q193_incremental_rollup,
    "q194_bucketed_join": q194_bucketed_join,
    "q196_budget_waterfill": q196_budget_waterfill,
    "q197_survival_km": q197_survival_km,
    "q198_psi": q198_psi,
}

ORACLES = {
    "q197_survival_km": _SURVIVAL_KM_SQL,
    "q198_psi": _psi_sql(),
    "q196_budget_waterfill": _waterfill_sql(),
    "q193_incremental_rollup": _INCR_ROLLUP_SQL,
    "q194_bucketed_join": _BUCKETED_JOIN_SQL,
    "q191_cuped": _CUPED_SQL,
    "q192_chi2_keywords": _chi2_sql(),
    "q188_cusum_changepoint": _CUSUM_SQL,
    "q189_conversion_lag": _CONVERSION_LAG_SQL,
    "q185_rolling_median": _ROLLING_MEDIAN_SQL,
    "q186_int8_quant": _INT8_QUANT_SQL,
    "q187_winsorized_mean": _WINSORIZED_SQL,
    "q179_k_anonymity": _K_ANONYMITY_SQL,
    "q180_mutual_info": _MUTUAL_INFO_SQL,
    "q181_ks_test": _KS_TEST_SQL,
    "q182_session_paths": _SESSION_PATHS_SQL,
    "q183_acf": _ACF_SQL,
}
