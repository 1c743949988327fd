"""As-of join — the batch form of request/response correlation.

Reference parity: the event bus pairs a response to its request via
``response_to = request.message_id`` (messages/base.py:593-609); the as-of
join answers "for each response-like event, which request-like event most
recently preceded it for the same key".

Spark has no ASOF JOIN operator, so this implements the SCALABLE form:
union both sides, sort within key partitions, carry the last left-row
forward with ``last(..., ignorenulls=True)`` over an unbounded-preceding
window. One shuffle on the key, no range-explosion — this survives 100×
scale-up where a naive range join (per-pair comparison) would not.

Tie policy: on equal timestamps the request IS visible to the response
(requests sort before responses at the same ts), and among equal-ts
requests the one with the largest ``event_id`` wins — mirrored in the
oracle's ``ORDER BY ts DESC, event_id DESC LIMIT 1``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import col, lit

from ..catalog import load


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    left_value: str,
    value_alias: str = "asof_value",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each right row, attach ``left_value`` of the latest left row with
    ``left_ts <= right_ts`` on the same key (None if no such row).

    ``tolerance_seconds`` bounds the lookback (pandas ``merge_asof``
    tolerance semantics): a match older than the tolerance yields None.
    Implemented by carrying the matched left timestamp alongside the value
    and nulling stale matches — same single shuffle, no extra join.
    """
    l = left.select(
        col(key).alias("k"),
        col(left_ts).alias("t"),
        col(left_value).cast("long").alias("lv"),
        lit(0).alias("side"),
    )
    r_cols = list(right.columns)
    r = right.select(
        col(key).alias("k"),
        col(right_ts).alias("t"),
        lit(None).cast("long").alias("lv"),
        lit(1).alias("side"),
        *[col(c).alias(f"r_{c}") for c in r_cols],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy("k")
        .orderBy(col("t"), col("side"), col("lv").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(value_alias, F.last("lv", ignorenulls=True).over(w))
    if tolerance_seconds is not None:
        lt = F.when(col("side") == 0, col("t"))
        carried = carried.withColumn("_lt", F.last(lt, ignorenulls=True).over(w))
        fresh = (
            F.unix_timestamp(col("t")) - F.unix_timestamp(col("_lt"))
            <= tolerance_seconds
        )
        carried = carried.withColumn(
            value_alias, F.when(fresh, col(value_alias))
        )
    return carried.where(col("side") == 1).select(
        *[col(f"r_{c}").alias(c) for c in r_cols], col(value_alias)
    )


def q25_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the most recent prior-or-simultaneous click of the
    same user (largest event_id on ts ties)."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = ev.where(col("event_type") == "purchase").select("event_id", "user_id", "ts")
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        left_value="event_id",
        value_alias="click_id",
    )
    return out.select("event_id", "click_id").orderBy("event_id")


def q25b_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q25 with a 1-hour lookback bound: clicks older than an hour before
    the purchase no longer count (merge_asof tolerance semantics)."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = ev.where(col("event_type") == "purchase").select("event_id", "user_id", "ts")
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        left_value="event_id",
        value_alias="click_id",
        tolerance_seconds=3600,
    )
    return out.select("event_id", "click_id").orderBy("event_id")


ORACLES = {
    "q25b_asof_tolerance": """
WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
purch AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id,
       (SELECT c.event_id FROM clicks c
        WHERE c.user_id = p.user_id AND c.ts <= p.ts
          AND c.ts >= p.ts - INTERVAL 1 HOUR
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
FROM purch p ORDER BY p.event_id
""",
    "q25_asof_join": """
WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
purch AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id,
       (SELECT c.event_id FROM clicks c
        WHERE c.user_id = p.user_id AND c.ts <= p.ts
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
FROM purch p ORDER BY p.event_id
""",
    "q147_cogroup_asof": """
WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
purch AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id,
       (SELECT c.event_id FROM clicks c
        WHERE c.user_id = p.user_id AND c.ts <= p.ts
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
FROM purch p ORDER BY p.event_id
""",
}


def q147_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q25's as-of correlation executed through the COGROUPED-map API
    (``groupBy().cogroup().applyInPandas`` running ``pd.merge_asof`` per
    user) — the escape hatch for per-key two-sided logic the relational
    as-of composition can't express (interpolation, custom tolerance
    curves, per-key model lookups). Same answer as q25 by construction;
    the relational form (operators/asof.py:83) remains the default — this
    rung exists to pin the cogrouped API against a known-exact oracle.

    PERFORMANCE: do not copy this template for production as-of joins —
    per-key pandas groups cost ~16 s at sf0.1 vs ~1 s for the relational
    q25 form (measured; excluded from bench.HEADLINE for that reason,
    bench.py documents it). q25 (``asof_join``, this file) is the
    production path; reach for the cogrouped form only when the per-key
    logic genuinely isn't relational.

    Scale: one co-partitioned shuffle on user_id for BOTH sides (the same
    exchange the join pays), then per-key Arrow batches; per-key state is
    the two sorted slices, never the whole table."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = ev.where(col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )

    def merge(purch_pdf, click_pdf):
        import pandas as pd

        p = purch_pdf.sort_values("ts", kind="mergesort")
        if click_pdf.empty:
            out = p.assign(click_id=pd.array([None] * len(p), dtype="Int64"))
        else:
            # sort clicks by (ts, event_id): merge_asof takes the LAST row
            # among equal ts, so the tie goes to the largest event_id —
            # exactly the relational form's ORDER BY ts DESC, event_id DESC
            c = click_pdf.sort_values(["ts", "event_id"], kind="mergesort")
            out = pd.merge_asof(
                p,
                c.rename(columns={"event_id": "click_id"})[["ts", "click_id"]],
                on="ts",
                direction="backward",
                allow_exact_matches=True,
            )
            out["click_id"] = out["click_id"].astype("Int64")
        return out[["event_id", "click_id"]]

    res = (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(merge, "event_id long, click_id long")
    )
    return res.orderBy("event_id")


QUERIES = {
    "q25_asof_join": q25_asof_join,
    "q25b_asof_tolerance": q25b_asof_tolerance,
    "q147_cogroup_asof": q147_cogroup_asof,
}
