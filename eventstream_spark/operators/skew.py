"""Skew-handling utilities.

AQE's skew-join splitting (on in session.py) is the first line of defense —
it splits oversized shuffle partitions at runtime. Pre-salting is for cases
AQE cannot fix: a single pathologically hot key inside one shuffle block,
skewed `groupBy` state, or streaming joins where AQE does not apply.

`salted_join` spreads each hot key over `salt_buckets` synthetic sub-keys:
the big side gets a deterministic per-row salt, the small side is replicated
once per bucket, and the join runs on (key, salt) — turning one hot shuffle
partition into `salt_buckets` balanced ones at the cost of replicating the
small side (which must therefore actually be small).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import col, lit


def with_salt(df: DataFrame, salt_buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, salt_buckets): hash of the whole
    row, not rand() — reruns and retried tasks must land rows in the same
    bucket or exactly-once sinks break."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), lit(salt_buckets)).cast("int")
    )


def replicate_salts(df: DataFrame, salt_buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Cross the (small) side with every salt value: one copy per bucket."""
    salts = F.explode(F.sequence(lit(0), lit(salt_buckets - 1))).alias(salt_col)
    return df.select("*", salts)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join robust to hot keys on the big side. Same rows as
    ``big.join(small, on, how)`` for inner/left joins (the only shapes where
    replicating the small side is sound)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    big_s = with_salt(big, salt_buckets)
    small_s = replicate_salts(small, salt_buckets)
    return big_s.join(small_s, keys + ["_salt"], how).drop("_salt")


def key_skew_stats(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Per-key frequency + share of total — the diagnostic that decides
    whether salting is worth the replication."""
    counts = df.groupBy(key).agg(F.count("*").alias("cnt"))
    total = df.count()
    return (
        counts.select(
            key,
            "cnt",
            F.round(col("cnt") / lit(float(total)), 4).alias("share"),
        )
        .orderBy(col("cnt").desc(), key)
        .limit(top_n)
    )


def q144_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report for lineitem.l_suppkey: the hottest keys with
    their share of rows, plus the hot/median ratio — the diagnostic a user
    runs BEFORE choosing between a plain shuffle join, AQE skew splitting,
    and salted_join (q93). One groupBy on the key + one tiny aggregate over
    the per-key counts; the per-key count table is the same partial-agg'd
    shuffle the join itself would do, so the report costs one pass."""
    from ..catalog import load

    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_suppkey").agg(F.count("*").alias("cnt"))
    stats = counts.agg(
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.expr("percentile(cnt, 0.5)"), 2).alias("median_cnt"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "l_suppkey",
            "cnt",
            F.round(col("cnt") / col("total"), 6).alias("share"),
            F.round(col("max_cnt") / col("median_cnt"), 2).alias("skew_ratio"),
        )
        .orderBy(col("cnt").desc(), "l_suppkey")
        .limit(10)
    )


ORACLES = {
    "q144_skew_report": """
WITH counts AS (SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
stats AS (SELECT SUM(cnt) AS total, MAX(cnt) AS max_cnt,
                 ROUND(quantile_cont(cnt, 0.5), 2) AS median_cnt
          FROM counts)
SELECT l_suppkey, cnt,
       ROUND(cnt / CAST(total AS DOUBLE), 6) AS share,
       ROUND(max_cnt / median_cnt, 2) AS skew_ratio
FROM counts CROSS JOIN stats
ORDER BY cnt DESC, l_suppkey LIMIT 10
""",
}

QUERIES = {
    "q144_skew_report": q144_skew_report,
}
