"""A/B: exact-decile pick via global_row_number range exchange (q210's
round-7 plan) vs the bucketed rank-pick (ranking.exact_value_at_ranks).
Run: python scripts/ab_rank_pick.py [sf_dir] — prints JSON with steady
times (median of 3 after 1 warm) for each spelling plus the values so
equality is asserted, not assumed."""
import json
import statistics
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
from pyspark.sql.functions import col

from eventstream_spark.catalog import load
from eventstream_spark.cache import release_cached
from eventstream_spark.operators.ranking import _ranked_with_total, exact_value_at_ranks

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def old_pick():
    li = load(spark, sf_dir, "lineitem")
    ranked, n = _ranked_with_total(
        li.select("l_extendedprice", "l_orderkey", "l_linenumber"),
        [col("l_extendedprice").asc(), col("l_orderkey").asc(), col("l_linenumber").asc()],
        "_r",
    )
    need = sorted({((n - 1) * d) // 10 + 1 for d in range(1, 10)})
    picked = {
        r["_r"]: r["l_extendedprice"]
        for r in ranked.where(col("_r").isin(need)).select("_r", "l_extendedprice").collect()
    }
    release_cached()
    return [picked[((n - 1) * d) // 10 + 1] for d in range(1, 10)]


def new_pick():
    li = load(spark, sf_dir, "lineitem")
    n, picked = exact_value_at_ranks(
        li, "l_extendedprice", lambda n: [((n - 1) * d) // 10 + 1 for d in range(1, 10)],
        what="lineitem",
    )
    release_cached()
    return [picked[((n - 1) * d) // 10 + 1] for d in range(1, 10)]


def bench(fn):
    vals = fn()  # warm
    ts = []
    for _ in range(3):
        t0 = time.time()
        v = fn()
        ts.append(time.time() - t0)
        assert v == vals
    return statistics.median(ts), vals


t_new, v_new = bench(new_pick)
t_old, v_old = bench(old_pick)
assert v_old == v_new, (v_old, v_new)
print(json.dumps({"old_exchange_s": round(t_old, 3), "new_bucketed_s": round(t_new, 3),
                  "values_equal": True, "sf_dir": sf_dir}))
spark.stop()
