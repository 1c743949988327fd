"""Cross-engine scale trendline: the SAME query timed on BOTH engines at
sf0.1 (1x) and at the scale_smoke-built N-times dataset — the measured
answer to "where does the distributed plan overtake the embedded one?".

BASELINE.md's headline comparison runs at sf0.1, where 60 k–600 k-row
tables sit far below the crossover: duckdb's per-query floor is ~10 ms
against Spark's ~200 ms scheduler/py4j round-trip, so ratio-at-sf0.1
measures harness floors, not plans. This script measures the RATIO TREND:
for each query, (duck_Nx / duck_1x) vs (spark_Nx / spark_1x) — an engine
whose time grows ~N-times pays the data in full; one whose time grows
far sublinearly has idle capacity absorbing it, and the crossover point
follows from the two growth rates.

Method notes:
- Both engines run the identical SQL/plan the differential gate verifies
  (duck: the oracle string; Spark: the registered DataFrame query).
- Spark drains through the smoke harness's noop sink; duckdb through
  fetchall() — both measure computation, not result transfer (outputs
  are small aggregates for every query in SUBSET).
- duckdb runs the scaled dirs via read_parquet glob (multi-file layout).
- One warm rep each at Nx (these are minutes-long runs; the 1x side uses
  min-of-2 like the bench convention).

Usage:
    python scripts/scale_bench.py [N] [name_substr...]   # default N=100
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from eventstream_spark.catalog import TABLES
from eventstream_spark.operators import all_oracles, all_queries

BASE = "/root/testdata/sf0.1"

# Family-spanning subset with nontrivial 100x work and aggregate-sized
# outputs: TPC-H agg/join shapes, text/dedup/LM/classifier pipeline
# stages, windows, packing, BM25 (the known spill case stays out — its
# 100x story is SCALING.md's).
SUBSET = [
    "q10_pricing_summary",
    "q05_join_rollup",
    "q11_count_distinct",
    "q14_running_sum",
    "q41_ngram_jaccard",
    "q55_dedup_clusters",
    "q82_token_packing",
    "q131_bpe_learn",
    "q140_rfm_segments",
    "q168_active_users",
    "q201_classifier_score",
    "q203_bigram_backoff_lm",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
        )
    return con


def time_duck(con, sql: str, reps: int) -> float:
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    subs = sys.argv[2:]
    names = [q for q in SUBSET if not subs or any(s in q for s in subs)]
    scaled_dir = f"/tmp/es_scale{n}"
    if not os.path.exists(os.path.join(scaled_dir, "_BUILT_v3")):
        raise SystemExit(f"{scaled_dir} missing — run scripts/scale_smoke.py first")

    oracles = all_oracles()
    queries = all_queries()

    duck1, duckn = {}, {}
    con = duck_con(BASE)
    con.sql(oracles["q01_scan_count"]).fetchall()
    for q in names:
        duck1[q] = time_duck(con, oracles[q], 2)
    con.close()
    con = duck_con(scaled_dir)
    con.sql(oracles["q01_scan_count"]).fetchall()
    for q in names:
        duckn[q] = time_duck(con, oracles[q], 1)
        print(f"duck {q}: 1x {duck1[q]}s  {n}x {duckn[q]}s", file=sys.stderr)
    con.close()

    # Spark side: reuse the smoke harness's session + noop-sink timing.
    from eventstream_spark.cache import release_cached
    from eventstream_spark.session import get_spark

    spark = get_spark(app_name="eventstream-scale-bench")
    spark1, sparkn = {}, {}
    for sf_dir, out in ((BASE, spark1), (scaled_dir, sparkn)):
        reps = 2 if sf_dir == BASE else 1
        for q in names:
            runs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                queries[q](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
                release_cached()
            out[q] = round(min(runs), 3)
            print(f"spark {q} @{sf_dir}: {out[q]}s", file=sys.stderr)

    rows = {
        q: {
            "duck_1x": duck1[q],
            "duck_nx": duckn[q],
            "duck_growth": round(duckn[q] / max(duck1[q], 1e-9), 1),
            "spark_1x": spark1[q],
            "spark_nx": sparkn[q],
            "spark_growth": round(sparkn[q] / max(spark1[q], 1e-9), 1),
            "ratio_1x": round(spark1[q] / max(duck1[q], 1e-9), 2),
            "ratio_nx": round(sparkn[q] / max(duckn[q], 1e-9), 2),
        }
        for q in names
    }
    print(
        json.dumps(
            {
                "metric": "cross_engine_scale_trend",
                "scale": n,
                "queries": rows,
                "duck_total_1x": round(sum(duck1.values()), 2),
                "duck_total_nx": round(sum(duckn.values()), 2),
                "spark_total_1x": round(sum(spark1.values()), 2),
                "spark_total_nx": round(sum(sparkn.values()), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
