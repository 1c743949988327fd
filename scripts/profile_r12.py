"""Targeted per-query profiler for the round-12 optimization pass.

Usage: python scripts/profile_r12.py q222_ann_recall_audit q217_ivfpq_ann ...

Bench-identical protocol per query (plan-warm at sf0.001, then 4 runs at
$SPARK_GRAFT_SF_DIR with toPandas + release_cached, min-of-3-warm), plus
the number of Spark jobs each run launches (driver-job overhead is the
suspected cost class for the tiny-table families) via a per-query job
group.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventstream_spark.cache import release_cached
from eventstream_spark.operators import all_queries
from eventstream_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    spark = get_spark(app_name="profile-r12")
    sc = spark.sparkContext
    queries = all_queries()
    queries["q01_scan_count"](spark, sf_dir).toPandas()

    out = {}
    for name in names:
        fn = queries[name]
        if os.path.isdir(warm_dir) and warm_dir != sf_dir:
            fn(spark, warm_dir).toPandas()
            release_cached()
        runs, jobs = [], []
        for i in range(4):
            gid = f"{name}-{i}"
            sc.setJobGroup(gid, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            runs.append(round(time.perf_counter() - t0, 3))
            jobs.append(len(sc.statusTracker().getJobIdsForGroup(gid)))
            sc.setJobGroup(None, None)
            release_cached()
        out[name] = {
            "steady": min(runs[1:]),
            "cold": runs[0],
            "runs": runs,
            "jobs": jobs[-1],
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("TOTAL steady", round(sum(v["steady"] for v in out.values()), 3))


if __name__ == "__main__":
    main()
