"""Round-13 probe: per-query Spark job count + executed (AQE-final) plan.

Usage: python scripts/probe_r13.py q139_pagerank ...

For each query: runs it once at $SPARK_GRAFT_SF_DIR (default sf0.1) under a
job group, reports the number of Spark jobs and per-job descriptions, and
writes the EXECUTED plan (explain after the action, i.e. AQE final plans)
to plans/r13/<query>_executed.txt. Timing is reported but secondary — job
counts and plan shapes are the contention-immune signals.
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
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="probe-r13")
    sc = spark.sparkContext
    queries = all_queries()
    queries["q01_scan_count"](spark, sf_dir).toPandas()

    for name in names:
        fn = queries[name]
        gid = f"probe-{name}"
        sc.setJobGroup(gid, name)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.toPandas()
        t_total = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        job_ids = sorted(tracker.getJobIdsForGroup(gid))
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_executed.txt"), "w") as fh:
            fh.write(plan)
        print(
            json.dumps(
                {
                    "query": name,
                    "jobs": len(job_ids),
                    "build_s": round(t_build, 3),
                    "total_s": round(t_total, 3),
                }
            ),
            flush=True,
        )
        release_cached()


if __name__ == "__main__":
    main()
