"""Run the full differential suite at a given SF (default sf0.01 — the
driver's t2 gate scale) and print one status line per query.

Usage: check_correctness.py [sf_dir] [query_name ...]
Extra args restrict the run to the named queries (substring match allowed).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventstream_spark.cache import release_cached
from eventstream_spark.operators import all_oracles, all_queries
from eventstream_spark.session import get_spark
from eventstream_spark.testing import compare, run_oracle


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="check-correctness")
    queries, oracles = all_queries(), all_oracles()
    if len(sys.argv) > 2:
        wanted = sys.argv[2:]
        queries = {
            n: q for n, q in queries.items() if any(w in n for w in wanted)
        }
    failures = 0
    for name in sorted(queries):
        t0 = time.time()
        try:
            spark_pdf = queries[name](spark, sf_dir).toPandas()
            oracle_pdf = run_oracle(oracles[name], sf_dir)
            problems = compare(spark_pdf, oracle_pdf)
        except Exception as exc:  # noqa: BLE001
            problems = [f"exception: {exc}"]
        release_cached()
        dt = time.time() - t0
        status = "OK " if not problems else "FAIL"
        print(f"{status} {name:28s} {dt:6.2f}s {'; '.join(problems)[:400]}")
        failures += bool(problems)
    print(f"{len(queries) - failures}/{len(queries)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
