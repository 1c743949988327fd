"""Time the duckdb oracle side of the bench headline suite — the practical
baseline BASELINE.md compares against. Prints ONE JSON line mirroring
bench.py's shape. Usage:

    python scripts/bench_duckdb.py [sf_dir]    # default /root/testdata/sf0.1

Each query runs three times on a warm connection; reported value = min
(same steady-state convention as bench.py, for the same reason: transient
host stalls measure the box, not the query).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from eventstream_spark.operators import all_oracles
from eventstream_spark.testing import duckdb_connection


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    m = re.search(r"sf([0-9.]+)", sf_dir)
    oracles = all_oracles()
    con = duckdb_connection(sf_dir)
    con.sql(oracles["q01_scan_count"]).fetchall()  # warm the file cache
    times: dict[str, float] = {}
    for name in HEADLINE:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.sql(oracles[name]).fetchall()
            runs.append(round(time.perf_counter() - t0, 3))
        times[name] = min(runs)
    print(
        json.dumps(
            {
                "metric": "duckdb_headline_suite_time",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(m.group(1)) if m else None,
            }
        )
    )


if __name__ == "__main__":
    main()
