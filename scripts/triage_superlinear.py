"""Stage-metric triage for the scale-smoke outliers (q08/q13/q22).

For each query, run at sf0.1 and at the 100x replicated dataset (reusing
scale_smoke.build) and pull the SQL metrics of the finished execution from
the shared status store: spill size, peak memory, shuffle bytes, output
rows. The point is to attribute superlinear time ratios: a plan whose
work-per-row is flat but whose spill goes 0 -> GBs at 100x is a
fixed-memory harness artifact (32 cores, one JVM), not a plan defect;
a plan whose output rows or shuffle bytes grow faster than 100x is
plan-inherent.

Usage: python scripts/triage_superlinear.py [N] [query ...]
Prints one JSON line; findings belong in SCALING.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventstream_spark.operators import all_queries
from eventstream_spark.session import get_spark
from scale_smoke import BASE, build  # noqa: E402  (scripts/ sibling import)

OUTLIERS = ["q08_range_join", "q13_topk_per_group", "q22_dedup_count"]

_SIZE = {"B": 1, "KiB": 1 << 10, "MiB": 1 << 20, "GiB": 1 << 30, "TiB": 1 << 40}


def _parse_amount(raw: str) -> float | None:
    """SQL metric display value -> number. Handles '150,000',
    '171.0 B (56.0 B, ...)' (second line of total/min/med/max blocks),
    and '25 ms (...)'."""
    lines = [l for l in raw.strip().splitlines() if l.strip()]
    if not lines:
        return None
    s = lines[-1].split(" (")[0].strip()
    m = re.match(r"^([\d.,]+)\s*([A-Za-z]+)?$", s)
    if not m:
        return None
    num = float(m.group(1).replace(",", ""))
    unit = m.group(2)
    if unit in _SIZE:
        return num * _SIZE[unit]
    if unit in ("ms", "s", None):
        return num
    return num


def _last_execution_metrics(spark) -> dict[str, float]:
    """Aggregate the most recent SQL execution's metrics by name:
    max for peak-style metrics, sum otherwise."""
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    last = execs.apply(execs.size() - 1)
    id2name = {}
    it = last.metrics().iterator()
    while it.hasNext():
        m = it.next()
        id2name[m.accumulatorId()] = m.name()
    agg: dict[str, float] = {}
    vit = store.executionMetrics(last.executionId()).iterator()
    while vit.hasNext():
        kv = vit.next()
        name = id2name.get(kv._1())
        val = _parse_amount(kv._2())
        if name is None or val is None:
            continue
        if "peak" in name:
            agg[name] = max(agg.get(name, 0.0), val)
        else:
            agg[name] = agg.get(name, 0.0) + val
    return agg


_KEEP = ("spill size", "peak memory", "shuffle bytes written", "number of output rows")


def _run_with_metrics(queries, name, spark, sf_dir) -> dict:
    from eventstream_spark.cache import release_cached

    for _ in range(2):  # second run is warm (plan compiled, AQE stats fresh)
        # Release tracked persists/memos BEFORE each timed run (the
        # scale_smoke round-7 fix, applied here in round 10): the warm run
        # must recompute the persisted lineage, not read the first run's
        # cache — otherwise any query whose persist sits upstream of
        # everything measures a cache read instead of the plan.
        release_cached()
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
    release_cached()
    metrics = _last_execution_metrics(spark)
    picked = {k: v for k, v in metrics.items() if any(w in k for w in _KEEP)}
    return {"sec": round(dt, 3), **{k: int(v) for k, v in picked.items()}}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    names = sys.argv[2:] or OUTLIERS
    spark = get_spark(app_name="triage-superlinear")
    scaled_dir = build(spark, n)
    queries = all_queries()
    out = {}
    for name in names:
        base = _run_with_metrics(queries, name, spark, BASE)
        scaled = _run_with_metrics(queries, name, spark, scaled_dir)
        out[name] = {
            "base": base,
            "scaled": scaled,
            "time_ratio": round(scaled["sec"] / max(base["sec"], 1e-9), 1),
        }
    print(json.dumps({"metric": "superlinear_triage", "scale": n, "queries": out}))


if __name__ == "__main__":
    main()
