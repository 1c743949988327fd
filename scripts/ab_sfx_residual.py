"""A/B for the q219/q220 STANDALONE (memo-cold) residual — round-10
VERDICT "what's wrong" #1: under the fixed triage protocol the standalone
rows read 38.2x/32.2x at 100x with ~1.9 GiB aggregate sort spill, while
the shared-session pair is fixed (SUFFIX_AB.json). This isolates WHERE
the standalone spill comes from and whether it is plan-inherent or a
box-memory artifact:

- ``base``      — the PRE-round-11 plan (MEMORY_AND_DISK persist of the
                  wide range-sorted suffix table, 250k rows/task); the
                  shipped plan is now ``disk+fine`` — the level/rows knobs
                  are read from dedup module constants so every variant
                  stays reachable (round-11 ADVICE).
- ``disk``      — same plan, DISK_ONLY persist for the suffix stage: the
                  wide string-keyed cache stops competing with the window
                  sort's execution memory in the unified pool (serialized
                  + compressed on NVMe instead of deserialized rows in
                  heap). If the spill is cache-pressure-induced, it
                  vanishes here without touching the plan.
- ``fine``      — MEMORY_AND_DISK, 100k rows/task (the round-9 knee
                  candidate, re-tested at today's plan).
- ``disk+fine`` — both.

Each variant runs q219 then q220 MEMO-COLD (release_cached between, the
triage protocol), reporting per-query sec + spill/peak from the status
store. Usage: python scripts/ab_sfx_residual.py [N]; one JSON line;
findings belong in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel

from eventstream_spark.cache import release_cached
from eventstream_spark.operators import all_queries, dedup
from eventstream_spark.session import get_spark
from scale_smoke import build  # noqa: E402
from triage_superlinear import _last_execution_metrics  # noqa: E402

_KEEP = ("spill size", "peak memory", "shuffle bytes written")


def _timed(queries, name, spark, sf_dir) -> dict:
    release_cached()
    t0 = time.perf_counter()
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    metrics = _last_execution_metrics(spark)
    picked = {
        k: int(v) for k, v in metrics.items() if any(w in k for w in _KEEP)
    }
    release_cached()
    return {"sec": round(dt, 3), **picked}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark(app_name="ab-sfx-residual")
    scaled = build(spark, n)
    queries = all_queries()
    # Override the suffix stage's persist level via the module constant
    # (round-11 ADVICE: the shipped call site passes the level explicitly,
    # so monkeypatching persist_tracked's default no longer reaches it —
    # _SFX_PERSIST_LEVEL is the one knob the plan actually reads).
    variants = {
        "base": (StorageLevel.MEMORY_AND_DISK, 250_000),
        "disk": (StorageLevel.DISK_ONLY, 250_000),
        "fine": (StorageLevel.MEMORY_AND_DISK, 100_000),
        "disk+fine": (StorageLevel.DISK_ONLY, 100_000),
    }
    out = {}
    for vname, (level, rpt) in variants.items():
        dedup._SFX_PERSIST_LEVEL, old_p = level, dedup._SFX_PERSIST_LEVEL
        dedup._SFX_ROWS_PER_TASK, old_r = rpt, dedup._SFX_ROWS_PER_TASK
        try:
            # warm plan compile once per variant (untimed, base fixtures)
            queries["q219_suffix_span_dedup"](
                spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
            ).write.format("noop").mode("overwrite").save()
            release_cached()
            out[vname] = {
                "q219": _timed(queries, "q219_suffix_span_dedup", spark, scaled),
                "q220": _timed(queries, "q220_substring_removal", spark, scaled),
            }
        finally:
            dedup._SFX_PERSIST_LEVEL = old_p
            dedup._SFX_ROWS_PER_TASK = old_r
    print(json.dumps({"metric": "sfx_residual_ab", "scale": n, "variants": out}))


if __name__ == "__main__":
    main()
