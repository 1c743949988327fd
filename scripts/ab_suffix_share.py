"""A/B the q219/q220 shared sorted-suffix stage at the scale smoke.

q219 (duplication profile) and q220 (removal sweep) both stand on ONE
global range-sorted suffix table (suffix_repeat_lengths). Before round 10
each query re-paid that sort — the TRIAGE q220 row (43x at 100x) was
mostly q219's exchange run twice. The round-10 memo lets the second
caller in a session reuse the first's persisted stage.

Measures, at sf0.1 and the Nx replicated corpus:
  A (unshared): q219, release_cached, q220  — each pays the full sort
  B (shared):   q219, q220, release_cached  — one sort feeds both

Usage: python scripts/ab_suffix_share.py [N]     # default 100
Prints one JSON line; findings belong in SCALING.md.
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
from scale_smoke import BASE, build  # noqa: E402  (scripts/ sibling import)

PAIR = ("q219_suffix_span_dedup", "q220_substring_removal")


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def _run(queries, spark, sf_dir, shared: bool) -> dict:
    out = {}
    for name in PAIR:
        out[name] = _timed(
            lambda: queries[name](spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        if not shared:
            release_cached()
    release_cached()
    out["pair_total"] = round(sum(out[n] for n in PAIR), 3)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark(app_name="ab-suffix-share")
    scaled_dir = build(spark, n)
    queries = all_queries()
    result = {"metric": "suffix_share_ab", "scale": n, "dirs": {}}
    for label, sf_dir in (("base", BASE), ("scaled", scaled_dir)):
        # warm plan/codegen once so A-vs-B compares steady execution
        queries[PAIR[0]](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        release_cached()
        result["dirs"][label] = {
            "unshared": _run(queries, spark, sf_dir, shared=False),
            "shared": _run(queries, spark, sf_dir, shared=True),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
