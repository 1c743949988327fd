"""A/B for the shared BM25 rankings stage (round-11 VERDICT ask #1, the
CLF_AB analog): in one session, run q158 (which builds and persists the
top-5 ranking stage via bm25_rankings) and then q173 + q243 twice — once
MEMO-COLD (release_cached between queries, the smoke protocol) and once
SHARED (memo left live, the realistic session where a retrieval stack
ranks once and reads the IR eval + hybrid fusion off the same stage).
Usage: python scripts/ab_bm25_share.py [N]; one JSON line; findings
belong in SCALING.md."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventstream_spark.cache import release_cached
from eventstream_spark.operators import all_queries
from eventstream_spark.session import get_spark
from scale_smoke import build  # noqa: E402

TRIO = ["q158_bm25_topk", "q173_ir_eval", "q243_hybrid_rrf"]


def _t(queries, name, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark(app_name="ab-bm25-share")
    scaled = build(spark, n)
    queries = all_queries()
    # plan-compile warmup at 1x (untimed)
    for q in TRIO:
        _t(queries, q, spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    release_cached()
    cold = {}
    for q in TRIO:
        release_cached()
        cold[q] = _t(queries, q, spark, scaled)
    release_cached()
    shared = {}
    for q in TRIO:  # NO release between: later consumers ride the memo
        shared[q] = _t(queries, q, spark, scaled)
    release_cached()
    print(
        json.dumps(
            {
                "metric": "bm25_share_ab",
                "scale": n,
                "memo_cold": cold,
                "shared_session": shared,
                "cold_total": round(sum(cold.values()), 3),
                "shared_total": round(sum(shared.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
