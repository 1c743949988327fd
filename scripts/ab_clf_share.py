"""A/B for the shared classifier-scoring stage (round-10 VERDICT ask #5,
the SUFFIX_AB analog): in one session, run q201 (which builds and
persists the scored-docs stage via clf_scored_docs) and then q230 + q214
twice — once MEMO-COLD (release_cached between queries, the smoke
protocol) and once SHARED (memo left live, the realistic session where a
curation run scores once and reads the calibration + selection views off
the same stage). Usage: python scripts/ab_clf_share.py [N]; one JSON
line; findings belong in SCALING.md."""

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

TRIO = ["q201_classifier_score", "q230_calibration_ece", "q214_selection_curve"]


def _t(queries, name, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark(app_name="ab-clf-share")
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
                "metric": "clf_share_ab",
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
