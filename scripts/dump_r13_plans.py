"""Dump .explain("formatted") for round-13 optimization candidates.

Usage: python scripts/dump_r13_plans.py before|after [query ...]
Writes plans/r13/<query>_<tag>.txt for each named query (default: the
round-13 candidate list below) at sf0.1.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventstream_spark.cache import release_cached
from eventstream_spark.operators import all_queries
from eventstream_spark.session import get_spark

# The round-12 VERDICT "Next round: do this" list, in priority order.
CANDIDATES = [
    "q139_pagerank",
    "q133_triangle_count",
    "q219_suffix_span_dedup",
    "q220_substring_removal",
    "q201b_classifier_train",
    "q158_bm25_topk",
    "q222_ann_recall_audit",
    "q223_curriculum_order",
    "q224_rho_select",
    "q210_quantile_sketch",
    "q150_equidepth_histogram",
    "q184_recursive_rollup",
    "q131_bpe_learn",
    "q41_ngram_jaccard",
    "q159_zorder_layout",
    "q175_association_rules",
    "q211_dsir_select",
    "q234_domain_transfer_matrix",
    "q203_bigram_backoff_lm",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or CANDIDATES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-r13-plans")
    queries = all_queries()
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building plan: {exc}"
        release_cached()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
