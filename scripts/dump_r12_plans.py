"""Dump .explain("formatted") for round-12 optimization candidates.

Usage: python scripts/dump_r12_plans.py before|after [query ...]
Writes plans/r12/<query>_<tag>.txt for each named query (default: the
round-12 candidate list below) at sf0.1.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventstream_spark.cache import release_cached
from eventstream_spark.operators import all_queries
from eventstream_spark.session import get_spark

CANDIDATES = [
    "q201b_classifier_train",
    "q219_suffix_span_dedup",
    "q220_substring_removal",
    "q222_ann_recall_audit",
    "q223_curriculum_order",
    "q224_rho_select",
    "q226_pca_project",
    "q218_pca_power",
    "q211_dsir_select",
    "q221_doremi_step",
    "q217b_ivfpq_ann_scaled",
    "q175_association_rules",
    "q203_bigram_backoff_lm",
    "q200_leakage_safe_split",
    "q158_bm25_topk",
    "q168_active_users",
    "q214_selection_curve",
    "q210_quantile_sketch",
    "q172_jackknife_se",
    "q41_ngram_jaccard",
    "q42b_minhash_lsh_grown",
    "q133_triangle_count",
    "q139_pagerank",
    "q131_bpe_learn",
    "q159_zorder_layout",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or CANDIDATES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-r12-plans")
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
