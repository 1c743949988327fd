"""Data-ops / observability demo over the fixtures: the monitoring passes
a lakehouse runs AROUND its pipelines — profiling, drift, skew, integrity,
reconciliation, and sketch-accelerated pruning.

Runs self-contained on the sf0.001 fixture:

    python examples/ops_observability_demo.py

What it shows, in order:
1. data-quality profile + correlation matrix (q129/q151 families),
2. join-key skew report feeding the plain-vs-salted join decision (q144),
3. FK-integrity audit across every declared edge (q154),
4. snapshot reconciliation after a simulated partial re-ingest (q153),
5. source-drift KL monitor over the document corpus (q146),
6. heavy-hitter mining with Misra-Gries + exact recount (q137),
7. bloom-pruned semi-join with the grow-bits bitmap (q136),
all as DataFrame plans — the demo only collects small summaries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from eventstream_spark.operators.analytics import (
        q129_quality_report,
        q151_corr_matrix,
    )
    from eventstream_spark.operators.merge import q153_snapshot_diff, q154_fk_audit
    from eventstream_spark.operators.sketch import (
        q136_bloom_semi_join,
        q137_heavy_hitters,
    )
    from eventstream_spark.operators.skew import q144_skew_report
    from eventstream_spark.operators.text import q146_source_drift
    from eventstream_spark.session import get_spark

    spark = get_spark(app_name="ops-observability-demo")

    print("== 1. table profile (orders) ==")
    q129_quality_report(spark, SF_DIR).show(truncate=False)
    print("== 1b. correlation matrix (lineitem) ==")
    q151_corr_matrix(spark, SF_DIR).show()

    print("== 2. join-key skew report (lineitem.l_suppkey) ==")
    q144_skew_report(spark, SF_DIR).show()

    print("== 3. FK-integrity audit ==")
    q154_fk_audit(spark, SF_DIR).show(truncate=False)

    print("== 4. snapshot reconciliation (events v1 vs v2) ==")
    q153_snapshot_diff(spark, SF_DIR).show()

    print("== 5. source-drift KL monitor (documents) ==")
    q146_source_drift(spark, SF_DIR).show()

    print("== 6. heavy hitters (bigrams, Misra-Gries + exact recount) ==")
    q137_heavy_hitters(spark, SF_DIR).show(10)

    print("== 7. bloom-pruned semi-join (jumbo-order customers) ==")
    q136_bloom_semi_join(spark, SF_DIR).show()

    spark.stop()


if __name__ == "__main__":
    main()
