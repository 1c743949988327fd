"""Statistics / governance demo over the fixtures: the analyst-facing
passes a warehouse team runs AFTER the relational surface is in place —
hypothesis tests, information theory, robust statistics, change detection,
privacy auditing, and sketch-based distinct counting.

Runs self-contained on the sf0.001 fixture:

    python examples/stats_demo.py

What it shows, in order:
1. k-anonymity audit of the customer quasi-identifier (q179),
2. language x source mutual information / NMI on the corpus (q180),
3. two-sample KS drift test between purchase and click values (q181),
4. top 3-step user paths + the conversion-lag cohort view (q182/q189),
5. daily-revenue ACF, rolling median filter, and CUSUM change point
   (q183/q185/q188 — the time-series diagnostics trio),
6. winsorized vs raw means per event type (q187),
7. HyperLogLog vs exact distinct users (q178) and the INT8 embedding
   quantization audit (q186),
8. the recursive-CTE hierarchy rollup (q184),
all as DataFrame plans — the demo only collects small summaries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from eventstream_spark.operators.relational import q184_recursive_rollup
    from eventstream_spark.operators.sketch import q178_hll_distinct
    from eventstream_spark.operators.stats import (
        q179_k_anonymity,
        q180_mutual_info,
        q181_ks_test,
        q182_session_paths,
        q183_acf,
        q185_rolling_median,
        q186_int8_quant,
        q187_winsorized_mean,
        q188_cusum_changepoint,
        q189_conversion_lag,
        q191_cuped,
        q196_budget_waterfill,
        q197_survival_km,
        q198_psi,
    )
    from eventstream_spark.session import get_spark

    spark = get_spark(app_name="stats-demo")

    print("== 1. k-anonymity audit (customer QI) ==")
    q179_k_anonymity(spark, SF_DIR).show()

    print("== 2. mutual information: lang x source ==")
    q180_mutual_info(spark, SF_DIR).show()

    print("== 3. KS test: purchase vs click values ==")
    q181_ks_test(spark, SF_DIR).show()

    print("== 4. top user paths ==")
    q182_session_paths(spark, SF_DIR).show(truncate=False)
    print("== 4b. conversion-lag cohorts ==")
    q189_conversion_lag(spark, SF_DIR).show()

    print("== 5. ACF of daily revenue ==")
    q183_acf(spark, SF_DIR).show()
    print("== 5b. rolling median filter (spikes flagged) ==")
    q185_rolling_median(spark, SF_DIR).show(10)
    print("== 5c. CUSUM change point per type ==")
    q188_cusum_changepoint(spark, SF_DIR).show()

    print("== 6. winsorized vs raw means ==")
    q187_winsorized_mean(spark, SF_DIR).show()

    print("== 7. HLL vs exact distincts ==")
    q178_hll_distinct(spark, SF_DIR).show()
    print("== 7b. INT8 quantization audit ==")
    q186_int8_quant(spark, SF_DIR).show()

    print("== 8. recursive hierarchy rollup (top 4 levels) ==")
    q184_recursive_rollup(spark, SF_DIR).show(16)

    print("== 9. CUPED-adjusted A/B means ==")
    q191_cuped(spark, SF_DIR).show()
    print("== 9b. PSI drift verdict (first vs second half) ==")
    q198_psi(spark, SF_DIR).show()

    print("== 10. retention survival curve (Kaplan-Meier) ==")
    q197_survival_km(spark, SF_DIR).show(10)
    print("== 10b. token-budget water-filling across sources ==")
    q196_budget_waterfill(spark, SF_DIR).show(10)

    spark.stop()


if __name__ == "__main__":
    main()
