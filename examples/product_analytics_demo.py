"""Product-analytics warehouse demo over the fixtures: the event-log →
dimension → metrics chain a growth/product team runs daily, composed from
the round-4 operators.

Runs self-contained on the sf0.001 fixture:

    python examples/product_analytics_demo.py

What it shows, in order:
1. SCD2 dimension build from the raw event log (q157) — users' state
   history with validity intervals,
2. point-in-time temporal join of purchases against that history (q170) —
   the leak-free feature/state lookup,
3. last-touch attribution with a 7-day lookback (q160),
4. DAU/WAU/MAU + stickiness (q168),
5. hourly OHLC bars (q164) and their streaming twin's contract (q167 runs
   the same semantics with associative aggregates under the oracle gate),
6. interval max-concurrency via the two-level sweep-line (q156),
7. jackknife error bars on the revenue mean (q172) — the one-extra-pass
   resampling that prices any statistic,
all as DataFrame plans — the demo only collects small summaries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from eventstream_spark.operators.analytics import (
        q156_interval_concurrency,
        q157_scd2_history,
        q160_attribution,
        q164_ohlc_bars,
        q168_active_users,
        q170_temporal_join,
        q172_jackknife_se,
    )
    from eventstream_spark.session import get_spark

    spark = get_spark(app_name="product-analytics-demo")

    print("== 1. SCD2 state history (first 5 versions) ==")
    q157_scd2_history(spark, SF_DIR).show(5, truncate=False)

    print("== 2. point-in-time purchases by state version ==")
    q170_temporal_join(spark, SF_DIR).show(truncate=False)

    print("== 3. last-touch attribution (7-day lookback) ==")
    q160_attribution(spark, SF_DIR).show(truncate=False)

    print("== 4. DAU / WAU / MAU + stickiness (first week) ==")
    q168_active_users(spark, SF_DIR).show(7, truncate=False)

    print("== 5. hourly OHLC bars (first 5) ==")
    q164_ohlc_bars(spark, SF_DIR).show(5, truncate=False)

    print("== 6. interval max-concurrency (sweep-line) ==")
    q156_interval_concurrency(spark, SF_DIR).show(truncate=False)

    print("== 7. jackknife error bars on mean revenue ==")
    q172_jackknife_se(spark, SF_DIR).show(truncate=False)

    print("done.")


if __name__ == "__main__":
    main()
