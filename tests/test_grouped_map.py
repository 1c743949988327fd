"""Grouped-map (applyInPandas) escape hatch, pinned against the built-in
regression aggregates: when a per-group model fit outgrows the regr_*
family, the applyInPandas form is the scale path — each group's rows
arrive as ONE pandas frame, the fit runs vectorized, and the output is
one row per group. Here the np.polyfit twin must agree with q134's
closed-form co-moment aggregation to float tolerance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from eventstream_spark.catalog import load
from eventstream_spark.operators.analytics import q134_trend_per_type


def test_applyinpandas_polyfit_matches_regr_aggregates(spark, sf_dir):
    agg = {r.event_type: r for r in q134_trend_per_type(spark, sf_dir).collect()}

    ev = load(spark, sf_dir, "events")
    import pyspark.sql.functions as F

    d = ev.select(
        "event_type",
        (F.unix_micros(F.col("ts")) / F.lit(3600000000.0)).alias("x"),
        F.col("value").alias("y"),
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        slope, intercept = np.polyfit(pdf["x"], pdf["y"], 1)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "slope": [slope],
                "intercept": [intercept],
            }
        )

    fitted = {
        r.event_type: r
        for r in d.groupBy("event_type")
        .applyInPandas(fit, schema="event_type string, slope double, intercept double")
        .collect()
    }
    assert set(fitted) == set(agg)
    for et, r in fitted.items():
        assert r.slope == pytest.approx(agg[et].slope, rel=1e-3, abs=1e-3)
        assert r.intercept == pytest.approx(agg[et].intercept, rel=1e-3, abs=1e-2)
