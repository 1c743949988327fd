"""observe() metrics ride the consuming action (no second pass): batch via
Observation.get, streaming via the per-batch observedMetrics surface."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Observation

from eventstream_spark.catalog import load
from eventstream_spark.codec import normalize_envelope
from eventstream_spark.plans.transforms import observe_route


def test_batch_observation_counts_without_second_pass(spark, sf_dir):
    ev = normalize_envelope(load(spark, sf_dir, "events"))
    obs = Observation("route_metrics")
    observed = observe_route(ev, obs)
    n = observed.count()  # the one and only action
    got = obs.get
    assert got["n_rows"] == n
    assert got["n_null_event"] == 0
    assert 0 < got["n_event_types"] <= 10


def test_streaming_observed_metrics_per_batch(spark, sf_dir, tmp_path):
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))
    ev = normalize_envelope(stream)
    q = (
        observe_route(ev, "route_metrics")
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    progresses = [p for p in q.recentProgress if p["observedMetrics"]]
    assert progresses, "no observed metrics in any micro-batch"
    m = progresses[-1]["observedMetrics"]["route_metrics"]
    batch_rows = spark.read.parquet(str(src)).count()
    assert sum(
        p["observedMetrics"]["route_metrics"]["n_rows"] for p in progresses
    ) == batch_rows
    assert m["n_null_event"] == 0
