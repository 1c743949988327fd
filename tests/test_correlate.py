"""Stream-stream request↔response correlation (A8 streaming twin):
streaming join equals the batch join of the same envelopes, and the
unanswered-request (DLQ) view finds exactly the requests with no in-window
response."""

from __future__ import annotations

import pyspark.sql.functions as F

from eventstream_spark.catalog import load
from eventstream_spark.codec import create_response, normalize_envelope
from eventstream_spark.streaming import correlate_responses, unanswered_requests


def _request_response_frames(spark, sf_dir, tmp_path):
    """Requests = click envelopes; responses synthesized per the reference's
    create_response (response_to = request message_id) with a +5 minute
    latency, and every 7th request deliberately left unanswered. Both frames
    are written to parquet dirs so they can be re-read as file streams."""
    env = normalize_envelope(load(spark, sf_dir, "events"), application_name="req_app")
    requests = env.where(F.col("event") == "click")
    answered = requests.where((F.col("message_id").cast("long") % 7) != 0)
    responses = create_response(answered, "resp_app", "i-1").withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 5 MINUTES")
    )
    req_dir, resp_dir = str(tmp_path / "req"), str(tmp_path / "resp")
    requests.write.parquet(req_dir)
    responses.write.parquet(resp_dir)
    return req_dir, resp_dir


def _stream(spark, path):
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def test_stream_correlation_equals_batch(spark, sf_dir, tmp_path):
    req_dir, resp_dir = _request_response_frames(spark, sf_dir, tmp_path)

    batch = correlate_responses(
        spark.read.parquet(req_dir), spark.read.parquet(resp_dir), within="10 minutes"
    )
    want = batch.count()
    assert want > 0

    joined = correlate_responses(
        _stream(spark, req_dir), _stream(spark, resp_dir), within="10 minutes"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("corr_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("corr_out").count()
    assert got == want

    # Every pair really correlates: key match + in-window latency.
    bad = spark.table("corr_out").where(
        (F.col("response_response_to") != F.col("request_message_id"))
        | (F.col("response_ts") < F.col("request_ts"))
    )
    assert bad.count() == 0


def test_unanswered_requests_batch(spark, sf_dir, tmp_path):
    req_dir, resp_dir = _request_response_frames(spark, sf_dir, tmp_path)
    requests = spark.read.parquet(req_dir)
    responses = spark.read.parquet(resp_dir)

    dlq = unanswered_requests(requests, responses, within="10 minutes")
    # Exactly the every-7th requests that were never answered.
    expect = requests.where((F.col("message_id").cast("long") % 7) == 0).count()
    assert dlq.count() == expect > 0

    # Tight window: a 1-minute bound misses the +5 minute responses entirely.
    assert unanswered_requests(requests, responses, within="1 minute").count() == requests.count()
