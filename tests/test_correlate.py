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


def test_stream_left_outer_emits_dlq_rows(spark, sf_dir, tmp_path):
    """A19-adjacent A15/A16 parity in STREAMING mode: with
    join_type='leftOuter', requests whose correlation window has fully
    passed the watermark are emitted with NULL response columns — the
    streaming dead-letter view. Late-horizon requests (watermark never
    passes their deadline before the stream drains) legitimately stay in
    state, so the assertion is subset + guaranteed-core, not equality."""
    req_dir, resp_dir = _request_response_frames(spark, sf_dir, tmp_path)

    joined = correlate_responses(
        _stream(spark, req_dir), _stream(spark, resp_dir),
        within="10 minutes", join_type="leftOuter",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("dlq_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_dlq"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("dlq_out")
    # create_response leaves the response message_id unassigned (stamped at
    # send time, like the reference), so the unmatched discriminator is the
    # correlation key itself.
    emitted_dlq = out.where(F.col("response_response_to").isNull()).select(
        "request_message_id"
    )

    requests = spark.read.parquet(req_dir)
    responses = spark.read.parquet(resp_dir)
    truly_unanswered = unanswered_requests(
        requests, responses, within="10 minutes"
    ).select("message_id")

    # No false positives: every emitted DLQ row is truly unanswered.
    false_pos = emitted_dlq.join(
        truly_unanswered,
        emitted_dlq.request_message_id == truly_unanswered.message_id,
        "left_anti",
    )
    assert false_pos.count() == 0

    # Guaranteed core: unanswered requests whose 10-minute window closed
    # well before the final watermark (30-minute slack against boundary
    # semantics) must all have been emitted.
    import pyspark.sql.functions as FF

    max_ts = requests.agg(FF.max("ts")).first()[0]
    core = (
        unanswered_requests(requests, responses, within="10 minutes")
        .where(FF.col("ts") < FF.lit(max_ts) - FF.expr("INTERVAL 40 MINUTES"))
        .select("message_id")
    )
    missing = core.join(
        emitted_dlq, core.message_id == emitted_dlq.request_message_id, "left_anti"
    )
    assert core.count() > 0
    assert missing.count() == 0


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
