"""Request↔response correlation as a stream-stream join.

The reference correlates a response to its request by stamping
``response_to = request.message_id`` (event_stream/messages/base.py:578,
streams/reader.py:126-128) and clients poll for the pair
(close_local.py:112-146). The Spark form is a watermarked stream-stream
inner join: the equi-key is ``response_to = message_id``, the time bound
(response arrives within ``within`` of the request) is what lets Spark
expire join state — without it the state store grows forever.

The same function works on batch DataFrames (watermarks are ignored in
batch), which is what the streaming≡batch test uses as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.functions import col, expr


def correlate_responses(
    requests: DataFrame,
    responses: DataFrame,
    within: str = "1 hour",
    join_type: str = "inner",
) -> DataFrame:
    """Pair each request envelope with the responses that answer it.

    Both inputs are canonical envelopes (codec.ENVELOPE_SCHEMA shape).
    Output columns are prefixed ``request_`` / ``response_``.

    Streaming notes (scale):
    - Watermark = ``within`` on both sides → join state is bounded by the
      correlation window, not the stream length.
    - ``join_type='leftOuter'`` additionally emits unanswered requests
      (NULL response columns) once the watermark passes — the dead-letter
      detection the reference gets from inbox scans (A15/A16).
    """
    req = requests.select(
        [col(c).alias(f"request_{c}") for c in requests.columns]
    )
    resp = responses.select(
        [col(c).alias(f"response_{c}") for c in responses.columns]
    )
    if req.isStreaming:
        req = req.withWatermark("request_ts", within)
    if resp.isStreaming:
        resp = resp.withWatermark("response_ts", within)

    cond = (
        (col("response_response_to") == col("request_message_id"))
        & (col("response_ts") >= col("request_ts"))
        & (col("response_ts") <= col("request_ts") + expr(f"INTERVAL {within}"))
    )
    return req.join(resp, cond, join_type)


def unanswered_requests(
    requests: DataFrame, responses: DataFrame, within: str = "1 hour"
) -> DataFrame:
    """Requests that got no response inside the window — the DLQ view.
    Batch form uses left_anti; streaming callers use
    ``correlate_responses(..., join_type='leftOuter')`` and filter NULLs
    (left_anti stream-stream joins need the outer-join watermark anyway)."""
    if requests.isStreaming or responses.isStreaming:
        paired = correlate_responses(requests, responses, within, "leftOuter")
        # The join key (response_to) is the non-null-on-match marker; the
        # response's own message_id may legitimately be NULL (create_response
        # clears it, codec.py).
        return paired.where(col("response_response_to").isNull())
    resp = responses.select(
        col("response_to").alias("resp_corr_key"), col("ts").alias("resp_ts")
    )
    cond = (
        (col("resp_corr_key") == col("message_id"))
        & (col("resp_ts") >= col("ts"))
        & (col("resp_ts") <= col("ts") + expr(f"INTERVAL {within}"))
    )
    return requests.join(resp, cond, "left_anti")
