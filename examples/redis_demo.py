"""End-to-end live-ingestion demo: RESP2 broker → rediswire stream →
canonical envelope → response derivation → close-local control roundtrip.

Runs self-contained (the in-process RESP2 server stands in for Redis):

    python examples/redis_demo.py

What it shows, in order:
1. publish events over the real Redis wire protocol (pipelined XADD),
2. a Structured Streaming query tailing the stream by replayable ID ranges,
3. wire fields lifting into the typed envelope (stream_entry_to_envelope),
4. response derivation (create_response) writing to a parquet sink,
5. the close_local admin flow driving a targeted stop through data.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventstream_spark.codec import create_response, stream_entry_to_envelope
from eventstream_spark.session import get_spark
from eventstream_spark.sources.redis_stream import RedisStreamClient, register_rediswire
from eventstream_spark.sources.resp_server import FakeRedisServer
from eventstream_spark.streaming import QueryManager


def main() -> None:
    spark = get_spark(app_name="redis-demo", master="local[4]")
    out_dir = tempfile.mkdtemp(prefix="redis_demo_out_")
    ckpt = tempfile.mkdtemp(prefix="redis_demo_ckpt_")

    with FakeRedisServer() as server:
        # 1. Publish over the wire (a real producer would XADD the same way).
        with RedisStreamClient("127.0.0.1", server.port) as c:
            c.xadd_many(
                "EVENTS",
                [
                    {"event": "click", "application_name": "demo", "value": str(i)}
                    for i in range(5)
                ]
                + [{"event": "get_instance", "application_name": "admin"}],
            )
            print(f"published {c.xlen('EVENTS')} entries to EVENTS")

        # 2-4. Stream → envelope → response → parquet sink.
        register_rediswire(spark)
        wire = (
            spark.readStream.format("rediswire")
            .option("host", "127.0.0.1")
            .option("port", str(server.port))
            .option("stream", "EVENTS")
            .load()
        )
        responses = create_response(
            stream_entry_to_envelope(wire), "demo-worker", "i-1"
        )
        manager = QueryManager(spark)
        q = (
            responses.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()  # continuous micro-batches — a long-lived responder
        )
        manager.register("demo:responder", q, ckpt, owner=("demo-worker", "i-1"))

        # Wait until the responder has answered everything published so far.
        import time

        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(out_dir).count() >= 6:
                    break
            except Exception:
                pass
            time.sleep(0.5)

        got = spark.read.parquet(out_dir)
        print(f"responses written: {got.count()}")
        got.select("event", "response_to", "application_name").show(
            7, truncate=False
        )

        # 5. Targeted stop by owner identity (the close_local selector) —
        # the responder is still live, so the stop is a real close.
        print(f"active before close: {manager.info('demo:responder').is_active}")
        stopped = manager.stop_owned("demo-worker", "i-1")
        print(f"stopped: {stopped}")


if __name__ == "__main__":
    main()
