"""End-to-end streaming demo: the event-bus lifecycle on Spark.

Stages (mirroring the reference application lifecycle, SURVEY §3):
1. validate a bus config (A27) and stage the events fixture as a landing dir
2. start the single-scan multi-route streaming fan-out (A1-A5) under a
   QueryManager (A11-A14)
3. derive responses for one route (A8) and correlate them back to requests
   with a watermarked stream-stream join
4. trim-and-archive the landing table (A12)

Run: python examples/streaming_demo.py  [sf_dir]  (default sf0.001)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from eventstream_spark.catalog import EVENTS_RAW_SCHEMA, load, table_path
from eventstream_spark.codec import create_response, normalize_envelope
from eventstream_spark.plans.config import BusConfig, EngineConfig, RouteConfig, SinkConfig, TransformRef
from eventstream_spark.plans.routes import start_streaming
from eventstream_spark.session import get_spark
from eventstream_spark.sources import events_file_stream
from eventstream_spark.streaming import QueryManager, correlate_responses, trim_and_archive
from eventstream_spark.streaming.control import read_archive


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="streaming-demo")
    work = tempfile.mkdtemp(prefix="esdemo_")
    landing = os.path.join(work, "landing")
    os.makedirs(landing)
    shutil.copy(table_path(sf_dir, "events"), os.path.join(landing, "part-0.parquet"))

    # 1. config (A27): two routes over one scan.
    cfg = EngineConfig(
        application_name="demo_app",
        application_instance="i-0",
        busses=(
            BusConfig(
                name="events",
                source_path=landing,
                routes=(
                    RouteConfig(
                        name="clicks",
                        event="click",
                        aliases=("tap",),
                        sink=SinkConfig("parquet", os.path.join(work, "clicks_out")),
                    ),
                    RouteConfig(
                        name="purchases",
                        event="purchase",
                        transform=TransformRef("eventstream_spark.plans.transforms", "respond"),
                        kwargs={"application_name": "demo_app", "application_instance": "i-0"},
                        sink=SinkConfig("parquet", os.path.join(work, "responses_out")),
                    ),
                ),
            ),
        ),
    )

    # 2. streaming fan-out under the manager (A1-A5, A11).
    mgr = QueryManager(spark)
    ckpt = os.path.join(work, "ckpt")
    q = start_streaming(spark, cfg, cfg.busses[0], landing, EVENTS_RAW_SCHEMA, ckpt)
    mgr.register("demo_app:i-0", q, ckpt)
    mgr.await_all()
    info = mgr.info("demo_app:i-0")
    clicks = spark.read.parquet(os.path.join(work, "clicks_out"))
    responses = spark.read.parquet(os.path.join(work, "responses_out"))
    print(f"fan-out done (query {info.query_id[:8]}): "
          f"{clicks.count()} clicks, {responses.count()} purchase responses")

    # 3. correlate responses back to their requests (A8) — batch==stream
    # semantics; here over the written outputs.
    env = normalize_envelope(load(spark, sf_dir, "events"))
    requests = env.where(F.col("event") == "purchase")
    paired = correlate_responses(
        requests,
        responses.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 SECOND")),
        within="1 minute",
    )
    print(f"correlated {paired.count()} request-response pairs")

    # 4. retention (A12): keep the newest 800 events, archive the rest.
    stats = trim_and_archive(
        spark, landing, keep_count=800, archive_dir=os.path.join(work, "archive"),
        id_col="event_id",
    )
    archived = read_archive(spark, os.path.join(work, "archive")).count()
    print(f"trim: {stats}; archive rows: {archived}")

    mgr.purge("demo_app:i-0", drop_checkpoint=True)
    shutil.rmtree(work)
    print("demo complete")


if __name__ == "__main__":
    main(*sys.argv[1:])
