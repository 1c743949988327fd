"""The eventwire custom data source (A1 as a first-class Spark source):
batch partition-per-file reads, ID-millis event time, streaming file
tailing whose drained result equals the batch read, and typed access via
the codec's interpret casts."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from eventstream_spark.codec import interpret_boolean, interpret_double
from eventstream_spark.sources.wire import register_eventwire

ENTRIES = [
    {"id": "1712000000000-0", "fields": {"event": "click", "value": "1.5"}},
    {"id": "1712000061000-0", "fields": {"event": "purchase", "value": "20",
                                         "rush": "yes"}},
    {"id": "1712000122000-1", "fields": {"event": "click", "value": "-3.25",
                                         "rush": "0"}},
]


def _write_wire(tmp_path, n_files=2):
    d = tmp_path / "wire"
    d.mkdir()
    for i in range(n_files):
        with open(d / f"dump{i}.jsonl", "w") as fh:
            for e in ENTRIES:
                entry = dict(e, id=f"{int(e['id'].split('-')[0]) + i}-0")
                fh.write(json.dumps(entry) + "\n")
    return str(d)


def test_batch_read_types_and_event_time(spark, tmp_path):
    path = _write_wire(tmp_path)
    register_eventwire(spark)
    df = spark.read.format("eventwire").option("path", path).load()
    rows = df.orderBy("message_id").collect()
    assert len(rows) == 6
    first = rows[0]
    assert first.message_id == "1712000000000-0"
    # ID millis prefix IS the event time (reference get_message_date).
    assert first.ts.isoformat() == "2024-04-01T19:33:20"
    assert first.fields["event"] == "click"


def test_batch_read_is_partition_per_file(spark, tmp_path):
    path = _write_wire(tmp_path, n_files=3)
    register_eventwire(spark)
    df = spark.read.format("eventwire").option("path", path).load()
    assert df.rdd.getNumPartitions() == 3


def test_typed_access_via_codec_casts(spark, tmp_path):
    """The source stays string-typed (the wire contract); the codec's
    interpret_* casts give the reference's lenient typing downstream."""
    path = _write_wire(tmp_path, n_files=1)
    register_eventwire(spark)
    df = spark.read.format("eventwire").option("path", path).load()
    typed = df.select(
        F.element_at("fields", "event").alias("event"),
        interpret_double(F.element_at("fields", "value")).alias("value"),
        interpret_boolean(F.element_at("fields", "rush")).alias("rush"),
    ).orderBy("value")
    got = [tuple(r) for r in typed.collect()]
    assert got == [
        ("click", -3.25, False),  # "0" -> False (int-string rule)
        ("click", 1.5, None),  # absent key -> NULL
        ("purchase", 20.0, True),  # "yes" -> True
    ]


def test_stream_read_drains_to_batch_equivalent(spark, tmp_path):
    path = _write_wire(tmp_path, n_files=2)
    register_eventwire(spark)
    stream = spark.readStream.format("eventwire").option("path", path).load()
    ckpt = str(tmp_path / "ckpt")
    q = (
        stream.groupBy(F.element_at("fields", "event").alias("event"))
        .count()
        .writeStream.format("memory")
        .queryName("wire_stream_out")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event, r["count"]) for r in spark.table("wire_stream_out").collect()
    }
    assert got == {("click", 4), ("purchase", 2)}
