"""Golden schema-resolution tests — ports the reference's
tests/test_messages.py:17-82 cases onto the Spark registry (FIXTURES.md §B):
payload dict → most-specific schema name, both driver-side and columnar."""

from __future__ import annotations

import json

from pyspark.sql.types import (
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from eventstream_spark.registry import EventSchema, SchemaRegistry


def _registry() -> SchemaRegistry:
    reg = SchemaRegistry()
    reg.register(
        EventSchema(
            name="value_event",
            schema=StructType(
                [StructField("event", StringType()), StructField("example_body_value", LongType())]
            ),
            required_fields=("example_body_value",),
        )
    )
    reg.register(
        EventSchema(
            name="example_event",
            schema=StructType(
                [StructField("event", StringType()), StructField("example_data", StringType())]
            ),
            required_fields=("example_data",),
        )
    )
    reg.register(
        EventSchema(
            name="trim_message",
            schema=StructType(
                [StructField("event", StringType()), StructField("count", LongType())]
            ),
            event_literal="trim",
        )
    )
    reg.register(
        EventSchema(
            name="generic_message",
            schema=StructType(
                [
                    StructField("event", StringType()),
                    StructField("data", MapType(StringType(), LongType())),
                ]
            ),
            required_fields=("data.value1", "data.value2"),
            depth=2,
        )
    )
    return reg


GOLDEN = [
    # (payload, expected) — from reference tests/test_messages.py:42-50, 63-82
    ({"event": "value test", "example_body_value": 1}, "value_event"),
    ({"event": "example test", "example_data": '{"example": 3}'}, "example_event"),
    ({"event": "trim"}, "trim_message"),
    ({"event": "generic test", "data": {"value1": 1, "value2": 2}}, "generic_message"),
    ({"event": "generic", "hoopla": "HOOPLA"}, "message"),  # falls back to base
]


def test_driver_side_resolution():
    reg = _registry()
    for payload, expected in GOLDEN:
        assert reg.resolve(payload) == expected, payload


def test_literal_event_outweighs_required_fields():
    # trim has ZERO required fields but the literal bonus (+100) must beat
    # field-rich generic schemas (reference base.py:519-534).
    reg = _registry()
    names = [s.name for s in reg.ordered()]
    assert names[0] == "trim_message"


def test_columnar_resolution_matches_driver_side(spark):
    reg = _registry()
    df = spark.createDataFrame([(json.dumps(p),) for p, _ in GOLDEN], ["value"])
    out = reg.parse(df, "value")
    got = [r.schema_name for r in out.collect()]
    assert got == [expected for _, expected in GOLDEN]
    # typed payload: the value_event row has a parsed struct, others NULL
    rows = out.collect()
    assert rows[0].value_event.example_body_value == 1
    assert rows[0].example_event is None
    assert rows[3].generic_message.data == {"value1": 1, "value2": 2}


def test_registry_parse_on_stream(spark, tmp_path):
    """Registry schema-on-read inside a streaming pipeline (§1.4→§1.5): the
    per-event when() chain and from_json run per micro-batch with schemas
    resolved from the registry, never inferred."""
    import pandas as pd

    reg = _registry()
    payloads = [json.dumps(p) for p, _ in GOLDEN]
    src = tmp_path / "reg_src"
    src.mkdir()
    pd.DataFrame({"value": payloads}).to_parquet(src / "p.parquet")
    schema = spark.read.parquet(str(src)).schema

    stream = reg.parse(spark.readStream.schema(schema).parquet(str(src)))
    q = (
        stream.writeStream.format("memory")
        .queryName("reg_stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_reg"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT schema_name, value_event.example_body_value AS v FROM reg_stream_out"
    ).collect()
    got = sorted(r.schema_name for r in rows)
    want = sorted(expected for _, expected in GOLDEN)
    assert got == want
    # Typed access works on the resolved struct column.
    assert sorted([r.v for r in rows if r.v is not None]) == [1]
