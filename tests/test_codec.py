"""Codec unit tests: interpret_value-equivalent casts (FIXTURES.md §B
type-inference fixture) and envelope construction / response derivation —
mirroring the reference's test_common.py / test_messages.py granularity."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql.functions import col

from eventstream_spark.codec import (
    create_response,
    interpret_boolean,
    interpret_double,
    interpret_long,
    normalize_envelope,
    props_get,
)

from eventstream_spark.catalog import load


def _one_col(spark, values):
    return spark.createDataFrame([(v,) for v in values], ["v"])


def test_interpret_long(spark):
    df = _one_col(spark, ["42", "-7", "+3", "3.14", "abc", "None", "null", "nil", ""])
    out = [r[0] for r in df.select(interpret_long(col("v"))).collect()]
    assert out == [42, -7, 3, None, None, None, None, None, None]


def test_interpret_double(spark):
    df = _one_col(spark, ["3.14", "-0.5", "42", "1e3", "nan", "inf", "-infinity", "x", "None"])
    out = [r[0] for r in df.select(interpret_double(col("v"))).collect()]
    assert out[0] == 3.14 and out[1] == -0.5 and out[2] == 42.0 and out[3] == 1000.0
    assert math.isnan(out[4]) and out[5] == float("inf") and out[6] == float("-inf")
    assert out[7] is None and out[8] is None


def test_interpret_boolean_word_lists_and_threshold(spark):
    df = _one_col(spark, ["true", "YES", "on", "1", "false", "No", "off", "0",
                          "0.9", "0.2", "7", "maybe", "nil",
                          "-1", "0.35", "0.3"])
    out = [r[0] for r in df.select(interpret_boolean(col("v"))).collect()]
    # Numeric-string truth mirrors the reference's is_true: nonzero ints are
    # true ('-1'), floats use the 0.3 minimum_truth default (strictly above).
    assert out == [True, True, True, True, False, False, False, False,
                   True, False, True, None, None,
                   True, True, False]


def test_normalize_envelope_and_props(spark, sf_dir):
    ev = load(spark, sf_dir, "events").limit(50)
    env = normalize_envelope(ev, application_name="app", application_instance="i-1")
    row = env.first()
    assert set(env.columns) >= {
        "event", "message_id", "response_to", "application_name",
        "application_instance", "workflow_id", "ts", "header", "props",
    }
    assert row.application_name == "app"
    assert row.header.date is not None
    # open payload: props JSON key 'k' lands in the map
    got = env.select(props_get("k").alias("k")).first().k
    assert got is not None and got.lstrip("-").isdigit()


def test_create_response_semantics(spark, sf_dir):
    ev = load(spark, sf_dir, "events").limit(5)
    env = normalize_envelope(ev, application_name="req-app", application_instance="r-1")
    resp = create_response(env, "resp-app", "inst-9")
    r, original = resp.first(), env.first()
    assert r.event == original.event + "_response"
    assert r.response_to == original.message_id
    assert r.message_id is None
    assert r.application_name == "resp-app"
    assert r.application_instance == "inst-9"
    assert r.header.caller_application == "resp-app"


def test_parse_with_quarantine(spark):
    from pyspark.sql.types import IntegerType, StructField, StructType

    from eventstream_spark.codec import parse_with_quarantine

    df = spark.createDataFrame(
        [
            (1, '{"a": 1}'),
            (2, "not json"),
            (3, None),
            (4, '{"a": null}'),
            (5, '{"a": 7, "extra": true}'),
        ],
        "id long, js string",
    )
    schema = StructType([StructField("a", IntegerType())])
    good, bad = parse_with_quarantine(df, "js", schema)

    got_good = {r.id: r.a for r in good.collect()}
    # Malformed row 2 is quarantined; null payload (3) and legit null field
    # (4) are good; extra keys (5) are permissive.
    assert got_good == {1: 1, 3: None, 4: None, 5: 7}
    assert [(r.id, r.js) for r in bad.collect()] == [(2, "not json")]
    assert "js" not in good.columns and "js" in bad.columns


def test_interpret_nested_recursive_promotion(spark):
    """interpret_nested recurses dicts/lists/maps and promotes string
    leaves by the same rules as the flat interpret_* family (reference
    interpret_value recursion, common.py:366-404)."""
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        LongType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    from eventstream_spark.codec import interpret_nested

    schema = StructType(
        [
            StructField(
                "meta",
                StructType(
                    [
                        StructField("id", LongType()),
                        StructField("flag", BooleanType()),
                        StructField("name", StringType()),
                    ]
                ),
            ),
            StructField("scores", ArrayType(DoubleType())),
            StructField("attrs", MapType(StringType(), LongType())),
            StructField(
                "deep", ArrayType(StructType([StructField("b", BooleanType())]))
            ),
        ]
    )
    payload = (
        '{"meta": {"id": "42", "flag": "yes", "name": "abc"},'
        ' "scores": ["1.5", "nan", "3.5e1", "none"],'
        ' "attrs": {"a": "7", "b": "x"},'
        ' "deep": [{"b": "0.2"}, {"b": "2"}, {"b": "nil"}]}'
    )
    row = (
        spark.range(1)
        .select(interpret_nested(F.lit(payload), schema).alias("v"))
        .first()
        .v
    )
    assert row.meta.id == 42 and row.meta.flag is True and row.meta.name == "abc"
    assert row.scores[0] == 1.5 and math.isnan(row.scores[1])
    assert row.scores[2] == 35.0 and row.scores[3] is None
    assert row.attrs == {"a": 7, "b": None}
    # float 0.2 <= 0.3 threshold -> False; int "2" nonzero -> True; nil -> NULL
    assert [d.b for d in row.deep] == [False, True, None]

    # Native JSON numbers/booleans coerce through the string shadow fine,
    # and a null object stays a null object (not a struct of NULLs).
    native = '{"meta": {"id": 7, "flag": true, "name": null}, "scores": [2, 0.5]}'
    row2 = (
        spark.range(1)
        .select(interpret_nested(F.lit(native), schema).alias("v"))
        .first()
        .v
    )
    assert row2.meta.id == 7 and row2.meta.flag is True and row2.meta.name is None
    assert row2.scores == [2.0, 0.5] and row2.attrs is None and row2.deep is None
    row3 = (
        spark.range(1)
        .select(interpret_nested(F.lit('{"scores": []}'), schema).alias("v"))
        .first()
        .v
    )
    assert row3.meta is None and row3.scores == []


def test_header_stack_trace_roundtrip(spark):
    """Reference HeaderInfo debug-mode parity (messages/base.py:447-487):
    include_stack embeds (file, function, line_number, code) frames; the
    capture site (this test) appears in the trace."""
    from eventstream_spark.codec import make_header

    header = spark.range(1).select(make_header(include_stack=True).alias("h")).first().h
    assert header.trace, "trace must be non-empty"
    frame = header.trace[-1]
    assert set(frame.asDict()) == {"file", "function", "line_number", "code"}
    assert isinstance(frame.line_number, int)
    assert any(f.file.endswith("test_codec.py") for f in header.trace)
    # Default headers stay trace-free (HEADER_SCHEMA unchanged on the wire).
    plain = spark.range(1).select(make_header().alias("h")).first().h
    assert "trace" not in plain.asDict()


def test_wire_datetime_format(spark):
    """Reference configurable datetime serialization (system/system.py:19
    DEFAULT_DATETIME_FORMAT stamps HeaderInfo.date at send time): the wire
    encoding formats header.date with the given pattern; without one the
    date serializes as Spark's default JSON timestamp."""
    import json as _json
    import re

    from eventstream_spark.codec import envelope_to_wire, make_header
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.lit("get_instance").alias("event"), make_header().alias("header")
    )
    formatted = _json.loads(
        envelope_to_wire(df, datetime_format="yyyy-MM-dd HH:mm:ssxx").first().wire
    )
    assert re.fullmatch(
        r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\+\d{4}", formatted["header"]["date"]
    )
    plain = _json.loads(envelope_to_wire(df).first().wire)
    assert "T" in plain["header"]["date"]  # ISO default untouched
