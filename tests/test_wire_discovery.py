"""Wire codec round trip (A7 Message.send analog) and handler
auto-discovery (A26), plus property-based checks of the lenient casts
against a pure-Python model of the reference's interpret_value rules."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from eventstream_spark.catalog import load
from eventstream_spark.codec import (
    envelope_to_wire,
    interpret_boolean,
    interpret_long,
    normalize_envelope,
    wire_to_envelope,
)
from eventstream_spark.plans.config import RouteConfig, discover_routes


def test_wire_round_trip(spark, sf_dir):
    env = normalize_envelope(
        load(spark, sf_dir, "events"), application_name="app", application_instance="i1"
    ).select("event", "message_id", "application_name", "ts", "props", "value")
    wire = envelope_to_wire(env)
    assert wire.columns == ["wire"]

    back = wire_to_envelope(wire, env.schema)
    # from_json output is always nullable; compare names + types.
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in env.schema.fields
    ]
    want = sorted((r.message_id, r.event, r.value) for r in env.collect())
    got = sorted((r.message_id, r.event, r.value) for r in back.collect())
    assert got == want


def test_wire_drops_null_fields(spark, sf_dir):
    env = normalize_envelope(load(spark, sf_dir, "events")).limit(1)
    payload = json.loads(envelope_to_wire(env).collect()[0].wire)
    # response_to / workflow_id / application identity are NULL on ingest —
    # "None is never sent" (reference base.py:688-690).
    for absent in ("response_to", "workflow_id", "application_name"):
        assert absent not in payload
    assert payload["event"]


def test_discover_routes_reflects_module():
    routes = discover_routes("eventstream_spark.plans.transforms")
    names = [r.name for r in routes]
    assert "identity" in names and "respond" in names
    assert all(isinstance(r, RouteConfig) and r.event == r.name for r in routes)
    # Discovered transforms are pre-flight loaded, like the reference's
    # import-validated handlers.
    for r in routes:
        assert callable(r.transform.load())


def test_discover_routes_skips_nonconforming():
    # catalog's public surface includes non-transform functions (e.g.
    # table_path(str, str)) — none should appear.
    routes = discover_routes("eventstream_spark.catalog")
    assert all(r.name not in ("table_path",) for r in routes)


# --- property-based: lenient casts vs a pure-Python model ------------------

def _py_interpret_long(s: str):
    low = s.lower()
    if low in ("none", "null", "nil"):
        return None
    stripped = s[1:] if s[:1] in "+-" else s
    if stripped.isdigit() and stripped != "":
        return int(s)
    return None


def _py_interpret_boolean(s: str):
    # Mirrors the reference's interpret_value→is_true composition: integer
    # strings true iff nonzero, float strings true above minimum_truth=0.3.
    import re

    t = s.strip()
    low = t.lower()
    if low in ("none", "null", "nil"):
        return None
    if re.fullmatch(r"[+-]?\d+", t):
        return int(t) != 0
    if re.fullmatch(r"[+-]?(\d+\.\d*|\.\d+|\d+[eE][+-]?\d+|\d+\.\d*[eE][+-]?\d+)", t):
        return float(t) > 0.3
    if low in ("true", "yes", "on", "1", "y", "t"):
        return True
    if low in ("false", "no", "off", "0", "n", "f"):
        return False
    return None


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(-(2**62), 2**62).map(str),
            st.text(alphabet="0123456789+-.eE aboynf", max_size=8),
            st.sampled_from(["None", "null", "NIL", "true", "off", "Y", "1.5"]),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_interpret_casts_match_python_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = df.select(
        interpret_long(F.col("s")).alias("l"),
        interpret_boolean(F.col("s")).alias("b"),
    ).collect()
    for v, row in zip(values, got):
        assert row.l == _py_interpret_long(v), f"long({v!r})"
        want_b = _py_interpret_boolean(v)
        assert row.b == want_b, f"bool({v!r}): {row.b} != {want_b}"


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab cd\t\n", min_size=0, max_size=40),
        min_size=1,
        max_size=12,
    )
)
def test_word_shingles_match_python_model(spark, texts):
    """The zip/slice shingle construction (dedup.word_shingles) equals the
    naive Python n-gram model on arbitrary whitespace-noise strings."""
    from eventstream_spark.operators.dedup import _SHINGLE_N, word_shingles

    def py_shingles(s: str) -> list[str]:
        w = [t for t in s.split() if t]
        seen, out = set(), []
        for i in range(max(len(w) - (_SHINGLE_N - 1), 0)):
            sh = " ".join(w[i : i + _SHINGLE_N])
            if sh not in seen:
                seen.add(sh)
                out.append(sh)
        return out

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.s for r in df.select(word_shingles("text").alias("s")).collect()]
    want = [py_shingles(t) for t in texts]
    assert got == want
