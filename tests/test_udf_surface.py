"""UDF/UDAF/UDTF surface smoke (SURVEY §2B last row): the same envelope
transform at every rung of the user-function ladder gives identical results
to the built-in expression."""

from __future__ import annotations

import pyspark.sql.functions as F

from eventstream_spark.catalog import load
from eventstream_spark.codec import normalize_envelope
from eventstream_spark.functions.udfs import (
    register_explode_props_udtf,
    response_event_builtin,
    response_event_pandas,
    response_event_udf,
    response_events_map_in_pandas,
)


def _envelope(spark, sf_dir):
    return normalize_envelope(load(spark, sf_dir, "events")).select(
        "event", "message_id"
    )


def _counts(df, event_col="event"):
    return sorted(
        (r[0], r[1])
        for r in df.groupBy(event_col).count().collect()
    )


def test_udf_rungs_agree(spark, sf_dir):
    env = _envelope(spark, sf_dir)
    want = _counts(env.select(response_event_builtin(F.col("event")).alias("event")))
    assert want and all(name.endswith("_response") for name, _ in want)

    got_udf = _counts(env.select(response_event_udf()("event").alias("event")))
    got_pandas = _counts(env.select(response_event_pandas()("event").alias("event")))
    got_map = _counts(response_events_map_in_pandas(env).select("event"))
    assert got_udf == want
    assert got_pandas == want
    assert got_map == want


def test_apply_in_pandas_grouped_agg(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    want = sorted(
        (r.event_type, r.n)
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    )

    def agg(key, pdf):
        import pandas as pd

        return pd.DataFrame({"event_type": [key[0]], "n": [len(pdf)]})

    got = sorted(
        (r.event_type, r.n)
        for r in events.groupBy("event_type")
        .applyInPandas(agg, "event_type string, n long")
        .collect()
    )
    assert got == want


def test_udtf_explode_props(spark, sf_dir):
    register_explode_props_udtf(spark)
    load(spark, sf_dir, "events").createOrReplaceTempView("events_udtf_in")
    got = spark.sql(
        """
        SELECT p.key, COUNT(*) AS n
        FROM events_udtf_in, LATERAL explode_props(props) p
        GROUP BY p.key ORDER BY p.key
        """
    ).collect()
    # Fixture props JSON is {"k": <int>} — one key, one row per event.
    want_rows = (
        load(spark, sf_dir, "events").where(F.col("props").isNotNull()).count()
    )
    assert [(r.key, r.n) for r in got] == [("k", want_rows)]


def test_grouped_agg_udaf_matches_builtin(spark, sf_dir):
    """UDAF (grouped-agg pandas_udf): weighted mean equals the built-in
    expression sum(v*w)/sum(w) per group."""
    from eventstream_spark.functions.udfs import weighted_mean_udaf

    ev = load(spark, sf_dir, "events").select(
        "event_type", F.col("value").alias("v"), (F.col("user_id") + 1).alias("w")
    )
    wmean = weighted_mean_udaf()
    got = {
        r.event_type: round(r.wm, 6)
        for r in ev.groupBy("event_type").agg(wmean("v", "w").alias("wm")).collect()
    }
    want = {
        r.event_type: round(r.wm, 6)
        for r in ev.groupBy("event_type")
        .agg((F.sum(F.col("v") * F.col("w")) / F.sum("w")).alias("wm"))
        .collect()
    }
    assert got == want and len(got) >= 3


def test_cogrouped_map_equals_relational_asof(spark, sf_dir):
    """The cogrouped-map rung (groupBy().cogroup().applyInPandas running
    pd.merge_asof per key) returns row-identical results to the relational
    as-of composition — pinning the last rung of the Python-execution
    ladder against a known-exact plan, tie semantics included."""
    from eventstream_spark.operators.asof import q147_cogroup_asof, q25_asof_join

    a = [tuple(r) for r in q25_asof_join(spark, sf_dir).collect()]
    b = [tuple(r) for r in q147_cogroup_asof(spark, sf_dir).collect()]
    assert a == b


def test_materialize_ctes_anchored_to_cte_list():
    """The evaluate-once rewrite touches ONLY depth-0 WITH-list CTE
    definitions: a named WINDOW clause in the main query must survive
    verbatim (duckdb rejects WINDOW w AS MATERIALIZED — the ADVICE r7
    hazard), string literals containing parens must not desync the walk,
    and every registered oracle that carries MATERIALIZED pins must
    round-trip strip->reapply byte-identically."""
    import duckdb

    from eventstream_spark.functions import materialize_ctes as mat

    s = (
        "WITH a AS (SELECT regexp_matches('x(', '(a)(b)') AS m), "
        "b(y) AS (SELECT 1) "
        "SELECT y, sum(y) OVER w AS s FROM a, b WINDOW w AS (ORDER BY y)"
    )
    r = mat(s)
    assert "WINDOW w AS (ORDER BY y)" in r and r.count("MATERIALIZED") == 2
    duckdb.sql(r)  # parses

    rec = "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM t WHERE n<3) SELECT * FROM t"
    assert duckdb.sql(mat(rec)).fetchall() == [(1,), (2,), (3,)]
    assert mat("SELECT 1") == "SELECT 1"

    import __spark_entry__ as entry

    pinned = {k: v for k, v in entry.oracle_sql().items() if "MATERIALIZED" in v}
    assert len(pinned) >= 13
    # _mat-applied oracles round-trip exactly; hand-pinned ones (q212/q218
    # materialize a strict subset by design) gain pins but stay parseable;
    # oracles NESTING a pre-pinned WITH block inside a CTE body (q222)
    # cannot round-trip the inner pins — by design the anchored rewrite
    # never reaches depth > 0 — so for those assert exactly that: the
    # outer list re-pins, the inner stays stripped.
    import re

    for k, v in pinned.items():
        redone = mat(v.replace(" AS MATERIALIZED (", " AS ("))
        if re.search(r"\(\s*\nWITH\b", v):
            outer_pins = redone.count("MATERIALIZED")
            assert 0 < outer_pins < v.count("MATERIALIZED"), k
        else:
            assert (
                redone == v
                or redone.count("MATERIALIZED") > v.count("MATERIALIZED")
            ), k
