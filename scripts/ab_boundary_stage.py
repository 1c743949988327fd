"""A/B: q223/q224's former global-rank spellings vs the boundary-tuple
rank-pick reclaim (round-8 VERDICT ask #1).

OLD q223: TWO range exchanges — scalable_ntile for the stage, then
_ranked_with_total for the global position. NEW: the 9 NTILE boundary
tuples via exact_value_at_ranks(tie_col), stage assigned MAP-SIDE, ONE
range exchange for the position.

OLD q224: _ranked_with_total for the global top-25% cut. NEW: one
boundary tuple at rank ceil(n/4), kept flag map-side — zero range
exchanges.

Run: python scripts/ab_boundary_stage.py [sf_dir] — prints JSON with
steady times (median of 3 after 1 warm) per spelling; result equality is
asserted, not assumed.
"""
import json
import statistics
import sys
import time

sys.path.insert(0, ".")
import pyspark.sql.functions as F
from pyspark.sql.functions import col

from eventstream_spark.cache import release_cached
from eventstream_spark.catalog import load, spread
from eventstream_spark.functions import hash48
from eventstream_spark.operators.ranking import _ranked_with_total, scalable_ntile
from eventstream_spark.operators.text import (
    _CURR_K,
    _RHO_KEEP_DEN,
    _two_lm_tables,
    q223_curriculum_order,
    q224_rho_select,
    tokens,
    unigram_logprob,
)
from eventstream_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-boundary-stage")
spark.sparkContext.setLogLevel("ERROR")


def q223_old():
    """The round-8 two-exchange spelling, verbatim."""
    docs = spread(load(spark, sf_dir, "documents"))
    scored = unigram_logprob(docs).select("doc_id", "doc_logp")
    b = scalable_ntile(
        scored, [col("doc_logp").desc(), col("doc_id").asc()], _CURR_K, "stage"
    )
    d = b.select(
        "doc_id", "stage", "doc_logp", hash48(col("doc_id").cast("string")).alias("k")
    )
    ranked, _ = _ranked_with_total(
        d, [col("stage").asc(), col("k").asc(), col("doc_id").asc()], "pos"
    )
    return (
        ranked.groupBy("stage")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("pos").alias("first_pos"),
            F.max("pos").alias("last_pos"),
            F.sum(
                hash48(
                    F.concat_ws(
                        ":", col("pos").cast("string"), col("doc_id").cast("string")
                    )
                )
                % F.lit(1000003)
            ).alias("order_sum"),
            F.round(F.avg("doc_logp"), 4).alias("avg_logp"),
        )
        .orderBy("stage")
    )


def q224_old():
    """The round-8 range-exchange cut, verbatim."""
    from eventstream_spark.cache import persist_tracked

    docs = spread(load(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", "source", F.explode(tokens("text")).alias("term"))
    tf = persist_tracked(
        tok.groupBy("doc_id", "source", "term").agg(
            F.count("*").alias("c"),
            F.sum((col("doc_id") % 4 == 0).cast("long")).alias("cref"),
        )
    )
    ll, _ = _two_lm_tables(tf)
    doc = (
        tf.join(ll, "term")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").alias("n_tok"),
            F.sum(col("c") * (col("lf") - col("lr"))).alias("s"),
        )
        .select(
            "doc_id",
            "source",
            "n_tok",
            F.round(col("s") * F.lit(1000.0) / col("n_tok")).cast("long").alias("rho_u"),
        )
    )
    ranked, n = _ranked_with_total(
        doc, [col("rho_u").desc(), col("doc_id").asc()], "_r"
    )
    keep = (n + _RHO_KEEP_DEN - 1) // _RHO_KEEP_DEN
    sel = ranked.withColumn("kept", (col("_r") <= keep).cast("long"))
    return (
        sel.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept").alias("n_selected"),
            F.round(F.sum("kept") / F.count("*"), 4).alias("sel_rate"),
            F.round(
                F.avg(F.when(col("kept") == 1, col("rho_u"))) / F.lit(1e6), 4
            ).alias("avg_rho_sel"),
            F.sum(F.when(col("kept") == 1, col("n_tok")).otherwise(F.lit(0))).alias(
                "kept_tokens"
            ),
        )
        .orderBy("source")
    )


def bench(fn):
    rows = [tuple(r) for r in fn().collect()]
    release_cached()
    ts = []
    for _ in range(3):
        t0 = time.time()
        got = [tuple(r) for r in fn().collect()]
        ts.append(time.time() - t0)
        release_cached()
        assert got == rows
    return statistics.median(ts), rows


out = {}
for name, old_fn, new_fn in (
    ("q223", q223_old, lambda: q223_curriculum_order(spark, sf_dir)),
    ("q224", q224_old, lambda: q224_rho_select(spark, sf_dir)),
):
    t_new, v_new = bench(new_fn)
    t_old, v_old = bench(old_fn)
    assert v_old == v_new, (name, v_old[:3], v_new[:3])
    out[f"{name}_old_exchange_s"] = round(t_old, 3)
    out[f"{name}_new_boundary_s"] = round(t_new, 3)
    out[f"{name}_equal"] = True
out["sf_dir"] = sf_dir
print(json.dumps(out))
spark.stop()
