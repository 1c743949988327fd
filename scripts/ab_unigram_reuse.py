"""A/B: unigram_logprob's vocab leg as an independent tokenize subtree
(current form — the corpus is tokenized twice, once under each groupBy)
vs vocab derived from the UN-persisted tf plan (tc = sum(c) per term), so
the tf exchange subtree appears twice in one plan and Spark's
ReuseExchange materializes the tokenize + partial-agg + shuffle write
once. Distinct from the round-12 persist-tf A/B (rejected 1.35 vs
0.97 s): no materialization barrier, no storage — reuse happens inside
the single job.

Run: python scripts/ab_unigram_reuse.py [sf_dir] [reps]
Interleaved alternating reps after one warm each; prints JSON with
min/median per spelling and asserts the q125 rollup rows are identical.
"""
import json
import statistics
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
from pyspark.sql.functions import col, lit

from eventstream_spark.catalog import load, spread
from eventstream_spark.functions import tokens
from eventstream_spark.operators.text import _LL_FLAG

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def _rollup(scored):
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("doc_logp"), 4).alias("avg_logprob"),
            F.round(F.min("doc_logp"), 4).alias("min_logprob"),
            F.sum((col("doc_logp") < _LL_FLAG).cast("long")).alias("n_surprising"),
        )
        .orderBy("source")
    )


def _score(docs, vocab_from_tf: bool):
    tok = docs.select("doc_id", "source", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "source", "term").agg(F.count("*").alias("c"))
    if vocab_from_tf:
        vocab = tf.groupBy("term").agg(F.sum("c").alias("tc"))
    else:
        vocab = tok.groupBy("term").agg(F.count("*").alias("tc"))
    total = vocab.agg(F.sum("tc").cast("double").alias("total"))
    ll = vocab.crossJoin(F.broadcast(total)).select(
        "term",
        F.round(F.log(col("tc") / col("total")) * 1e6).cast("long").alias("llmicro"),
    )
    return (
        tf.join(ll, "term")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").alias("n_tok"),
            (F.sum(col("c") * col("llmicro")) / F.sum("c") / lit(1e6)).alias("doc_logp"),
        )
    )


def run(vocab_from_tf: bool):
    docs = spread(load(spark, sf_dir, "documents"))
    return _rollup(_score(docs, vocab_from_tf)).toPandas()


v_old = run(False)  # warm both
v_new = run(True)
assert v_old.equals(v_new), (v_old, v_new)

t_old, t_new = [], []
for _ in range(reps):
    t0 = time.time(); r = run(False); t_old.append(time.time() - t0)
    assert r.equals(v_old)
    t0 = time.time(); r = run(True); t_new.append(time.time() - t0)
    assert r.equals(v_new)

print(json.dumps({
    "old_double_tokenize": {"min": round(min(t_old), 3), "median": round(statistics.median(t_old), 3)},
    "new_vocab_from_tf": {"min": round(min(t_new), 3), "median": round(statistics.median(t_new), 3)},
    "rows_equal": True, "reps": reps, "sf_dir": sf_dir,
}))
spark.stop()
