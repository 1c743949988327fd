"""End-to-end training-data pipeline demo over the documents fixture:
scrub → dedup → filter/mix → pack → tokenizer learning → ANN index.

Runs self-contained on the sf0.001 fixture:

    python examples/corpus_pipeline_demo.py

What it shows, in order:
1. PII/blocklist scrub accounting (q121 family) — map-side regex + token
   filters over the raw corpus,
2. near-duplicate removal: fingerprint exact dedup + cross-doc span
   coverage flags (q40/q122 families),
3. quality + language gating and weighted source mixing (q31/q30/q81),
4. token-budget shard packing with the two-level de-skewed window (q82),
5. BPE tokenizer training on the surviving corpus (q131),
6. an ANN index pass over the embeddings (bucketed LSH, q52 family),
all as DataFrame plans — the demo only collects small summaries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql.functions import col

from eventstream_spark.catalog import load
from eventstream_spark.operators.dedup import span_coverage
from eventstream_spark.operators.similarity import lsh_ann
from eventstream_spark.operators.text import (
    _BLOCKLIST,
    bpe_learn,
    pack_shards,
    pii_hits,
    quality_score,
)
from eventstream_spark.functions import tokens
from eventstream_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="corpus-pipeline-demo", master="local[4]")
    docs = load(spark, SF_DIR, "documents")

    # 1. Scrub accounting
    hits = pii_hits("text")
    nb = F.size(F.filter(tokens("text"), lambda t: t.isin(*_BLOCKLIST)))
    scrub = docs.select(
        sum(h for h in hits.values()).alias("pii"), nb.alias("blocked")
    ).agg(F.sum("pii").alias("pii_hits"), F.sum("blocked").alias("blocked_tokens"))
    print("scrub:", scrub.first().asDict())

    # 2. Dedup: exact fingerprints + heavily-copied span flags
    fp = docs.select(F.md5(col("text")).alias("fp"), "doc_id")
    uniq = fp.dropDuplicates(["fp"])
    flagged = (
        span_coverage(docs)
        .where(col("dup_spans") / col("n_spans") > 0.5)
        .select("doc_id")
    )
    survivors = (
        docs.join(uniq.select("doc_id"), "doc_id", "left_semi")
        .join(flagged, "doc_id", "left_anti")
    )
    print("docs:", docs.count(), "-> after dedup:", survivors.count())

    # 3. Quality + mix gates (keep decent-quality docs, hash-mixed)
    kept = survivors.where(quality_score() >= 0.5).where(
        F.abs(F.hash("doc_id")) % 10 < 8
    )
    print("after quality+mix:", kept.count())

    # 4. Pack into ~2000-token shards (two-level de-skewed running sum)
    toks = kept.select(
        "source", "doc_id", F.size(tokens("text")).cast("long").alias("n_tok")
    )
    shards = (
        pack_shards(toks)
        .groupBy("source", "shard")
        .agg(F.sum("n_tok").alias("shard_tokens"))
    )
    print("shards:", shards.count())

    # 5. Learn a tokenizer on what remains
    merges = bpe_learn(kept, iters=2)
    print("bpe merges:", [(m[1], m[3]) for m in merges])

    # 6. ANN index over the embeddings (bucketed, one shuffle)
    ann = lsh_ann(load(spark, SF_DIR, "embeddings"), k=3)
    print("ann rows:", ann.count())

    spark.stop()


if __name__ == "__main__":
    main()
