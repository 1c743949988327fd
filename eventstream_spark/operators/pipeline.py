"""The composed training-data pipeline — the product all the north-star
operators exist for, run end-to-end as ONE declarative plan:

    fingerprint dedup → quality filter → language filter →
    weighted source mixing → token-budget shard packing

Every stage is the same column expression its standalone query uses
(q33/q31/q30/q81/q82), so the whole pipeline is one Catalyst plan: the
text is tokenized ONCE, per-doc scores are computed in a single projection,
and the only shuffles are the fingerprint window, the packing window, and
the final rollup. The duckdb oracle mirrors the full chain, so the gate
checks the composition, not just the parts.

Scale notes (100 TB): stages 2–4 are pure map work riding on the stage-1
projection; the fingerprint dedup window shuffles on the (uniform) digest;
packing shuffles on (source, doc_id-range bucket) — two-level per
text.pack_shards, so a single dominant source stays parallel instead of
collapsing into one window task. Nothing materializes between stages — at
cluster scale this runs as a single job with a handful of exchanges.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import col, lit

from ..catalog import load, spread
from ..functions import hash48, hash48_sql, tokens, tokens_sql
from .text import (
    _LANG_ORDER,
    _MIX_RATES,
    _NORM,
    _PACK_BUDGET,
    _marker_count,
    _marker_count_sql,
    _normalized_text,
    pack_shards,
    predicted_lang,
    predicted_lang_sql,
    quality_score,
    quality_score_sql,
)

_MIN_QUALITY = 0.5
_KEEP_LANG = "en"


def training_pipeline(docs: DataFrame) -> DataFrame:
    """(source, shard, n_docs, shard_tokens, avg_quality) — the cleaned,
    mixed, packed corpus layout."""
    toks = tokens("text")
    enriched = spread(docs).select(
        "doc_id",
        "source",
        F.md5(_normalized_text()).alias("fp"),
        quality_score().alias("quality"),
        F.size(toks).cast("long").alias("n_tok"),
        *[_marker_count(toks, lang).alias(f"n_{lang}") for lang in _LANG_ORDER],
    )
    n = {lang: col(f"n_{lang}") for lang in _LANG_ORDER}
    enriched = enriched.withColumn("lang_pred", predicted_lang(n))

    # 1. exact dedup: keep the representative (min doc_id) per fingerprint.
    w_fp = Window.partitionBy("fp")
    deduped = enriched.withColumn("min_id", F.min("doc_id").over(w_fp)).where(
        col("doc_id") == col("min_id")
    )

    # 2+3. quality and language gates (per-doc values are bit-identical to
    # the oracle, so the threshold comparisons are deterministic).
    filtered = deduped.where(
        (col("quality") >= _MIN_QUALITY) & (col("lang_pred") == _KEEP_LANG)
    )

    # 4. weighted source mixing (same hash gate as q81).
    idx = F.substring(col("source"), 4, 10).cast("int")
    rate = F.element_at(
        F.array(*[lit(r) for r in _MIX_RATES]), (idx % len(_MIX_RATES)) + 1
    )
    mixed = filtered.where(hash48(col("doc_id").cast("string")) % 1000 < rate)

    # 5. token-budget shard packing (same two-level windows as q82 — see
    # text.pack_shards: per-(source, doc_id-range-bucket) running sums plus
    # a bucket-offset join keep one dominant source from serializing into
    # one task, with shard ids identical to the single-window form).
    packed = pack_shards(
        mixed.select(
            "source",
            "doc_id",
            "n_tok",
            # Integer milli-units: per-doc quality is already rounded to 4
            # decimals, so summing 10^4-scaled integers is exact under ANY
            # partial-aggregation fold order (a double sum of the rounded
            # values flipped the final ROUND's last digit at sf0.1).
            F.round(col("quality") * 10000).cast("long").alias("q_i"),
        )
    )
    return (
        packed.groupBy("source", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("shard_tokens"),
            # No final ROUND: sum and count are exact integers, so the
            # double quotient is bit-identical across engines — while a
            # ROUND on an exact .xxxx5 halfway value is where they differ.
            (F.sum("q_i") / (F.count("*") * lit(10000.0))).alias("avg_quality"),
        )
        .orderBy("source", "shard")
    )


def q89_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return training_pipeline(load(spark, sf_dir, "documents"))


def _pipeline_sql() -> str:
    markers = ",\n         ".join(
        f"{_marker_count_sql(lang)} AS n_{lang}" for lang in _LANG_ORDER
    )
    rates = ", ".join(f"({i}, {r})" for i, r in enumerate(_MIX_RATES))
    return f"""
WITH tok AS (SELECT doc_id, source, text, {tokens_sql()} AS w FROM documents),
enriched AS (
  SELECT doc_id, source,
         md5({_NORM}) AS fp,
         {quality_score_sql()} AS quality,
         CAST(len(w) AS BIGINT) AS n_tok,
         {markers}
  FROM tok),
lang AS (SELECT *, {predicted_lang_sql()} AS lang_pred FROM enriched),
dedup AS (
  SELECT * FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS min_id FROM lang)
  WHERE doc_id = min_id),
filtered AS (
  SELECT * FROM dedup
  WHERE quality >= {_MIN_QUALITY} AND lang_pred = '{_KEEP_LANG}'),
rates AS (SELECT * FROM (VALUES {rates}) AS t(ri, rate)),
mixed AS (
  SELECT f.* FROM filtered f JOIN rates
    ON CAST(substr(f.source, 4) AS INT) % {len(_MIX_RATES)} = ri
  WHERE {hash48_sql("CAST(doc_id AS VARCHAR)")} % 1000 < rate),
packed AS (
  SELECT source, n_tok,
         CAST(ROUND(quality * 10000) AS BIGINT) AS q_i,
         CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
              / {_PACK_BUDGET}.0) AS BIGINT) AS shard
  FROM mixed)
SELECT source, shard, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS shard_tokens,
       CAST(SUM(q_i) AS DOUBLE) / (COUNT(*) * 10000.0) AS avg_quality
FROM packed GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLES = {"q89_training_pipeline": _pipeline_sql()}

QUERIES = {"q89_training_pipeline": q89_training_pipeline}
