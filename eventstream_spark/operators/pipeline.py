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


def curation_pipeline(docs: DataFrame) -> DataFrame:
    """The round-6 curation stages composed into ONE plan — the nightly
    training-data job a real team runs:

        model-based classifier gate (q201) → bigram-LM perplexity gate
        (q203, LM trained on the held-in slice of classifier SURVIVORS) →
        segment-level dedup (q209, per-doc surviving-token accounting) →
        temperature-scaled source mixing (q204, over SURVIVING tokens) →
        deterministic epoch-0 shuffle (q202, shard + order checksum)

    Output: one row per (source, shard) of the final export layout —
    doc/token volumes, the position-weighted order checksum that proves
    the epoch permutation, and the source's mixture weight / token
    allocation from the post-dedup token counts.

    The corpus TOKENIZES ONCE: the (doc_id, source, w) projection
    persists and every stage — classifier grams, LM bigrams/unigrams,
    segments — reads the cache (plan-asserted in tests/test_plans.py).
    Stage math is byte-identical to the standalone queries' (shared
    column builders on the Spark side, shared CTE builders on the oracle
    side), so the full-chain differential checks the COMPOSITION.

    Scale: the gates are map-side on the cached projection; the LM adds
    one (w1,w2) groupBy + bigram-key join (vocab-dimension legs); the
    dedup adds one seg-hash shuffle + the bounded duplicate join-back;
    mixing is one groupBy(source) + a 1-row broadcast; the shuffle's
    only exchange is the shard partitioning the export write needs. No
    stage re-reads the raw corpus."""
    from ..cache import persist_tracked
    from .dedup import segments_from_tokens
    from .text import (
        _BG_FLAG,
        _EPOCH_SHARDS,
        _MIX_ALPHA,
        bigram_logprob_from_tokens,
        classifier_logit_micro,
    )

    tok = persist_tracked(
        spread(docs).select("doc_id", "source", tokens("text").alias("w"))
    )
    # 1. classifier gate: non-negative micro-logit survives. Survivors
    # persist too — the LM reads them three ways (doc bigrams, held-in
    # unigrams, held-in bigrams) and the segment stage once more.
    s1 = persist_tracked(
        tok.withColumn("lm", classifier_logit_micro())
        .where(col("lm") >= 0)
        .drop("lm")
    )
    # 2. perplexity gate: docs at or above the junk threshold survive
    # (unscorable docs — fewer than two tokens — fail the gate).
    keep = (
        bigram_logprob_from_tokens(s1)
        .where(col("doc_logp") >= _BG_FLAG)
        .select("doc_id")
    )
    s2 = s1.join(keep, "doc_id", "left_semi")
    # 3. segment dedup: a segment occurring in >= 2 surviving docs drops
    # everywhere; docs keep their unique-segment token volume.
    seg = persist_tracked(segments_from_tokens(s2))
    dup = (
        seg.groupBy("seg_hash")
        .agg(F.countDistinct("doc_id").alias("df_docs"))
        .where(col("df_docs") >= 2)
        .select("seg_hash", lit(1).alias("is_dup"))
    )
    kept = persist_tracked(
        seg.join(dup, "seg_hash", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.sum(
                F.when(col("is_dup").isNull(), col("n_toks")).otherwise(lit(0))
            ).alias("kept_tokens")
        )
        .where(col("kept_tokens") > 0)
    )
    # 4. temperature mixing over the post-dedup token volumes (q204 math).
    per = (
        kept.groupBy("source")
        .agg(F.sum("kept_tokens").alias("n_tokens"))
        .select(
            "source",
            "n_tokens",
            F.round(lit(1e6) * F.exp(lit(_MIX_ALPHA) * F.log(col("n_tokens"))))
            .cast("long")
            .alias("w_micro"),
        )
    )
    tot = per.agg(F.sum("n_tokens").alias("tot_tok"), F.sum("w_micro").alias("tot_w"))
    mixdim = per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.round(col("w_micro") / col("tot_w"), 4).alias("mix_weight"),
        F.floor((col("tot_tok") * col("w_micro")) / col("tot_w"))
        .cast("long")
        .alias("alloc_tokens"),
    )
    # 5. deterministic epoch-0 shuffle (q202 key), rolled up per
    # (source, shard) with the transposition-sensitive order checksum.
    k = hash48(F.concat_ws(":", lit("0"), col("doc_id").cast("string")))
    d = kept.select(
        "source", "doc_id", "kept_tokens", k.alias("k"),
        (k % _EPOCH_SHARDS).alias("shard"),
    )
    w_sh = Window.partitionBy("shard").orderBy("k", "doc_id")
    r = d.select(
        "source", "shard", "doc_id", "kept_tokens",
        F.row_number().over(w_sh).alias("pos"),
    )
    return (
        r.groupBy("source", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept_tokens").alias("kept_tokens"),
            F.sum(col("pos").cast("long") * (col("doc_id") + 1)).alias("order_sum"),
        )
        .join(mixdim, "source")
        .select(
            "source", "shard", "n_docs", "kept_tokens", "order_sum",
            "mix_weight", "alloc_tokens",
        )
        .orderBy("source", "shard")
    )


def q89b_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation_pipeline(load(spark, sf_dir, "documents"))


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


def _curation_sql() -> str:
    """Full-chain duckdb mirror of curation_pipeline — every stage is the
    SAME CTE builder its standalone oracle uses (clf_scored_cte_sql /
    bigram_doc_logp_cte_sql / seg_select_sql), applied to the surviving
    subset instead of `documents`."""
    from .dedup import seg_select_sql
    from .text import (
        _BG_FLAG,
        _EPOCH_SHARDS,
        _MIX_ALPHA,
        bigram_doc_logp_cte_sql,
        clf_scored_cte_sql,
    )

    return f"""
WITH tok AS (SELECT doc_id, source, {tokens_sql()} AS w FROM documents),
{clf_scored_cte_sql('tok')},
s1 AS (SELECT doc_id, source, w FROM scored_tok WHERE lm >= 0),
{bigram_doc_logp_cte_sql('s1')},
s2 AS (SELECT s.doc_id, s.source, s.w
       FROM s1 s JOIN doc_s1 d USING (doc_id)
       WHERE d.doc_logp >= {_BG_FLAG}),
seg AS ({seg_select_sql('s2')}),
dup AS (SELECT seg_hash, 1 AS is_dup FROM seg GROUP BY seg_hash
        HAVING COUNT(DISTINCT doc_id) >= 2),
kept AS (
  SELECT s.doc_id, s.source,
         SUM(CASE WHEN d.is_dup IS NULL THEN s.n_toks ELSE 0 END) AS kept_tokens
  FROM seg s LEFT JOIN dup d USING (seg_hash)
  GROUP BY 1, 2
  HAVING SUM(CASE WHEN d.is_dup IS NULL THEN s.n_toks ELSE 0 END) > 0),
per AS (
  SELECT source, CAST(SUM(kept_tokens) AS BIGINT) AS n_tokens
  FROM kept GROUP BY 1),
wt AS (SELECT source, n_tokens,
              CAST(ROUND(1e6 * exp({_MIX_ALPHA} * ln(n_tokens))) AS BIGINT)
                AS w_micro
       FROM per),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tok,
               CAST(SUM(w_micro) AS BIGINT) AS tot_w FROM wt),
mixdim AS (SELECT source,
                  ROUND(w_micro / CAST(tot_w AS DOUBLE), 4) AS mix_weight,
                  CAST(FLOOR((tot_tok * w_micro) / CAST(tot_w AS DOUBLE))
                       AS BIGINT) AS alloc_tokens
           FROM wt CROSS JOIN tot),
kk AS (SELECT source, doc_id, kept_tokens,
              {hash48_sql("'0:' || CAST(doc_id AS VARCHAR)")} AS k
       FROM kept),
r AS (SELECT source, k % {_EPOCH_SHARDS} AS shard, doc_id, kept_tokens,
             ROW_NUMBER() OVER (PARTITION BY k % {_EPOCH_SHARDS}
                                ORDER BY k, doc_id) AS pos
      FROM kk),
agg AS (
  SELECT source, shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(kept_tokens) AS BIGINT) AS kept_tokens,
         CAST(SUM(pos * (doc_id + 1)) AS BIGINT) AS order_sum
  FROM r GROUP BY 1, 2)
SELECT a.source, a.shard, a.n_docs, a.kept_tokens, a.order_sum,
       m.mix_weight, m.alloc_tokens
FROM agg a JOIN mixdim m USING (source)
ORDER BY a.source, a.shard
"""


ORACLES = {
    "q89_training_pipeline": _pipeline_sql(),
    "q89b_curation_pipeline": _curation_sql(),
}

# Evaluate-once CTE pinning (see functions.materialize_ctes): the
# composed-pipeline oracles reference the tokenized/scored CTEs from
# several downstream stages (q89b measured 10.5 s -> 3.1 s at sf0.1).
from ..functions import materialize_ctes as _mat

for _k in ("q89_training_pipeline", "q89b_curation_pipeline"):
    ORACLES[_k] = _mat(ORACLES[_k])

QUERIES = {
    "q89_training_pipeline": q89_training_pipeline,
    "q89b_curation_pipeline": q89b_curation_pipeline,
}
