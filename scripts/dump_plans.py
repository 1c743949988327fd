"""Regenerate PLANS.md: formatted physical plans for representative queries,
the evidence behind SCALING.md's claims. Usage:

    python scripts/dump_plans.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventstream_spark.operators import all_queries
from eventstream_spark.session import get_spark

PICKS = {
    "q03_filter_project": "pushdown + pruning reach the parquet scan (PushedFilters, 2-column ReadSchema)",
    "q05_join_rollup": "all three dims broadcast; the fact side never shuffles",
    "q09_request_response": "composite (user_id, hour_bucket) equi-key with the 1-hour range as residual — hot-user fanout bounded per hour",
    "q13_topk_per_group": "WindowGroupLimit caps per-group state before the sort",
    "q44_embedding_neardup": "LSH-bucketed near-dup: equi-join on the bucket key, no BroadcastNestedLoopJoin",
    "q15_topn": "TakeOrderedAndProject: per-partition heaps, no global sort",
    "q41_ngram_jaccard": "df-capped inverted-index count join (r10 replan): window df rides the h exchange into the pair self-join; counts aggregate at corpus-scaled partitions; heavy tables broadcast; NO per-doc array crosses a shuffle",
    "q53_ivf_ann": "map-side centroid assignment: literal planes, no centroid join before the cell shuffle",
    "q62_exists_subquery": "EXISTS decorrelates to a left-semi join (AQE-broadcastable)",
    "q64_range_frame": "RANGE frame: one exchange on user_id, linear in-partition state",
    "q21b_sliding_window": "sliding window: map-side 2x expansion, one aggregation shuffle",
    "q71_order_priority": "EXISTS decorrelates to LeftSemi; lineitem contributes keys, never rows",
    "q74_disjunctive_pred": "OR-of-triples still pushes per-column disjunct bounds into both scans",
    "q82_token_packing": "sequence packing: one window exchange on the stratum key, agg rides the same partitioning",
    "q94_local_supplier_volume": "Q5 shape: every dimension hop broadcast; one fact-fact shuffle, one agg shuffle",
    "q99_waiting_suppliers": "Q21 shape: EXISTS/NOT-EXISTS fused into one grouped pass; order set applies as LeftSemi",
    "q102_unpivot": "unpivot is a zero-shuffle Expand; the only exchange is the final groupBy",
    "q121_pii_scrub": "PII/blocklist scrub: pure per-row regex + token filters, one rollup exchange — no joins, no windows",
    "q122_span_coverage": "span coverage: two aggregations + one equi-join on the span key, all hash-partitioned text keys",
    "q123_semantic_dedup": "SemDeDup: map-side centroid assignment, pairwise check shuffles once on the cell key",
    "q51b_matmul_knn": "BLAS kNN: MapInPandas (Arrow) scoring, per-partition top-k, tiny global re-rank window",
    "q136_bloom_semi_join": "bloom pre-filter: all 3 bitmap probes run in the probe scan's Filter (codegen), before the exact semi-join",
    "q137_heavy_hitters": "Misra-Gries: MapInPandas candidate pruning, broadcast semi-join recount — shuffle bounded by partitions x k",
    "q139_pagerank": "integer PageRank: both iterations read the persisted edge set (InMemoryTableScan), one join + one agg per iteration",
    "q142_inverted_index": "inverted index: both agg levels partial (map-side) — the explode never crosses a shuffle raw",
    "q143_weighted_sample": "weighted top-k: TakeOrderedAndProject, no global sort",
    "q150_equidepth_histogram": "equi-depth buckets via scalable_ntile: rangepartitioning exchange + per-partition rank — no single-task Window",
    "q155_fuzzy_blocked_match": "fuzzy ER: equi-join on the (brand, size) blocking key; levenshtein only as a post-join projection, never a join condition",
    "q156_interval_concurrency": "sweep-line: map-side endpoint explode (one scan), two-level running sum — window partitions carry the bucket key",
    "q158_bm25_topk": "BM25: query-term side broadcast into the posting join; per-query top-k is WindowGroupLimit",
    "q163_mutual_ann": "mutual ANN: one bucketed A-B equi-join; both rank directions window the same candidate frame",
    "q165_count_min": "count-min: sketch is a depth-x-width groupBy of map-side partials; the estimate join broadcasts the 768-row sketch",
    "q178_hll_distinct": "HLL: register build is a (type, bucket) groupBy of map-side partial maxes — state bounded at 256 integers per group",
    "q181_ks_test": "KS: CDF running sums carry the value-bucket key (two-level, no single-task window over the data); max-gap reduces map-side",
    "q184_recursive_rollup": "recursive CTE: UnionLoop iterative frontier (log-depth), then one hash aggregate over the ancestor table",
    "q186_int8_quant": "INT8 audit: posexplode is map-side; the only exchanges are the 64-row dim agg and its broadcast join-back",
    "q211_dsir_select": "DSIR: one gram shuffle builds the 4096-row lambda table, which joins back BROADCAST; top-fraction via the range-partitioned rank, never a single-task window",
    "q212_embedding_gram": "Gram/cov: MapInPandas int64 GEMM partials per Arrow batch; ONE (i,j) hash exchange, then broadcast joins on the d-row sum table",
    "q214_selection_curve": "selection curve: map-side scoring + scalable_ntile's range exchange; the cumulative window runs on the 10-row decile rollup",
    "q217_ivfpq_ann": "IVF-PQ: assignment/encode are literal-matrix map work (no exchange); the |queries|x n_probe LUT table broadcasts onto the cell-keyed inverted lists",
    "q217b_ivfpq_ann_scaled": "grown-cells IVF-PQ: assignment+encode are MapInPandas GEMM passes (no centroid join in the plan); the LUT table broadcasts onto the cell-keyed codes",
    "q219_suffix_span_dedup": "suffix dedup: ONE range exchange on the suffix key; lag/lead windows partition on the range-partition id (no single-task window)",
    "q220_substring_removal": "substring removal: reads the SHARED persisted rep_len stage (q219's sort+LCP, computed once per session) + one doc_id hash exchange for the per-doc coverage sweep",
    "q210_quantile_sketch": "quantile sketch: TakeOrdered sample + bucketed rank-pick — histogram aggregate and a window over ONLY the target buckets; no full-table range exchange (the r8 reclaim)",
    "q221_doremi_step": "DoReMi: one (source, term) corpus groupBy; LM table aggregates FROM it; broadcast totals; K-row dimension math with an integer micro-sum normalizer",
    "q224_rho_select": "RHO selection: (doc, term) groupBy + vocab-join scoring; global quarter cut via the range-partitioned rank",
    "q222_ann_recall_audit": "ANN recall audit: shares the IVF-PQ GEMM build; exact side is one broadcast corpus scan; audit joins are rows <= 5 x |queries|",
    "q223_curriculum_order": "curriculum: stage assigned MAP-SIDE against the 9 broadcast boundary tuples (the r8-late reclaim); ONE range exchange for the global position, down from two",
    "q226_pca_project": "PCA projection: the corpus projects in ONE MapInPandas GEMM pass (zero exchange before the K-row audit groupBy); components are a broadcast literal matrix",
    "q228_sequence_pack": "sequence packing: map-side token counts; the only exchange is the per-shard hash partition + writer sort; frame-bounded running-sum window per shard",
    "q229_cluster_balanced_select": "cluster-balanced select: MapInPandas GEMM assignment (no centroid join); one cell-key exchange; the per-cell window sorts ~sqrt(N) rows per cell",
    "q234_domain_transfer_matrix": "transfer matrix: one (source, term) corpus groupBy; LM/floors/scoring joins all run on vocabulary-bounded aggregates — corpus size never re-enters the K^2 assembly",
    "q241_exact_span_decontam": "exact-span decontamination: the benchmark window set broadcasts into the corpus probe (BroadcastHashJoin) — corpus windows explode map-side, the corpus never shuffles before the per-doc fold",
}


def formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="dump-plans")
    qs = all_queries()
    print("# PLANS — physical-plan evidence for the scale claims\n")
    print(
        "Generated with `.explain('formatted')` (plans are scale-independent;\n"
        "regenerate: `python scripts/dump_plans.py > PLANS.md`). What to look for\n"
        "is noted per query; the same properties are asserted as regression tests\n"
        "in `tests/test_plans.py` and `tests/test_sources.py`.\n"
    )
    for name, note in PICKS.items():
        print(f"## {name}\n\n*{note}*\n")
        plan = formatted_plan(spark, qs[name](spark, sf))
        lines = [ln[:200] for ln in plan.splitlines()[:90]]
        print("```")
        print("\n".join(lines))
        print("```\n")


if __name__ == "__main__":
    main()
