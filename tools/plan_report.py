"""Plan-quality report: prints the physical-plan properties that
matter at scale for each headline query — pushed filters reaching the
parquet scans, partition filters, join strategies, whole-stage codegen
spans, and any Python evaluation nodes. Usage:

    python tools/plan_report.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "h3_parent_agg_sum",
    "h3_compact",
    "h3_cell_membership",
    "ann_cosine_top3",
    "dedup_minhash_lsh_pairs",
    "text_stats",
    "events_asof_join",
    "events_range_join",
    "events_salted_join",
    "events_sessionize",
    "text_repetition",
    "text_gopher_quality",
    "dedup_lsh_verified",
    "corpus_stratified_sample",
    "corpus_decontaminate",
    "q9_profit_by_nation_year",
    "q21_blocking_suppliers",
    "q2_cheapest_supplier",
    "ann_sq8_top3",
    "text_boilerplate",
    "text_surprisal",
    "dedup_cross_modal",
    "dedup_semantic",
    "source_zordered_scan",
    # round-5 additions
    "geo_latlng_to_cell_hex",
    "geo_cell_centers_hex",
    "events_hex_parent_rollup",
    "corpus_dsir_weights",
    "q11_important_suppliers",
    # round-6 additions
    "dedup_substring_spans",
    "dedup_segments",
    "dedup_span_excise",
    "text_c4_filter",
    "events_global_cumsum",
    "text_bpe_pairs",
    "text_bpe_merge_apply",
    "text_bigram_surprisal",
    "corpus_quality_auc",
    "multimodal_phash_pairs",
    "corpus_clean_pipeline",
    "corpus_resampled_mix",
    # round-8/9 additions
    "events_ks_drift",
    "corpus_w1_drift",
    "graph_hits",
    "lineitem_copurchase_lift",
    "part_fuzzy_match",
    "ann_tiered_rerank",
    "corpus_curation_e2e",
    "events_funnel_conversion",
    "corpus_ngram_diversity",
    "corpus_pack_curriculum",
    "embedding_margin_pairs",
]


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed = [p for p in pushed if p.strip()]
        parts = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        parts = [p for p in parts if p.strip()]
        print(f"== {name}")
        print(f"   scans: {plan.count('FileScan')}  "
              f"pushed-filter scans: {len(pushed)}  "
              f"partition-filter scans: {len(parts)}")
        print(f"   joins: broadcast={plan.count('BroadcastHashJoin')} "
              f"sortmerge={plan.count('SortMergeJoin')} "
              f"nestedloop={plan.count('BroadcastNestedLoopJoin')}")
        print(f"   hashagg={plan.count('HashAggregate')} "
              f"python-eval={plan.count('BatchEvalPython')} "
              f"arrow-eval={plan.count('ArrowEvalPython')} "
              f"pandas={plan.count('FlatMapGroupsInPandas') + plan.count('MapInPandas')}")
        if pushed:
            print(f"   example pushdown: {pushed[0][:120]}")
    spark.stop()


if __name__ == "__main__":
    main()
