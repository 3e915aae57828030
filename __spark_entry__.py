"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose the SURVEY.md §2 operator
inventory as paired Spark implementations and DuckDB oracles (see
ukis_h3cellstore_spark/entry_queries.py for the determinism
conventions that make the value hashes match bit-for-bit).

ORDERING MATTERS: the driver's correctness gate samples the FIRST 50
registry entries each round, so the dicts are merged through an
explicit priority list — queries that have never earned a green
CORRECTNESS row come first, then the ones whose last green row is
oldest, then the most-recently-verified set. Rotate `_PRIORITY` each
round as rows come in (after r5, every gate has at least one driver
row; r6 samples the oldest-green r3 set plus the head of the r4 set).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# ROUND-8 ROTATION (computed by `python tools/rotation.py --python`):
# tier 1 = the 5 gates whose last driver row is r3, then the oldest
# r4-green set; round-8 additions are spliced to the head as written.
_PRIORITY = [
    # tier 1 — never driver-sampled (round-8 additions spliced at head)
    "corpus_tokenize_pack",
    "dedup_incremental_e2e",
    "corpus_novelty_rate",
    "corpus_filter_attrition",
    "corpus_l_diversity",
    "corpus_cluster_balanced_sample",
    "streaming_novelty",
    "events_ks_drift",
    "events_type_bucket_dependence",
    "events_pareto_frontier",
    "text_readability",
    "ann_matryoshka_top3",
    "streaming_cdc_upsert",
    "lineitem_copurchase_lift",
    "part_fuzzy_match",
    "events_cusum_changepoint",
    "corpus_psi_drift",
    "graph_hits",
    "orders_rfm_segments",
    "corpus_zipf_slope",
    "corpus_score_rank_corr",
    "streaming_psi_drift",
    "dedup_minhash_error",
    "geo_disk_smoothing",
    "part_abc_classes",
    "events_benford_audit",
    "events_markov_transitions",
    "corpus_length_gini",
    "corpus_jsd_drift",
    "embedding_two_nn_dim",
    "events_gap_survival",
    "text_burstiness",
    "geo_ring_profile",
    "corpus_surprisal_outliers",
    "multimodal_dup_clusters",
    "ann_tiered_rerank",
    "corpus_w1_drift",
    "text_code_score",
    # tier 2 — oldest driver-green first
    "text_stats",
    "text_langid",
    "text_token_counts",
    "text_fingerprint",
    "dedup_exact",
    "q12_late_shipment_priority",
    "q9_profit_by_nation_year",
    "q21_blocking_suppliers",
    "q2_cheapest_supplier",
    "lineitem_percentiles",
    "events_value_moments",
    "events_zscore",
    "source_orc_roundtrip",
    "orders_semi_anti_join",
    "events_variant_props",
    "source_csv_roundtrip",
    "events_distinct_daily",
    "events_user_type_signature",
    "part_string_funcs",
    "source_jsonl_roundtrip",
    "events_lateral_top2",
    "events_gapfill_daily",
    "events_map_ops",
    "events_window_nav",
    "text_normalize",
    "text_boilerplate",
    "text_quality_logit",
    "ann_sq8_top3",
    "ann_filtered_top3",
    "text_surprisal",
    "multimodal_features",
    "dedup_cross_modal",
    "dedup_lsh_verified",
    "embedding_norm_report",
    "multimodal_frame_sample",
    "text_gopher_quality",
    "corpus_source_report",
    "corpus_stratified_sample",
    "corpus_chunked",
    "corpus_length_filter",
    "corpus_oov_report",
    "corpus_cross_source_dups",
    "ann_pq_top3",
    "ann_ivfpq_top3",
    "dedup_containment",
    "text_char_entropy",
    "corpus_temperature_mix",
    "pipeline_templated_query",
    "geo_polyfill_traversal",
    "geo_border_cells",
]



def _ordered(merged: dict) -> dict:
    head = {k: merged[k] for k in _PRIORITY if k in merged}
    return head | {k: v for k, v in merged.items() if k not in head}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full CellStore insert→rollup→query pipeline over
    synthetic H3 cells derived from the events table at sf0.001."""
    from ukis_h3cellstore_spark.entry_queries import q_pipeline_sum_rollup

    return q_pipeline_sum_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ukis_h3cellstore_spark.entry_queries import QUERIES
    from ukis_h3cellstore_spark.entry_queries_geo import QUERIES_GEO
    from ukis_h3cellstore_spark.entry_queries_ops import QUERIES_OPS
    from ukis_h3cellstore_spark.entry_queries_raster import QUERIES_RASTER
    from ukis_h3cellstore_spark.entry_queries_rel import QUERIES_REL
    from ukis_h3cellstore_spark.entry_queries_stream import QUERIES_STREAM
    from ukis_h3cellstore_spark.entry_queries_trav import QUERIES_TRAV

    return _ordered(
        {
            **QUERIES,
            **QUERIES_REL,
            **QUERIES_OPS,
            **QUERIES_TRAV,
            **QUERIES_GEO,
            **QUERIES_RASTER,
            **QUERIES_STREAM,
        }
    )


def oracle_sql() -> dict[str, str]:
    from ukis_h3cellstore_spark.entry_queries import ORACLES
    from ukis_h3cellstore_spark.entry_queries_geo import ORACLES_GEO
    from ukis_h3cellstore_spark.entry_queries_ops import ORACLES_OPS
    from ukis_h3cellstore_spark.entry_queries_raster import ORACLES_RASTER
    from ukis_h3cellstore_spark.entry_queries_rel import ORACLES_REL
    from ukis_h3cellstore_spark.entry_queries_stream import ORACLES_STREAM
    from ukis_h3cellstore_spark.entry_queries_trav import ORACLES_TRAV

    return _ordered(
        {
            **ORACLES,
            **ORACLES_REL,
            **ORACLES_OPS,
            **ORACLES_TRAV,
            **ORACLES_GEO,
            **ORACLES_RASTER,
            **ORACLES_STREAM,
        }
    )
