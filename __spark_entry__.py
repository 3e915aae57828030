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

# ROUND-9 ROTATION (computed by `python tools/rotation.py --python`):
# tier 1 = the 6 round-9 additions, then the FULL 43-gate r4-aged
# backlog (the registry's oldest driver-green cohort) + the oldest r5
# entry — exactly the head-50 the round-8 verdict prescribed.
_PRIORITY = [
    # tier 1 — never driver-sampled (round-9 additions at head)
    "corpus_curation_e2e",
    "part_fuzzy_link",
    "events_funnel_conversion",
    "corpus_ngram_diversity",
    "corpus_pack_curriculum",
    "embedding_margin_pairs",
    "embedding_source_drift",
    # tier 2 — oldest driver-green first (the r4-aged backlog)
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
    "geo_latlng_to_cell",
    "streaming_topk",
    "streaming_dedup_exact",
    "streaming_sessionize",
    "streaming_interval_join",
    "q1_pricing_summary",
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
