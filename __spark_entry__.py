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
round as rows come in (r4 samples the 50 never-sampled gates; the
r2/r3-verified set sits behind them and rotates back in r5).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# First-50 sampling priority for round 4: the 50 never-sampled gates
# (r3-late + r4-new code) = exactly the driver's 50-query sample; the
# whole head was swept green locally (tools/check_correctness.py,
# artifact CORRECTNESS_LOCAL_r04.json) before registration.
# ROUND-5 ROTATION (do this first in r5): replace _PRIORITY with the
# first 50 of the tail below — gates never driver-sampled in r4
# (r4-late additions first, then the r3-verified set, oldest-green
# first) — and push the current head to the back. Tail order as of
# r4 close: dedup_semantic, geo_grid_disk, streaming_tableset_ingest,
# pipeline_join_tablesets, source_zordered_scan,
# q11_important_suppliers, q20_dominant_suppliers,
# events_window_ntile, events_grouping_sets, then the r3-verified 41+
# (q1/q3/q5/q6/q4/q18/q7/q8/q10/q15/q19/q13/q14/q16/q17/q22, the
# events_* suite, h3_* suite, pipeline_* suite, text/dedup/ann r2
# set, raster_ingest, streaming_windowed_rollup). All 137 have green
# rows in CORRECTNESS_LOCAL_r04{,_sf0.1}.json.
_PRIORITY = [
    # tier 1 — never sampled (all locally verified vs DuckDB oracles)
    "orders_semi_anti_join",
    "events_variant_props",
    "source_csv_roundtrip",
    "events_distinct_daily",
    "events_user_type_signature",
    "part_string_funcs",
    "geo_polyfill_traversal",
    "geo_border_cells",
    "geo_latlng_to_cell",
    "streaming_dedup_exact",
    "streaming_sessionize",
    "streaming_interval_join",
    "pipeline_templated_query",
    "dedup_lsh_verified",
    "embedding_norm_report",
    "multimodal_frame_sample",
    "text_gopher_quality",
    "corpus_source_report",
    "corpus_stratified_sample",
    "corpus_chunked",
    "source_jsonl_roundtrip",
    "events_lateral_top2",
    "events_gapfill_daily",
    "events_map_ops",
    "events_window_nav",
    "corpus_length_filter",
    "corpus_oov_report",
    "corpus_cross_source_dups",
    "ann_pq_top3",
    "ann_ivfpq_top3",
    "dedup_containment",
    "text_char_entropy",
    "corpus_temperature_mix",
    "q12_late_shipment_priority",
    "q9_profit_by_nation_year",
    "q21_blocking_suppliers",
    "q2_cheapest_supplier",
    "text_normalize",
    "text_boilerplate",
    "text_quality_logit",
    "ann_sq8_top3",
    "streaming_topk",
    "dedup_cross_modal",
    "lineitem_percentiles",
    "events_value_moments",
    "events_zscore",
    "ann_filtered_top3",
    "text_surprisal",
    "multimodal_features",
    "source_orc_roundtrip",
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
