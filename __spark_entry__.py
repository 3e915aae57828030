"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose the SURVEY.md §2 operator
inventory as paired Spark implementations and DuckDB oracles (see
ukis_h3cellstore_spark/entry_queries.py for the determinism
conventions that make the value hashes match bit-for-bit).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


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
    from ukis_h3cellstore_spark.entry_queries_stream import QUERIES_STREAM
    from ukis_h3cellstore_spark.entry_queries_trav import QUERIES_TRAV

    return {
        **QUERIES,
        **QUERIES_OPS,
        **QUERIES_TRAV,
        **QUERIES_GEO,
        **QUERIES_RASTER,
        **QUERIES_STREAM,
    }


def oracle_sql() -> dict[str, str]:
    from ukis_h3cellstore_spark.entry_queries import ORACLES
    from ukis_h3cellstore_spark.entry_queries_geo import ORACLES_GEO
    from ukis_h3cellstore_spark.entry_queries_ops import ORACLES_OPS
    from ukis_h3cellstore_spark.entry_queries_raster import ORACLES_RASTER
    from ukis_h3cellstore_spark.entry_queries_stream import ORACLES_STREAM
    from ukis_h3cellstore_spark.entry_queries_trav import ORACLES_TRAV

    return {
        **ORACLES,
        **ORACLES_OPS,
        **ORACLES_TRAV,
        **ORACLES_GEO,
        **ORACLES_RASTER,
        **ORACLES_STREAM,
    }
