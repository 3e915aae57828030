"""Driver-contract queries for traversal (Q3) and stats (Q4) — the
full streaming-read and statistics pipelines run end-to-end against a
throwaway warehouse, with DuckDB oracles stating the equivalent
relational result over the raw events table.

Cell synthesis matches entry_queries: ``synth_cell(event_id, 6)``
res-6 cells derived from event ids (deterministic in both engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ukis_h3cellstore_spark.entry_queries import (
    DUCK,
    _events,
    _pipeline_store,
    _synth_col,
    _synth_py,
)
from ukis_h3cellstore_spark.h3 import cells as h3c
from ukis_h3cellstore_spark.h3 import sqlgen as sg
from ukis_h3cellstore_spark.traversal import (
    TraversalOptions,
    build_traverser,
    traverse_apply,
)


def _trav_schema():
    from ukis_h3cellstore_spark import CompactedTableSchemaBuilder

    return (
        CompactedTableSchemaBuilder("entry_trav")
        .h3_base_resolutions([4, 6])
        .add_h3index_column()
        .add_aggregated_column("value_cents", "UInt64", "Sum")
        .build()
    )


def _trav_loaded_store(spark: SparkSession, sf_dir: str):
    store = _pipeline_store(spark)
    e = _events(spark, sf_dir)
    df = e.select(
        _synth_col("event_id", 6).alias("h3index"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    store.insert_h3dataframe_into_tableset(_trav_schema(), df)
    return store


def _aoi_parents() -> list[int]:
    """8 res-4 traversal tiles with data (parents of synth cells)."""
    return sorted({h3c.cell_to_parent(_synth_py(i, 6), 4) for i in range(60)})[:8]


def q_pipeline_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 pull-iterator: traverse the AOI tile-by-tile (each step one
    bounded Q2 query at res 6), union the per-tile results."""
    store = _trav_loaded_store(spark, sf_dir)
    trav = build_traverser(
        store,
        "entry_trav",
        _aoi_parents(),
        6,
        options=TraversalOptions(max_h3indexes_fetch_count=50),
    )
    parts = [step.contained_data.df for step in trav]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("h3index", "value_cents")


def _q_pipeline_traversal_sql() -> str:
    cell = sg.synth_cell("event_id", 6, DUCK)
    plist = ", ".join(str(p) for p in _aoi_parents())
    return f"""
WITH syn AS (
  SELECT {cell} AS h3index,
         CAST(round(value*100) AS BIGINT) AS value_cents
  FROM events
)
SELECT h3index, CAST(SUM(value_cents) AS BIGINT) AS value_cents
FROM syn
WHERE {sg.to_parent('h3index', 4, DUCK)} IN ({plist})
GROUP BY h3index
"""


def q_pipeline_traverse_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 distributed variant: ONE job, grouped by traversal tile,
    per-tile pandas aggregation via applyInPandas."""
    store = _trav_loaded_store(spark, sf_dir)

    def per_tile(pdf):
        import pandas as pd

        return pd.DataFrame(
            {
                "traversal_cell": [int(pdf["__traversal_cell"].iloc[0])],
                "n_cells": [int(pdf["h3index"].nunique())],
                "sum_cents": [int(pdf["value_cents"].sum())],
            }
        )

    return traverse_apply(
        store,
        "entry_trav",
        _aoi_parents(),
        6,
        per_tile,
        "traversal_cell long, n_cells long, sum_cents long",
        options=TraversalOptions(max_h3indexes_fetch_count=50),
    )


def _q_pipeline_traverse_apply_sql() -> str:
    cell = sg.synth_cell("event_id", 6, DUCK)
    plist = ", ".join(str(p) for p in _aoi_parents())
    return f"""
WITH syn AS (
  SELECT {cell} AS h3index,
         CAST(round(value*100) AS BIGINT) AS value_cents
  FROM events
),
agg AS (
  SELECT h3index, SUM(value_cents) AS value_cents,
         {sg.to_parent('h3index', 4, DUCK)} AS traversal_cell
  FROM syn
  WHERE {sg.to_parent('h3index', 4, DUCK)} IN ({plist})
  GROUP BY 1, 3
)
SELECT traversal_cell,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(value_cents) AS BIGINT) AS sum_cents
FROM agg GROUP BY 1
"""


def q_pipeline_traversal_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 with a prefilter (P4): the filter query runs at the
    traversal resolution (res 4, where rows are the tile-level rollup
    sums), tiles it returns no rows for are skipped, surviving tiles
    fetch in full at res 6. Oracle: keep rows of tiles whose TOTAL
    value reaches the threshold."""
    from ukis_h3cellstore_spark.query import TableSetQuery

    store = _trav_loaded_store(spark, sf_dir)
    f = TableSetQuery.from_template(
        "select * from <[table]> where value_cents >= 2000 "
        "and h3index in <[h3indexes]>"
    )
    trav = build_traverser(
        store,
        "entry_trav",
        _aoi_parents(),
        6,
        options=TraversalOptions(max_h3indexes_fetch_count=50, filter_query=f),
    )
    parts = [step.contained_data.df for step in trav]
    if not parts:
        return spark.createDataFrame([], "h3index long, value_cents long")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("h3index", "value_cents")


def _q_pipeline_traversal_prefiltered_sql() -> str:
    cell = sg.synth_cell("event_id", 6, DUCK)
    plist = ", ".join(str(p) for p in _aoi_parents())
    return f"""
WITH syn AS (
  SELECT {cell} AS h3index,
         CAST(round(value*100) AS BIGINT) AS value_cents
  FROM events
),
agg AS (
  SELECT h3index, CAST(SUM(value_cents) AS BIGINT) AS value_cents,
         {sg.to_parent('h3index', 4, DUCK)} AS tile
  FROM syn
  WHERE {sg.to_parent('h3index', 4, DUCK)} IN ({plist})
  GROUP BY 1, 3
),
live_tiles AS (
  -- the res-4 base table holds one rollup row per tile: the filter
  -- sees the tile's total
  SELECT tile FROM agg GROUP BY tile
  HAVING CAST(SUM(value_cents) AS BIGINT) >= 2000
)
SELECT h3index, value_cents
FROM agg WHERE tile IN (SELECT tile FROM live_tiles)
"""


def q_pipeline_tableset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: per-table row counts + derived finest-resolution cell
    counts after a full insert (Sum schema → no compacted tables:
    base tables at res 4 and 6 only)."""
    store = _trav_loaded_store(spark, sf_dir)
    return store.tableset_stats("entry_trav").select(
        "table_name", "resolution", "is_compacted", "num_rows",
        "num_cells_at_max_res",
    )


def _q_pipeline_tableset_stats_sql() -> str:
    cell = sg.synth_cell("event_id", 6, DUCK)
    return f"""
WITH syn AS (SELECT DISTINCT {cell} AS h3index FROM events),
c6 AS (SELECT COUNT(*) AS n FROM syn),
c4 AS (SELECT COUNT(DISTINCT {sg.to_parent('h3index', 4, DUCK)}) AS n FROM syn)
SELECT 'entry_trav_04_base' AS table_name, 4 AS resolution,
       FALSE AS is_compacted, CAST(c4.n AS BIGINT) AS num_rows,
       CAST(c4.n AS BIGINT) AS num_cells_at_max_res
FROM c4
UNION ALL
SELECT 'entry_trav_06_base', 6, FALSE, CAST(c6.n AS BIGINT),
       CAST(c6.n AS BIGINT)
FROM c6
"""


def _templ_cells() -> list[int]:
    """Res-6 query cells (synth cells of the first 200 event ids)."""
    return sorted({_synth_py(i, 6) for i in range(200)})


def q_pipeline_templated_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: a CH-dialect templated predicate through the full store
    read path — ``<[table]>``/``<[h3indexes]>`` placeholders plus the
    registered ``h3GetBaseCell``/``modulo`` SQL functions evaluated
    inside the per-table query (reference templated queries,
    query.rs + functions registered per §2.6)."""
    from ukis_h3cellstore_spark.functions import register_h3_sql_functions
    from ukis_h3cellstore_spark.query import TableSetQuery

    register_h3_sql_functions(spark)
    store = _trav_loaded_store(spark, sf_dir)
    q = TableSetQuery.from_template(
        "select h3index, value_cents from <[table]> "
        "where modulo(h3GetBaseCell(h3index), 2) = 0 "
        "and value_cents >= 500 and h3index in <[h3indexes]>"
    )
    out = store.query_tableset_cells("entry_trav", _templ_cells(), 6, query=q)
    return out.df.select("h3index", "value_cents")


def _q_pipeline_templated_query_sql() -> str:
    cell = sg.synth_cell("event_id", 6, DUCK)
    clist = ", ".join(str(c) for c in _templ_cells())
    return f"""
WITH syn AS (
  SELECT {cell} AS h3index,
         CAST(round(value*100) AS BIGINT) AS value_cents
  FROM events
),
merged AS (
  SELECT h3index, CAST(SUM(value_cents) AS BIGINT) AS value_cents
  FROM syn GROUP BY h3index
)
SELECT h3index, value_cents FROM merged
WHERE ({sg.base_cell('h3index', DUCK)} % 2) = 0
  AND value_cents >= 500
  AND h3index IN ({clist})
"""


QUERIES_TRAV: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pipeline_traversal": q_pipeline_traversal,
    "pipeline_traversal_prefiltered": q_pipeline_traversal_prefiltered,
    "pipeline_traverse_apply": q_pipeline_traverse_apply,
    "pipeline_tableset_stats": q_pipeline_tableset_stats,
    "pipeline_templated_query": q_pipeline_templated_query,
}

ORACLES_TRAV: dict[str, str] = {
    "pipeline_traversal": _q_pipeline_traversal_sql(),
    "pipeline_traversal_prefiltered": _q_pipeline_traversal_prefiltered_sql(),
    "pipeline_traverse_apply": _q_pipeline_traverse_apply_sql(),
    "pipeline_tableset_stats": _q_pipeline_tableset_stats_sql(),
    "pipeline_templated_query": _q_pipeline_templated_query_sql(),
}
