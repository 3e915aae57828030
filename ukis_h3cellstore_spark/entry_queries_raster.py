"""Driver-contract query for the raster source (S12) with a TRUE SQL
oracle: the SquareGrid pixel→cell mapping is integer arithmetic, so
DuckDB can recompute the exact cell ids relationally.

Mask: a deterministic disk ("water blob") over a 60×60 pixel grid
spanning the (10°..20° E, 40°..50° N) box; ingest at SquareGrid res 9
(cells finer than pixels → one cell per masked pixel).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ukis_h3cellstore_spark import geo
from ukis_h3cellstore_spark.raster import raster_to_dataframe

_N = 60
_PX = 10.0 / _N
_TRANSFORM = (_PX, 0.0, 10.0, 0.0, -_PX, 50.0)
_RES = 9


def _mask():
    import numpy as np

    m = np.zeros((_N, _N), dtype="int64")
    yy, xx = np.mgrid[0:_N, 0:_N]
    m[(yy - 30) ** 2 + (xx - 30) ** 2 <= 20**2] = 7
    m[5:10, 40:55] = 3
    return m


def q_raster_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return raster_to_dataframe(
        spark,
        _mask(),
        _TRANSFORM,
        _RES,
        nodata_value=0,
        grid=geo.SquareGrid(),
        band_rows=16,
    )


def _q_raster_ingest_sql() -> str:
    # SquareGrid arithmetic (geo.SquareGrid): size = 360 / 2^(res+3);
    # i = floor((lng+180)/size) wrapped; j = floor((lat+90)/size)
    # clamped; id = (1<<60) | (res<<52) | (i<<26) | j
    size = 360.0 / (1 << (_RES + 3))
    return f"""
WITH px AS (
  SELECT r.r AS row, c.c AS col
  FROM (SELECT unnest(generate_series(0, {_N - 1})) AS r) r,
       (SELECT unnest(generate_series(0, {_N - 1})) AS c) c
),
masked AS (
  SELECT row, col,
         CASE
           WHEN row >= 5 AND row < 10 AND col >= 40 AND col < 55 THEN 3
           WHEN (row-30)*(row-30) + (col-30)*(col-30) <= 400 THEN 7
           ELSE 0
         END AS value
  FROM px
),
cells AS (
  SELECT
    CAST(floor((({_TRANSFORM[0]} * (col + 0.5) + {_TRANSFORM[2]}) + 180.0)
               / {size}) AS BIGINT) AS i,
    CAST(floor((({_TRANSFORM[4]} * (row + 0.5) + {_TRANSFORM[5]}) + 90.0)
               / {size}) AS BIGINT) AS j,
    value
  FROM masked WHERE value <> 0
)
SELECT DISTINCT
  ((CAST(1 AS BIGINT) << 60) | (CAST({_RES} AS BIGINT) << 52)
   | ((i % {1 << (_RES + 3)}) << 26) | j) AS h3index,
  CAST(value AS BIGINT) AS value
FROM cells
"""


QUERIES_RASTER: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "raster_ingest": q_raster_ingest,
}

ORACLES_RASTER: dict[str, str] = {
    "raster_ingest": _q_raster_ingest_sql(),
}
