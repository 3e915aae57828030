"""Driver-contract queries for the geometry suite (H5-H7): polygon →
cells ("polyfill" + exterior-ring union, reference traversal.rs:131-162)
feeding a distributed AOI membership + per-tile rollup, and
border_cells (reference geom/border_cells.rs:15-101).

These run on the :class:`~ukis_h3cellstore_spark.geo.SquareGrid`
backend (the ``h3`` wheel is absent in this container). What makes
them a REAL correctness gate rather than a self-comparison: the
DuckDB oracles re-implement the entire geometry pipeline
independently in SQL —

- the bbox scan + even-odd point-in-polygon polyfill is a
  ``generate_series`` cross product with the crossing-parity test
  written out per edge;
- the exterior-ring densification (samples every half cell size
  along each segment) is a per-segment ``generate_series`` of lerp'd
  points;
- the border dilation is an explicit 8-neighbor offset join.

So the Python geometry code (geo.py) and the SQL never share a line;
matching value hashes validate the algorithms, not the plumbing.

Event coordinates are synthesized deterministically from event ids
(the events table carries no lat/lon): integer arithmetic only, so
both engines agree bit-for-bit.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ukis_h3cellstore_spark import geo
from ukis_h3cellstore_spark.entry_queries import _events

#: AOI resolution: square-grid res 6 → 512 columns, cell size 0.703125°
GEO_RES = 6
_SIZE = 360.0 / (1 << (GEO_RES + 3))
_MARKER = 1 << 60

#: Non-degenerate triangle AOI (lng, lat), vertices chosen off the
#: cell-center lattice so even-odd and half-plane membership agree.
TRIANGLE = [
    (-20.17, -10.23),
    (25.31, -5.77),
    (2.93, 30.41),
    (-20.17, -10.23),
]
TRIANGLE_POLY = {"type": "Polygon", "coordinates": [TRIANGLE]}


def _synth_lng_sql(idc: str) -> str:
    return f"(({idc} * 7919) % 36000) / 100.0 - 180.0"


def _synth_lat_sql(idc: str) -> str:
    return f"(({idc} * 104729) % 14000) / 100.0 - 70.0"


def _synth_lng_col(idc: str):
    return ((F.col(idc) * 7919) % 36000) / 100.0 - 180.0


def _synth_lat_col(idc: str):
    return ((F.col(idc) * 104729) % 14000) / 100.0 - 70.0


def _sq_cell_col(lat, lng):
    """SquareGrid.latlng_to_cell as a JVM Column expression (the
    distributed twin of the driver-side grid method)."""
    i = F.floor((lng + F.lit(180.0)) / F.lit(_SIZE)).cast("long")
    j = F.floor((lat + F.lit(90.0)) / F.lit(_SIZE)).cast("long")
    n = F.lit(1 << (GEO_RES + 3))
    i = ((i % n) + n) % n
    j = F.greatest(F.lit(0), F.least(j, n / F.lit(2) - 1)).cast("long")
    return (
        F.lit(_MARKER)
        .bitwiseOR(F.lit(GEO_RES << 52))
        .bitwiseOR(F.shiftleft(i, 26))
        .bitwiseOR(j)
    )


def _sq_cell_sql(lat: str, lng: str) -> str:
    n = 1 << (GEO_RES + 3)
    return (
        f"({_MARKER} | {GEO_RES << 52}"
        f" | ((((CAST(floor(({lng} + 180.0) / {_SIZE}) AS BIGINT) % {n})"
        f" + {n}) % {n}) << 26)"
        f" | greatest(0, least(CAST(floor(({lat} + 90.0) / {_SIZE}) AS BIGINT),"
        f" {n // 2 - 1})))"
    )


def _duck_point_in_triangle(x: str, y: str) -> str:
    """Even-odd crossing parity over the triangle's edges — the same
    rule as geo.point_in_polygon, independently written out."""
    crossings = []
    for a in range(3):
        x1, y1 = TRIANGLE[a]
        x2, y2 = TRIANGLE[a + 1]
        crossings.append(
            f"(CASE WHEN (({y1} > {y}) <> ({y2} > {y}))"
            f" AND {x} < {x1} + ({y} - {y1}) / ({y2} - {y1}) * ({x2} - {x1})"
            f" THEN 1 ELSE 0 END)"
        )
    return f"(({' + '.join(crossings)}) % 2 = 1)"


def _duck_polyfill_cells() -> str:
    """CTE body: the AOI cell set = bbox-scan polyfill (centers inside
    the triangle) UNION exterior-ring trace cells — H6 re-implemented
    relationally."""
    lngs = [p[0] for p in TRIANGLE]
    lats = [p[1] for p in TRIANGLE]
    i0 = int((min(lngs) + 180.0) // _SIZE)
    i1 = int((max(lngs) + 180.0) // _SIZE)
    j0 = int((min(lats) + 90.0) // _SIZE)
    j1 = int((max(lats) + 90.0) // _SIZE)
    center_lng = f"(-180.0 + (i + 0.5) * {_SIZE})"
    center_lat = f"(-90.0 + (j + 0.5) * {_SIZE})"
    fill = f"""
  SELECT ({_MARKER} | {GEO_RES << 52} | (i << 26) | j) AS cell
  FROM (SELECT unnest(generate_series({i0}, {i1})) AS i),
       (SELECT unnest(generate_series({j0}, {j1})) AS j)
  WHERE {_duck_point_in_triangle(center_lng, center_lat)}
"""
    # ring trace: per segment, k = max(ceil(len / (size/2)), 1) lerp
    # samples at t/k — mirrors geo.densify_ring
    step = _SIZE / 2.0
    segs = []
    for a in range(3):
        x1, y1 = TRIANGLE[a]
        x2, y2 = TRIANGLE[a + 1]
        k = max(int(math.ceil(math.hypot(x2 - x1, y2 - y1) / step)), 1)
        px = f"({x1} + (t / {k}.0) * ({x2 - x1}))"
        py = f"({y1} + (t / {k}.0) * ({y2 - y1}))"
        segs.append(
            f"SELECT {_sq_cell_sql(py, px)} AS cell"
            f" FROM (SELECT unnest(generate_series(0, {k - 1})) AS t)"
        )
    ring = " UNION ALL ".join(segs)
    return f"SELECT DISTINCT cell FROM ({fill} UNION ALL {ring})"


def q_geo_polyfill_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6 + the geometry-first AOI read: polygon → cells on the driver
    (polyfill + exterior ring, exactly the reference's to_h3_cells),
    then ONE distributed job — synth event points → cells, broadcast
    semi-join against the AOI cover, per-cell aggregation with the
    aperture-4 parent tile attached (the traverse_apply grouping)."""
    aoi = geo.polygon_to_cells(TRIANGLE_POLY["coordinates"], GEO_RES, geo.SquareGrid())
    cells_df = spark.createDataFrame([(c,) for c in aoi], "cell long")
    e = _events(spark, sf_dir)
    pts = e.select(
        F.col("event_id"),
        (F.round(F.col("value") * 100)).cast("long").alias("value_cents"),
        _sq_cell_col(_synth_lat_col("event_id"), _synth_lng_col("event_id")).alias(
            "cell"
        ),
    )
    mask26 = (1 << 26) - 1
    i = F.shiftrightunsigned(F.col("cell"), 26).bitwiseAND(F.lit(mask26))
    j = F.col("cell").bitwiseAND(F.lit(mask26))
    tile = (
        F.lit(_MARKER)
        .bitwiseOR(F.lit((GEO_RES - 1) << 52))
        .bitwiseOR(F.shiftleft(F.floor(i / 2).cast("long"), 26))
        .bitwiseOR(F.floor(j / 2).cast("long"))
    )
    return (
        pts.join(F.broadcast(cells_df), on="cell", how="leftsemi")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_cents").cast("long").alias("sum_cents"),
        )
        .withColumn("tile", tile)
        .select("tile", "cell", "n_events", "sum_cents")
    )


def _q_geo_polyfill_traversal_sql() -> str:
    mask26 = (1 << 26) - 1
    return f"""
WITH aoi AS ({_duck_polyfill_cells()}),
pts AS (
  SELECT {_sq_cell_sql(_synth_lat_sql('event_id'), _synth_lng_sql('event_id'))}
           AS cell,
         CAST(round(value * 100) AS BIGINT) AS value_cents
  FROM events
),
agg AS (
  SELECT cell, COUNT(*) AS n_events,
         CAST(SUM(value_cents) AS BIGINT) AS sum_cents
  FROM pts WHERE cell IN (SELECT cell FROM aoi)
  GROUP BY cell
)
SELECT ({_MARKER} | {(GEO_RES - 1) << 52}
        | ((((cell >> 26) & {mask26}) // 2) << 26)
        | ((cell & {mask26}) // 2)) AS tile,
       cell, n_events, sum_cents
FROM agg
"""


def q_geo_border_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H7: the width-2 border lining the inside of the AOI polygon
    (ring-trace layer + one grid_disk(1) dilation kept inside the
    cover). The driver computes it with geo.border_cells; the oracle
    re-derives the same set with an explicit 8-neighbor offset join."""
    cells = geo.border_cells(TRIANGLE_POLY, GEO_RES, width=2, grid=geo.SquareGrid())
    return spark.createDataFrame([(c,) for c in cells], "cell long")


def _q_geo_border_cells_sql() -> str:
    mask26 = (1 << 26) - 1
    step = _SIZE / 2.0
    segs = []
    for a in range(3):
        x1, y1 = TRIANGLE[a]
        x2, y2 = TRIANGLE[a + 1]
        k = max(int(math.ceil(math.hypot(x2 - x1, y2 - y1) / step)), 1)
        px = f"({x1} + (t / {k}.0) * ({x2 - x1}))"
        py = f"({y1} + (t / {k}.0) * ({y2 - y1}))"
        segs.append(
            f"SELECT {_sq_cell_sql(py, px)} AS cell"
            f" FROM (SELECT unnest(generate_series(0, {k - 1})) AS t)"
        )
    ring = " UNION ALL ".join(segs)
    return f"""
WITH cover AS ({_duck_polyfill_cells()}),
ring AS (SELECT DISTINCT cell FROM ({ring})),
layer0 AS (SELECT cell FROM ring WHERE cell IN (SELECT cell FROM cover)),
dilated AS (
  SELECT DISTINCT ({_MARKER} | {GEO_RES << 52}
          | (((((cell >> 26) & {mask26}) + di + {1 << (GEO_RES + 3)})
              % {1 << (GEO_RES + 3)}) << 26)
          | greatest(0, least((cell & {mask26}) + dj,
                              {(1 << (GEO_RES + 3)) // 2 - 1}))) AS cell
  FROM layer0,
       (SELECT unnest(generate_series(-1, 1)) AS di),
       (SELECT unnest(generate_series(-1, 1)) AS dj)
),
layer1 AS (
  SELECT cell FROM dilated
  WHERE cell IN (SELECT cell FROM cover)
    AND cell NOT IN (SELECT cell FROM layer0)
)
SELECT cell FROM layer0 UNION SELECT cell FROM layer1
"""


def q_geo_latlng_to_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 ``geoToH3`` through the registered SQL-function path: the
    Python UDF is backed by the closure-shipped SquareGrid (no ``h3``
    wheel here), applied to synthesized event coordinates inside a
    ``spark.sql`` statement — the CH-template execution route. The
    oracle recomputes the same grid arithmetic relationally."""
    from ukis_h3cellstore_spark.functions import register_h3_sql_functions

    register_h3_sql_functions(spark, grid=geo.SquareGrid())
    _events(spark, sf_dir).createOrReplaceTempView("__geo_events")
    lng = _synth_lng_sql("event_id")
    lat = _synth_lat_sql("event_id")
    return spark.sql(
        f"""
        SELECT geoToH3({lat}, {lng}, {GEO_RES}) AS cell,
               COUNT(*) AS n_events
        FROM __geo_events GROUP BY 1
        """
    )


def _q_geo_latlng_to_cell_sql() -> str:
    return f"""
SELECT {_sq_cell_sql(_synth_lat_sql('event_id'), _synth_lng_sql('event_id'))}
         AS cell,
       COUNT(*) AS n_events
FROM events GROUP BY 1
"""


def q_geo_grid_disk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5 grid_disk through the geo backend, reference-client shape
    (traversal.rs computes disks driver-side then fetches): 40 event
    coordinates → centers → k=2 disks via geo.SquareGrid.grid_disk,
    parallelized as (center_cell, disk_cell) rows. The oracle
    re-derives every disk with independent SQL lattice arithmetic
    (wraparound modulo, pole clamping), so matching hashes validate
    the Python neighborhood algebra, not the plumbing."""
    grid = geo.SquareGrid()
    ids = [
        r.event_id
        for r in _events(spark, sf_dir)
        .filter(F.col("event_id") < 40)
        .select("event_id")
        .distinct()
        .collect()
    ]
    rows = set()
    for ev in sorted(ids):
        lng = ((ev * 7919) % 36000) / 100.0 - 180.0
        lat = ((ev * 104729) % 14000) / 100.0 - 70.0
        center = grid.latlng_to_cell(lat, lng, GEO_RES)
        for c in grid.grid_disk(center, 2):
            rows.add((center, c))
    return spark.createDataFrame(
        sorted(rows), "center_cell long, disk_cell long"
    )


def _q_geo_grid_disk_sql() -> str:
    n = 1 << (GEO_RES + 3)
    mask = (1 << 26) - 1
    return f"""
WITH centers AS (
  SELECT DISTINCT
    {_sq_cell_sql(_synth_lat_sql('event_id'), _synth_lng_sql('event_id'))}
      AS center
  FROM events WHERE event_id < 40
),
un AS (
  SELECT center, (center >> 26) & {mask} AS i, center & {mask} AS j
  FROM centers
),
offs AS (
  SELECT a.di, b.dj
  FROM (SELECT unnest(generate_series(-2, 2)) AS di) a,
       (SELECT unnest(generate_series(-2, 2)) AS dj) b
)
SELECT DISTINCT center AS center_cell,
       ({_MARKER} | {GEO_RES << 52}
        | ((((i + di) % {n} + {n}) % {n}) << 26)
        | greatest(0, least(j + dj, {n // 2 - 1}))) AS disk_cell
FROM un, offs
"""


QUERIES_GEO: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "geo_grid_disk": q_geo_grid_disk,
    "geo_polyfill_traversal": q_geo_polyfill_traversal,
    "geo_border_cells": q_geo_border_cells,
    "geo_latlng_to_cell": q_geo_latlng_to_cell,
}

ORACLES_GEO: dict[str, str] = {
    "geo_grid_disk": _q_geo_grid_disk_sql(),
    "geo_polyfill_traversal": _q_geo_polyfill_traversal_sql(),
    "geo_border_cells": _q_geo_border_cells_sql(),
    "geo_latlng_to_cell": _q_geo_latlng_to_cell_sql(),
}
