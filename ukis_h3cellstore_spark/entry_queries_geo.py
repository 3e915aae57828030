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




# --------------------------------------------------- real-hex geoToH3

#: 200 vendored (event_id → res-5 H3 index) pairs for the real
#: hexagonal grid, precomputed with the pure-Python icosahedral core
#: (h3/icosa.py) over the same synthesized coordinates the Spark side
#: uses. Anchoring chain: the core itself is pinned to PUBLIC ground
#: truth in tests/test_h3_public_vectors.py (latLngToCell/cellToLatLng
#: doc vectors, SF polyfill counts from the H3 C suite, disk size
#: formulas) plus exhaustive res-1..3 round-trips; this gate then
#: proves the DISTRIBUTED path — Arrow-batched pandas UDF, per-res
#: batching, bit packing — reproduces the driver-side reference
#: implementation bit-for-bit, and cross-checks the index bit layout
#: (base-cell extraction) in DuckDB integer arithmetic.
_HEX_VECTORS = """(0, 603108745894952959),
  (1, 601567589222580223),
  (2, 599108261957861375),
  (3, 601329319469383679),
  (4, 599338370199453695),
  (5, 601799811661823999),
  (6, 599231734751428607),
  (7, 602013487358541823),
  (8, 599631011017392127),
  (9, 601778953153150975),
  (10, 599659719652540415),
  (11, 601878989383925759),
  (12, 599769657930416127),
  (13, 602239256609423359),
  (14, 599929980469641215),
  (15, 602611644232630271),
  (16, 599978085177098239),
  (17, 602569456916365311),
  (18, 600575839398002687),
  (19, 602691535993044991),
  (20, 600495193870827519),
  (21, 602924720504963071),
  (22, 600816411253669887),
  (23, 603112927045615615),
  (24, 600784937733324799),
  (25, 603031664116891647),
  (26, 601349463939743743),
  (27, 599063457932771327),
  (28, 601527643879243775),
  (29, 599456304632692735),
  (30, 601645970228248575),
  (31, 599349405044178943),
  (32, 601714521127518207),
  (33, 599239902705483775),
  (34, 601667411778732031),
  (35, 599541884003549183),
  (36, 602337987170140159),
  (37, 599685270412984319),
  (38, 601954050379874303),
  (39, 600091719274332159),
  (40, 602498878792531967),
  (41, 600239699151290367),
  (42, 602683377702666239),
  (43, 600475427357589503),
  (44, 602547314212470783),
  (45, 600355719102857215),
  (46, 602962517290909695),
  (47, 600633367263707135),
  (48, 603036543199739903),
  (49, 600757238415491071),
  (50, 603105049001852927),
  (51, 600888083520421887),
  (52, 599086879463178239),
  (53, 601329584683614207),
  (54, 599059429253447679),
  (55, 601399145973940223),
  (56, 599248686987345919),
  (57, 601285968216981503),
  (58, 599632007449804799),
  (59, 601777833240428543),
  (60, 599673803924045823),
  (61, 601880723476971519),
  (62, 599758612348272639),
  (63, 602216068080992255),
  (64, 599957962181574655),
  (65, 602125041617862655),
  (66, 599980178973655039),
  (67, 602570517773287423),
  (68, 599882777705316351),
  (69, 602696441919438847),
  (70, 600511336505409535),
  (71, 602772789258092543),
  (72, 600831334117539839),
  (73, 602728264405876735),
  (74, 600784544743817215),
  (75, 603030345561931775),
  (76, 600688165677694975),
  (77, 603133168152739839),
  (78, 600938359333847039),
  (79, 599099934016274431),
  (80, 601629770685349887),
  (81, 599350946937438207),
  (82, 601700429339820031),
  (83, 599241699075555327),
  (84, 601654672905732095),
  (85, 599544782032732159),
  (86, 601743942727237631),
  (87, 599688178105843711),
  (88, 601952563247448063),
  (89, 600093942993649663),
  (90, 602506066420301823),
  (91, 600231344366157823),
  (92, 602201815232020479),
  (93, 599900930384592895),
  (94, 602548348225847295),
  (95, 600357007593046015),
  (96, 602959676170043391),
  (97, 600648761500237823),
  (98, 603035469457915903),
  (99, 600765021969973247),
  (100, 603107658194485247),
  (101, 600889884185460735),
  (102, 603179987591233535),
  (103, 601321851594997759),
  (104, 599060305426776063),
  (105, 601383809719468031),
  (106, 599248430363049983),
  (107, 601285305718276095),
  (108, 599182964324040703),
  (109, 601785579213946879),
  (110, 599301607426883583),
  (111, 601865339977859071),
  (112, 599759647435390975),
  (113, 602217577761996799),
  (114, 599949846840868863),
  (115, 602126688737820671),
  (116, 599971733994209279),
  (117, 602589696949747711),
  (118, 599882460951478271),
  (119, 602681196933021695),
  (120, 600512587414634495),
  (121, 602754480886251519),
  (122, 600308272599138303),
  (123, 602727583653560319),
  (124, 600799941127831551),
  (125, 602878801935859711),
  (126, 600687093009612799),
  (127, 603159951568797695),
  (128, 600936893676257279),
  (129, 603171224784207871),
  (130, 601132491855626239),
  (131, 599168609469595647),
  (132, 601698790809796607),
  (133, 599237046552231935),
  (134, 601653214764335103),
  (135, 599564146966527999),
  (136, 601742659605757951),
  (137, 599496368087629823),
  (138, 601937131429953535),
  (139, 599522702679605247),
  (140, 601923247948169215),
  (141, 599601256557707263),
  (142, 602198329866059775),
  (143, 599900505182830591),
  (144, 602537202785714175),
  (145, 600364784705077247),
  (146, 602480916165558271),
  (147, 600340039251001343),
  (148, 602654049518485503),
  (149, 600749195015487487),
  (150, 602831485354901503),
  (151, 600905323519148031),
  (152, 602874733528088575),
  (153, 600711702098477055),
  (154, 603147467172610047),
  (155, 601381401316556799),
  (156, 599243005819355135),
  (157, 601269206033367039),
  (158, 599155772886089727),
  (159, 601770729364520959),
  (160, 599303322192576511),
  (161, 601883269318836223),
  (162, 599270477503922175),
  (163, 602230015987286015),
  (164, 599481323890933759),
  (165, 602111309533675519),
  (166, 599986876975153151),
  (167, 602591862687006719),
  (168, 599866249597419519),
  (169, 602678388024410111),
  (170, 599903682384887807),
  (171, 602754229630664703),
  (172, 600309335603544063),
  (173, 602708738410807295),
  (174, 600203869460365311),
  (175, 602877212797960191),
  (176, 600668995091169279),
  (177, 603160500250869759),
  (178, 600921504808435711),
  (179, 603171976403484671),
  (180, 601130201564315647),
  (181, 599078812440854527),
  (182, 600962369274773503),
  (183, 599252154099695615),
  (184, 601672328442544127),
  (185, 599176019361923071),
  (186, 601750425980370943),
  (187, 599305346195914751),
  (188, 601939931748630527),
  (189, 599512409790480383),
  (190, 601921646999109631),
  (191, 599600922623999999),
  (192, 602182975357976575),
  (193, 599915546158301183),
  (194, 602539281549885439),
  (195, 599810259330007039),
  (196, 602464206595293183),
  (197, 600336479796854783),
  (198, 602643741596975103),
  (199, 600748883630358527)"""


def q_geo_latlng_to_cell_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 ``geoToH3`` on the REAL hexagonal grid: the default-grid
    registration path (vectorized Arrow-batched pandas UDF over
    h3.icosa.latlng_to_cell_np) applied to synthesized event
    coordinates at res 5, with the base cell re-extracted via the
    bit-arithmetic SQL functions. Reference parity: geoToH3 /
    traversal.rs:131-162 (h3ron latlng→cell)."""
    from ukis_h3cellstore_spark.functions import register_h3_sql_functions

    register_h3_sql_functions(spark)  # default grid → real H3, vectorized
    _events(spark, sf_dir).createOrReplaceTempView("__geo_events_hex")
    lng = _synth_lng_sql("event_id")
    lat = _synth_lat_sql("event_id")
    return spark.sql(
        f"""
        SELECT event_id, h3index,
               CAST(shiftright(h3index, 45) & 127 AS BIGINT) AS base_cell
        FROM (
          SELECT event_id, geoToH3({lat}, {lng}, 5) AS h3index
          FROM __geo_events_hex WHERE event_id < 200
        )
        """
    )


def _q_geo_latlng_to_cell_hex_sql() -> str:
    return f"""
SELECT v.event_id, v.h3index, (v.h3index >> 45) & 127 AS base_cell
FROM (VALUES
  {_HEX_VECTORS}
) AS v(event_id, h3index)
WHERE v.event_id IN (SELECT event_id FROM events)
"""


QUERIES_GEO: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "geo_grid_disk": q_geo_grid_disk,
    "geo_polyfill_traversal": q_geo_polyfill_traversal,
    "geo_border_cells": q_geo_border_cells,
    "geo_latlng_to_cell": q_geo_latlng_to_cell,
    "geo_latlng_to_cell_hex": q_geo_latlng_to_cell_hex,
}

ORACLES_GEO: dict[str, str] = {
    "geo_grid_disk": _q_geo_grid_disk_sql(),
    "geo_polyfill_traversal": _q_geo_polyfill_traversal_sql(),
    "geo_border_cells": _q_geo_border_cells_sql(),
    "geo_latlng_to_cell": _q_geo_latlng_to_cell_sql(),
    "geo_latlng_to_cell_hex": _q_geo_latlng_to_cell_hex_sql(),
}
