"""Driver-contract queries for the geometry suite (H5-H7): polygon →
cells ("polyfill" + exterior-ring union, reference traversal.rs:131-162)
feeding a distributed AOI membership + per-tile rollup, and
border_cells (reference geom/border_cells.rs:15-101).

Two gate families with complementary oracle strategies:

1. The `geo_*` lattice gates run on the
   :class:`~ukis_h3cellstore_spark.geo.SquareGrid` backend, where the
   DuckDB oracles re-implement the ENTIRE geometry pipeline
   independently in SQL (fully cross-engine);
2. the `*_hex` gates run on the REAL hexagonal grid (pure-Python
   icosa core): the leaf geocodes are vendored (anchored separately
   to public spec vectors in tests/test_h3_public_vectors.py), while
   hierarchy rollups, AOI membership, and the pyramid aggregation are
   re-derived cross-engine in DuckDB's own int64 bit arithmetic.

What makes the lattice family a REAL correctness gate rather than a
self-comparison: the oracles re-implement the geometry relationally —

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




#: (event_id, res-5 cell, center lon, center lat) for the h3ToGeo
#: gate — centers precomputed by the pure-Python core at full double
#: precision (repr round-trip exact).
_HEX_CENTER_VECTORS = """(0, 603108745894952959, -179.9423283851526, -69.94213676573993),
  (1, 601567589222580223, -100.80726111666641, -2.759359892274583),
  (2, 599108261957861375, -21.550066246832525, 64.6389583575909),
  (3, 601329319469383679, 57.5125528171781, -8.175838949620216),
  (4, 599338370199453695, 136.79053152028587, 59.2298833911504),
  (5, 601799811661823999, -144.11642769781275, -13.56699455646427),
  (6, 599231734751428607, -64.88569446959211, 53.7864013137052),
  (7, 602013487358541823, 14.386467030758652, -18.913066207900343),
  (8, 599631011017392127, 93.43276021625111, 48.32373811197828),
  (9, 601778953153150975, 172.69852784640733, -24.334468504242054),
  (10, 599659719652540415, -108.1258514087276, 42.849502141635924),
  (11, 601878989383925759, -28.86484803297497, -29.778951236677837),
  (12, 599769657930416127, 50.267936876870955, 37.54076496129274),
  (13, 602239256609423359, 129.5425190455014, -35.21033164093431),
  (14, 599929980469641215, -151.30229935488381, 32.08159530921864),
  (15, 602611644232630271, -72.19493426902723, -40.64152625143422),
  (16, 599978085177098239, 7.049614171159862, 26.62897940281627),
  (17, 602569456916365311, 86.20527578274992, -46.11453065360126),
  (18, 600575839398002687, 165.45281445795715, 21.289059867165374),
  (19, 602691535993044991, -115.49435861872134, -51.44499850222303),
  (20, 600495193870827519, -36.231640005524355, 15.812049330754961),
  (21, 602924720504963071, 42.88402834035952, -56.930915194921276),
  (22, 600816411253669887, 122.12448617473058, 10.356769688760659),
  (23, 603112927045615615, -158.6210140985253, -62.38578472193429),
  (24, 600784937733324799, -79.43882438533936, 4.938198619833189),
  (25, 603031664116891647, -0.20837573033385645, -67.7238934768768),
  (26, 601349463939743743, 78.9786323012847, -0.47259010528869966),
  (27, 599063457932771327, 158.14662331648216, 66.77230628493975),
  (28, 601527643879243775, -122.67145316149247, -5.833569862187925),
  (29, 599456304632692735, -43.646500747393155, 61.429065029798),
  (30, 601645970228248575, 35.72220855243795, -11.30419128698523),
  (31, 599349405044178943, 114.87037123486958, 55.94196784148424),
  (32, 601714521127518207, -165.87944543310576, -16.768650255062788),
  (33, 599239902705483775, -86.83034681572204, 50.553693871827925),
  (34, 601667411778732031, -7.489795862704585, -22.16920936045755),
  (35, 599541884003549183, 71.66835811181531, 45.10723161253799),
  (36, 602337987170140159, 150.76537660464217, -27.599745922434916),
  (37, 599685270412984319, -129.98231327273518, 39.70517797851026),
  (38, 601954050379874303, -50.718745245682676, -33.025659497204586),
  (39, 600091719274332159, 28.387044337987525, 34.30273414809569),
  (40, 602498878792531967, 107.55428779662932, -38.371348969254704),
  (41, 600239699151290367, -173.19198573710676, 28.96288890832239),
  (42, 602683377702666239, -94.02004307098348, -43.80616942965634),
  (43, 600475427357589503, -14.761385130532398, 23.434101547834093),
  (44, 602547314212470783, 64.33056166933679, -49.30912837694244),
  (45, 600355719102857215, 143.49787114573408, 18.111620051762447),
  (46, 602962517290909695, -137.3076398619584, -54.6473657048708),
  (47, 600633367263707135, -58.124443700969195, 12.61516925384102),
  (48, 603036543199739903, 21.201561708376122, -60.0779022456223),
  (49, 600757238415491071, 100.28874047996078, 7.189378761477391),
  (50, 603105049001852927, 179.44762135789833, -65.47325470090367),
  (51, 600888083520421887, -101.25010388772147, 1.8236717812171417),
  (52, 599086879463178239, -22.26672566897049, 69.04059552804316),
  (53, 601329584683614207, 57.06572930490417, -3.667239614242857),
  (54, 599059429253447679, 136.3003871416816, 63.622686576114376),
  (55, 601399145973940223, -144.5133196751407, -9.023954276486137),
  (56, 599248686987345919, -65.36255969302003, 58.3106206217325),
  (57, 601285968216981503, 13.818982975374693, -14.441301647667869),
  (58, 599632007449804799, 93.08295954913835, 52.87757258622682),
  (59, 601777833240428543, 172.1679794017251, -19.847659481194142),
  (60, 599673803924045823, -108.56895634807505, 47.468179519202714),
  (61, 601880723476971519, -29.412840857233693, -25.33107667770589),
  (62, 599758612348272639, 49.87767078253603, 41.98948425163481),
  (63, 602216068080992255, 129.00652488453522, -30.71560105747768),
  (64, 599957962181574655, -151.77611519241137, 36.5016336416508),
  (65, 602125041617862655, -72.64536925038922, -36.12179225606296),
  (66, 599980178973655039, 6.551654847125298, 31.13876743459216),
  (67, 602570517773287423, 85.77490895503266, -41.50184465905885),
  (68, 599882777705316351, 164.8672593383228, 25.78042371628461),
  (69, 602696441919438847, -115.82141765890562, -46.94131137606777),
  (70, 600511336505409535, -36.706178815543716, 20.337048877875574),
  (71, 602772789258092543, 42.50909893095277, -52.420448900499885),
  (72, 600831334117539839, 121.6797688351606, 14.881783700317975),
  (73, 602728264405876735, -159.14102238408555, -57.78605214597492),
  (74, 600784544743817215, -79.94151027673173, 9.402539003985328),
  (75, 603030345561931775, -0.7119945100351196, -63.22413896818141),
  (76, 600688165677694975, 78.43683409458056, 4.105537866652163),
  (77, 603133168152739839, 157.65598572408882, -68.73900918798681),
  (78, 600938359333847039, -123.1613592909326, -1.3856085145998773),
  (79, 599099934016274431, -44.12688181225518, 65.88957203532095),
  (80, 601629770685349887, 35.24962607340223, -6.8092450005216545),
  (81, 599350946937438207, 114.52042530988348, 60.48448335514966),
  (82, 601700429339820031, -166.38135268408044, -12.24861123981642),
  (83, 599241699075555327, -87.28323807698933, 55.03646253556657),
  (84, 601654672905732095, -8.051702479346613, -17.684664183917246),
  (85, 599544782032732159, 71.13484823253023, 49.68327647521781),
  (86, 601743942727237631, 150.27229476275593, -23.04639012822046),
  (87, 599688178105843711, -130.47249721299937, 44.27979037870392),
  (88, 601952563247448063, -51.280590068208646, -28.480084243003517),
  (89, 600093942993649663, 27.90014795893218, 38.774175490013874),
  (90, 602506066420301823, 107.06180802661824, -33.898207685618765),
  (91, 600231344366157823, -173.64998723216976, 33.35184646092297),
  (92, 602201815232020479, -94.46826047049949, -39.333524727736325),
  (93, 599900930384592895, -15.30408756407634, 28.00293677440576),
  (94, 602548348225847295, 63.937049759507495, -44.79090011415816),
  (95, 600357007593046015, 142.99302575629284, 22.552033735540714),
  (96, 602959676170043391, -137.7337970443454, -50.12011001066797),
  (97, 600648761500237823, -58.57805337131776, 17.121930782850423),
  (98, 603035469457915903, 20.57357212575126, -55.55571738653071),
  (99, 600765021969973247, 99.74878206315168, 11.715318760969115),
  (100, 603107658194485247, 179.04856888589677, -60.94366272885631),
  (101, 600889884185460735, -101.8654433288521, 6.341952790888507),
  (102, 603179987591233535, -22.650903069129075, -66.34047365186017),
  (103, 601321851594997759, 56.54631933651479, 0.8882385522421099),
  (104, 599060305426776063, 135.60524763405203, 68.15231004161338),
  (105, 601383809719468031, -144.97215872336085, -4.518118919410272),
  (106, 599248430363049983, -65.83366433264806, 62.717436311614456),
  (107, 601285305718276095, 13.275467162292802, -9.981227986832474),
  (108, 599182964324040703, 92.37240483864613, 57.35447721688075),
  (109, 601785579213946879, 171.70191074360528, -15.389755274458754),
  (110, 599301607426883583, -109.07306175746119, 51.83111281637403),
  (111, 601865339977859071, -29.924398978328508, -20.883715943216128),
  (112, 599759647435390975, 49.20292648957447, 46.54637937547797),
  (113, 602217577761996799, 128.45197185865, -26.1927865555205),
  (114, 599949846840868863, -152.39040217455306, 41.03321205349884),
  (115, 602126688737820671, -73.10501166770871, -31.669867761352926),
  (116, 599971733994209279, 6.009234015963224, 35.604619357031545),
  (117, 602589696949747711, 85.26643124719803, -37.15115396571389),
  (118, 599882460951478271, 164.51337245167264, 30.235713939890044),
  (119, 602681196933021695, -116.32310864172591, -42.44864769715257),
  (120, 600512587414634495, -37.22719277891348, 24.87905533345849),
  (121, 602754480886251519, 42.081430421772616, -47.91569810856902),
  (122, 600308272599138303, 121.12754897169705, 19.36978538010807),
  (123, 602727583653560319, -159.633380957889, -53.379152162587076),
  (124, 600799941127831551, -80.39762019137899, 13.920635455537754),
  (125, 602878801935859711, -1.179984880041558, -58.74825220572364),
  (126, 600687093009612799, 77.96520933086141, 8.471792293718462),
  (127, 603159951568797695, 157.12307416088777, -64.1700800714286),
  (128, 600936893676257279, -123.67140828110496, 3.13050430148177),
  (129, 603171224784207871, -44.58705503868251, -69.52331925527719),
  (130, 601132491855626239, 34.715133485054366, -2.2411945854065545),
  (131, 599168609469595647, 113.90912181231089, 64.97290613357498),
  (132, 601698790809796607, -167.00120954320465, -7.739477167924092),
  (133, 599237046552231935, -87.86021032950796, 59.584973589373526),
  (134, 601653214764335103, -8.472962975019703, -13.162184496955863),
  (135, 599564146966527999, 70.73888958223493, 54.12216720491882),
  (136, 601742659605757951, 149.82579182652358, -18.636602948705885),
  (137, 599496368087629823, -131.03575329401016, 48.737044085249615),
  (138, 601937131429953535, -51.698988178587534, -23.986430806321717),
  (139, 599522702679605247, 27.48918124308452, 43.2507623425965),
  (140, 601923247948169215, 106.58705224840361, -29.37478674922612),
  (141, 599601256557707263, -174.2267112114489, 37.94080352411837),
  (142, 602198329866059775, -95.00781662616131, -34.83712614668367),
  (143, 599900505182830591, -15.799467196432296, 32.3978812276209),
  (144, 602537202785714175, 63.335702610754694, -40.18987167584694),
  (145, 600364784705077247, 142.60540243715838, 27.049782800849158),
  (146, 602480916165558271, -138.2252409008924, -45.724500711867975),
  (147, 600340039251001343, -59.010236695858026, 21.602657681779565),
  (148, 602654049518485503, 20.11864736925873, -51.02607564405533),
  (149, 600749195015487487, 99.3618261353574, 16.263226394902002),
  (150, 602831485354901503, 178.39703078432052, -56.46517922051967),
  (151, 600905323519148031, -102.37319306773406, 10.821909793275614),
  (152, 602874733528088575, -23.075491477942318, -61.879261530106035),
  (153, 600711702098477055, 56.04318556166779, 5.4138103054010305),
  (154, 603147467172610047, 135.1563373863092, -67.35713670531781),
  (155, 601381401316556799, -145.49742257365023, -0.034320866244190104),
  (156, 599243005819355135, -66.22089704866092, 67.23960064959205),
  (157, 601269206033367039, 12.847580890454902, -5.455971200847705),
  (158, 599155772886089727, 92.12401897264625, 61.77796233283215),
  (159, 601770729364520959, 171.1755045984526, -10.93072461204731),
  (160, 599303322192576511, -109.47214171889627, 56.40999626913958),
  (161, 601883269318836223, -30.34178237016408, -16.315936807326413),
  (162, 599270477503922175, 48.882523241765405, 51.01306634987684),
  (163, 602230015987286015, 128.03670779983813, -21.69858176589312),
  (164, 599481323890933759, -152.87665929058755, 45.56315290267585),
  (165, 602111309533675519, -73.72362357364234, -27.136075579105476),
  (166, 599986876975153151, 5.496912942306722, 40.120263474228366),
  (167, 602591862687006719, 84.65852159534282, -32.53149515939305),
  (168, 599866249597419519, 163.91677240919444, 34.73903728390934),
  (169, 602678388024410111, -116.96181414777281, -38.02302113029686),
  (170, 599903682384887807, -37.634960285370234, 29.289718905323735),
  (171, 602754229630664703, 41.4584699604109, -43.47315126864427),
  (172, 600309335603544063, 120.67573239902347, 23.937810561583934),
  (173, 602708738410807295, -160.2106233184977, -48.86685605312275),
  (174, 600203869460365311, -80.92466119545294, 18.47252608568183),
  (175, 602877212797960191, -1.761890543772326, -54.244567866113854),
  (176, 600668995091169279, 77.39877565972604, 13.09864158676568),
  (177, 603160500250869759, 156.71339314495128, -59.635133701760225),
  (178, 600921504808435711, -124.20023533483912, 7.632901364590968),
  (179, 603171976403484671, -44.979728641646766, -65.04913814781072),
  (180, 601130201564315647, 34.1990888343258, 2.197180944701816),
  (181, 599078812440854527, 113.18007198543455, 69.45104555396289),
  (182, 600962369274773503, -167.46217751675982, -3.1546415149849287),
  (183, 599252154099695615, -88.35360803519367, 64.0220052002585),
  (184, 601672328442544127, -9.059471967090483, -8.588135803644256),
  (185, 599176019361923071, 70.27054498302398, 58.62463494282541),
  (186, 601750425980370943, 149.2589846523523, -14.05370795099602),
  (187, 599305346195914751, -131.44539517712082, 53.28994475278414),
  (188, 601939931748630527, -52.263694545077556, -19.46310003678448),
  (189, 599512409790480383, 26.826403156500515, 47.82145313760927),
  (190, 601921646999109631, 106.03092005501762, -24.88114949957715),
  (191, 599600922623999999, -174.80903520581614, 42.36363488648006),
  (192, 602182975357976575, -95.4474816523952, -30.323116074842932),
  (193, 599915546158301183, -16.311322875713145, 36.99274652666397),
  (194, 602539281549885439, 62.83606629819448, -35.66064340273466),
  (195, 599810259330007039, 142.12644460082936, 31.550625453116908),
  (196, 602464206595293183, -138.81602403588383, -41.13290867972222),
  (197, 600336479796854783, -59.50328857863915, 26.09405803274384),
  (198, 602643741596975103, 19.541871978095013, -46.53838373462499),
  (199, 600748883630358527, 98.79203417476428, 20.695951862573278)"""


def q_geo_cell_centers_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 ``h3ToGeo`` (CH tuple order: lon, lat) on the real hex
    grid through the vectorized pandas-UDF registration: event points
    → res-5 cells → cell centers. The oracle carries the centers
    precomputed by the same pure-Python core (anchoring chain as in
    ``geo_latlng_to_cell_hex``; cellToLatLng itself is pinned to the
    public doc vector in tests/test_h3_public_vectors.py), so the
    gate proves the distributed inverse path — Arrow batching, mixed
    per-batch resolutions, struct packing — bit-for-bit."""
    from ukis_h3cellstore_spark.functions import register_h3_sql_functions

    register_h3_sql_functions(spark)
    _events(spark, sf_dir).createOrReplaceTempView("__geo_events_ctr")
    lng = _synth_lng_sql("event_id")
    lat = _synth_lat_sql("event_id")
    return spark.sql(
        f"""
        SELECT event_id, h3index, c.lon AS center_lon, c.lat AS center_lat
        FROM (
          SELECT event_id, h3index, h3ToGeo(h3index) AS c
          FROM (
            SELECT event_id, geoToH3({lat}, {lng}, 5) AS h3index
            FROM __geo_events_ctr WHERE event_id < 200
          )
        )
        """
    )


def _q_geo_cell_centers_hex_sql() -> str:
    return f"""
SELECT v.event_id, v.h3index, v.center_lon, v.center_lat
FROM (VALUES
  {_HEX_CENTER_VECTORS}
) AS v(event_id, h3index, center_lon, center_lat)
WHERE v.event_id IN (SELECT event_id FROM events)
"""


def q_events_hex_parent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point indexing + hierarchy rollup on the real hex grid: events
    → res-5 cells (vectorized geoToH3) → res-2 parents via the
    bit-arithmetic ``h3ToParent`` SQL function → per-parent counts.
    The oracle starts from the vendored leaf cells and re-derives the
    parents with ITS OWN int64 bit arithmetic in DuckDB — the
    hierarchy math is genuinely cross-engine, only the leaf
    geocoding is vendored."""
    from ukis_h3cellstore_spark.functions import register_h3_sql_functions

    register_h3_sql_functions(spark)
    _events(spark, sf_dir).createOrReplaceTempView("__geo_events_par")
    lng = _synth_lng_sql("event_id")
    lat = _synth_lat_sql("event_id")
    return spark.sql(
        f"""
        SELECT h3ToParent(h3index, 2) AS parent, COUNT(*) AS n_points
        FROM (
          SELECT geoToH3({lat}, {lng}, 5) AS h3index
          FROM __geo_events_par WHERE event_id < 200
        )
        GROUP BY 1
        """
    )


def _q_events_hex_parent_rollup_sql() -> str:
    res_clear = ~(0xF << 52)
    trailing = (1 << (3 * (15 - 2))) - 1
    return f"""
SELECT (v.h3index & {res_clear}) | (2::BIGINT << 52) | {trailing} AS parent,
       COUNT(*) AS n_points
FROM (VALUES
  {_HEX_VECTORS}
) AS v(event_id, h3index)
WHERE v.event_id IN (SELECT event_id FROM events)
GROUP BY 1
"""




#: res-2 polyfill cover of the TRIANGLE AOI on the real hexagonal
#: grid (reference H6: polyfill PLUS exterior-ring cells), precomputed
#: by geo.polygon_to_cells over H3Grid (pure-Python core; anchored to the SF-polygon counts of the
#: public H3 C test suite in tests/test_h3_public_vectors.py).
_HEX_COVER_VALUES = """(586463009581301759),
  (586464109092929535),
  (586466857871998975),
  (586467957383626751),
  (586468507139440639),
  (586469056895254527),
  (586470156406882303),
  (586950642988220415),
  (586951192744034303),
  (586952292255662079),
  (586952842011475967),
  (586953391767289855),
  (586968784930078719),
  (586970983953334271),
  (587016613685886975),
  (587017163441700863),
  (587017713197514751),
  (587018262953328639),
  (587018812709142527),
  (587019362464956415),
  (587019912220770303),
  (587021011732398079),
  (587022111244025855),
  (587022660999839743),
  (587024310267281407),
  (587025409778909183),
  (587025959534723071),
  (587026509290536959),
  (587027059046350847),
  (587027608802164735),
  (587028158557978623),
  (587028708313792511),
  (587029807825420287),
  (587030357581234175),
  (587030907337048063),
  (587031457092861951),
  (587032006848675839),
  (587032556604489727),
  (587033106360303615),
  (587034205871931391),
  (587034755627745279),
  (587035305383559167),
  (587035855139373055),
  (587036404895186943),
  (587036954651000831),
  (587037504406814719),
  (587038603918442495),
  (587039703430070271),
  (587040253185884159),
  (587041902453325823),
  (587043001964953599),
  (587043551720767487),
  (587044101476581375),
  (587044651232395263),
  (587045200988209151),
  (587045750744023039),
  (587046300499836927),
  (587342069127708671),
  (587343168639336447),
  (587343718395150335),
  (587345367662591999),
  (587359661313753087),
  (587360760825380863),
  (587361310581194751),
  (587362959848636415),
  (587509194895130623),
  (587510294406758399),
  (587510844162572287),
  (587511393918386175),
  (587511943674200063),
  (587512493430013951),
  (587517990988152831),
  (587518540743966719),
  (587519090499780607),
  (587519640255594495),
  (587520190011408383),
  (587520739767222271),
  (587521289523036159),
  (587522389034663935),
  (587522938790477823),
  (587523488546291711),
  (587524038302105599),
  (587524588057919487),
  (587525137813733375),
  (587525687569547263),
  (587526787081175039),
  (587527336836988927),
  (587527886592802815),
  (587528436348616703),
  (587528986104430591),
  (587529535860244479),
  (587530085616058367),
  (587531185127686143),
  (587531734883500031),
  (587532284639313919),
  (587532834395127807),
  (587533384150941695),
  (587533933906755583),
  (587534483662569471),
  (587535583174197247),
  (587536132930011135),
  (587536682685825023),
  (587537232441638911),
  (587537782197452799),
  (587538331953266687),
  (587538881709080575),
  (587659827988135935),
  (587662027011391487),
  (587668624081158143),
  (587670823104413695),
  (587676320662552575),
  (587677420174180351),
  (587677969929994239),
  (587678519685808127),
  (587679069441622015),
  (587679619197435903),
  (587755485499752447),
  (587756035255566335),
  (587756585011380223),
  (587757134767194111),
  (587757684523007999),
  (587758234278821887),
  (587758784034635775),
  (587759883546263551),
  (587760433302077439),
  (587760983057891327),
  (587761532813705215),
  (587762082569519103),
  (587762632325332991),
  (587763182081146879),
  (587764281592774655),
  (587764831348588543),
  (587765381104402431),
  (587765930860216319),
  (587766480616030207),
  (587767030371844095),
  (587767580127657983),
  (587768679639285759),
  (587769229395099647),
  (587769779150913535),
  (587770328906727423),
  (587770878662541311),
  (587771428418355199),
  (587771978174169087),
  (587779124999749631),
  (587781873778819071),
  (587782423534632959),
  (587782973290446847),
  (587783523046260735),
  (587784622557888511),
  (587785172313702399),
  (588120523360174079),
  (588121073115987967),
  (588122172627615743),
  (588160105778774015),
  (588160655534587903),
  (588161205290401791),
  (588161755046215679),
  (588162304802029567),
  (588162854557843455),
  (588163404313657343),
  (588164503825285119),
  (588166702848540671),
  (588167252604354559),
  (588167802360168447),
  (588171100895051775),
  (588172200406679551)"""


def q_geo_polyfill_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6 on the REAL hexagonal grid: driver-side polyfill of the
    triangle AOI at res 2 (reference client shape, traversal.rs:
    131-162) parameterizing a distributed membership count — events
    are geocoded at res 5 by the vectorized UDF and rolled to res 2
    via the bit-arithmetic parent function, then counted per cover
    cell. The oracle takes the vendored cover, re-derives the event
    res-2 cells from the vendored res-5 leaves with DuckDB's own
    int64 bit math, and joins — so AOI membership + hierarchy rollup
    are genuinely cross-engine; only the leaf geocode and the
    geometry of the cover itself are vendored."""
    from ukis_h3cellstore_spark.functions import register_h3_sql_functions

    register_h3_sql_functions(spark)
    cover = geo.polygon_to_cells(TRIANGLE_POLY["coordinates"], 2, geo.H3Grid())
    cover_df = spark.createDataFrame([(c,) for c in cover], "cell long")
    cover_df.createOrReplaceTempView("__hex_cover")
    _events(spark, sf_dir).createOrReplaceTempView("__geo_events_pf")
    lng = _synth_lng_sql("event_id")
    lat = _synth_lat_sql("event_id")
    return spark.sql(
        f"""
        SELECT c.cell, COUNT(e.cell2) AS n_events
        FROM __hex_cover c
        LEFT JOIN (
          SELECT h3ToParent(geoToH3({lat}, {lng}, 5), 2) AS cell2
          FROM __geo_events_pf WHERE event_id < 200
        ) e ON e.cell2 = c.cell
        GROUP BY c.cell
        """
    )


def _q_geo_polyfill_hex_sql() -> str:
    res_clear = ~(0xF << 52)
    trailing = (1 << (3 * (15 - 2))) - 1
    return f"""
WITH cover AS (SELECT * FROM (VALUES
  {_HEX_COVER_VALUES}
) AS t(cell)),
pts AS (
  SELECT (v.h3index & {res_clear}) | (2::BIGINT << 52) | {trailing} AS cell2
  FROM (VALUES
  {_HEX_VECTORS}
  ) AS v(event_id, h3index)
  WHERE v.event_id IN (SELECT event_id FROM events)
)
SELECT c.cell, COUNT(p.cell2) AS n_events
FROM cover c LEFT JOIN pts p ON p.cell2 = c.cell
GROUP BY c.cell
"""




def q_pipeline_hex_ingest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship on the REAL grid: the reference's end-to-end flow —
    geocode points (vectorized geoToH3 at res 5) → insert into a
    Sum-rollup tableset pyramid (Q1: compact/split/rollup/publish) →
    AOI query at res 2 with the cover computed by driver-side polyfill
    (Q2 client shape, traversal.rs:131-162). The oracle re-derives the
    whole relational side — res-2 parents via its own int64 bit math
    over the vendored leaf geocodes, AOI membership against the
    vendored cover, and the Sum rollup from raw event values — so
    everything but the leaf geocode is cross-engine."""
    from ukis_h3cellstore_spark import CompactedTableSchemaBuilder
    from ukis_h3cellstore_spark.entry_queries import _cents, _pipeline_store
    from ukis_h3cellstore_spark.functions import register_h3_sql_functions

    register_h3_sql_functions(spark)
    _events(spark, sf_dir).createOrReplaceTempView("__geo_events_pipe")
    lng = _synth_lng_sql("event_id")
    lat = _synth_lat_sql("event_id")
    df = spark.sql(
        f"""
        SELECT geoToH3({lat}, {lng}, 5) AS h3index,
               CAST(round(value * 100) AS BIGINT) AS value_cents
        FROM __geo_events_pipe WHERE event_id < 200
        """
    )
    schema = (
        CompactedTableSchemaBuilder("hex_ingest")
        .h3_base_resolutions([2, 5])
        .add_h3index_column()
        .add_aggregated_column("value_cents", "UInt64", "Sum")
        .build()
    )
    store = _pipeline_store(spark)
    store.insert_h3dataframe_into_tableset(schema, df)
    cover = geo.polygon_to_cells(TRIANGLE_POLY["coordinates"], 2, geo.H3Grid())
    out = store.query_tableset_cells("hex_ingest", cover, 2)
    return out.df.select("h3index", "value_cents")


def _q_pipeline_hex_ingest_query_sql() -> str:
    res_clear = ~(0xF << 52)
    trailing = (1 << (3 * (15 - 2))) - 1
    return f"""
WITH leaf AS (
  SELECT v.event_id, v.h3index
  FROM (VALUES
  {_HEX_VECTORS}
  ) AS v(event_id, h3index)
),
pts AS (
  SELECT (l.h3index & {res_clear}) | (2::BIGINT << 52) | {trailing} AS cell2,
         CAST(round(e.value * 100) AS BIGINT) AS value_cents
  FROM leaf l JOIN events e ON e.event_id = l.event_id
),
cover AS (SELECT * FROM (VALUES
  {_HEX_COVER_VALUES}
) AS t(cell))
SELECT p.cell2 AS h3index,
       CAST(SUM(p.value_cents) AS BIGINT) AS value_cents
FROM pts p
WHERE p.cell2 IN (SELECT cell FROM cover)
GROUP BY 1
"""


def q_geo_disk_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Focal statistics (geo.py:disk_smooth): per-cell event cents
    smoothed over the k=1 lattice disk — neighbor ids are pure bit
    arithmetic in codegen (wrap/clamp identical to
    SquareGrid.grid_disk), so the only shuffle is the disk-member
    equi-join against the occupied-cell table. Integer milli mean.
    The oracle re-derives every neighbor with independent SQL lattice
    arithmetic."""
    from ukis_h3cellstore_spark.geo import disk_smooth

    _events(spark, sf_dir).createOrReplaceTempView("__geo_smooth_events")
    lng = _synth_lng_sql("event_id")
    lat = _synth_lat_sql("event_id")
    cells = spark.sql(
        f"""
        SELECT {_sq_cell_sql(lat, lng)} AS cell,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM __geo_smooth_events GROUP BY 1
        """
    )
    return disk_smooth(cells, "cell", "cents", k=1)


def _q_geo_disk_smoothing_sql() -> str:
    n = 1 << (GEO_RES + 3)
    mask = (1 << 26) - 1
    cell = _sq_cell_sql(_synth_lat_sql("event_id"), _synth_lng_sql("event_id"))
    return f"""
WITH cells AS (
  SELECT {cell} AS cell,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
off AS (SELECT a.di, b.dj
        FROM (SELECT unnest([-1, 0, 1]) AS di) a
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dj) b),
nbs AS (
  SELECT DISTINCT c.cell,
         ({1 << 60} | {GEO_RES << 52}
          | ((((((c.cell >> 26) & {mask}) + o.di) % {n} + {n}) % {n}) << 26)
          | greatest(0, least((c.cell & {mask}) + o.dj, {n // 2 - 1}))) AS nb
  FROM cells c CROSS JOIN off o
)
SELECT nbs.cell, CAST(COUNT(*) AS BIGINT) AS n_present,
       CAST(SUM(v.cents) AS BIGINT) AS disk_sum,
       CAST((1000 * SUM(v.cents)) // COUNT(*) AS BIGINT) AS mean_milli
FROM nbs JOIN cells v ON v.cell = nbs.nb
GROUP BY 1
"""


def q_geo_ring_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-band rollup (geo.py:ring_profile): per-cell event
    cents aggregated by Chebyshev ring distance (<= 6) from a fixed
    POI cell — the "activity decay from the point of interest"
    profile. Ring indices are bit arithmetic in codegen; no join."""
    from ukis_h3cellstore_spark.geo import ring_profile

    _events(spark, sf_dir).createOrReplaceTempView("__geo_ring_events")
    lng = _synth_lng_sql("event_id")
    lat = _synth_lat_sql("event_id")
    cells = spark.sql(
        f"""
        SELECT {_sq_cell_sql(lat, lng)} AS cell,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM __geo_ring_events GROUP BY 1
        """
    )
    center = geo.SquareGrid().latlng_to_cell(10.0, 20.0, GEO_RES)
    return ring_profile(cells, "cell", "cents", center, k=6)


def _q_geo_ring_profile_sql() -> str:
    grid = geo.SquareGrid()
    center = grid.latlng_to_cell(10.0, 20.0, GEO_RES)
    res, ci, cj = grid.unpack(center)
    n = 1 << (GEO_RES + 3)
    mask = (1 << 26) - 1
    cell = _sq_cell_sql(_synth_lat_sql("event_id"), _synth_lng_sql("event_id"))
    return f"""
WITH cells AS (
  SELECT {cell} AS cell,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
rings AS (
  SELECT CAST(greatest(
             least(abs(((cell >> 26) & {mask}) - {ci}),
                   {n} - abs(((cell >> 26) & {mask}) - {ci})),
             abs((cell & {mask}) - {cj})) AS INT) AS ring,
         cents
  FROM cells
  WHERE ((cell >> 52) & 15) = {res}
)
SELECT ring, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(cents) AS BIGINT) AS value_sum
FROM rings WHERE ring <= 6 GROUP BY 1
"""


QUERIES_GEO: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "geo_disk_smoothing": q_geo_disk_smoothing,
    "geo_ring_profile": q_geo_ring_profile,
    "geo_grid_disk": q_geo_grid_disk,
    "geo_polyfill_traversal": q_geo_polyfill_traversal,
    "geo_border_cells": q_geo_border_cells,
    "geo_latlng_to_cell": q_geo_latlng_to_cell,
    "geo_latlng_to_cell_hex": q_geo_latlng_to_cell_hex,
    "geo_cell_centers_hex": q_geo_cell_centers_hex,
    "events_hex_parent_rollup": q_events_hex_parent_rollup,
    "geo_polyfill_hex": q_geo_polyfill_hex,
    "pipeline_hex_ingest_query": q_pipeline_hex_ingest_query,
}

ORACLES_GEO: dict[str, str] = {
    "geo_disk_smoothing": _q_geo_disk_smoothing_sql(),
    "geo_ring_profile": _q_geo_ring_profile_sql(),
    "geo_grid_disk": _q_geo_grid_disk_sql(),
    "geo_polyfill_traversal": _q_geo_polyfill_traversal_sql(),
    "geo_border_cells": _q_geo_border_cells_sql(),
    "geo_latlng_to_cell": _q_geo_latlng_to_cell_sql(),
    "geo_latlng_to_cell_hex": _q_geo_latlng_to_cell_hex_sql(),
    "geo_cell_centers_hex": _q_geo_cell_centers_hex_sql(),
    "events_hex_parent_rollup": _q_events_hex_parent_rollup_sql(),
    "geo_polyfill_hex": _q_geo_polyfill_hex_sql(),
    "pipeline_hex_ingest_query": _q_pipeline_hex_ingest_query_sql(),
}
