"""Bitwise parity of the vectorized point-in-polygon with the scalar
rule, and array/list agreement of the hierarchical cover's two forms.

The vectorized form exists for the planet-scale polyfill's final-level
containment test (millions of band centers at a res-10 continent);
its contract is NOT "approximately the same verdicts" but *the same
float operations broadcast*, so every point must classify identically
— including points exactly on vertices, edges, and the longitude
wrap.  Reference behavior being preserved: the sphere-aware even-odd
rule matching h3ron's transmeridian handling (traversal.rs:131-162).
"""

import math
import random

import numpy as np
import pytest

from ukis_h3cellstore_spark.geo import point_in_polygon, points_in_polygon_np
from ukis_h3cellstore_spark.h3 import icosa


def _assert_parity(rings, lngs, lats):
    got = points_in_polygon_np(np.asarray(lngs), np.asarray(lats), rings)
    want = np.array(
        [point_in_polygon(float(x), float(y), rings)
         for x, y in zip(lngs, lats)]
    )
    mism = np.nonzero(got != want)[0]
    assert mism.size == 0, [
        (float(lngs[i]), float(lats[i]), bool(want[i])) for i in mism[:5]
    ]


SQUARE = [(-10.0, -10.0), (10.0, -10.0), (10.0, 10.0), (-10.0, 10.0),
          (-10.0, -10.0)]
STRIP = [(170.0, 10.0), (-170.0, 10.0), (-170.0, 20.0), (170.0, 20.0),
         (170.0, 10.0)]
NCAP = [(float(lng), 85.0) for lng in range(-180, 181, 30)]
SCAP = [(float(lng), -85.0) for lng in range(-180, 181, 30)]
HOLED = [
    [(-3.0, -3.0), (3.0, -3.0), (3.0, 3.0), (-3.0, 3.0), (-3.0, -3.0)],
    [(-1.5, -1.5), (1.5, -1.5), (1.5, 1.5), (-1.5, 1.5), (-1.5, -1.5)],
]


@pytest.mark.parametrize(
    "rings",
    [[SQUARE], [STRIP], [NCAP], [SCAP], HOLED],
    ids=["square", "antimeridian-strip", "north-cap", "south-cap", "holed"],
)
def test_grid_and_boundary_parity(rings):
    # a lng/lat grid spanning both hemispheres and the wrap…
    lngs, lats = np.meshgrid(
        np.linspace(-180.0, 180.0, 73), np.linspace(-89.0, 89.0, 37)
    )
    lngs, lats = lngs.ravel().tolist(), lats.ravel().tolist()
    # …plus every vertex EXACTLY, edge midpoints, and wrap-adjacent
    # points — the boundary classes where a reimplementation drifts
    for ring in rings:
        for a in range(len(ring) - 1):
            x1, y1 = ring[a]
            x2, y2 = ring[a + 1]
            lngs.extend([x1, (x1 + x2) / 2.0])
            lats.extend([y1, (y1 + y2) / 2.0])
    lngs.extend([180.0, -180.0, 179.999999, -179.999999])
    lats.extend([15.0, 15.0, 15.0, 15.0])
    _assert_parity(rings, lngs, lats)


def test_random_polygon_fuzz_parity():
    rng = random.Random(1405)
    for _ in range(25):
        cx = rng.uniform(-170.0, 170.0)
        cy = rng.uniform(-60.0, 60.0)
        n = rng.randrange(3, 12)
        ring = []
        for k in range(n):
            ang = 2.0 * math.pi * k / n
            r = rng.uniform(2.0, 25.0)
            ring.append((cx + r * math.cos(ang), cy + r * math.sin(ang)))
        ring.append(ring[0])
        lngs = [rng.uniform(-180.0, 180.0) for _ in range(400)]
        lats = [rng.uniform(-89.0, 89.0) for _ in range(400)]
        # points biased INTO the polygon's bbox so both verdicts occur
        lngs.extend(cx + rng.uniform(-30.0, 30.0) for _ in range(400))
        lats.extend(cy + rng.uniform(-30.0, 30.0) for _ in range(400))
        _assert_parity([ring], lngs, lats)


def test_cover_np_and_list_forms_agree():
    aoi = [[(-2.0, -2.0), (6.0, -2.0), (6.0, 4.0), (-2.0, 4.0),
            (-2.0, -2.0)]]
    interior, leaves = icosa.polygon_to_cells_cover(aoi, 6)
    ic, il, lv = icosa.polygon_to_cells_cover_np(aoi, 6)
    assert interior == [(int(c), int(l)) for c, l in zip(ic, il)]
    assert leaves == [int(c) for c in lv]
    assert ic.dtype == np.int64 and lv.dtype == np.int64
    # and the hierarchical split still reproduces the flat polyfill
    from ukis_h3cellstore_spark.h3 import cells as h3c

    expanded = set(leaves)
    for c, lvl in interior:
        expanded.update(h3c.cell_to_children(c, 6))
    assert expanded == set(icosa.polygon_to_cells(aoi, 6))


def test_cover_np_flat_path_small_aoi():
    # an AOI small enough that the classifier starts AT the target
    # resolution: the np form must return empty interior + the flat
    # polyfill as leaves (the gate fixtures ride this path)
    aoi = [[(11.0, 11.0), (11.2, 11.0), (11.2, 11.2), (11.0, 11.2),
            (11.0, 11.0)]]
    ic, il, lv = icosa.polygon_to_cells_cover_np(aoi, 5)
    assert ic.size == 0 and il.size == 0
    assert [int(c) for c in lv] == icosa.polygon_to_cells(aoi, 5)
