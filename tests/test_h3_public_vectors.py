"""Vendored PUBLIC H3 test vectors (bit-level, grid-independent).

Everything here comes from the public H3 spec / documentation, NOT
from this repo's own code paths — so these tests anchor the engine's
bit arithmetic (h3/cells.py, h3/expressions.py, functions.py) to
external ground truth instead of self-consistency:

- the res-0 index layout and the published first/last res-0 cells
  (``8001fffffffffff`` … ``80f3fffffffffff``, 122 of them);
- the canonical documentation example cells ``85283473fffffff``
  (res 5, base cell 20) and ``8828308281fffff`` (res 8, base cell
  20) with documented parent/child relations;
- the pentagon example ``821c07fffffffff`` (res 2, base cell 14);
- the published global cell counts per resolution (122, 842, 5882,
  41162, …, 569'707'381'193'162 at res 15) and the 12-pentagons-per-
  resolution invariant.

The latlng/grid-disk vectors exercise the pure-Python icosahedral
core (h3/icosa.py) through the H3Grid backend — no native wheel
needed. They are the external ground-truth anchors for that module:
the latLngToCell/cellToLatLng doc examples, the polygonToCells cell
counts from the public H3 C test suite, and the grid-disk size
formulas (hexagon and pentagon).
"""

from __future__ import annotations

import pytest

from ukis_h3cellstore_spark.h3 import cells as c

# ---------------------------------------------------------- res-0 layout

#: (base cell, published res-0 index)
RES0_VECTORS = [
    (0, 0x8001FFFFFFFFFFF),  # first cell of getRes0Cells()
    (20, 0x8029FFFFFFFFFFF),  # base cell of the SF doc examples
    (121, 0x80F3FFFFFFFFFFF),  # last cell of getRes0Cells()
]

#: published per-resolution cell counts (H3 docs, "Table of cell
#: counts by resolution"): count(r+1) = 7*count(r) - 12*6 + 12*5
CELL_COUNTS = {0: 122, 1: 842, 2: 5882, 3: 41162, 15: 569_707_381_193_162}


def test_res0_index_layout_matches_published_cells():
    for base, want in RES0_VECTORS:
        got = c.build_cell(base, [])
        assert got == want, f"base {base}: {hex(got)} != {hex(want)}"
        assert c.is_valid_cell(want)
        assert c.get_resolution(want) == 0
        assert c.get_base_cell(want) == base


def test_canonical_doc_example_cells():
    # primary example index of the H3 C documentation
    e5 = 0x85283473FFFFFFF
    assert c.is_valid_cell(e5)
    assert c.get_resolution(e5) == 5
    assert c.get_base_cell(e5) == 20
    assert not c.is_pentagon(e5)
    assert len(c.cell_to_children(e5, 6)) == 7
    # SF res-8 cell from the cellToParent doc example; its res-9
    # children include the documented ring members around it
    p8 = 0x8828308281FFFFF
    assert c.is_valid_cell(p8)
    assert c.get_resolution(p8) == 8
    assert c.get_base_cell(p8) == 20
    for child in (0x8928308280FFFFF, 0x8928308280BFFFF):
        assert c.is_valid_cell(child)
        assert c.get_resolution(child) == 9
        assert c.cell_to_parent(child, 8) == p8
    assert c.cell_to_parent(p8, 0) == 0x8029FFFFFFFFFFF


def test_pentagon_example_cell():
    # isPentagon doc example
    pent = 0x821C07FFFFFFFFF
    assert c.is_valid_cell(pent)
    assert c.is_pentagon(pent)
    assert c.get_resolution(pent) == 2
    assert c.get_base_cell(pent) == 14
    assert c.get_base_cell(pent) in c.PENTAGON_BASE_CELLS
    # pentagons have 6 direct children (K axis deleted), hexagons 7
    assert len(c.cell_to_children(pent, 3)) == 6
    # a pentagon's center child is itself a pentagon
    kids = c.cell_to_children(pent, 3)
    assert sum(c.is_pentagon(k) for k in kids) == 1


def test_published_global_cell_counts():
    res0 = [c.build_cell(b, []) for b in range(122)]
    assert len(res0) == CELL_COUNTS[0]
    for r in (1, 2, 3, 15):
        total = sum(c.cell_to_children_count(cell, r) for cell in res0)
        assert total == CELL_COUNTS[r], f"res {r}"


def test_twelve_pentagons_per_resolution():
    assert len(c.PENTAGON_BASE_CELLS) == 12
    for r in (1, 2):
        pents = [
            k
            for b in sorted(c.PENTAGON_BASE_CELLS)
            for k in c.cell_to_children(c.build_cell(b, []), r)
            if c.is_pentagon(k)
        ]
        assert len(pents) == 12, f"res {r}"


def test_invalid_indexes_rejected():
    # base cell out of range (122), wrong mode bits, digit-7 below res
    assert not c.is_valid_cell(c.build_cell(121, []) + (1 << 45))  # base 122
    assert not c.is_valid_cell(0x85283473FFFFFFF & ~(1 << 59))  # mode 0
    assert not c.is_valid_cell(0x85283473FFFFFFF | (7 << 42))  # digit1 = 7
    # pentagon child on the deleted K axis (leading digit 1)
    assert not c.is_valid_cell(c.build_cell(4, [1]))


# ------------------------------------------- real-grid vectors (icosa)


#: sfGeoLoop from the public H3 C test suite (testPolygonToCells.c),
#: vertices in radians (lat, lng); polygonToCells at res 9 covers
#: exactly 1253 cells (TEST_ASSERT in the suite), 1214 with the
#: holeGeoLoop hole punched out.
SF_LOOP_RAD = [
    (0.659966917655, -2.1364398519396),
    (0.6595011102219, -2.1359434279405),
    (0.6583348114025, -2.1354884206045),
    (0.6581220034068, -2.1382437718946),
    (0.6594479998527, -2.1384597563896),
    (0.6599990002976, -2.1376771158464),
]
SF_HOLE_RAD = [
    (0.6595072188743, -2.1371053983433),
    (0.6591482046471, -2.1373141048153),
    (0.6592295020837, -2.1365222838402),
]


def _ring_deg(loop_rad):
    """(lat, lng) radians → GeoJSON-order (lng, lat) degrees ring."""
    import math

    return [(math.degrees(lng), math.degrees(lat)) for lat, lng in loop_rad]


def test_latlng_to_cell_doc_input_vector():
    from ukis_h3cellstore_spark.geo import H3Grid

    g = H3Grid()
    # latLngToCell doc example: (37.3615593, -122.0553238) @ res 5
    assert g.latlng_to_cell(37.3615593, -122.0553238, 5) == 0x85283473FFFFFFF


def test_polyfill_sf_polygon_count_vector():
    from ukis_h3cellstore_spark.geo import H3Grid

    g = H3Grid()
    cells = g.polygon_to_cells([_ring_deg(SF_LOOP_RAD)], 9)
    assert len(cells) == 1253
    assert len(set(cells)) == 1253
    assert all(c.get_resolution(x) == 9 and c.is_valid_cell(x) for x in cells)
    # same polygon with the hole loop punched out
    holed = g.polygon_to_cells(
        [_ring_deg(SF_LOOP_RAD), _ring_deg(SF_HOLE_RAD)], 9
    )
    assert len(holed) == 1214
    assert set(holed) <= set(cells)


def test_grid_disk_size_formula_vectors():
    from ukis_h3cellstore_spark.geo import H3Grid

    g = H3Grid()
    # published maxGridDiskSize formula: 1 + 3k(k+1) (hexagon center)
    for k, want in [(0, 1), (1, 7), (2, 19), (3, 37)]:
        assert len(g.grid_disk(0x8828308281FFFFF, k)) == want
    # pentagon-centered ring k has 5k cells → disk 1 + 5k(k+1)/2
    for k, want in [(1, 6), (2, 16)]:
        assert len(g.grid_disk(0x821C07FFFFFFFFF, k)) == want


def test_latlng_vector_doc_example():
    from ukis_h3cellstore_spark.geo import H3Grid

    g = H3Grid()
    lat, lng = g.cell_to_latlng(0x85283473FFFFFFF)
    # cellToLatLng doc example (Santa Clara county area)
    assert abs(lat - 37.345793375368) < 1e-6
    assert abs(lng - (-121.976375972551)) < 1e-6
    assert g.latlng_to_cell(lat, lng, 5) == 0x85283473FFFFFFF


def test_grid_disk_ring_size_vector():
    from ukis_h3cellstore_spark.geo import H3Grid

    g = H3Grid()
    disk = g.grid_disk(0x8828308281FFFFF, 1)
    assert len(disk) == 7 and 0x8828308281FFFFF in disk
    # pentagon disks are one smaller (deleted K axis neighbor)
    pent_disk = g.grid_disk(0x821C07FFFFFFFFF, 1)
    assert len(pent_disk) == 6
