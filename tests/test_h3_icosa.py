"""Property and consistency tests for the pure-Python H3 icosahedral
core (h3/icosa.py) beyond the vendored public vectors
(test_h3_public_vectors.py): exhaustive coarse round-trips, vectorized
≡ scalar, ring geometry, and polyfill membership semantics."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from ukis_h3cellstore_spark.h3 import cells as c
from ukis_h3cellstore_spark.h3 import icosa


def test_roundtrip_exhaustive_res1_res2():
    for res in (1, 2):
        for b in range(122):
            for cell in c.cell_to_children(c.build_cell(b, []), res):
                lat, lng = icosa.cell_to_latlng(cell)
                assert icosa.latlng_to_cell(lat, lng, res) == cell


def test_roundtrip_random_points_all_resolutions():
    rng = random.Random(5)
    for _ in range(500):
        lat = math.degrees(math.asin(rng.uniform(-1, 1)))
        lng = rng.uniform(-180, 180)
        res = rng.randint(0, 15)
        cell = icosa.latlng_to_cell(lat, lng, res)
        assert c.is_valid_cell(cell)
        assert c.get_resolution(cell) == res
        clat, clng = icosa.cell_to_latlng(cell)
        assert icosa.latlng_to_cell(clat, clng, res) == cell


def test_hierarchy_vs_geometry_nearly_nested():
    """H3's hierarchy is NOT strictly nested (children protrude past
    parent boundaries — a documented property of the real grid), so
    the bit-math ancestor of a point's fine cell is either the point's
    coarse cell or one of its immediate neighbors, and the two agree
    for the vast majority of points."""
    rng = random.Random(9)
    agree = 0
    for _ in range(300):
        lat = math.degrees(math.asin(rng.uniform(-1, 1)))
        lng = rng.uniform(-180, 180)
        fine = icosa.latlng_to_cell(lat, lng, 9)
        coarse = icosa.latlng_to_cell(lat, lng, 4)
        anc = c.cell_to_parent(fine, 4)
        if anc == coarse:
            agree += 1
        else:
            assert anc in icosa.cell_neighbors(coarse)
    assert agree > 270  # boundary effect is a few percent at most


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(3)
    lats = np.degrees(np.arcsin(rng.uniform(-1, 1, 800)))
    lngs = rng.uniform(-180, 180, 800)
    for res in (0, 3, 8, 15):
        vec = icosa.latlng_to_cell_np(lats, lngs, res)
        for i in range(0, 800, 37):
            assert vec[i] == icosa.latlng_to_cell(lats[i], lngs[i], res)


def test_ring_geometry_all_res2_cells():
    """Every res-2 cell's ring-1 is complete, distinct, and at
    near-uniform spacing — exercises the derived neighbor tables and
    the pentagon fixups globally (5882 cells)."""
    bad = []
    for b in range(122):
        for cell in c.cell_to_children(c.build_cell(b, []), 2):
            if not icosa._ring_geometry_ok(cell):
                bad.append(hex(cell))
    assert not bad, f"{len(bad)} broken rings, e.g. {bad[:5]}"


def test_disk_distances_symmetry():
    center = 0x8828308281FFFFF
    dd = icosa.grid_disk_distances(center, 3)
    assert dd[center] == 0
    ring_sizes = {}
    for cell, d in dd.items():
        ring_sizes[d] = ring_sizes.get(d, 0) + 1
    assert ring_sizes == {0: 1, 1: 6, 2: 12, 3: 18}


def test_polyfill_center_containment_semantics():
    from ukis_h3cellstore_spark.geo import point_in_polygon

    ring = [(-122.05, 37.35), (-121.95, 37.35), (-121.95, 37.45),
            (-122.05, 37.45), (-122.05, 37.35)]
    cells = icosa.polygon_to_cells([ring], 7)
    assert cells == sorted(set(cells))
    for cell in cells:
        lat, lng = icosa.cell_to_latlng(cell)
        assert point_in_polygon(lng, lat, [ring])
    # completeness: every cell of a covering disk whose center is
    # inside must be in the result
    anchor = icosa.latlng_to_cell(37.40, -122.00, 7)
    for cand in icosa.grid_disk(anchor, 12):
        lat, lng = icosa.cell_to_latlng(cand)
        if point_in_polygon(lng, lat, [ring]):
            assert cand in cells


def test_pentagons_have_five_neighbors():
    for p in sorted(icosa.PENTAGONS):
        for res in (1, 2):
            pent_cells = [
                x
                for x in c.cell_to_children(c.build_cell(p, []), res)
                if c.is_pentagon(x)
            ]
            assert len(pent_cells) == 1
            disk = icosa.grid_disk(pent_cells[0], 1)
            assert len(disk) == 6  # center + 5 neighbors


def test_vendored_hex_gate_vectors_current():
    """Change detector: the vendored oracle pairs in the
    geo_latlng_to_cell_hex gate must match the live implementation."""
    from ukis_h3cellstore_spark.entry_queries_geo import _HEX_VECTORS

    for row in _HEX_VECTORS.strip().rstrip(",").split("\n"):
        eid, cell = eval(row.strip().rstrip(","))
        lng = ((eid * 7919) % 36000) / 100.0 - 180.0
        lat = ((eid * 104729) % 14000) / 100.0 - 70.0
        assert icosa.latlng_to_cell(lat, lng, 5) == cell


class TestChildrenOneLevelNp:
    """Round-14: the vectorized one-level child expansion that keeps
    the hierarchical polyfill's recursion band out of Python lists —
    cell-for-cell parity with cells.cell_to_children, pentagon chains
    included."""

    def test_parity_with_scalar_form(self):
        import random

        import numpy as np

        from ukis_h3cellstore_spark.h3 import cells as _cells
        from ukis_h3cellstore_spark.h3 import icosa

        rng = random.Random(1234)
        for level in [0, 1, 2, 5, 8, 14]:
            parents = []
            for bc in (4, 14, 38, 117, 60, 20, 33):  # pentagons + hexagons
                c = _cells.build_cell(bc, [])
                for r in range(level):
                    kids = _cells.cell_to_children(c, r + 1)
                    # mix center-chain (pentagon-preserving) and random
                    c = kids[0] if bc in (4, 14) else rng.choice(kids)
                parents.append(c)
            arr = np.array(parents, dtype=np.int64)
            got = sorted(int(x) for x in icosa.children_one_level_np(arr, level))
            want = sorted(
                k for c in parents for k in _cells.cell_to_children(c, level + 1)
            )
            assert got == want

    def test_pentagon_chain_skips_k_axis(self):
        import numpy as np

        from ukis_h3cellstore_spark.h3 import cells as _cells
        from ukis_h3cellstore_spark.h3 import icosa

        pent5 = _cells.build_cell(4, [0, 0, 0, 0, 0])  # res-5 pentagon
        kids = icosa.children_one_level_np(
            np.array([pent5], dtype=np.int64), 5
        )
        assert len(kids) == 6  # K-axis child deleted
        assert sorted(int(k) for k in kids) == _cells.cell_to_children(pent5, 6)
