"""Geometry-suite tests (H5-H7) on the SquareGrid double, mirroring
the reference's geometry invariants (border_cells.rs:103-145: border of
a rectangle has many cells and is a subset of the filled cells;
traversal.rs:131-162: thin polygons still produce cells via the
exterior-ring trace)."""

from __future__ import annotations

import pytest

from ukis_h3cellstore_spark import geo


@pytest.fixture()
def grid():
    return geo.SquareGrid()


RECT = {
    "type": "Polygon",
    "coordinates": [
        [(10.0, 40.0), (20.0, 40.0), (20.0, 50.0), (10.0, 50.0), (10.0, 40.0)]
    ],
}


def test_square_grid_roundtrip(grid):
    c = grid.latlng_to_cell(45.0, 15.0, 8)
    lat, lng = grid.cell_to_latlng(c)
    size = grid.cell_size_deg(8)
    assert abs(lat - 45.0) <= size and abs(lng - 15.0) <= size
    assert grid.latlng_to_cell(lat, lng, 8) == c


def test_grid_disk_counts(grid):
    c = grid.latlng_to_cell(45.0, 15.0, 8)
    assert len(geo.grid_disk(c, 0, grid)) == 1
    assert len(geo.grid_disk(c, 1, grid)) == 9  # square lattice: (2k+1)^2
    assert len(geo.grid_disk(c, 2, grid)) == 25
    assert c in geo.grid_disk(c, 2, grid)


def test_polyfill_rect_count(grid):
    res = 7
    cells = geo.polygon_to_cells(RECT["coordinates"], res, grid)
    size = grid.cell_size_deg(res)
    approx = (10.0 / size) * (10.0 / size)
    assert 0.8 * approx <= len(cells) <= 1.3 * approx
    # all centers inside or on the boundary trace
    assert len(set(cells)) == len(cells)


def test_polyfill_thin_polygon_still_yields_cells(grid):
    # a sliver far thinner than a cell: polyfill alone finds no
    # centers, the exterior-ring trace still covers it
    thin = [
        [(10.0, 45.0), (15.0, 45.0), (15.0, 45.0001), (10.0, 45.0001), (10.0, 45.0)]
    ]
    cells = geo.polygon_to_cells(thin, 6, grid)
    assert len(cells) >= 2


def test_geometry_to_cells_variants(grid):
    pt = {"type": "Point", "coordinates": (15.0, 45.0)}
    assert geo.geometry_to_cells(pt, 8, grid) == [
        grid.latlng_to_cell(45.0, 15.0, 8)
    ]
    mp = {
        "type": "MultiPolygon",
        "coordinates": [RECT["coordinates"]],
    }
    assert geo.geometry_to_cells(mp, 6, grid) == geo.geometry_to_cells(RECT, 6, grid)
    with pytest.raises(ValueError):
        geo.geometry_to_cells({"type": "Nope", "coordinates": []}, 6, grid)


def test_border_cells_invariants(grid):
    res = 7
    filled = set(geo.polygon_to_cells(RECT["coordinates"], res, grid))
    border1 = geo.border_cells(RECT, res, width=1, grid=grid)
    # reference invariant (border_cells.rs:103-145): many cells, all
    # inside the filled cover
    assert len(border1) > 100
    assert set(border1) <= filled
    # wider border strictly grows but stays inside
    border3 = geo.border_cells(RECT, res, width=3, grid=grid)
    assert set(border1) < set(border3) <= filled
    # interior not reached: a width-1 ring is far fewer than the fill
    assert len(border1) < len(filled) / 2


def test_border_cells_rejects_bad_input(grid):
    with pytest.raises(ValueError):
        geo.border_cells(RECT, 7, width=0, grid=grid)
    with pytest.raises(ValueError):
        geo.border_cells({"type": "Point", "coordinates": (0, 0)}, 7, grid=grid)


def test_h3grid_default_backend():
    # the pure-Python icosahedral core backs H3Grid with no native
    # wheel, so default_grid() always resolves to the real hex grid
    geo.set_default_grid(None)
    try:
        g = geo.default_grid()
        assert isinstance(g, geo.H3Grid)
        # doc vector through the GridSystem protocol
        assert g.latlng_to_cell(37.3615593, -122.0553238, 5) == 0x85283473FFFFFFF
        lat, lng = g.cell_to_latlng(0x85283473FFFFFFF)
        assert abs(lat - 37.345793375368) < 1e-6
        assert len(g.grid_disk(0x85283473FFFFFFF, 1)) == 7
        assert 0.0 < g.cell_size_deg(5) < 1.0
    finally:
        geo.set_default_grid(None)


def test_point_in_polygon_with_hole():
    rings = [
        [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
        [(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)],
    ]
    assert geo.point_in_polygon(2, 2, rings)
    assert not geo.point_in_polygon(5, 5, rings)  # inside the hole
    assert not geo.point_in_polygon(11, 5, rings)


def test_vendored_hex_cover_matches_live_polyfill():
    """Change detector: the vendored AOI cover in the real-hex gates
    must match the live driver-side polyfill (polyfill + ring union)."""
    from ukis_h3cellstore_spark.entry_queries_geo import (
        _HEX_COVER_VALUES,
        TRIANGLE_POLY,
    )

    vendored = sorted(
        int(row.strip().strip("(),"))
        for row in _HEX_COVER_VALUES.strip().split("\n")
    )
    live = geo.polygon_to_cells(TRIANGLE_POLY["coordinates"], 2, geo.H3Grid())
    assert vendored == sorted(live)
