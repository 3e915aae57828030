"""Exhaustive pentagon-adjacent geometry validation.

The hypothesis suites sample pentagon NEIGHBORHOODS only rarely, yet
pentagon-adjacent cells are exactly where the icosahedral geometry is
hardest (deleted K axis, five faces meeting, class-II/III overage on
every side). This suite walks EVERY cell within grid distance 3 of
EVERY pentagon at resolutions 1-3 (12 pentagons x 3 res x 31 cells)
and checks, deterministically:

- forward(inverse(cell)) == cell — the two independent geometry code
  paths (digit-peeling inverse vs nearest-face forward) must agree on
  every pentagon-adjacent cell, including all face-overage members;
- neighbor symmetry and cardinality on the distance-1 shell;
- the published pentagon-centered disk/ring size formulas
  (ring k has 5k cells, disk k has 1 + 5k(k+1)/2);
- grid_disk_distances is consistent with ring membership (the cell
  appears at exactly one distance, and distance-1 members are exactly
  the neighbor set).

These are cross-checks between INDEPENDENT implementations plus the
public size formulas — the strongest anchor available without the
native library in the container.
"""

from __future__ import annotations

import pytest

from ukis_h3cellstore_spark.h3 import cells as h3c
from ukis_h3cellstore_spark.h3 import icosa

RESOLUTIONS = [1, 2, 3, 4, 5]  # both class-II (even) and class-III (odd)


def _pentagons(res: int) -> list[int]:
    out = []
    for b in sorted(h3c.PENTAGON_BASE_CELLS):
        cell = h3c.build_cell(b, [0] * res)  # center-child chain
        assert h3c.is_pentagon(cell)
        out.append(cell)
    return out


@pytest.mark.parametrize("res", RESOLUTIONS)
def test_pentagon_disk_sizes_all_twelve(res):
    for p in _pentagons(res):
        dist = icosa.grid_disk_distances(p, 3)
        by_k: dict[int, int] = {}
        for _, k in dist.items():
            by_k[k] = by_k.get(k, 0) + 1
        assert by_k[0] == 1
        for k in (1, 2, 3):
            assert by_k[k] == 5 * k, (hex(p), k, by_k)
        assert len(dist) == 1 + 5 * 3 * 4 // 2  # 31


@pytest.mark.parametrize("res", RESOLUTIONS)
def test_pentagon_adjacent_roundtrip(res):
    for p in _pentagons(res):
        for cell in icosa.grid_disk(p, 3):
            lat, lng = icosa.cell_to_latlng(cell)
            got = icosa.latlng_to_cell(lat, lng, res)
            assert got == cell, (hex(p), hex(cell), hex(got))


@pytest.mark.parametrize("res", RESOLUTIONS)
def test_pentagon_shell_neighbor_symmetry(res):
    for p in _pentagons(res):
        nbs = icosa.cell_neighbors(p)
        assert len(nbs) == 5 and len(set(nbs)) == 5
        dist = icosa.grid_disk_distances(p, 1)
        assert {c for c, k in dist.items() if k == 1} == set(nbs)
        for nb in nbs:
            # distance-1 shell cells are hexagons (pentagons are never
            # adjacent) with full 6-neighbor fans containing the pentagon
            assert not h3c.is_pentagon(nb)
            fan = icosa.cell_neighbors(nb)
            assert len(fan) == 6 and len(set(fan)) == 6
            assert p in fan


@pytest.mark.parametrize("res", RESOLUTIONS)
def test_pentagon_adjacent_vectorized_inverse_agrees(res):
    import numpy as np

    for p in _pentagons(res):
        cells = np.array(icosa.grid_disk(p, 2), dtype=np.int64)
        vlat, vlng = icosa.cell_to_latlng_np(cells)
        for i, cell in enumerate(cells):
            slat, slng = icosa.cell_to_latlng(int(cell))
            assert abs(vlat[i] - slat) < 1e-12
            assert abs(vlng[i] - slng) < 1e-12
