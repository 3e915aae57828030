"""Raster source tests — the synthetic analog of the reference's
tier-3 raster oracle (test_raster.py:22-82: ingest a mask, read it
back, re-rasterize, assert almost nothing lost)."""

from __future__ import annotations

import numpy as np
import pytest

from ukis_h3cellstore_spark import geo
from ukis_h3cellstore_spark.raster import cells_to_raster, raster_to_dataframe

# 10°x10° box starting at (lng=10, lat=40), 60x60 pixels;
# row 0 at the top (negative y pixel size, GDAL-style)
PX = 10.0 / 60
TRANSFORM = (PX, 0.0, 10.0, 0.0, -PX, 50.0)


@pytest.fixture(scope="module")
def mask():
    m = np.zeros((60, 60), dtype="int64")
    yy, xx = np.mgrid[0:60, 0:60]
    blob = (yy - 30) ** 2 + (xx - 30) ** 2 <= 20**2
    m[blob] = 7  # "water" class
    m[5:10, 40:55] = 3  # a second class, disjoint
    return m


def test_raster_roundtrip_lossless(spark, mask):
    # SquareGrid res 9 cells (0.088°) are finer than pixels (0.167°):
    # every masked pixel maps to a distinct cell → exact round trip,
    # a stronger form of the reference's <0.5%-lost bound
    grid = geo.SquareGrid()
    df = raster_to_dataframe(
        spark, mask, TRANSFORM, 9, nodata_value=0, grid=grid, band_rows=16
    )
    n_px = int((mask != 0).sum())
    assert df.count() == n_px
    back = cells_to_raster(df, TRANSFORM, mask.shape, grid=grid)
    lost = int(((mask != 0) & (back != mask)).sum())
    assert lost == 0
    # nodata stays clear
    assert int(back[mask == 0].sum()) == 0


def test_raster_compacted_same_coverage(spark, mask):
    grid = geo.SquareGrid()
    plain = raster_to_dataframe(spark, mask, TRANSFORM, 9, grid=grid)
    compacted = raster_to_dataframe(
        spark, mask, TRANSFORM, 9, grid=grid, compact=True
    )
    # compaction can only shrink the row count, never grow it
    assert compacted.count() <= plain.count()


def test_raster_rejects_bad_input(spark):
    with pytest.raises(ValueError):
        raster_to_dataframe(
            spark, np.zeros((2, 2, 2)), TRANSFORM, 9, grid=geo.SquareGrid()
        )
    with pytest.raises(ValueError):
        # det == 0
        cells_to_raster(None, (1, 0, 0, 1, 0, 0), (4, 4), grid=geo.SquareGrid())


def test_raster_real_hex_grid_roundtrip(spark, mask):
    """The reference's tier-3 oracle on the REAL hexagonal grid: ingest
    the mask through H3Grid (pure-Python icosa core), re-rasterize,
    and assert <0.5 % of source pixels lost (test_raster.py:80-82
    parity) — res-7 hexagons (~1.2 km edge) are much finer than the
    ~18 km pixels."""
    grid = geo.H3Grid()
    df = raster_to_dataframe(
        spark, mask, TRANSFORM, 7, nodata_value=0, grid=grid, band_rows=16
    )
    rows = df.count()
    n_px = int((mask != 0).sum())
    assert rows >= n_px  # finer cells: at least one per pixel region
    back = cells_to_raster(df, TRANSFORM, mask.shape, grid=grid)
    src_set = mask != 0
    lost = int((src_set & (back == 0)).sum())
    assert lost / n_px < 0.005
    # classes survive: the two distinct values map back
    assert set(np.unique(back[back != 0])) == {3, 7}
