"""The distributed polyfill's validity filter is conditioned on an
exact pentagon test of the interior cover parents: only
pentagon-rooted subtrees can contain invalid (K-axis) children, so a
pentagon-free AOI's multi-billion-row expansion must not pay the
~45-node per-row `h3_is_valid_cell` filter (the store's uncompaction
applies the same `any_pentagon` conditioning, store.py:975)."""

from ukis_h3cellstore_spark import geo
from ukis_h3cellstore_spark.h3 import cells as h3c
from ukis_h3cellstore_spark.h3 import icosa


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _box(lng, lat, half):
    return {
        "type": "Polygon",
        "coordinates": [
            [(lng - half, lat - half), (lng + half, lat - half),
             (lng + half, lat + half), (lng - half, lat + half),
             (lng - half, lat - half)]
        ],
    }


def test_pentagon_free_aoi_skips_validity_filter(spark):
    # Africa box at res 6: hierarchical path, no pentagon anywhere in
    # the cover -> the plan must contain NO Filter node at all (the
    # expansion is leaves ∪ cross-joined projections)
    df = geo.geometry_to_cells_df(spark, _box(15.0, 0.0, 20.0), 6)
    assert "Filter" not in _plan(df)
    # and the result still matches the driver polyfill exactly
    want = geo.geometry_to_cells(_box(15.0, 0.0, 20.0), 6)
    assert sorted(r["h3index"] for r in df.collect()) == want


def test_pentagon_aoi_keeps_validity_filter(spark):
    # a box centered on pentagon base cell 4, sized so the cover's
    # interior contains pentagon parents -> filter stays on, and
    # equality with the driver form (which drops K-axis descendants)
    # still holds
    plat, plng = icosa.cell_to_latlng(h3c.build_cell(4, []))
    gi = _box(plng, plat, 6.0)
    df = geo.geometry_to_cells_df(spark, gi, 5)
    ic, il, _ = icosa.polygon_to_cells_cover_np(gi["coordinates"], 5)
    has_pent = any(
        h3c.is_pentagon(int(c)) for c in ic
    )
    assert has_pent, "fixture must put a pentagon in the cover interior"
    assert "Filter" in _plan(df)
    want = geo.geometry_to_cells(gi, 5)
    assert sorted(r["h3index"] for r in df.collect()) == want
