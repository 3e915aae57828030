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


# the pentagon K-axis condition is recognizable in the optimized plan
# by the INSET membership test over the 12 pentagon base cells
# (Catalyst may keep it as a Filter node or push it into the cross
# join's condition — both count as "the filter is applied")
_PENT_MARKER = "INSET"


def test_pentagon_free_aoi_skips_validity_filter(spark):
    # Africa box at res 6: hierarchical path, no pentagon anywhere in
    # the cover -> neither a Filter node nor a pentagon-base INSET
    # condition anywhere in the plan (the expansion is leaves ∪
    # cross-joined projections)
    df = geo.geometry_to_cells_df(spark, _box(15.0, 0.0, 20.0), 6)
    plan = _plan(df)
    assert "Filter" not in plan and _PENT_MARKER not in plan
    # and the result still matches the driver polyfill exactly
    want = geo.geometry_to_cells(_box(15.0, 0.0, 20.0), 6)
    assert sorted(r["h3index"] for r in df.collect()) == want


def test_staged_rule_matches_driver_children(spark):
    # h3_expand_to_children's staged pentagon rule must reproduce the
    # driver hierarchy exactly: single-stage, multi-stage (two offset
    # stages across the MAX_OFFSET_DIFF split), and mixed
    # pentagon/hexagon parents sharing one frame
    import numpy as np

    from ukis_h3cellstore_spark.h3 import expressions as hx
    from ukis_h3cellstore_spark.query import cells_frame

    pent = h3c.build_cell(4, [])
    for target in (4, 8):
        got = sorted(
            r["h3index"]
            for r in hx.h3_expand_to_children(
                cells_frame(spark, "h3index", np.array([pent])),
                "h3index", 0, target, filter_invalid=True,
            ).collect()
        )
        assert got == sorted(h3c.cell_to_children(pent, target))
    mix = [h3c.build_cell(4, [0, 0]), h3c.build_cell(4, [2, 0]),
           h3c.build_cell(10, [1, 2])]
    got = sorted(
        r["h3index"]
        for r in hx.h3_expand_to_children(
            cells_frame(spark, "h3index", np.array(mix)),
            "h3index", 2, 7, filter_invalid=True,
        ).collect()
    )
    assert got == sorted(c for p in mix for c in h3c.cell_to_children(p, 7))


def test_staged_rule_agrees_with_full_validity(spark):
    # on every child of a valid parent the staged clause and the full
    # h3_is_valid_cell tree must agree (the staged form exists because
    # the full tree was 40x per-row on a multi-billion-row expansion)
    import numpy as np

    from pyspark.sql import functions as F

    from ukis_h3cellstore_spark.h3 import expressions as hx
    from ukis_h3cellstore_spark.query import cells_frame

    # all parents AT res 1 (the expansion contract): a res-1 pentagon,
    # a non-pentagon child on the pentagon base, and a plain hexagon
    parents = [h3c.build_cell(4, [0]), h3c.build_cell(4, [3]),
               h3c.build_cell(37, [5])]
    pf = cells_frame(spark, "h3index", np.array(parents))
    raw = hx.h3_expand_to_children(pf, "h3index", 1, 4, filter_invalid=False)
    both = raw.select(
        hx.h3_pentagon_rule_staged(F.col("h3index"), 1, 4).alias("staged"),
        hx.h3_is_valid_cell(F.col("h3index")).alias("full"),
    )
    # NOTE: parents at res 1 expand in ONE stage here, so the staged
    # rule sees (lo=1, hi=4) exactly as the expansion applies it
    assert both.filter(F.col("staged") != F.col("full")).count() == 0
    assert both.filter(~F.col("full")).count() > 0  # pentagons present


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
    assert _PENT_MARKER in _plan(df)
    want = geo.geometry_to_cells(gi, 5)
    assert sorted(r["h3index"] for r in df.collect()) == want
