"""Property-based tests (hypothesis) for the pure-Python H3 core —
the invariants every other layer builds on: hierarchy consistency,
compact/uncompact round trips, resolution changes. Mirrors the spirit
of the reference's tier-1 unit tests with generated inputs instead of
fixed fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ukis_h3cellstore_spark.h3 import cells as h3c

# valid random cells: base cell + digit path (pentagon-safe digits
# handled by filtering through is_valid_cell)
base_cells = st.integers(min_value=0, max_value=121)
# resolutions kept in a narrow band (4..7) so expansion-based
# properties stay bounded (7^spread children)
digit_paths = st.lists(st.integers(min_value=0, max_value=6), min_size=4, max_size=7)


@st.composite
def valid_cells(draw):
    base = draw(base_cells)
    digits = draw(digit_paths)
    cell = h3c.build_cell(base, digits)
    if not h3c.is_valid_cell(cell):
        # pentagon K-axis path — nudge to the center child chain
        cell = h3c.build_cell(base, [0] * len(digits))
    return cell


@given(valid_cells())
@settings(max_examples=200, deadline=None)
def test_parent_is_prefix(cell):
    res = h3c.get_resolution(cell)
    for pr in range(res + 1):
        parent = h3c.cell_to_parent(cell, pr)
        assert h3c.get_resolution(parent) == pr
        assert h3c.is_valid_cell(parent)
        assert h3c.get_base_cell(parent) == h3c.get_base_cell(cell)
        # parent of the parent chain is consistent
        assert h3c.cell_to_parent(cell, 0) == h3c.cell_to_parent(parent, 0)


@given(valid_cells(), st.integers(min_value=0, max_value=2))
@settings(max_examples=60, deadline=None)
def test_children_partition_the_parent(cell, diff):
    res = h3c.get_resolution(cell)
    child_res = min(res + diff, 15)
    children = h3c.cell_to_children(cell, child_res)
    # count: 7^diff for hexagons, fewer under pentagons
    assert len(children) == h3c.cell_to_children_count(cell, child_res)
    assert len(set(children)) == len(children)
    for ch in children:
        assert h3c.is_valid_cell(ch)
        assert h3c.cell_to_parent(ch, res) == cell


@given(st.lists(valid_cells(), min_size=1, max_size=25))
@settings(max_examples=60, deadline=None)
def test_compact_uncompact_roundtrip(cells):
    # normalize to one resolution so the roundtrip is exact
    max_res = max(h3c.get_resolution(c) for c in cells)
    uniform = sorted(set(h3c.change_resolution(cells, max_res)))
    compacted = h3c.compact_cells(uniform)
    # compaction never grows the set and the expansion restores it
    assert len(compacted) <= len(uniform)
    assert h3c.uncompact_cells(compacted, max_res) == uniform
    # mixed resolutions in the compacted set stay ancestors of inputs
    for c in compacted:
        assert h3c.get_resolution(c) <= max_res


@given(st.lists(valid_cells(), min_size=1, max_size=20), st.integers(4, 8))
@settings(max_examples=60, deadline=None)
def test_change_resolution_idempotent(cells, res):
    out = h3c.change_resolution(cells, res)
    assert all(h3c.get_resolution(c) == res for c in out)
    # applying again is the identity
    assert h3c.change_resolution(out, res) == sorted(set(out)) or sorted(
        out
    ) == sorted(h3c.change_resolution(out, res))


@given(valid_cells())
@settings(max_examples=200, deadline=None)
def test_center_child_roundtrip(cell):
    res = h3c.get_resolution(cell)
    if res < 15:
        cc = h3c.cell_to_center_child(cell, res + 1)
        assert h3c.cell_to_parent(cc, res) == cell
        assert h3c.get_resolution(cc) == res + 1


# ------------------------------------------------ geometry properties


@given(valid_cells())
@settings(max_examples=150, deadline=None)
def test_geometry_roundtrip_any_cell(cell):
    """forward(inverse(cell)) == cell for arbitrary generated cells —
    the geometry layer must agree with the bit layer everywhere,
    including pentagon bases and face-overage regions."""
    from ukis_h3cellstore_spark.h3 import icosa

    lat, lng = icosa.cell_to_latlng(cell)
    assert -90.0 <= lat <= 90.0 and -180.0 <= lng <= 180.0
    assert icosa.latlng_to_cell(lat, lng, h3c.get_resolution(cell)) == cell


@given(
    lat=st.floats(min_value=-89.9, max_value=89.9),
    lng=st.floats(min_value=-180.0, max_value=180.0),
    res=st.integers(min_value=0, max_value=15),
)
@settings(max_examples=150, deadline=None)
def test_vectorized_forward_equals_scalar(lat, lng, res):
    import numpy as np

    from ukis_h3cellstore_spark.h3 import icosa

    vec = icosa.latlng_to_cell_np(np.array([lat]), np.array([lng]), res)
    assert int(vec[0]) == icosa.latlng_to_cell(lat, lng, res)


@given(valid_cells())
@settings(max_examples=100, deadline=None)
def test_vectorized_inverse_equals_scalar(cell):
    import numpy as np

    from ukis_h3cellstore_spark.h3 import icosa

    vlat, vlng = icosa.cell_to_latlng_np(np.array([cell], dtype=np.int64))
    slat, slng = icosa.cell_to_latlng(cell)
    assert abs(vlat[0] - slat) < 1e-12 and abs(vlng[0] - slng) < 1e-12


@given(valid_cells())
@settings(max_examples=60, deadline=None)
def test_neighbors_are_symmetric_and_complete(cell):
    from ukis_h3cellstore_spark.h3 import icosa

    nbs = icosa.cell_neighbors(cell)
    expect = 5 if h3c.is_pentagon(cell) else 6
    assert len(nbs) == expect and len(set(nbs)) == expect
    for nb in nbs:
        assert cell in icosa.cell_neighbors(nb)
