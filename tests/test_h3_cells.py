"""Unit tests for the pure-Python H3 index math (no Spark needed).

Golden values cross-checked against the public H3 library semantics:
e.g. 0x8029fffffffffff is the res-0 cell for base cell 20 (trailing
digits all 7), parents/children follow the bit layout spec.
"""

from __future__ import annotations

import random

import pytest

from ukis_h3cellstore_spark.h3 import cells as c


def test_build_and_fields():
    cell = c.build_cell(20, [1, 2, 3])
    assert c.get_resolution(cell) == 3
    assert c.get_base_cell(cell) == 20
    assert c.get_digit(cell, 1) == 1
    assert c.get_digit(cell, 2) == 2
    assert c.get_digit(cell, 3) == 3
    assert c.get_digit(cell, 4) == 7
    assert c.is_valid_cell(cell)


def test_known_res0_index():
    # base cell 20 at res 0: mode=1, res=0, bc=20, all digits 7
    cell = c.build_cell(20, [])
    assert cell == 0x8029FFFFFFFFFFF


def test_known_res1_index():
    # well-known H3 cell: res 1, base cell 20, digit 0 → 0x81283ffffffffff
    cell = c.build_cell(20, [0])
    assert cell == 0x81283FFFFFFFFFF


def test_parent_child_roundtrip():
    cell = c.build_cell(20, [1, 2, 3, 4])
    parent = c.cell_to_parent(cell, 2)
    assert c.get_resolution(parent) == 2
    assert c.get_digit(parent, 1) == 1
    assert c.get_digit(parent, 2) == 2
    assert c.get_digit(parent, 3) == 7
    children = c.cell_to_children(parent, 4)
    assert cell in children
    assert len(children) == 49
    # every child's parent is the parent
    assert all(c.cell_to_parent(ch, 2) == parent for ch in children)


def test_parent_same_res_identity():
    cell = c.build_cell(33, [5])
    assert c.cell_to_parent(cell, 1) == cell


def test_pentagon_detection_and_children():
    pent = c.build_cell(4, [])  # base cell 4 is a pentagon
    assert c.is_pentagon(pent)
    assert c.is_pentagon(c.build_cell(4, [0, 0]))
    assert not c.is_pentagon(c.build_cell(4, [0, 2]))
    assert not c.is_pentagon(c.build_cell(5, []))
    kids = c.cell_to_children(pent, 1)
    assert len(kids) == 6  # pentagons have 6 children
    assert c.cell_to_children_count(pent, 1) == 6
    assert c.cell_to_children_count(pent, 2) == 1 + 5 * (49 - 1) // 6  # 41
    assert len(c.cell_to_children(pent, 2)) == 41
    # K-axis digit never appears on the pentagon chain
    assert all(c.get_digit(k, 1) != 1 or not c.is_pentagon(c.cell_to_parent(k, 0)) or True for k in kids)
    assert 1 not in {c.get_digit(k, 1) for k in kids}


def test_children_count_hexagon():
    cell = c.build_cell(20, [1])
    assert c.cell_to_children_count(cell, 1) == 1
    assert c.cell_to_children_count(cell, 4) == 343


def test_validity_rejects():
    good = c.build_cell(20, [1, 2])
    assert c.is_valid_cell(good)
    assert not c.is_valid_cell(good | (1 << 63))  # high bit
    assert not c.is_valid_cell(good & ~(0xF << 59))  # mode 0
    assert not c.is_valid_cell((125 << 45) | (c.MODE_CELL << 59) | c.trailing_sevens(0))
    # digit 7 inside resolution range
    bad = c.build_cell(20, [1, 2]) & ~(0x7 << (3 * 13)) | (0x7 << (3 * 13))
    assert not c.is_valid_cell(bad)
    # pentagon with leading K digit
    assert not c.is_valid_cell(c.build_cell(4, [1]))
    assert c.is_valid_cell(c.build_cell(4, [2]))


def test_change_resolution():
    a = c.build_cell(20, [1, 2])
    b = c.build_cell(20, [1])
    out = c.change_resolution([a, b], 1)
    assert out == [b]  # a's parent is b → dedup
    up = c.change_resolution([b], 2)
    assert len(up) == 7
    assert a in up


def test_compact_complete_set():
    parent = c.build_cell(20, [3])
    kids = c.cell_to_children(parent, 3)
    assert len(kids) == 49
    out = c.compact_cells(kids)
    assert out == [parent]


def test_compact_partial_set():
    parent = c.build_cell(20, [3])
    kids = c.cell_to_children(parent, 2)
    out = c.compact_cells(kids[:-1])
    assert len(out) == 6
    assert parent not in out


def test_compact_mixed_and_uncompact_roundtrip():
    p1 = c.build_cell(20, [3])
    p2 = c.build_cell(21, [4])
    # every 5th child → no complete 7-sibling set among them
    cells = c.cell_to_children(p1, 3) + c.cell_to_children(p2, 3)[::5]
    out = c.compact_cells(cells)
    assert p1 in out
    assert len(out) == 1 + 10
    # uncompact back to res 3 reproduces the original set
    assert c.uncompact_cells(out, 3) == sorted(set(cells))


def test_compact_pentagon():
    pent = c.build_cell(4, [])
    kids = c.cell_to_children(pent, 1)
    assert c.compact_cells(kids) == [pent]
    assert c.compact_cells(kids[:-1]) == sorted(kids[:-1])


def test_uncompact_subset():
    parent = c.build_cell(20, [3])
    kids = c.cell_to_children(parent, 3)
    want = set(random.Random(7).sample(kids, 5))
    out = c.uncompact_cells_subset([parent], 3, want)
    assert sorted(want) == out


def test_compact_random_property():
    rng = random.Random(42)
    base = c.build_cell(50, [2, 3])
    universe = c.cell_to_children(base, 6)
    sample = rng.sample(universe, 900)
    compacted = c.compact_cells(sample)
    # uncompacting the compacted set reproduces the sample exactly
    assert c.uncompact_cells(compacted, 6) == sorted(set(sample))
    assert len(compacted) <= len(set(sample))
