"""CH-dialect SQL function registration tests (SURVEY §2.6): the
registered functions must agree with the driver-side bit arithmetic in
``h3/cells.py`` and inline into the plan (no Python in the hot path
except geoToH3)."""

from __future__ import annotations

import pytest

from ukis_h3cellstore_spark import geo
from ukis_h3cellstore_spark.functions import register_h3_sql_functions
from ukis_h3cellstore_spark.h3 import cells as h3c


@pytest.fixture(scope="module")
def fspark(spark):
    register_h3_sql_functions(spark)
    return spark


def test_registration_idempotent(fspark):
    names = register_h3_sql_functions(fspark)
    assert "h3ToParent" in names and "geoToH3" in names


def test_resolution_basecell_parent_agree_with_cells(fspark):
    cell = h3c.build_cell(60, [1, 2, 3, 4, 5])
    row = fspark.sql(
        f"SELECT h3GetResolution({cell}) AS r, h3GetBaseCell({cell}) AS b, "
        f"h3ToParent({cell}, 2) AS p"
    ).collect()[0]
    assert row.r == h3c.get_resolution(cell) == 5
    assert row.b == h3c.get_base_cell(cell) == 60
    assert row.p == h3c.cell_to_parent(cell, 2)


def test_to_children_matches_cells(fspark):
    cell = h3c.build_cell(60, [1, 2])
    got = fspark.sql(f"SELECT h3ToChildren({cell}, 4) AS ch").collect()[0].ch
    assert sorted(got) == h3c.cell_to_children(cell, 4)
    assert len(got) == 49
    # identity case: children at own resolution
    same = fspark.sql(f"SELECT h3ToChildren({cell}, 2) AS ch").collect()[0].ch
    assert same == [cell]


def test_children_explode_roundtrip(fspark):
    # reference test_connection.py:39-49: arrayJoin(h3ToChildren(...))
    # over 3 levels gives 7^3 rows (Spark dialect: explode)
    cell = h3c.build_cell(60, [3])
    # SQL UDFs cannot sit directly under a generator — materialize the
    # array in a subquery first (documented pattern)
    n = fspark.sql(
        f"SELECT explode(ch) AS c FROM (SELECT h3ToChildren({cell}, 4) AS ch)"
    ).count()
    assert n == 7 ** 3


def test_validity_and_pentagon(fspark):
    cell = h3c.build_cell(60, [1, 2, 3])
    penta = h3c.build_cell(4, [0, 0])  # base cell 4 is a pentagon
    rows = fspark.sql(
        f"SELECT h3IsValid({cell}) AS v1, h3IsValid(-5) AS v2, "
        f"h3IsPentagon({cell}) AS p1, h3IsPentagon({penta}) AS p2"
    ).collect()[0]
    assert rows.v1 and not rows.v2
    assert not rows.p1 and rows.p2


def test_max2_modulo(fspark):
    row = fspark.sql("SELECT max2(3.0, 7.0) AS m, modulo(-3, 5) AS o").collect()[0]
    assert row.m == 7.0
    assert row.o == 2  # pmod semantics, like ClickHouse positive modulo


def test_geo_to_h3_udf_with_square_grid(fspark):
    # the grid backend must be captured at registration time — it is
    # shipped to executors in the UDF closure
    grid = geo.SquareGrid()
    register_h3_sql_functions(fspark, grid=grid)
    try:
        got = fspark.sql("SELECT geoToH3(45.0, 15.0, 8) AS c").collect()[0].c
        assert got == grid.latlng_to_cell(45.0, 15.0, 8)
    finally:
        register_h3_sql_functions(fspark)


def test_sql_functions_inline_into_codegen(fspark):
    # the SQL UDFs must constant-fold / inline (no BatchEvalPython)
    cell = h3c.build_cell(60, [1, 2, 3, 4, 5])
    plan = (
        fspark.sql(f"SELECT h3ToParent(h3index, 2) FROM (SELECT {cell} AS h3index)")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan


def test_is_valid_full_digit_and_pentagon_rules(fspark):
    """The SQL h3IsValid must enforce the digit rules and the pentagon
    K-axis rule, agreeing with cells.is_valid_cell bit for bit."""
    good = h3c.build_cell(60, [1, 2, 3])
    # digit ≤ res set to 7 (deleted marker) → invalid
    bad_seven = good | (0x7 << (3 * 14))
    # digit > res not 7 → invalid
    bad_tail = good & ~(0x7 << 3)
    # pentagon base cell 4 with leading K-axis digit 1 → invalid
    bad_pent = h3c.build_cell(4, [1])
    ok_pent = h3c.build_cell(4, [2])
    cases = [good, bad_seven, bad_tail, bad_pent, ok_pent]
    exprs = ", ".join(f"h3IsValid({c}) AS c{i}" for i, c in enumerate(cases))
    row = fspark.sql(f"SELECT {exprs}").collect()[0]
    for i, cell in enumerate(cases):
        assert row[f"c{i}"] == h3c.is_valid_cell(cell), hex(cell)


def test_h3_k_ring_sql_function(spark):
    from ukis_h3cellstore_spark.functions import register_h3_sql_functions

    register_h3_sql_functions(spark)
    rows = spark.sql(
        """
        SELECT size(h3kRing(603108745894952959, 1)) AS n1,
               size(h3kRing(603108745894952959, 2)) AS n2,
               array_contains(h3kRing(603108745894952959, 1),
                              603108745894952959) AS has_center
        """
    ).collect()[0]
    assert rows.n1 == 7 and rows.n2 == 19 and rows.has_center
    # explode route (the arrayJoin substitute documented for templates)
    n = spark.sql(
        """
        SELECT explode(ring) FROM (
          SELECT h3kRing(603108745894952959, 2) AS ring
        )
        """
    ).count()
    assert n == 19
