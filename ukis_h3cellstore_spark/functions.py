"""SQL-dialect H3 function registration (SURVEY §2.6, §7.4.8).

The reference's templated queries (P3) are written in ClickHouse SQL
and lean on ClickHouse's H3 function suite (``h3GetResolution``,
``h3ToParent``, ...). On the Spark backend, templates run through
``spark.sql`` — this module registers the same function names so
CH-dialect templates keep working.

The hierarchy functions are **SQL scalar UDFs** (``CREATE TEMPORARY
FUNCTION ... RETURN <expr>``): pure bit-arithmetic that Catalyst
inlines into the plan, so they constant-fold and stay inside
whole-stage codegen — no Python in the hot path. Only ``geoToH3``
needs real grid geometry; on the default H3 backend it registers an
Arrow-batched Pandas UDF over the vectorized pure-Python transform
(see :mod:`ukis_h3cellstore_spark.h3.icosa`).

H3 index bit layout (public spec): resolution in bits 52-55, base cell
in bits 45-51, one 3-bit digit per resolution from bit 45 downward;
unused fine digits hold 7. See ``h3/cells.py`` for the same math on
driver-side ints and ``h3/expressions.py`` for Column expressions.

Supported-function subset for templates (documented per SURVEY §7.4.8):
``h3GetResolution h3GetBaseCell h3ToParent h3ToChildren h3IsValid
h3IsPentagon max2 modulo geoToH3 h3ToGeo h3kRing`` plus everything in
Spark SQL's own library (``if``,
``greatest``, ``year``, ``month``, ``floor``, ``ceil``, ...).
ClickHouse's ``arrayJoin(x)`` must be written as ``explode(x)``, and
because Spark disallows SQL UDFs directly under a generator, the array
must be materialized in a subquery first:
``SELECT explode(ch) FROM (SELECT h3ToChildren(c, r) AS ch ...)``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_RES_CLEAR = ~(0xF << 52)  # clears the resolution nibble

# trailing_sevens(r) == (1 << (3*(15-r))) - 1: all digits below r set to 7


_SQL_FUNCTIONS: dict[str, str] = {
    "h3GetResolution": """
        (c BIGINT) RETURNS INT
        RETURN CAST(shiftright(c, 52) & 15 AS INT)
    """,
    "h3GetBaseCell": """
        (c BIGINT) RETURNS INT
        RETURN CAST(shiftright(c, 45) & 127 AS INT)
    """,
    "h3ToParent": f"""
        (c BIGINT, r INT) RETURNS BIGINT
        RETURN (c & CAST({_RES_CLEAR} AS BIGINT))
             | shiftleft(CAST(r AS BIGINT), 52)
             | (shiftleft(CAST(1 AS BIGINT), 3 * (15 - r)) - 1)
    """,
    # children of a hexagon cell at child resolution cr: expand every
    # base-7 combination into the digit slots between parent-res+1 and
    # cr. Pentagon parents (12 of 122 base cells) additionally skip
    # digit 1 in their first non-7 slot — use the driver-side
    # cells.cell_to_children for exact pentagon handling.
    "h3ToChildren": """
        (c BIGINT, cr INT) RETURNS ARRAY<BIGINT>
        -- identity guard: sequence(1, 0) would DESCEND in Spark SQL
        RETURN IF(cr = CAST(shiftright(c, 52) & 15 AS INT), array(c), transform(
          sequence(CAST(0 AS BIGINT),
                   CAST(pow(7, cr - (shiftright(c, 52) & 15)) AS BIGINT) - 1),
          k -> aggregate(
            sequence(1, cr - CAST(shiftright(c, 52) & 15 AS INT)),
            -- zero-digit base: parent with res nibble = cr and the
            -- parent's trailing-7 digit region cleared to 0
            (c & ~(shiftleft(CAST(1 AS BIGINT), CAST(3 * (15 - (shiftright(c, 52) & 15)) AS INT)) - 1)
               & CAST(-67553994410557441 AS BIGINT))
              | shiftleft(CAST(cr AS BIGINT), 52),
            -- write digit ii (base-7 expansion of k, most significant first)
            (acc, ii) -> acc | (
            shiftleft(
              (k div CAST(pow(7, cr - (shiftright(c, 52) & 15) - ii) AS BIGINT)) % 7,
              CAST(3 * (15 - ((shiftright(c, 52) & 15) + ii)) AS INT))),
            -- digits below cr stay 7
            acc -> acc | (shiftleft(CAST(1 AS BIGINT), 3 * (15 - cr)) - 1)
          )
        ))
    """,
    "h3IsPentagon": """
        (c BIGINT) RETURNS BOOLEAN
        RETURN array_contains(
          array(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117),
          CAST(shiftright(c, 45) & 127 AS INT))
    """,
    "max2": """
        (a DOUBLE, b DOUBLE) RETURNS DOUBLE RETURN greatest(a, b)
    """,
    "modulo": """
        (a BIGINT, b BIGINT) RETURNS BIGINT RETURN pmod(a, b)
    """,
}


def _h3_is_valid_sql_body() -> str:
    """Full structural validity as one SQL expression — the same
    unrolled digit / pentagon-K-axis bit tests as
    ``h3.expressions.h3_is_valid_cell`` (pure bit arithmetic, inlines
    into codegen). Built programmatically: 15 digit-rule tests plus 15
    first-nonzero-digit positions for the pentagon rule."""
    res = "(shiftright(c, 52) & 15)"
    parts = [
        "c > 0",
        "(shiftright(c, 59) & 15) = 1",  # cell mode, high bit 0
        "(shiftright(c, 56) & 7) = 0",  # reserved bits
        "(shiftright(c, 45) & 127) < 122",  # base cell range
    ]
    # digit rules: digits at positions ≤ res must not be 7 (deleted
    # subsequence marker), digits below res must all be 7
    for r in range(1, 16):
        digit = f"(shiftright(c, {3 * (15 - r)}) & 7)"
        parts.append(f"IF({r} <= {res}, {digit} != 7, {digit} = 7)")
    # pentagon rule: on a pentagon base cell the leading (first
    # non-zero-prefixed) digit must not be the deleted K axis (1)
    pent = (
        "array_contains(array(4,14,24,38,49,58,63,72,83,97,107,117), "
        "CAST(shiftright(c, 45) & 127 AS INT))"
    )
    leads = []
    for r in range(1, 16):
        digit = f"(shiftright(c, {3 * (15 - r)}) & 7)"
        if r == 1:
            prefix_zero = "true"
        else:
            mask = (1 << (3 * (r - 1))) - 1
            prefix_zero = f"(shiftright(c, {3 * (15 - (r - 1))}) & {mask}) = 0"
        leads.append(f"({r} <= {res} AND {prefix_zero} AND {digit} = 1)")
    parts.append(f"NOT ({pent} AND ({' OR '.join(leads)}))")
    return f"(c BIGINT) RETURNS BOOLEAN RETURN {' AND '.join(parts)}"


_SQL_FUNCTIONS["h3IsValid"] = _h3_is_valid_sql_body()


def register_h3_sql_functions(spark: SparkSession, grid=None) -> list[str]:
    """Register the CH-name H3 function subset as temporary SQL
    functions on this session. Returns the registered names.

    ``grid`` (a :class:`ukis_h3cellstore_spark.geo.GridSystem`) backs
    the geometry functions (``geoToH3``/``h3ToGeo``/``h3kRing``); when
    omitted they run on the real hexagonal grid via the vectorized
    pure-Python core — no native package needed anywhere."""
    names = []
    for name, body in _SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name} {body}")
        names.append(name)
    names.append(_register_geo_to_h3(spark, grid))
    names.append(_register_h3_to_geo(spark, grid))
    names.append(_register_h3_k_ring(spark, grid))
    return names


def _register_h3_k_ring(spark: SparkSession, grid=None) -> str:
    """``h3kRing(cell, k)`` — the grid disk as ``array<bigint>``
    (ClickHouse's h3kRing shape; pair with ``explode`` since Spark
    has no ``arrayJoin``). Disk walking is inherently per-cell
    iterative, so this is an Arrow-batched UDF with a per-batch
    memo — CH templates use it for small-k buffering of bounded cell
    lists, not corpus-wide scans (use the driver-side
    ``geo.grid_disk`` + broadcast joins for those)."""
    from pyspark.sql.types import ArrayType, LongType

    from ukis_h3cellstore_spark import geo

    g_backend = grid

    if g_backend is None or isinstance(g_backend, geo.H3Grid):
        global pd
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf(ArrayType(LongType()))
        def h3_k_ring(cell: pd.Series, k: pd.Series) -> pd.Series:
            from ukis_h3cellstore_spark.h3 import icosa

            memo: dict = {}
            out = []
            for c, kk in zip(cell, k):
                key = (int(c), int(kk))
                if key not in memo:
                    memo[key] = icosa.grid_disk(int(c), int(kk))
                out.append(memo[key])
            return pd.Series(out)

        spark.udf.register("h3kRing", h3_k_ring)
        return "h3kRing"

    def h3_k_ring_rowwise(cell: int, k: int):
        return g_backend.grid_disk(int(cell), int(k))

    spark.udf.register("h3kRing", h3_k_ring_rowwise, ArrayType(LongType()))
    return "h3kRing"


def _register_h3_to_geo(spark: SparkSession, grid=None) -> str:
    """``h3ToGeo(cell)`` — cell center as a ``(lon, lat)`` struct in
    degrees (ClickHouse's tuple order). On the default grid this is an
    Arrow-batched Pandas UDF over the vectorized inverse transform
    (``h3.icosa.cell_to_latlng_np``, ~750k cells/s/core); a custom
    GridSystem falls back to a per-row UDF."""
    from pyspark.sql.types import (
        DoubleType,
        StructField,
        StructType,
    )

    from ukis_h3cellstore_spark import geo

    out_type = StructType(
        [
            StructField("lon", DoubleType()),
            StructField("lat", DoubleType()),
        ]
    )
    if grid is None or isinstance(grid, geo.H3Grid):
        global pd
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf(out_type)
        def h3_to_geo(cell: pd.Series) -> pd.DataFrame:
            from ukis_h3cellstore_spark.h3 import icosa

            lats, lngs = icosa.cell_to_latlng_np(
                cell.to_numpy(dtype="int64")
            )
            return pd.DataFrame({"lon": lngs, "lat": lats})

        spark.udf.register("h3ToGeo", h3_to_geo)
        return "h3ToGeo"

    def h3_to_geo_rowwise(cell: int):
        lat, lng = grid.cell_to_latlng(int(cell))
        return (lng, lat)

    spark.udf.register("h3ToGeo", h3_to_geo_rowwise, out_type)
    return "h3ToGeo"


def _register_geo_to_h3(spark: SparkSession, grid=None) -> str:
    """``geoToH3(lat, lng, res)``.

    With the default grid (or an explicit :class:`~ukis_h3cellstore_spark.geo.H3Grid`)
    this registers an **Arrow-batched Pandas UDF** over the vectorized
    numpy forward transform (``h3.icosa.latlng_to_cell_np``, several
    hundred k points/s/core) — the 100-TB shape for point indexing. A
    custom :class:`GridSystem` (e.g. the SquareGrid test double) falls
    back to a per-row UDF with the grid captured in the closure
    (driver-side ``set_default_grid`` does not propagate to
    executors)."""
    from pyspark.sql.types import LongType

    from ukis_h3cellstore_spark import geo

    if grid is None or isinstance(grid, geo.H3Grid):
        # module-level import alias so the postponed annotations on the
        # pandas UDF resolve under `from __future__ import annotations`
        global pd
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf(LongType())
        def geo_to_h3(lat: pd.Series, lng: pd.Series, res: pd.Series) -> pd.Series:
            import numpy as np

            from ukis_h3cellstore_spark.h3 import icosa

            lats = lat.to_numpy(dtype="float64")
            lngs = lng.to_numpy(dtype="float64")
            rr = res.to_numpy(dtype="int64")
            out = np.empty(len(lats), dtype=np.int64)
            for r in np.unique(rr):
                m = rr == r
                out[m] = icosa.latlng_to_cell_np(lats[m], lngs[m], int(r))
            return pd.Series(out)

        spark.udf.register("geoToH3", geo_to_h3)
        return "geoToH3"

    def geo_to_h3_rowwise(lat: float, lng: float, res: int) -> int:
        # SQL float literals arrive as decimal.Decimal — normalize
        return grid.latlng_to_cell(float(lat), float(lng), int(res))

    spark.udf.register("geoToH3", geo_to_h3_rowwise, LongType())
    return "geoToH3"