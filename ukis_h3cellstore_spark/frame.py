"""H3DataFrame — a Spark DataFrame plus the name of its H3 column.

Mirrors the reference's ``H3DataFrame`` (a polars DataFrame + h3index
column name; ``crates/ukis_h3cellstore/src/clickhouse/compacted_tables/
mod.rs:366``) and the Python ``DataFrameWrapper``
(``ukis_h3cellstorepy/frame.py:23-89``): conversion helpers to
pandas/pyarrow are provided for API parity, but unlike the reference —
where the dataframe is always driver-resident — the wrapped object here
is a *lazy distributed* DataFrame; conversions collect and should only
be used on query results that fit the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ukis_h3cellstore_spark.h3 import expressions as hx


class H3DataFrame:
    def __init__(self, df: DataFrame, h3index_column_name: str = "h3index"):
        if h3index_column_name not in df.columns:
            raise ValueError(
                f"h3index column {h3index_column_name!r} not in {df.columns}"
            )
        self.df = df
        self.h3index_column_name = h3index_column_name

    # -- column helpers -----------------------------------------------------

    @property
    def h3col(self) -> Column:
        return F.col(self.h3index_column_name)

    def with_resolution(self, out: str = "h3_resolution") -> DataFrame:
        return self.df.withColumn(out, hx.h3_get_resolution(self.h3col))

    def with_parent(self, parent_res: int, out: str = "h3index_parent") -> DataFrame:
        return self.df.withColumn(out, hx.h3_to_parent(self.h3col, parent_res))

    # -- exports (parity with DataFrameWrapper.to_pandas/to_arrow) ----------

    def to_pandas(self):
        return self.df.toPandas()

    def to_arrow(self):
        return self.df.toArrow()

    def to_polars(self):
        """Reference ``DataFrameWrapper.to_polars`` (frame.py:50-82);
        needs the optional ``polars`` package."""
        try:
            import polars
        except ImportError as e:  # pragma: no cover - env dependent
            raise ImportError(
                "to_polars requires the optional 'polars' package"
            ) from e
        return polars.from_arrow(self.df.toArrow())

    def count(self) -> int:
        return self.df.count()

    @property
    def columns(self) -> list[str]:
        return self.df.columns

    def __repr__(self) -> str:
        return f"H3DataFrame(h3index_column={self.h3index_column_name!r}, df={self.df})"
