"""H3DataFrame API-parity tests: the h3ron-polars-style dataframe ops
the reference exposes on its H3DataFrame (compact / uncompact-subset /
partition-by-resolution), plus wrapper basics."""

from __future__ import annotations

import pytest

from ukis_h3cellstore_spark import H3DataFrame
from ukis_h3cellstore_spark.h3 import cells as h3c


@pytest.fixture()
def h3df(spark):
    region = h3c.build_cell(60, [1, 2, 3, 4])  # res 4
    cells = h3c.cell_to_children(region, 6)    # 49 res-6 cells
    df = spark.createDataFrame([(c, 1) for c in cells], "h3index long, v int")
    return region, cells, H3DataFrame(df)


def test_wrapper_requires_h3_column(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        H3DataFrame(df)


def test_compact_uniform_disk_to_single_parent(h3df):
    region, cells, wrapped = h3df
    compacted = wrapped.compact()
    got = compacted.df.toPandas()
    # uniform full coverage compacts all the way to the res-4 region
    assert set(got["h3index"]) == {region}
    assert compacted.h3index_column_name == "h3index"


def test_uncompact_subset_restores_cells(h3df):
    region, cells, wrapped = h3df
    compacted = wrapped.compact()
    subset = cells[:10]
    back = compacted.uncompact(6, cells=subset)
    assert sorted(back.df.toPandas()["h3index"]) == sorted(subset)
    # unrestricted expansion restores the full disk
    full = compacted.uncompact(6)
    assert set(full.df.toPandas()["h3index"]) == set(cells)


def test_partition_by_resolution_split(h3df):
    region, cells, wrapped = h3df
    mixed = wrapped.compact().df.unionByName(
        wrapped.df.limit(0)  # keep schema; no extra rows
    )
    parts = H3DataFrame(mixed).partition_by_resolution()
    assert list(parts) == [4]
    both = H3DataFrame(
        wrapped.df.limit(3).unionByName(parts[4])
    ).partition_by_resolution()
    assert sorted(both) == [4, 6]
    assert both[6].count() == 3 and both[4].count() == 1
