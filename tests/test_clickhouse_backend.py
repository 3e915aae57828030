"""ClickHouse DDL compiler tests — parity with the reference's DDL
shape (schema/mod.rs:306-350, reference unit tests schema/mod.rs:493-572)
as pure string assertions, plus the JDBC gating behavior."""

from __future__ import annotations

import pytest

from ukis_h3cellstore_spark import CompactedTableSchemaBuilder
from ukis_h3cellstore_spark.backends import ClickHouseJdbcBackend, clickhouse_ddl
from ukis_h3cellstore_spark.backends.clickhouse import (
    ClickHouseUnavailable,
    drop_tableset_ddl,
)


def okavango():
    return (
        CompactedTableSchemaBuilder("okavango_delta")
        .h3_base_resolutions([4, 5, 6])
        .add_h3index_column()
        .add_column("is_valid", "UInt8")
        .add_aggregated_column("elephant_density", "Float32", "RelativeToCellArea")
        .build()
    )


def test_ddl_one_statement_per_pyramid_table():
    schema = okavango()
    ddl = clickhouse_ddl(schema)
    # 3 base + 7 compacted (res 0..6)
    assert len(ddl) == len(schema.resolution_metadata()) == 10
    names = [d.splitlines()[0] for d in ddl]
    assert any("okavango_delta_04_base" in n for n in names)
    assert any("okavango_delta_00_compacted" in n for n in names)


def test_ddl_statement_shape():
    ddl = clickhouse_ddl(okavango(), database="db1")[0]
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS db1.okavango_delta_")
    assert "h3index UInt64 CODEC(ZSTD(6))" in ddl
    assert "is_valid UInt8 CODEC(ZSTD(6))" in ddl
    assert "ENGINE ReplacingMergeTree()" in ddl
    assert "PARTITION BY (h3GetBaseCell(h3index))" in ddl
    assert "ORDER BY (h3index)" in ddl


def test_ddl_engines_and_nullable():
    schema = (
        CompactedTableSchemaBuilder("sums")
        .table_engine("SummingMergeTree", ["v"])
        .h3_base_resolutions([3, 4])
        .add_h3index_column()
        .add_column("v", "UInt32")
        .add_column("tag", "String", nullable=True)
        .build()
    )
    ddl = clickhouse_ddl(schema)[0]
    assert "ENGINE SummingMergeTree((v))" in ddl
    assert "tag Nullable(String)" in ddl


def test_ddl_temporal_and_lowres_partitioning():
    schema = (
        CompactedTableSchemaBuilder("evts")
        .h3_base_resolutions([5, 6])
        .h3_partitioning("lower_resolution", 3)
        .temporal_partitioning("2 years")
        .add_h3index_column()
        .add_column("observed_on", "DateTime")
        .add_column("v", "Float64")
        .build()
    )
    ddl = clickhouse_ddl(schema)[0]
    assert (
        "h3ToParent(h3index, CAST(max2(h3GetResolution(h3index) - 3, 0) AS UInt8))"
        in ddl
    )
    assert "toString(intDiv(toYear(observed_on), 2) * 2)" in ddl


def test_drop_ddl():
    drops = drop_tableset_ddl(okavango())
    assert len(drops) == 10
    assert all(d.startswith("DROP TABLE IF EXISTS okavango_delta_") for d in drops)


def test_jdbc_backend_gated(spark):
    be = ClickHouseJdbcBackend(spark, "jdbc:clickhouse://localhost:8123")
    assert not be.driver_available()  # no driver jar in this container
    with pytest.raises(ClickHouseUnavailable):
        be.read_table("t")
    with pytest.raises(ClickHouseUnavailable):
        be.create_tableset(okavango())
