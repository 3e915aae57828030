"""Schema-system unit tests — mirrors the reference tier-1 suite
(SURVEY §5.1: schema validation, name regex, JSON round-trip,
resolution-metadata ordering, datatype/aggregation matrix)."""

from __future__ import annotations

import pytest

from ukis_h3cellstore_spark.schema import (
    AggregationMethod,
    CompactedTableSchema,
    CompactedTableSchemaBuilder,
    CompressionMethod,
    ResolutionMetadata,
    SchemaError,
    TemporalPartitioning,
    parse_table_name,
)


def okavango_schema() -> CompactedTableSchema:
    """The reference's primary fixture schema (FIXTURES F1)."""
    return (
        CompactedTableSchemaBuilder("okavango_delta")
        .h3_base_resolutions(list(range(8)))
        .temporal_resolution("second")
        .temporal_partitioning("1 month")
        .add_h3index_column()
        .add_column("is_valid", "UInt8", codec=CompressionMethod("Gorilla", None))
        .add_column("observed_on", "DateTime")
        .add_aggregated_column("elephant_density", "Float32", "RelativeToCellArea")
        .add_aggregated_column("some_category", "UInt8", "SetNullOnConflict", nullable=True)
        .build()
    )


def test_okavango_builds_and_roundtrips():
    s = okavango_schema()
    s2 = CompactedTableSchema.from_json_string(s.to_json_string())
    assert s.to_json_dict() == s2.to_json_dict()
    assert s.max_h3_resolution == 7
    assert s.h3index_column() == "h3index"
    assert s.compaction_enabled


def test_name_regex():
    with pytest.raises(SchemaError):
        CompactedTableSchemaBuilder("0bad").h3_base_resolutions([3]).add_h3index_column().build()
    with pytest.raises(SchemaError):
        CompactedTableSchemaBuilder("bad name").h3_base_resolutions([3]).add_h3index_column().build()


def test_h3index_column_required():
    with pytest.raises(SchemaError, match="h3index"):
        CompactedTableSchemaBuilder("tname").h3_base_resolutions([3]).add_column(
            "x", "UInt8"
        ).build()


def test_base_resolution_required_and_range():
    with pytest.raises(SchemaError):
        CompactedTableSchemaBuilder("tname").add_h3index_column().build()
    with pytest.raises(SchemaError):
        CompactedTableSchemaBuilder("tname").h3_base_resolutions([16]).add_h3index_column().build()


def test_agg_compat_matrix():
    # Sum on temporal → invalid
    with pytest.raises(SchemaError):
        (
            CompactedTableSchemaBuilder("tname")
            .h3_base_resolutions([3])
            .add_h3index_column()
            .add_aggregated_column("t", "DateTime", "Sum")
            .build()
        )
    # SetNullOnConflict requires nullable
    with pytest.raises(SchemaError):
        (
            CompactedTableSchemaBuilder("tname")
            .h3_base_resolutions([3])
            .add_h3index_column()
            .add_aggregated_column("c", "UInt8", "SetNullOnConflict", nullable=False)
            .build()
        )
    # Min/Max on temporal → fine
    (
        CompactedTableSchemaBuilder("tname")
        .h3_base_resolutions([3])
        .add_h3index_column()
        .add_aggregated_column("t", "DateTime", "Max")
        .build()
    )


def test_sum_disables_compaction():
    s = (
        CompactedTableSchemaBuilder("okavango_delta")
        .h3_base_resolutions(list(range(6)))
        .add_h3index_column()
        .add_aggregated_column("elephant_count", "UInt32", "Sum")
        .add_column("observed_on", "DateTime64", order_key_position=0)
        .build()
    )
    assert s.use_compaction and not s.compaction_enabled
    metas = s.resolution_metadata()
    assert all(not m.is_compacted for m in metas)
    assert [m.resolution for m in metas] == list(range(6))


def test_resolution_metadata_pyramid_and_ordering():
    s = okavango_schema()
    metas = s.resolution_metadata()
    # 8 base + 8 compacted (res 0..7)
    assert len(metas) == 16
    assert metas == sorted(metas)
    names = [m.table_name(s.name) for m in metas]
    assert "okavango_delta_07_base" in names
    assert "okavango_delta_00_compacted" in names


def test_table_name_parse_roundtrip():
    meta = ResolutionMetadata(11, True)
    name = meta.table_name("water_cover")
    parsed = parse_table_name(name)
    assert parsed == ("water_cover", meta)
    assert parse_table_name("system.columns") is None
    assert parse_table_name("not_a_tableset") is None


def test_sort_key_h3index_first():
    s = (
        CompactedTableSchemaBuilder("tname")
        .h3_base_resolutions([3])
        .add_h3index_column()
        .add_column("b", "UInt8", order_key_position=1)
        .add_column("a", "UInt8", order_key_position=0)
        .build()
    )
    assert s.sort_key() == ["h3index", "a", "b"]


def test_temporal_partitioning_parse():
    assert TemporalPartitioning.parse("5 years") == TemporalPartitioning("years", 5)
    assert TemporalPartitioning.parse("1 month") == TemporalPartitioning("months", 1)
    with pytest.raises(SchemaError):
        TemporalPartitioning.parse("fortnight")


def test_ambiguous_temporal_partition_column():
    with pytest.raises(SchemaError, match="ambiguous"):
        (
            CompactedTableSchemaBuilder("tname")
            .h3_base_resolutions([3])
            .add_h3index_column()
            .add_column("t1", "DateTime")
            .add_column("t2", "Date")
            .build()
        )


def test_codec_levels():
    with pytest.raises(SchemaError):
        CompressionMethod("ZSTD", 99)
    with pytest.raises(SchemaError):
        CompressionMethod("Gorilla", 3)
    assert CompressionMethod().name == "ZSTD"


def test_summing_column_must_exist():
    with pytest.raises(SchemaError):
        (
            CompactedTableSchemaBuilder("tname")
            .table_engine("SummingMergeTree", ["missing"])
            .h3_base_resolutions([3])
            .add_h3index_column()
            .build()
        )


def test_spark_schema_types():
    s = okavango_schema()
    st = s.spark_schema()
    assert st.names[0] == "h3index"
    assert st["h3index"].dataType.simpleString() == "bigint"
    assert st["elephant_density"].dataType.simpleString() == "float"
    assert st["some_category"].nullable


def test_tableset_discovery_from_realistic_table_list():
    """Mirror of the reference's 70-name discovery test
    (tableset.rs:246-445): a mixed listing of pyramid tables, system
    tables, temp suffixes and unrelated names groups into exactly the
    valid tablesets."""
    from ukis_h3cellstore_spark.tableset import group_tables_into_tablesets

    names = (
        # a complete pyramid
        [f"water_{r:02d}_base" for r in range(3, 7)]
        + [f"water_{r:02d}_compacted" for r in range(0, 7)]
        # a second set, base-only
        + [f"elephants_{r:02d}_base" for r in (4, 5)]
        # orphan compacted tables (no base) must NOT become a tableset
        + ["orphan_03_compacted", "orphan_04_compacted"]
        # noise: system tables, malformed names, similar prefixes
        + [
            "system.columns",
            "system.parts",
            "columns",
            "water_07",
            "water_base",
            "water_xx_base",
            "water_123_base",
            "_water_03_base",
            "tmp_water_03_base_tmp123",
        ]
    )
    ts = group_tables_into_tablesets(names)
    assert sorted(ts) == ["elephants", "water"]
    assert ts["water"].base_resolutions == [3, 4, 5, 6]
    assert ts["water"].compacted_resolutions == list(range(7))
    assert ts["elephants"].base_resolutions == [4, 5]
    assert ts["elephants"].compacted_resolutions == []
