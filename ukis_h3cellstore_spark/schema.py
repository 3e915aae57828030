"""Declarative tableset schema system, compiled to Spark table layout.

Re-expresses the reference's ``CompactedTableSchema`` (SURVEY.md §1.3;
reference files ``crates/ukis_h3cellstore/src/clickhouse/compacted_tables/
schema/{mod,column,datatype,agg,other,partitioning}.rs``) for a
Parquet/Delta-backed Spark store:

- the fixed ClickHouse datatype subset maps to Spark types
  (``datatype.rs:11-26`` → :data:`DATATYPES`);
- validation reproduces the reference matrix: name regex
  (``mod.rs:138-149``), mandatory H3Index column (``mod.rs:213-227``),
  ≥1 base resolution ≤ 15 (``mod.rs:121-127,391-402``),
  aggregation/datatype compatibility (``agg.rs:22-31``,
  ``column.rs:76-99``), single temporal partition column
  (``mod.rs:252-271``), SummingMergeTree column existence
  (``mod.rs:103-118``);
- instead of ClickHouse DDL the schema compiles to a
  :class:`TableLayout`: Spark ``StructType`` + partition columns
  (H3 base-cell / lower-resolution parent + temporal bucket,
  ``partitioning.rs:63-130``) + sort key (h3index first,
  ``mod.rs:169-199``) + the resolution metadata of the pyramid
  (``mod.rs:284-304``).

Schemas serialize to/from JSON (parity with serde round-trip,
``schema/mod.rs:539-547``).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import types as T

from ukis_h3cellstore_spark.h3 import cells as h3c

COL_NAME_H3INDEX = "h3index"  # reference: compacted_tables/mod.rs:35
H3_MAX_RESOLUTION = h3c.MAX_RESOLUTION

_TABLE_NAME_RE = re.compile(r"^[a-zA-Z][_a-zA-Z0-9]+$")


class SchemaError(ValueError):
    """Raised on schema validation failure."""


class TableEngine(str, Enum):
    """Dedup/merge semantics of a tableset (reference ``other.rs:11-22``).

    In the Spark store these choose the *read/compaction-time* dedup
    strategy rather than a server-side merge engine:

    - ``ReplacingMergeTree``: duplicates on the sort key are resolved
      keep-latest (``dropDuplicates`` over sort-key columns).
    - ``SummingMergeTree``: duplicate sort keys are summed over the
      configured columns.
    - ``AggregatingMergeTree``: duplicates resolved by the columns'
      declared aggregation methods.
    """

    REPLACING = "ReplacingMergeTree"
    SUMMING = "SummingMergeTree"
    AGGREGATING = "AggregatingMergeTree"


class CompressionMethod:
    """Per-column / default codec declaration (reference ``other.rs:27-75``).

    Parquet writing only distinguishes the file codec; the declaration
    is validated and preserved for parity + DDL emission on a JDBC
    backend. Default: ZSTD(6) (``other.rs:71-75``).
    """

    _LEVELS = {"LZ4HC": (1, 9), "ZSTD": (1, 22), "Delta": (1, 8)}
    _NO_LEVEL = {"DoubleDelta", "Gorilla", "T64"}

    def __init__(self, name: str = "ZSTD", level: int | None = 6):
        if name in self._LEVELS:
            lo, hi = self._LEVELS[name]
            if level is None or not lo <= level <= hi:
                raise SchemaError(f"{name} codec level {level} outside [{lo},{hi}]")
        elif name in self._NO_LEVEL:
            if level is not None:
                raise SchemaError(f"{name} codec takes no level")
        else:
            raise SchemaError(f"unknown compression method {name}")
        self.name = name
        self.level = level

    def to_json(self) -> dict:
        return {"name": self.name, "level": self.level}

    @classmethod
    def from_json(cls, d: dict) -> "CompressionMethod":
        return cls(d["name"], d.get("level"))

    def __eq__(self, other):
        return (
            isinstance(other, CompressionMethod)
            and (self.name, self.level) == (other.name, other.level)
        )

    def __repr__(self):
        return f"CompressionMethod({self.name}, {self.level})"


#: ClickHouse datatype subset (datatype.rs:11-26) → (Spark type, predicates).
#: Unsigned ints are widened into the next signed Spark type; UInt64 maps
#: to LongType (valid H3 indexes keep the top bit 0 — SURVEY §7.4.1).
DATATYPES: dict[str, T.DataType] = {
    "UInt8": T.ShortType(),
    "UInt16": T.IntegerType(),
    "UInt32": T.LongType(),
    "UInt64": T.LongType(),
    "Int8": T.ByteType(),
    "Int16": T.ShortType(),
    "Int32": T.IntegerType(),
    "Int64": T.LongType(),
    "Float32": T.FloatType(),
    "Float64": T.DoubleType(),
    "Date": T.DateType(),
    "DateTime": T.TimestampType(),
    "DateTime64": T.TimestampType(),
    "String": T.StringType(),
}

_TEMPORAL = {"Date", "DateTime", "DateTime64"}
_UNSIGNED = {"UInt8", "UInt16", "UInt32", "UInt64"}
_SIGNED = {"Int8", "Int16", "Int32", "Int64"}
_FLOAT = {"Float32", "Float64"}
_NUMBER = _UNSIGNED | _SIGNED | _FLOAT


def is_temporal(dt: str) -> bool:
    return dt in _TEMPORAL


def is_number(dt: str) -> bool:
    return dt in _NUMBER


class AggregationMethod(str, Enum):
    """Rollup aggregation methods (reference ``agg.rs:10-19``)."""

    RELATIVE_TO_CELL_AREA = "RelativeToCellArea"
    SUM = "Sum"
    MAX = "Max"
    MIN = "Min"
    AVERAGE = "Average"
    SET_NULL_ON_CONFLICT = "SetNullOnConflict"

    def is_applicable_to(self, datatype: str, nullable: bool) -> bool:
        """Compatibility matrix (``agg.rs:22-31``, ``column.rs:76-99``)."""
        if self in (
            AggregationMethod.RELATIVE_TO_CELL_AREA,
            AggregationMethod.SUM,
            AggregationMethod.AVERAGE,
        ):
            return is_number(datatype) and not is_temporal(datatype)
        if self in (AggregationMethod.MAX, AggregationMethod.MIN):
            return is_number(datatype) or is_temporal(datatype)
        if self is AggregationMethod.SET_NULL_ON_CONFLICT:
            return nullable
        return False

    @property
    def allows_compaction(self) -> bool:
        """``Sum`` disables compaction — compacted storage would
        double-count on re-aggregation (``agg.rs:33-43``)."""
        return self is not AggregationMethod.SUM


@dataclass
class SimpleColumn:
    """Column definition (reference ``column.rs:108-120``)."""

    datatype: str
    order_key_position: int | None = None
    codec: CompressionMethod | None = None
    nullable: bool = False

    def __post_init__(self):
        if self.datatype not in DATATYPES:
            raise SchemaError(f"unsupported datatype {self.datatype}")


@dataclass
class ColumnDefinition:
    """Simple | H3Index | WithAggregation (reference ``column.rs:13-29``)."""

    kind: str  # "simple" | "h3index" | "aggregated"
    column: SimpleColumn | None = None
    aggregation: AggregationMethod | None = None

    @classmethod
    def h3index(cls) -> "ColumnDefinition":
        return cls(kind="h3index")

    @classmethod
    def simple(cls, col: SimpleColumn) -> "ColumnDefinition":
        return cls(kind="simple", column=col)

    @classmethod
    def aggregated(cls, col: SimpleColumn, agg: AggregationMethod) -> "ColumnDefinition":
        return cls(kind="aggregated", column=col, aggregation=agg)

    @property
    def datatype(self) -> str:
        return "UInt64" if self.kind == "h3index" else self.column.datatype

    @property
    def nullable(self) -> bool:
        return False if self.kind == "h3index" else self.column.nullable

    @property
    def codec(self) -> "CompressionMethod | None":
        """Per-column compression override (reference
        ``def.compression_method()``, mod.rs:327)."""
        return None if self.kind == "h3index" else self.column.codec

    @property
    def order_key_position(self) -> int | None:
        # h3index is always the first sort-key column (forced by a -100
        # offset in the reference, mod.rs:169-199)
        if self.kind == "h3index":
            return -100
        return self.column.order_key_position


class TemporalResolution(str, Enum):
    SECOND = "second"
    DAY = "day"


@dataclass
class TemporalPartitioning:
    """Months(n) | Years(n) (reference ``partitioning.rs:25-37``)."""

    unit: str  # "months" | "years"
    num: int = 1

    def __post_init__(self):
        if self.unit not in ("months", "years"):
            raise SchemaError(f"unknown temporal partitioning unit {self.unit}")
        if self.num < 1:
            raise SchemaError("temporal partitioning span must be ≥ 1")

    @classmethod
    def parse(cls, s: "str | TemporalPartitioning") -> "TemporalPartitioning":
        """Parse '5 years' / '1 month' style strings (reference
        ``ukis_h3cellstorepy/src/clickhouse/schema.rs:236-282``)."""
        if isinstance(s, TemporalPartitioning):
            return s
        m = re.match(r"^\s*(\d+)\s*(month|year)s?\s*$", s, re.IGNORECASE)
        if not m:
            raise SchemaError(f"cannot parse temporal partitioning {s!r}")
        return cls(unit=m.group(2).lower() + "s", num=int(m.group(1)))


@dataclass
class H3Partitioning:
    """BaseCell | LowerResolution(diff) (reference ``partitioning.rs:98-113``)."""

    kind: str = "basecell"  # "basecell" | "lower_resolution"
    resolution_difference: int = 0

    def __post_init__(self):
        if self.kind not in ("basecell", "lower_resolution"):
            raise SchemaError(f"unknown h3 partitioning {self.kind}")


@dataclass(frozen=True)
class ResolutionMetadata:
    """One physical table of the pyramid (reference ``schema/mod.rs:284-304``)."""

    resolution: int
    is_compacted: bool

    def table_name(self, tableset_name: str) -> str:
        kind = "compacted" if self.is_compacted else "base"
        return f"{tableset_name}_{self.resolution:02d}_{kind}"

    def __lt__(self, other: "ResolutionMetadata") -> bool:
        return (self.resolution, self.is_compacted) < (
            other.resolution,
            other.is_compacted,
        )


# tableset names must start with a letter (reference name regex
# ^[a-zA-Z].[_a-zA-Z_0-9]+$, schema/mod.rs:138-149) — the parse side
# enforces the same so e.g. "_water_03_base" is not a tableset member
_TABLE_PARSE_RE = re.compile(
    r"^(?P<name>[A-Za-z][A-Za-z0-9_]*)_(?P<res>\d{2})_(?P<kind>base|compacted)$"
)


def parse_table_name(table_name: str) -> tuple[str, ResolutionMetadata] | None:
    """Inverse of ResolutionMetadata.table_name (reference
    ``tableset.rs:37-40``); None if not a tableset member."""
    m = _TABLE_PARSE_RE.match(table_name)
    if not m:
        return None
    return m.group("name"), ResolutionMetadata(
        resolution=int(m.group("res")), is_compacted=m.group("kind") == "compacted"
    )


@dataclass
class CompactedTableSchema:
    """Validated schema of one tableset (reference ``schema/mod.rs:34-47``)."""

    name: str
    table_engine: TableEngine = TableEngine.REPLACING
    summing_columns: list[str] = field(default_factory=list)
    #: ClickHouse ``ReplacingMergeTree(ver[, is_deleted])`` semantics —
    #: a beyond-reference extension (the reference's engine enum,
    #: other.rs:11-22, carries no version parameter): duplicates on the
    #: sort key keep the row with the maximal version instead of
    #: full-row dedup. ``deleted_column`` marks CDC tombstones: the
    #: winning row stays in the table (so a late lower-version update
    #: cannot resurrect the key) and coarser-level rollups exclude it.
    version_column: str | None = None
    deleted_column: str | None = None
    compression_method: CompressionMethod = field(
        default_factory=lambda: CompressionMethod("ZSTD", 6)
    )
    h3_base_resolutions: list[int] = field(default_factory=list)
    use_compaction: bool = True
    temporal_resolution: TemporalResolution = TemporalResolution.SECOND
    temporal_partitioning: TemporalPartitioning = field(
        default_factory=lambda: TemporalPartitioning("months", 1)
    )
    h3_partitioning: H3Partitioning = field(default_factory=H3Partitioning)
    columns: dict[str, ColumnDefinition] = field(default_factory=dict)
    partition_by_columns: list[str] = field(default_factory=list)

    # ---------------------------------------------------------------- derived

    @property
    def max_h3_resolution(self) -> int:
        return max(self.h3_base_resolutions)

    def h3index_column(self) -> str:
        for name, cd in self.columns.items():
            if cd.kind == "h3index":
                return name
        raise SchemaError("schema has no h3index column")

    def aggregated_columns(self) -> dict[str, AggregationMethod]:
        return {
            n: cd.aggregation
            for n, cd in self.columns.items()
            if cd.kind == "aggregated"
        }

    def passthrough_columns(self) -> list[str]:
        """Non-aggregated, non-h3index columns — become rollup GROUP BY
        keys (reference ``insert.rs:305-323``)."""
        return sorted(
            n for n, cd in self.columns.items() if cd.kind == "simple"
        )

    @property
    def compaction_enabled(self) -> bool:
        """Compaction requested AND allowed by every aggregation method
        (``agg.rs:33-43`` honored at ``insert.rs:93-108``)."""
        return self.use_compaction and all(
            agg.allows_compaction for agg in self.aggregated_columns().values()
        )

    def resolution_metadata(self) -> list[ResolutionMetadata]:
        """All physical tables of the pyramid (``schema/mod.rs:284-304``):
        a base table per base resolution; if compaction is on, a
        compacted table for every resolution 0..=max."""
        out = [ResolutionMetadata(r, False) for r in sorted(self.h3_base_resolutions)]
        if self.compaction_enabled:
            out.extend(
                ResolutionMetadata(r, True) for r in range(self.max_h3_resolution + 1)
            )
        return sorted(out)

    def sort_key(self) -> list[str]:
        """Sort-key columns: h3index forced first, then by
        order_key_position, ties by name (``schema/mod.rs:169-199``)."""
        keyed = [
            (cd.order_key_position, name)
            for name, cd in self.columns.items()
            if cd.order_key_position is not None
        ]
        return [name for _, name in sorted(keyed)]

    def temporal_partition_column(self) -> str | None:
        """The single temporal column used for time partitioning
        (``schema/mod.rs:252-271``) — ambiguity is a validation error."""
        candidates = [
            n
            for n, cd in self.columns.items()
            if is_temporal(cd.datatype) and n not in self.partition_by_columns
        ]
        explicit = [
            n
            for n in self.partition_by_columns
            if is_temporal(self.columns[n].datatype)
        ]
        if explicit:
            candidates = explicit
        if len(candidates) > 1:
            raise SchemaError(
                f"ambiguous temporal partition column: {sorted(candidates)}"
            )
        return candidates[0] if candidates else None

    def spark_schema(self) -> T.StructType:
        """Spark StructType of a tableset table (column order: h3index
        first, then sorted names — deterministic for hashing)."""
        h3col = self.h3index_column()
        names = [h3col] + sorted(n for n in self.columns if n != h3col)
        return T.StructType(
            [
                T.StructField(n, DATATYPES[self.columns[n].datatype], self.columns[n].nullable)
                for n in names
            ]
        )

    # ------------------------------------------------------------- validation

    def validate(self) -> None:
        if not _TABLE_NAME_RE.match(self.name):
            raise SchemaError(f"invalid tableset name {self.name!r}")
        if not self.h3_base_resolutions:
            raise SchemaError("at least one h3 base resolution is required")
        for r in self.h3_base_resolutions:
            if not 0 <= r <= H3_MAX_RESOLUTION:
                raise SchemaError(f"h3 resolution {r} outside 0..{H3_MAX_RESOLUTION}")
        if len(set(self.h3_base_resolutions)) != len(self.h3_base_resolutions):
            raise SchemaError("duplicate h3 base resolutions")
        h3cols = [n for n, cd in self.columns.items() if cd.kind == "h3index"]
        if len(h3cols) != 1:
            raise SchemaError(
                f"exactly one h3index column required, found {len(h3cols)}"
            )
        if h3cols[0] != COL_NAME_H3INDEX:
            raise SchemaError(
                f"h3index column must be named {COL_NAME_H3INDEX!r} inside tablesets"
            )
        if self.table_engine is TableEngine.SUMMING:
            for col in self.summing_columns:
                if col not in self.columns:
                    raise SchemaError(f"SummingMergeTree column {col!r} not in schema")
        if self.version_column is not None:
            if self.table_engine is not TableEngine.REPLACING:
                raise SchemaError(
                    "version_column requires the ReplacingMergeTree engine"
                )
            cd = self.columns.get(self.version_column)
            if cd is None:
                raise SchemaError(
                    f"version column {self.version_column!r} not in schema"
                )
            if cd.kind == "h3index" or cd.order_key_position is not None:
                raise SchemaError(
                    "version column must not be part of the sort key"
                )
        if self.deleted_column is not None:
            if self.version_column is None:
                # ClickHouse enforces the same: is_deleted only with ver
                raise SchemaError("deleted_column requires version_column")
            cd = self.columns.get(self.deleted_column)
            if cd is None:
                raise SchemaError(
                    f"deleted column {self.deleted_column!r} not in schema"
                )
            if cd.kind == "h3index" or cd.order_key_position is not None:
                raise SchemaError(
                    "deleted column must not be part of the sort key"
                )
        for name, cd in self.columns.items():
            if cd.kind == "aggregated" and not cd.aggregation.is_applicable_to(
                cd.datatype, cd.nullable
            ):
                raise SchemaError(
                    f"aggregation {cd.aggregation.value} not applicable to "
                    f"column {name!r} ({cd.datatype}, nullable={cd.nullable})"
                )
        for col in self.partition_by_columns:
            if col not in self.columns:
                raise SchemaError(f"partition column {col!r} not in schema")
        if self.h3_partitioning.kind == "lower_resolution":
            if self.h3_partitioning.resolution_difference < 0:
                raise SchemaError("resolution_difference must be ≥ 0")
        self.temporal_partition_column()  # raises on ambiguity

    # ------------------------------------------------------------------- json

    def to_json_dict(self) -> dict:
        def col_json(cd: ColumnDefinition) -> dict:
            if cd.kind == "h3index":
                return {"kind": "h3index"}
            d = {
                "kind": cd.kind,
                "datatype": cd.column.datatype,
                "order_key_position": cd.column.order_key_position,
                "codec": cd.column.codec.to_json() if cd.column.codec else None,
                "nullable": cd.column.nullable,
            }
            if cd.kind == "aggregated":
                d["aggregation"] = cd.aggregation.value
            return d

        return {
            "name": self.name,
            "table_engine": self.table_engine.value,
            "summing_columns": self.summing_columns,
            "version_column": self.version_column,
            "deleted_column": self.deleted_column,
            "compression_method": self.compression_method.to_json(),
            "h3_base_resolutions": sorted(self.h3_base_resolutions),
            "use_compaction": self.use_compaction,
            "temporal_resolution": self.temporal_resolution.value,
            "temporal_partitioning": {
                "unit": self.temporal_partitioning.unit,
                "num": self.temporal_partitioning.num,
            },
            "h3_partitioning": {
                "kind": self.h3_partitioning.kind,
                "resolution_difference": self.h3_partitioning.resolution_difference,
            },
            "columns": {n: col_json(cd) for n, cd in sorted(self.columns.items())},
            "partition_by_columns": self.partition_by_columns,
        }

    def to_json_string(self) -> str:
        return json.dumps(self.to_json_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_json_dict(cls, d: dict) -> "CompactedTableSchema":
        def col_from(j: dict) -> ColumnDefinition:
            if j["kind"] == "h3index":
                return ColumnDefinition.h3index()
            sc = SimpleColumn(
                datatype=j["datatype"],
                order_key_position=j.get("order_key_position"),
                codec=CompressionMethod.from_json(j["codec"]) if j.get("codec") else None,
                nullable=j.get("nullable", False),
            )
            if j["kind"] == "aggregated":
                return ColumnDefinition.aggregated(sc, AggregationMethod(j["aggregation"]))
            return ColumnDefinition.simple(sc)

        schema = cls(
            name=d["name"],
            table_engine=TableEngine(d["table_engine"]),
            summing_columns=d.get("summing_columns", []),
            version_column=d.get("version_column"),
            deleted_column=d.get("deleted_column"),
            compression_method=CompressionMethod.from_json(d["compression_method"]),
            h3_base_resolutions=list(d["h3_base_resolutions"]),
            use_compaction=d["use_compaction"],
            temporal_resolution=TemporalResolution(d["temporal_resolution"]),
            temporal_partitioning=TemporalPartitioning(
                d["temporal_partitioning"]["unit"], d["temporal_partitioning"]["num"]
            ),
            h3_partitioning=H3Partitioning(
                d["h3_partitioning"]["kind"],
                d["h3_partitioning"].get("resolution_difference", 0),
            ),
            columns={n: col_from(j) for n, j in d["columns"].items()},
            partition_by_columns=d.get("partition_by_columns", []),
        )
        schema.validate()
        return schema

    @classmethod
    def from_json_string(cls, s: str) -> "CompactedTableSchema":
        return cls.from_json_dict(json.loads(s))


class CompactedTableSchemaBuilder:
    """Fluent builder mirroring the reference Python API
    (``ukis_h3cellstorepy/src/clickhouse/schema.rs:101-345``)."""

    def __init__(self, name: str):
        self._schema = CompactedTableSchema(name=name)

    def table_engine(
        self,
        engine: str,
        summing_columns: list[str] | None = None,
        version_column: str | None = None,
        deleted_column: str | None = None,
    ):
        """``version_column``/``deleted_column`` select ClickHouse's
        ``ReplacingMergeTree(ver[, is_deleted])`` keep-max-version
        merge — the CDC-apply engine (beyond-reference extension)."""
        self._schema.table_engine = TableEngine(engine)
        self._schema.summing_columns = summing_columns or []
        self._schema.version_column = version_column
        self._schema.deleted_column = deleted_column
        return self

    def compression_method(self, name: str, level: int | None = None):
        self._schema.compression_method = CompressionMethod(name, level)
        return self

    def use_compacted_resolutions(self, use: bool):
        self._schema.use_compaction = use
        return self

    def h3_base_resolutions(self, resolutions: list[int]):
        self._schema.h3_base_resolutions = list(resolutions)
        return self

    def add_h3index_column(self, name: str = COL_NAME_H3INDEX):
        self._schema.columns[name] = ColumnDefinition.h3index()
        return self

    def add_column(
        self,
        name: str,
        datatype: str,
        order_key_position: int | None = None,
        nullable: bool = False,
        codec: CompressionMethod | None = None,
    ):
        self._schema.columns[name] = ColumnDefinition.simple(
            SimpleColumn(datatype, order_key_position, codec, nullable)
        )
        return self

    def add_aggregated_column(
        self,
        name: str,
        datatype: str,
        aggregation: "str | AggregationMethod",
        nullable: bool = False,
        codec: CompressionMethod | None = None,
    ):
        agg = (
            aggregation
            if isinstance(aggregation, AggregationMethod)
            else AggregationMethod(aggregation)
        )
        self._schema.columns[name] = ColumnDefinition.aggregated(
            SimpleColumn(datatype, None, codec, nullable), agg
        )
        return self

    def temporal_resolution(self, res: str):
        self._schema.temporal_resolution = TemporalResolution(res)
        return self

    def temporal_partitioning(self, spec: str):
        self._schema.temporal_partitioning = TemporalPartitioning.parse(spec)
        return self

    def h3_partitioning(self, kind: str, resolution_difference: int = 0):
        self._schema.h3_partitioning = H3Partitioning(kind, resolution_difference)
        return self

    def partition_by(self, columns: list[str]):
        self._schema.partition_by_columns = list(columns)
        return self

    def build(self) -> CompactedTableSchema:
        self._schema.validate()
        return self._schema
