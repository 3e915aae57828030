"""ClickHouse backend: DDL compiler + JDBC reader/writer (SURVEY §7.2.8).

The reference compiles a ``CompactedTableSchema`` into one MergeTree
``CREATE TABLE`` per pyramid table (``schema/mod.rs:306-350``):

.. code-block:: sql

    CREATE TABLE IF NOT EXISTS {name}_{res:02}_{base|compacted} (
        cols... CODEC(...)
    )
    ENGINE {ReplacingMergeTree|SummingMergeTree((...))|AggregatingMergeTree}
    PARTITION BY (h3-partition-expr [, temporal-expr | user cols])
    ORDER BY (sort-key columns)

:func:`clickhouse_ddl` reproduces that statement shape (pure string
generation, unit-testable with no server). The partition expressions
mirror the parquet store's materialized ``h3part``/``tpart`` columns so
both backends prune on the same keys:

- h3: ``h3GetBaseCell(h3index)`` or
  ``h3ToParent(h3index, max2(h3GetResolution(h3index)-diff, 0))``
  (``partitioning.rs:115-130``)
- temporal: year/month bucket arithmetic (``partitioning.rs:63-94``)

:class:`ClickHouseJdbcBackend` moves dataframes over Spark's JDBC data
source. It is **gated**: constructing it only records the connection
info; any read/write first probes for the JDBC driver class and raises
a clear error when the driver jar is absent (this container has none —
add ``com.clickhouse:clickhouse-jdbc`` to ``spark.jars.packages`` in a
real deployment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ukis_h3cellstore_spark.schema import (
    CompactedTableSchema,
    ResolutionMetadata,
    TableEngine,
)

#: reference transport default (lib.rs:138-158 → JDBC batchsize)
DEFAULT_BATCH_SIZE = 1_000_000


class ClickHouseUnavailable(RuntimeError):
    pass


# ----------------------------------------------------------------- DDL


#: ClickHouse types the reference treats as temporal
#: (``datatype.rs``: Date / DateTime / DateTime64)
_TEMPORAL_TYPES = {"Date", "DateTime", "DateTime64"}


def _codec_sql(cm) -> str:
    """``codec_string`` parity (``schema/mod.rs:380-389``): name with
    the level/bytes argument when one is set, bare name otherwise
    (DoubleDelta / Gorilla / T64)."""
    return f"{cm.name}({cm.level})" if cm.level is not None else cm.name


def _column_sql(schema: CompactedTableSchema) -> str:
    """Column clauses — ALL columns sorted by name (the reference's
    "order to make the SQL comparable", ``mod.rs:322-340``), each
    `` {name} {dtype} CODEC({codec})`` with a per-column codec
    override falling back to the schema default."""
    default_codec = _codec_sql(schema.compression_method)
    out = []
    for n in sorted(schema.columns):
        cd = schema.columns[n]
        dt = "UInt64" if cd.kind == "h3index" else cd.datatype
        if cd.nullable:
            dt = f"Nullable({dt})"
        codec = _codec_sql(cd.codec) if cd.codec is not None else default_codec
        out.append(f" {n} {dt} CODEC({codec})")
    return ",\n".join(out)


def _engine_sql(schema: CompactedTableSchema) -> str:
    """``mod.rs:314-320``: bare engine names; SummingMergeTree carries
    its column list in single parens."""
    if schema.table_engine is TableEngine.SUMMING:
        return f"SummingMergeTree({', '.join(schema.summing_columns)})"
    if schema.table_engine is TableEngine.AGGREGATING:
        return "AggregatingMergeTree"
    if schema.version_column:
        # ClickHouse ReplacingMergeTree(ver[, is_deleted]) — the
        # keep-max-version CDC merge (beyond-reference extension; the
        # reference's mod.rs:314-320 emits only the bare name)
        if schema.deleted_column:
            return (
                f"ReplacingMergeTree({schema.version_column}, "
                f"{schema.deleted_column})"
            )
        return f"ReplacingMergeTree({schema.version_column})"
    return "ReplacingMergeTree"


def _h3_partition_expr(schema: CompactedTableSchema) -> str:
    """``partitioning.rs:116-129`` dialect."""
    h3name = schema.h3index_column()
    if schema.h3_partitioning.kind == "basecell":
        return f"h3GetBaseCell({h3name})"
    diff = schema.h3_partitioning.resolution_difference
    return (
        f"h3ToParent({h3name}, "
        f"cast(max2(h3GetResolution({h3name}) - {diff}, 0) as UInt8))"
    )


def _temporal_expr(schema: CompactedTableSchema, col: str) -> str:
    """``partitioning.rs:64-95`` dialect (year bucket via
    floor(year/n)*n, month bucket via the reference's
    year*100 + fractional-month ceil formula)."""
    tp = schema.temporal_partitioning
    if tp.unit == "years":
        if tp.num == 1:
            return f"toString(toYear({col}))"
        return f"toString(floor(toYear({col})/{tp.num})*{tp.num})"
    return (
        f"toString(ceil(((toYear({col}) * 100) + "
        f"(100 * (toMonth({col}) - 1) / 12)) / {tp.num}))"
    )


def _partition_by_expressions(schema: CompactedTableSchema) -> list[str]:
    """``partition_by_expressions`` parity (``mod.rs:244-290``): the H3
    expression always first; with no explicit partition columns a
    single temporal column (if any) is auto-used; explicit columns map
    through the temporal expression when temporal, else by name."""

    def col_expr(name: str) -> str:
        cd = schema.columns[name]
        if cd.kind != "h3index" and cd.datatype in _TEMPORAL_TYPES:
            return _temporal_expr(schema, name)
        return name

    parts = [_h3_partition_expr(schema)]
    if not schema.partition_by_columns:
        temporal_exprs: list[str] = []
        for name in sorted(schema.columns):
            cd = schema.columns[name]
            if cd.kind != "h3index" and cd.datatype in _TEMPORAL_TYPES:
                expr = _temporal_expr(schema, name)
                if expr not in temporal_exprs and expr not in parts:
                    temporal_exprs.append(expr)
        if len(temporal_exprs) > 1:
            raise ValueError(
                "found multiple temporal columns - explicit specification "
                "of partitioning columns required"
            )
        parts.extend(temporal_exprs)
    else:
        for c in schema.partition_by_columns:
            expr = col_expr(c)
            # the reference skips duplicate expressions
            # (mod.rs:273-279 "if !partition_by.contains(...)")
            if expr not in parts:
                parts.append(expr)
    return parts


def create_table_ddl(
    schema: CompactedTableSchema,
    meta: ResolutionMetadata,
    database: str | None = None,
) -> str:
    """One pyramid table's DDL — byte-parity with the reference's
    ``build_create_statement`` format string (``schema/mod.rs:342-349``):
    single statement, columns joined with ``,\\n``, trailing ``;``."""
    table = meta.table_name(schema.name)
    if database:
        table = f"{database}.{table}"
    partition_by = ", ".join(_partition_by_expressions(schema))
    order_by = ", ".join(schema.sort_key())
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ( {_column_sql(schema)} ) "
        f"ENGINE {_engine_sql(schema)} "
        f"PARTITION BY ({partition_by}) ORDER BY ({order_by});"
    )


def clickhouse_ddl(
    schema: CompactedTableSchema, database: str | None = None
) -> list[str]:
    """All CREATE TABLE statements of the tableset pyramid, coarse to
    fine, base before compacted (reference create_tableset,
    mod.rs:246-263)."""
    schema.validate()
    return [
        create_table_ddl(schema, meta, database)
        for meta in schema.resolution_metadata()
    ]


def drop_tableset_ddl(
    schema: CompactedTableSchema, database: str | None = None
) -> list[str]:
    """DROP TABLE statements (reference drop_tableset, mod.rs:215-244)."""
    out = []
    for meta in schema.resolution_metadata():
        table = meta.table_name(schema.name)
        if database:
            table = f"{database}.{table}"
        out.append(f"DROP TABLE IF EXISTS {table}")
    return out


# ---------------------------------------------------------------- JDBC IO


class ClickHouseJdbcBackend:
    """Reader/writer for a ClickHouse deployment over Spark JDBC.

    Replaces the reference's Arrow-over-gRPC transport (S1-S4) with
    Spark's JDBC data source; the generated-DDL statements above are
    executed out-of-band (any ClickHouse client) or via
    ``run_ddl`` where a driver is available.
    """

    DRIVER = "com.clickhouse.jdbc.ClickHouseDriver"

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        database: str = "default",
        user: str | None = None,
        password: str | None = None,
        batch_size: int = DEFAULT_BATCH_SIZE,
    ):
        self.spark = spark
        self.url = url
        self.database = database
        self.user = user
        self.password = password
        self.batch_size = batch_size

    # -- gating ------------------------------------------------------------

    def driver_available(self) -> bool:
        try:
            jvm = self.spark.sparkContext._jvm
            jvm.java.lang.Class.forName(self.DRIVER)
            return True
        except Exception:
            return False

    def _require_driver(self) -> None:
        if not self.driver_available():
            raise ClickHouseUnavailable(
                f"JDBC driver {self.DRIVER} not on the Spark classpath; "
                "add com.clickhouse:clickhouse-jdbc:<version> to "
                "spark.jars.packages"
            )

    def _options(self, table: str) -> dict[str, str]:
        opts = {
            "url": self.url,
            "dbtable": f"{self.database}.{table}",
            "driver": self.DRIVER,
            "batchsize": str(self.batch_size),
            "isolationLevel": "NONE",
        }
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        return opts

    # -- IO ----------------------------------------------------------------

    def read_table(self, table: str, partition_column: str | None = None,
                   num_partitions: int = 32) -> DataFrame:
        """Scan a table; with ``partition_column`` the scan is split
        into ``num_partitions`` parallel JDBC range reads (the
        distributed-read path — a single unpartitioned JDBC read is a
        1-task bottleneck at scale)."""
        self._require_driver()
        reader = self.spark.read.format("jdbc")
        for k, v in self._options(table).items():
            reader = reader.option(k, v)
        if partition_column is not None:
            bounds = self.spark.read.format("jdbc").options(
                **{**self._options(table),
                   "dbtable": f"(SELECT min({partition_column}) lo, "
                              f"max({partition_column}) hi FROM "
                              f"{self.database}.{table}) b"}
            ).load().collect()[0]
            reader = (
                reader.option("partitionColumn", partition_column)
                .option("lowerBound", str(bounds.lo))
                .option("upperBound", str(bounds.hi))
                .option("numPartitions", str(num_partitions))
            )
        return reader.load()

    def write_table(self, table: str, df: DataFrame, mode: str = "append") -> None:
        self._require_driver()
        writer = df.write.format("jdbc").mode(mode)
        for k, v in self._options(table).items():
            writer = writer.option(k, v)
        writer.save()

    def run_ddl(self, statements: list[str]) -> None:
        """Execute DDL through the JDBC connection (driver required)."""
        self._require_driver()
        jvm = self.spark.sparkContext._jvm
        props = jvm.java.util.Properties()
        if self.user:
            props.setProperty("user", self.user)
        if self.password:
            props.setProperty("password", self.password)
        conn = jvm.java.sql.DriverManager.getConnection(self.url, props)
        try:
            stmt = conn.createStatement()
            for sql in statements:
                stmt.execute(sql)
        finally:
            conn.close()

    def create_tableset(self, schema: CompactedTableSchema) -> None:
        self.run_ddl(clickhouse_ddl(schema, self.database))

    def drop_tableset(self, schema: CompactedTableSchema) -> None:
        self.run_ddl(drop_tableset_ddl(schema, self.database))

    # -- templated query passthrough (P3) ----------------------------------

    def tableset_template_sql(
        self,
        schema: CompactedTableSchema,
        template: str,
        cells: list[int],
        h3_resolution: int,
    ) -> list[tuple[str, str]]:
        """The EXACT per-resolution-table SQL a templated tableset
        query ships to ClickHouse — the statement-level parity slice
        of the reference's P3 path (validation ``select.rs:30-44``,
        substitution ``select.rs:127-129``, per-table cell-set prep
        ``select.rs:139-162``): contributing tables are the base
        table at the query resolution plus every compacted ancestor
        (``tableset.rs:153-170``), ``<[table]>`` becomes the
        db-qualified table name, and ``<[h3indexes]>`` the
        comma-joined literal cell list NORMALIZED to each table's own
        resolution (a compacted res-3 table is probed with the query
        cells' res-3 ancestors, sorted + deduplicated —
        ``select.rs:156-157`` parity via ``h3.cells.
        change_resolution``).

        Returns ``[(table_name, substituted_sql), ...]``
        coarse-to-fine. Pure — no driver or connection required."""
        from ukis_h3cellstore_spark.h3 import cells as h3c
        from ukis_h3cellstore_spark.query import (
            PLACEHOLDER_H3INDEXES,
            PLACEHOLDER_TABLE,
            TableSetQuery,
        )
        from ukis_h3cellstore_spark.tableset import TableSet

        TableSetQuery.from_template(template)  # <[table]> presence parity
        if not cells:
            raise ValueError("empty cell list")  # select.rs:87-89 parity
        metas = schema.resolution_metadata()
        ts = TableSet(
            name=schema.name,
            base_resolutions=[m.resolution for m in metas if not m.is_compacted],
            compacted_resolutions=[m.resolution for m in metas if m.is_compacted],
        )
        out: list[tuple[str, str]] = []
        for meta in ts.tables_to_satisfy_query_at_resolution(h3_resolution):
            t = meta.table_name(schema.name)
            sql = template.replace(PLACEHOLDER_TABLE, f"{self.database}.{t}")
            if PLACEHOLDER_H3INDEXES in template:
                table_cells = h3c.change_resolution(cells, meta.resolution)
                sql = sql.replace(
                    PLACEHOLDER_H3INDEXES,
                    ", ".join(str(int(c)) for c in table_cells),
                )
            out.append((t, sql))
        return out

    def read_tableset_template(
        self,
        schema: CompactedTableSchema,
        template: str,
        cells: list[int],
        h3_resolution: int,
    ) -> DataFrame:
        """Run a P3 templated query against a ClickHouse tableset: one
        JDBC subquery scan per contributing resolution table (the
        substituted SQL executes CH-SIDE — predicates and projections
        never ship raw rows), results unioned by name. The template
        fully owns projection and filtering, exactly like the
        local-store templated path (``query.py``)."""
        self._require_driver()
        parts = []
        for i, (_t, sql) in enumerate(
            self.tableset_template_sql(schema, template, cells, h3_resolution)
        ):
            reader = self.spark.read.format("jdbc")
            opts = self._options("ignored")
            opts["dbtable"] = f"({sql}) AS __tq{i}"
            for k, v in opts.items():
                reader = reader.option(k, v)
            parts.append(reader.load())
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df
