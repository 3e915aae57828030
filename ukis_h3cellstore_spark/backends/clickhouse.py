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


def _codec_sql(schema: CompactedTableSchema) -> str:
    cm = schema.compression_method
    return f"{cm.name}({cm.level})" if cm.level is not None else cm.name


def _column_sql(schema: CompactedTableSchema) -> list[str]:
    """Column clauses: h3index first, the rest sorted by name (the
    deterministic order used across the engine)."""
    h3name = schema.h3index_column()
    codec = _codec_sql(schema)
    names = [h3name] + sorted(c for c in schema.columns if c != h3name)
    out = []
    for n in names:
        cd = schema.columns[n]
        dt = "UInt64" if cd.kind == "h3index" else cd.datatype
        if cd.nullable:
            dt = f"Nullable({dt})"
        out.append(f"  {n} {dt} CODEC({codec})")
    return out


def _engine_sql(schema: CompactedTableSchema) -> str:
    if schema.table_engine is TableEngine.SUMMING:
        cols = ", ".join(schema.summing_columns)
        return f"SummingMergeTree(({cols}))"
    if schema.table_engine is TableEngine.AGGREGATING:
        return "AggregatingMergeTree()"
    return "ReplacingMergeTree()"


def _h3_partition_expr(schema: CompactedTableSchema) -> str:
    h3name = schema.h3index_column()
    if schema.h3_partitioning.kind == "basecell":
        return f"h3GetBaseCell({h3name})"
    diff = schema.h3_partitioning.resolution_difference
    return (
        f"h3ToParent({h3name}, "
        f"CAST(max2(h3GetResolution({h3name}) - {diff}, 0) AS UInt8))"
    )


def _temporal_partition_expr(schema: CompactedTableSchema) -> str | None:
    tcol = schema.temporal_partition_column()
    if tcol is None:
        return None
    tp = schema.temporal_partitioning
    if tp.unit == "years":
        return f"toString(intDiv(toYear({tcol}), {tp.num}) * {tp.num})"
    return (
        f"toString(intDiv(toYear({tcol}) * 12 + toMonth({tcol}) - 1, "
        f"{tp.num}) * {tp.num})"
    )


def create_table_ddl(
    schema: CompactedTableSchema,
    meta: ResolutionMetadata,
    database: str | None = None,
) -> str:
    """One pyramid table's DDL (reference ``schema/mod.rs:306-350``)."""
    table = meta.table_name(schema.name)
    if database:
        table = f"{database}.{table}"
    parts = [_h3_partition_expr(schema)]
    texpr = _temporal_partition_expr(schema)
    if texpr is not None:
        parts.append(texpr)
    parts.extend(
        c
        for c in schema.partition_by_columns
        if c != schema.temporal_partition_column()
    )
    order_by = ", ".join(schema.sort_key())
    cols = ",\n".join(_column_sql(schema))
    return (
        f"CREATE TABLE IF NOT EXISTS {table} (\n{cols}\n)\n"
        f"ENGINE {_engine_sql(schema)}\n"
        f"PARTITION BY ({', '.join(parts)})\n"
        f"ORDER BY ({order_by})"
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
