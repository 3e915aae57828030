"""Pluggable storage backends beyond the default Parquet warehouse.

The reference deploys against ClickHouse; :mod:`clickhouse` provides
the DDL compiler (schema → MergeTree CREATE TABLE statements, same
shape as the reference's generated DDL) and a JDBC-based reader/writer
gated on a reachable server + driver jar.
"""

from ukis_h3cellstore_spark.backends.clickhouse import (
    ClickHouseJdbcBackend,
    clickhouse_ddl,
)

__all__ = ["ClickHouseJdbcBackend", "clickhouse_ddl"]
