"""Connection facade tests — the §2.10 API-parity surface, mirroring
the reference ``tests/clickhouse/test_connection.py`` shapes (raw SQL
round-trips, dataframe insert, tableset lifecycle through the facade)."""

from __future__ import annotations

import pytest

from ukis_h3cellstore_spark import (
    CompactedTableSchemaBuilder,
    Connection,
    TableSetQuery,
)
from ukis_h3cellstore_spark.h3 import cells as h3c


@pytest.fixture()
def conn(spark, tmp_path):
    return Connection(spark, str(tmp_path / "wh"))


def simple_schema(name="conn_set"):
    return (
        CompactedTableSchemaBuilder(name)
        .h3_base_resolutions([4, 5, 6, 7])
        .add_h3index_column()
        .add_column("value", "Int32")
        .build()
    )


def test_api_parity_method_names():
    # SURVEY §2.10: the reference GRPCConnection method list must exist
    for m in [
        "execute",
        "execute_into_dataframe",
        "insert_dataframe",
        "execute_into_h3dataframe",
        "database_exists",
        "list_tablesets",
        "drop_tableset",
        "create_tableset",
        "deduplicate_schema",
        "insert_h3dataframe_into_tableset",
        "query_tableset_cells",
        "traverse_tableset_area_of_interest",
        "tableset_stats",
    ]:
        assert callable(getattr(Connection, m)), m


def test_raw_sql_roundtrip(conn):
    df = conn.execute_into_dataframe("SELECT 1 AS a, 'x' AS b")
    assert df.collect()[0].a == 1
    h3df = conn.execute_into_h3dataframe(
        "SELECT CAST(599686042433355775 AS BIGINT) AS h3index, 1 AS v", "h3index"
    )
    assert h3df.h3index_column_name == "h3index"


def test_insert_dataframe_visible_to_sql(conn, spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    conn.insert_dataframe("people", df)
    out = conn.execute_into_dataframe("SELECT count(*) AS n FROM people").collect()
    assert out[0].n == 2
    # append semantics (reference INSERT)
    conn.insert_dataframe("people", df)
    out = conn.execute_into_dataframe("SELECT count(*) AS n FROM people").collect()
    assert out[0].n == 4


def test_full_lifecycle_through_facade(conn, spark):
    schema = simple_schema()
    region = h3c.build_cell(60, [1, 2, 3, 4, 5])
    cells = h3c.cell_to_children(region, 7)
    df = spark.createDataFrame(
        [(c, i) for i, c in enumerate(cells)], "h3index long, value int"
    )

    assert conn.list_tablesets() == {}
    conn.create_tableset(schema)
    conn.insert_h3dataframe_into_tableset(schema, df)
    assert "conn_set" in conn.list_tablesets()

    # query order parity: (name, query, cells, resolution)
    out = conn.query_tableset_cells("conn_set", None, cells, 7)
    assert out.count() == len(cells)

    # template string is auto-coerced
    out2 = conn.query_tableset_cells(
        "conn_set",
        "select * from <[table]> where value >= 10 and h3index in <[h3indexes]>",
        cells,
        7,
    )
    assert out2.count() == len(cells) - 10

    # traversal through the facade
    trav = conn.traverse_tableset_area_of_interest(
        "conn_set", None, [region], 7, max_h3indexes_fetch_count=50
    )
    steps = list(trav)
    assert len(steps) == 1 and steps[0].cell == region

    stats = conn.tableset_stats("conn_set").toPandas()
    assert (stats[~stats.is_compacted & (stats.resolution == 7)].num_rows
            == len(cells)).all()

    conn.deduplicate_schema(schema)
    conn.drop_tableset("conn_set")
    assert conn.list_tablesets() == {}


def test_query_accepts_tablesetquery_object(conn, spark):
    schema = simple_schema("conn_set2")
    region = h3c.build_cell(60, [1, 2, 3, 4, 5])
    cells = h3c.cell_to_children(region, 6)
    df = spark.createDataFrame(
        [(c, i) for i, c in enumerate(cells)], "h3index long, value int"
    )
    conn.insert_h3dataframe_into_tableset(schema, df)
    q = TableSetQuery.from_template(
        "select h3index, value from <[table]> where h3index in <[h3indexes]>"
    )
    out = conn.query_tableset_cells("conn_set2", q, cells, 6)
    assert out.count() == len(cells)


def test_recommended_conf_shapes():
    from ukis_h3cellstore_spark import recommended_conf

    c = recommended_conf(parallelism=32)
    assert c["spark.sql.adaptive.enabled"] == "true"
    assert c["spark.sql.adaptive.skewJoin.enabled"] == "true"
    assert c["spark.sql.shuffle.partitions"] == "64"
    assert recommended_conf()["spark.sql.shuffle.partitions"] == "200"
    assert recommended_conf(shuffle_partitions=17)[
        "spark.sql.shuffle.partitions"
    ] == "17"
