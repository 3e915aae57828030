"""Basic end-to-end walkthrough — the Spark twin of the reference's
``crates/ukis_h3cellstore/examples/basic.rs``: build a schema, ingest
a disk of cells around a point, query them back, traverse the area.

Run: ``python examples/basic.py`` (a local SparkSession is created).
The geometry step uses the real ``h3`` package when installed and
falls back to the deterministic SquareGrid otherwise, so the example
runs in any environment.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from ukis_h3cellstore_spark import (
    CompactedTableSchemaBuilder,
    Connection,
)
from ukis_h3cellstore_spark import geo
from ukis_h3cellstore_spark.h3 import cells as h3c


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("h3cellstore-basic")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    conn = Connection(spark, tempfile.mkdtemp(prefix="h3wh_"))

    # 1. schema (reference examples/basic.rs: okavango elephant density)
    schema = (
        CompactedTableSchemaBuilder("okavango_delta")
        .h3_base_resolutions(list(range(8)))
        .add_h3index_column()
        .add_column("is_valid", "UInt8")
        .add_aggregated_column("elephant_density", "Float32", "RelativeToCellArea")
        .build()
    )
    conn.create_tableset(schema)

    # 2. a disk of res-7 cells around a center cell (grid_disk when a
    #    geo backend exists; hierarchy children otherwise)
    center = h3c.build_cell(60, [1, 2, 3, 4, 5])
    try:
        cells = geo.grid_disk(center, 2)
    except geo.GeoBackendUnavailable:
        cells = h3c.cell_to_children(center, 7)
    df = spark.createDataFrame(
        [(c, 1, 4.0) for c in cells],
        "h3index long, is_valid int, elephant_density float",
    )

    # 3. insert: compaction + rollups to every coarser base resolution
    conn.insert_h3dataframe_into_tableset(schema, df)

    # 4. query back at full resolution
    out = conn.query_tableset_cells("okavango_delta", None, cells, 7)
    print(f"queried {out.count()} cells at res 7")

    # 5. coarse query hits the pre-aggregated pyramid
    coarse = conn.query_tableset_cells(
        "okavango_delta", None, [h3c.cell_to_parent(c, 4) for c in cells], 4
    )
    print("res-4 rollup:")
    coarse.df.show(5, truncate=False)

    # 6. traverse the same area tile-by-tile
    trav = conn.traverse_tableset_area_of_interest(
        "okavango_delta", None, cells, 7, max_h3indexes_fetch_count=50
    )
    for step in trav:
        print(
            f"tile {step.cell:#x}: {step.contained_data.count()} rows, "
            f"{len(trav)} tiles remaining"
        )

    # 7. stats
    conn.tableset_stats("okavango_delta").show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
