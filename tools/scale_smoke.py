"""Scale smoke: ingest N synthetic rows (default 5M — 50× the sf0.1
events table) through the full insert pipeline and query a cell set
back, printing per-phase wall times. Not part of pytest; run ad hoc:

    python tools/scale_smoke.py [n_rows]

Exercises compaction grouping, the rollup chain, partitioned writes
and the broadcast-semi-join read path at a volume where shuffle
behavior, not job overhead, dominates.
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ukis_h3cellstore_spark import CellStore, CompactedTableSchemaBuilder
    from ukis_h3cellstore_spark.h3 import cells as h3c
    from ukis_h3cellstore_spark.h3 import sqlgen as sg

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()  # warm

    schema = (
        CompactedTableSchemaBuilder("scale_set")
        .h3_base_resolutions([4, 6, 8])
        .add_h3index_column()
        .add_aggregated_column("value", "Int64", "Sum")
        .build()
    )
    # ~n_rows/8 distinct res-8 cells → heavy duplicate merging + rollup
    cell = F.expr(sg.synth_cell("(id % " + str(n_rows // 8) + ")", 8, "spark"))
    df = spark.range(n_rows).select(
        cell.alias("h3index"), (F.col("id") % 1000).alias("value")
    )

    store = CellStore(spark, tempfile.mkdtemp(prefix="h3scale_"))
    t0 = time.perf_counter()
    store.insert_h3dataframe_into_tableset(schema, df)
    t1 = time.perf_counter()

    # 2000 random existing cells; sampling cost kept out of the timing
    sample = [r.h3index for r in df.select("h3index").distinct().limit(2000).collect()]
    t2 = time.perf_counter()
    out = store.query_tableset_cells("scale_set", sample, 8)
    n = out.df.count()
    t3 = time.perf_counter()

    stats = store.tableset_stats("scale_set").toPandas()
    t4 = time.perf_counter()

    print(f"rows ingested:    {n_rows:,}")
    print(f"insert:           {t1 - t0:8.1f}s  ({n_rows / (t1 - t0):,.0f} rows/s)")
    print(f"query 2000 cells: {t3 - t2:8.1f}s  ({n} rows)")
    print(f"stats:            {t4 - t3:8.1f}s")
    print(stats.to_string(index=False))
    spark.stop()


if __name__ == "__main__":
    main()
