"""Bench-style timing for a SUBSET of headline queries — the same
session config and min-of-3 + clearCache + forced-GC methodology as
``bench.py``, for fast A/B loops on the handful of queries a change
touches without paying the full 72-query run. Usage:

    python tools/bench_subset.py <query> [query ...]

Env: $SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS (same as bench.py).
Prints one "name seconds" line per query plus a total; this tool is
NOT the driver contract (bench.py is) and writes no artifact.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from bench import _bench_variants

    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ukis-h3cellstore-spark-bench-subset")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    variants = _bench_variants()

    # same warmup as bench.py
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .count()
        .orderBy("r_name")
        .collect()
    )

    total = 0.0
    for name in names:
        fn = variants.get(name) or queries[name]
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
            spark._jvm.System.gc()
        total += best
        print(f"{name} {best:.3f}", flush=True)
    print(f"TOTAL {total:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
