"""Multi-dimensional data layout: Z-order (Morton) clustering for
parquet at scale.

A 100 TB table filtered on TWO dimensions (say user and day) can only
exploit min/max row-group skipping for the one column it is sorted
by; the other column's values scatter across every file. Interleaving
the bits of both columns into one Morton value and range-partitioning
+ sorting on it clusters the data in BOTH dimensions at once — every
file covers a small rectangle of the (user, day) space, so either
filter prunes most files (the same trick Delta/Iceberg expose as
``OPTIMIZE ... ZORDER BY``; here as a plain writer over open parquet).

The Morton value is a pure JVM bit expression (shift/and/or terms —
whole-stage-codegen folds them into one projection); the write is
``repartitionByRange`` + ``sortWithinPartitions`` on it, i.e. one
range shuffle, the same cost as any global sort, and AQE balances the
output files.

The reference pins its layout to MergeTree PARTITION/ORDER BY
(``schema/mod.rs:306-350``); this module is the Spark-side analog for
secondary dimensions the partition expression does not cover.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integer)
    column into one Z-order value: bit ``b`` of column ``i`` lands at
    position ``b * len(cols) + i``. Columns are clamped into
    ``[0, 2^bits)`` first, so out-of-range values degrade to endpoint
    buckets instead of corrupting the interleave."""
    n = len(cols)
    if not 1 <= n * bits <= 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed 64-bit value")
    cap = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        clamped = F.greatest(F.least(col.cast("long"), F.lit(cap)), F.lit(0))
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(clamped, b).bitwiseAND(F.lit(1)), b * n + i
                )
            )
    return z


def rank_scale(col: Column | str, buckets: int = 1 << 16) -> Column:
    """``ntile``-free rank scaling for SKEWED or non-integer columns:
    maps values to ``[0, buckets)`` by percent_rank over a global
    order. Costs one window sort — use only when raw values are not
    already uniform-ish integers (ids, day numbers usually are)."""
    from pyspark.sql.window import Window

    c = F.col(col) if isinstance(col, str) else col
    pr = F.percent_rank().over(Window.orderBy(c))
    return F.least(
        (pr * buckets).cast("long"), F.lit(buckets - 1)
    )


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered in Z-order on ``cols``:
    compute the Morton value, range-partition on it (each output file
    owns a contiguous Z range = a small hyper-rectangle of the key
    space), sort within partitions so row groups nest the clustering,
    and drop the helper column on write."""
    z = morton_value(cols, bits).alias("__z")
    out = df.withColumn("__z", z)
    out = (
        out.repartitionByRange(num_files, "__z")
        if num_files
        else out.repartitionByRange("__z")
    )
    out.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    keys: list[str],
    table: str,
    num_buckets: int = 64,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table: rows are hash-partitioned into ``num_buckets`` files per
    write-task by ``keys`` and the bucketing is recorded in the
    catalog, so every later equi-join or aggregation on ``keys``
    between same-bucketed tables runs WITHOUT a shuffle (Spark plans a
    zipped per-bucket SortMergeJoin — `Exchange`-free, verified in
    tests). THE tool for a fact table joined on the same key every
    day: pay one shuffle at write time, never again at read time.

    Bucketing metadata lives in the session catalog (parquet files
    plus bucket spec); pick ``num_buckets`` so one bucket of the
    LARGEST table fits an executor core's memory at read time."""
    w = df.write.bucketBy(num_buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.mode(mode).format("parquet").saveAsTable(table)


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    docs_per_shard: int = 10_000,
    mode: str = "overwrite",
) -> DataFrame:
    """Export a curated corpus as JSON-lines shards for a training
    data loader: bounded shard size via ``maxRecordsPerFile`` (the
    loader-friendly contract — every shard ≤ ``docs_per_shard``
    records), gzip-free text so loaders stream-split freely. Returns
    the shard MANIFEST as a DataFrame — (shard, n_docs) — which
    callers persist alongside the export (the loader's index file).

    The write is one wide map (no shuffle); shard count scales with
    input partitions × records, so repartition upstream to set a
    floor. The manifest is built by counting LINES of the written
    shards via ``spark.read.text`` — one JSON-line per doc, so line
    count == doc count with no JSON parse and no schema inference
    (the earlier ``spark.read.json`` manifest re-parsed the whole
    export and threw on an empty one; ``read.text`` of an empty
    export yields the empty manifest directly, so there is no
    ``isEmpty`` pre-flight — that probe cost a near-full extra pass
    of the upstream plan per export). At 100 TB the manifest is
    thousands of rows — trivially collectable."""
    spark = df.sparkSession
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", docs_per_shard)
        .json(path)
    )
    return (
        spark.read.text(path)
        .select(F.input_file_name().alias("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
