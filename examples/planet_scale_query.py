"""Driver-list-free AOI query — the planet-scale shape of Q2/Q3.

The reference's client (and this engine's list APIs, kept for parity)
hold the AOI cell list in driver memory; at a res-8 continent that is
~10 GB of Python objects. This walkthrough never materializes the AOI
on the driver:

1. ``geo.geometry_to_cells_df`` polyfills the AOI as a PLAN — the
   driver computes only the hierarchical boundary cover; interior
   subtrees expand executor-side;
2. ``store.query_tableset_cells_df`` takes that frame as the probe —
   per-table normalization is in-plan bit arithmetic, partition
   pruning above the IN-list bound is an in-plan semi-join, and the
   probe-side broadcast hint is applied ONLY when the arithmetic
   size bound (n·7^diff) is under ``query.BROADCAST_MAX_CELLS``
   (above it the plain leftsemi is emitted and AQE picks the join —
   a 76M-cell probe must shuffle, not broadcast);
3. ``traversal.traverse_apply`` runs per-tile Python over the result
   in ONE distributed job (Arrow-batched applyInPandas), the cluster
   shape of the reference's pull iterator.

Run: ``python examples/planet_scale_query.py`` (small AOI so it
finishes in seconds; the shape is identical at any size — see
docs/SCALE.md's res-8 Africa rows for the 76M-cell measurements).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ukis_h3cellstore_spark import CellStore, CompactedTableSchemaBuilder
from ukis_h3cellstore_spark import geo
from ukis_h3cellstore_spark import traversal as T
from ukis_h3cellstore_spark.h3 import expressions as hx


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    aoi = {
        "type": "Polygon",
        "coordinates": [[(10, 45), (12, 45), (12, 47), (10, 47), (10, 45)]],
    }

    # 1. polyfill as a plan — no driver cell list
    aoi_df = geo.geometry_to_cells_df(spark, aoi, 6)
    print(f"AOI frame: {aoi_df.count():,} res-6 cells (driver holds the cover only)")

    # populate a [4,5,6] pyramid over the AOI
    schema = (
        CompactedTableSchemaBuilder("alpine")
        .h3_base_resolutions([4, 5, 6])
        .add_h3index_column()
        .add_column("value", "Int32")
        .build()
    )
    data = aoi_df.withColumn(
        "value", F.pmod(F.xxhash64("h3index"), F.lit(100)).cast("int")
    )
    store = CellStore(spark, tempfile.mkdtemp(prefix="h3ex_"))
    store.insert_h3dataframe_into_tableset(schema, data)

    # 2. query with the FRAME as the probe — hash-identical to the
    # list API (gate-pinned), but the cell set never leaves the plan
    out = store.query_tableset_cells_df("alpine", aoi_df, 6)
    print(f"query_tableset_cells_df: {out.df.count():,} rows")

    # 3. per-tile Python over the result, one distributed job
    def tile_stats(pdf):
        import pandas as pd

        return pd.DataFrame(
            {
                "tile": [int(pdf["__traversal_cell"].iloc[0])],
                "n": [len(pdf)],
                "mean_value": [float(pdf["value"].mean())],
            }
        )

    tiles = T.traverse_apply(
        store,
        "alpine",
        aoi_df,
        6,
        tile_stats,
        "tile long, n long, mean_value double",
        apply_resolution=4,
    )
    print(f"traverse_apply: {tiles.count():,} res-4 tiles")
    spark.stop()


if __name__ == "__main__":
    main()
