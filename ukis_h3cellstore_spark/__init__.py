"""ukis_h3cellstore_spark — a PySpark-native H3 cellstore analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of ``dlr-eoc/ukis-h3cellstore`` (reference: a Rust+Python
ClickHouse client storing H3-hexagon-indexed dataframes in a
multi-resolution "compacted tables" pyramid), re-expressed Spark-first:

- storage is partitioned Parquet (one dataset per (resolution, kind)
  table of the pyramid), written with ``partitionBy`` on the H3
  partition expression + temporal buckets and sorted within partitions
  on the H3 sort key — giving partition pruning and row-group min/max
  skipping where the reference relied on ClickHouse MergeTree layout;
- H3 hierarchy math (parent / resolution / base cell / children) is
  implemented as native Spark ``Column`` bit-arithmetic expressions
  (whole-stage-codegen friendly, no Python UDF in the hot path);
- the insert pipeline (compaction + resolution split + rollup
  aggregation chain) and query pipeline (per-resolution semi-joins +
  uncompaction) are lazy DataFrame compositions planned by Catalyst.

Reference API-parity checklist: SURVEY.md §2.10.
"""

from ukis_h3cellstore_spark.schema import (
    AggregationMethod,
    CompactedTableSchema,
    CompactedTableSchemaBuilder,
)
from ukis_h3cellstore_spark.store import CellStore, InsertOptions
from ukis_h3cellstore_spark.frame import H3DataFrame
from ukis_h3cellstore_spark.connection import Connection
from ukis_h3cellstore_spark.query import TableSetQuery
from ukis_h3cellstore_spark.traversal import TraversalOptions, Traverser
from ukis_h3cellstore_spark.session import build_session, recommended_conf

__all__ = [
    "AggregationMethod",
    "CompactedTableSchema",
    "CompactedTableSchemaBuilder",
    "CellStore",
    "Connection",
    "H3DataFrame",
    "InsertOptions",
    "TableSetQuery",
    "TraversalOptions",
    "Traverser",
    "build_session",
    "recommended_conf",
]

__version__ = "0.1.0"
