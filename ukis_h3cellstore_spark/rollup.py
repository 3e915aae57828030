"""Rollup aggregation chain — materializing coarser base resolutions.

Spark realization of the reference's generated-SQL rollup
(``insert.rs:278-548``): for every adjacent pair of base resolutions
(fine → coarse), aggregate ``base_src ∪ compacted_src`` grouped by
``h3ToParent(h3index, tgt)`` plus all passthrough columns, with the
per-column aggregation expressions of SURVEY §2.4 (A1-A7):

- Sum/Max/Min/Average → ``F.sum/max/min/avg``
- RelativeToCellArea → ``sum(col) / children_count(parent, src_res)``
  (exact pentagon-aware child count — parity with
  ``length(h3ToChildren(...))``, insert.rs:393), including the
  pre-scaling of rows already at the target resolution
  (insert.rs:477-486)
- SetNullOnConflict → value iff unanimous else NULL
  (``if(length(groupUniqArray(col))=1, first_value(col), null)``,
  insert.rs:429-436)

Scale notes: each rollup level is a single hash aggregation with
map-side partial aggregation; no driver-side data movement. The
reference's `modulo(parent, num_batches)` batching (O9) exists only to
bound ClickHouse server memory and is intentionally *not* replicated —
Spark's hash aggregate spills (SURVEY §4 O9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ukis_h3cellstore_spark.h3 import expressions as hx
from ukis_h3cellstore_spark.schema import AggregationMethod, CompactedTableSchema


def aggregation_exprs(
    schema: CompactedTableSchema, source_res: int, target_res: int
) -> list[Column]:
    """Per-column aggregation expressions over a pre-grouped source.

    Expects the grouping key column ``__h3_parent`` (the parent cell at
    ``target_res``) to be present.
    """
    out: list[Column] = []
    parent = F.col("__h3_parent")
    for name, agg in sorted(schema.aggregated_columns().items()):
        col = F.col(name)
        spark_type = schema.spark_schema()[name].dataType.simpleString()
        if agg is AggregationMethod.SUM:
            expr = F.sum(col)
        elif agg is AggregationMethod.MAX:
            expr = F.max(col)
        elif agg is AggregationMethod.MIN:
            expr = F.min(col)
        elif agg is AggregationMethod.AVERAGE:
            expr = F.avg(col)
        elif agg is AggregationMethod.RELATIVE_TO_CELL_AREA:
            expr = F.sum(col) / hx.h3_children_count(parent, source_res)
        elif agg is AggregationMethod.SET_NULL_ON_CONFLICT:
            expr = F.when(
                F.count_distinct(col) == 1, F.first(col, ignorenulls=True)
            ).otherwise(F.lit(None))
        else:  # pragma: no cover
            raise ValueError(f"unhandled aggregation {agg}")
        out.append(expr.cast(spark_type).alias(name))
    return out


def prescale_source(
    schema: CompactedTableSchema, df: DataFrame, source_res: int, target_res: int
) -> DataFrame:
    """Pre-scale already-aggregated RelativeToCellArea rows.

    Parity with insert.rs:477-486: a source row already at the target
    resolution is multiplied by its child count towards ``source_res``
    so the outer division returns it unchanged.
    """
    h3col = F.col(schema.h3index_column())
    res = hx.h3_get_resolution(h3col)
    for name, agg in schema.aggregated_columns().items():
        if agg is AggregationMethod.RELATIVE_TO_CELL_AREA:
            spark_type = schema.spark_schema()[name].dataType.simpleString()
            df = df.withColumn(
                name,
                F.when(
                    res == target_res,
                    (F.col(name) * hx.h3_children_count(h3col, source_res)).cast(
                        spark_type
                    ),
                ).otherwise(F.col(name)),
            )
    return df


def rollup_level(
    schema: CompactedTableSchema, source: DataFrame, source_res: int, target_res: int
) -> DataFrame:
    """One rollup step: aggregate ``source`` rows to ``target_res``.

    Returns a dataframe with the tableset's column layout, all cells at
    ``target_res``.
    """
    h3name = schema.h3index_column()
    passthrough = schema.passthrough_columns()
    source = prescale_source(schema, source, source_res, target_res)
    keyed = source.withColumn(
        "__h3_parent", hx.h3_to_parent(F.col(h3name), target_res)
    )
    aggs = aggregation_exprs(schema, source_res, target_res)
    if aggs:
        out = keyed.groupBy("__h3_parent", *passthrough).agg(*aggs)
    else:
        # no aggregated columns: GROUP BY over all columns ≡ DISTINCT
        # (the reference's generated SQL degenerates the same way)
        out = keyed.select("__h3_parent", *passthrough).distinct()
    out = out.withColumnRenamed("__h3_parent", h3name)
    # restore canonical column order
    ordered = [h3name] + sorted(c for c in schema.columns if c != h3name)
    return out.select(*ordered)
