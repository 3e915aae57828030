"""Distributed H3 compaction / uncompaction of DataFrames.

Compaction (reference: ``h3df.h3_compact_dataframe(true)`` via
h3ron-polars, called at ``insert.rs:99-108``) replaces every complete
set of sibling cells *with identical attribute values* by a single
parent-cell row, recursively — producing a mixed-resolution dataframe
that stores uniform regions once.

Spark-first design (scale notes):

- ``compact_df`` is pure JVM DataFrame algebra — an iterative
  finest-to-coarsest loop of ``groupBy(parent, *value_cols)`` where a
  parent is promoted when all its children are present (7, or 6 for a
  pentagon parent). No Python UDF; every level is one partial-agg
  (map-side combine) shuffle over a geometrically shrinking row set.
  Each level's survivors are accumulated lazily; intermediates are
  persisted to keep the plan linear instead of exponential.
- ``uncompact_df`` expands mixed-resolution rows to a target
  resolution with **staged broadcast joins against small child-offset
  tables** (``h3_expand_to_children``: each stage's offsets frame is at
  most 7^MAX_OFFSET_DIFF rows, so even a res-0 row under a res-10
  target never builds a multi-GB broadcast) and pure bit arithmetic —
  the Spark realization of the reference's client-side
  ``h3_uncompact_dataframe_subset`` (``mod.rs:459-477``) that scales to
  any number of rows (no driver materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ukis_h3cellstore_spark import query as build_query
from ukis_h3cellstore_spark.h3 import cells as h3c
from ukis_h3cellstore_spark.h3 import expressions as hx


#: levels handled by the single grouped-pandas pass: group key is the
#: ancestor ``max_res - GROUP_LEVELS`` (≤ 7^6 descendants per group, so
#: a group is bounded regardless of total data size); coarser levels
#: run the JVM loop over the residue (≤ 1/7^6 of the rows).
GROUP_LEVELS = 6


def compact_df(
    df: DataFrame,
    h3index_column: str = "h3index",
    max_res: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Compact complete uniform sibling sets into parent rows.

    ``df`` may hold mixed resolutions. Attribute columns (everything
    except the h3 column) take part in the grouping: only siblings with
    equal attribute values merge, so the operation is lossless
    (``uncompact_df(compact_df(df), r)`` reproduces ``df`` for
    single-resolution input).

    Two phases:

    1. all levels finer than ``P = max_res - GROUP_LEVELS`` compact in
       ONE ``applyInPandas`` pass grouped by the res-P ancestor: every
       complete sibling set below P lies entirely inside one group
       (siblings share their res-P ancestor), so per-group exact
       compaction via the pure-Python core is correct, and sibling
       sets AT res P span different groups, so no over-promotion.
       One shuffle replaces a window-agg per level.
    2. the residue at res ≤ P (≤ 1/7^GROUP_LEVELS of the input) runs
       the JVM window loop for the remaining coarse levels.
    """
    value_cols = [c for c in df.columns if c != h3index_column]
    h3col = F.col(h3index_column)
    res_col = hx.h3_get_resolution(h3col)

    if max_res is None:
        row = df.select(F.max(res_col).alias("r")).first()
        max_res = row["r"] if row and row["r"] is not None else 0

    group_res = max(max_res - GROUP_LEVELS, 0)
    if group_res == 0 and max_res <= GROUP_LEVELS:
        # the whole hierarchy fits into basecell groups → pure pandas
        # pass, no JVM tail (sibling sets never span base cells)
        return _compact_grouped_pandas(
            df, h3index_column, value_cols, group_key_res=None
        )

    fine = df.filter(res_col > group_res)
    coarse = df.filter(res_col <= group_res)
    fine_done = _compact_grouped_pandas(
        df=fine,
        h3index_column=h3index_column,
        value_cols=value_cols,
        group_key_res=group_res,
    )
    # rows that compacted all the way down to res P join the JVM tail;
    # rows still finer than P are final (their promotion failed inside
    # their own group and can never succeed elsewhere)
    fr = hx.h3_get_resolution(F.col(h3index_column))
    tail_in = coarse.unionByName(fine_done.filter(fr == group_res))
    still_fine = fine_done.filter(fr > group_res)
    tail_out = _compact_levels_jvm(
        tail_in, h3index_column, value_cols, group_res, persist
    )
    return tail_out.unionByName(still_fine)


def _compact_grouped_pandas(
    df: DataFrame,
    h3index_column: str,
    value_cols: list[str],
    group_key_res: int | None,
) -> DataFrame:
    """One-shuffle exact compaction within res-``group_key_res``
    ancestor groups (basecell groups when None)."""
    if group_key_res is None:
        key = hx.h3_get_base_cell(F.col(h3index_column))
    else:
        key = hx.h3_to_parent_dyn(
            F.col(h3index_column), F.lit(group_key_res)
        )
    schema = df.schema

    def compact_group(pdf):
        import pandas as pd

        pdf = pdf.drop(columns=["__grp"])
        if not value_cols:
            cells = h3c.compact_cells(pdf[h3index_column].tolist())
            return pd.DataFrame({h3index_column: cells}, dtype="int64")
        out_parts = []
        for _, sub in pdf.groupby(value_cols, dropna=False, sort=False):
            cells = h3c.compact_cells(sub[h3index_column].tolist())
            rep = sub.iloc[[0]].drop(columns=[h3index_column])
            block = rep.loc[rep.index.repeat(len(cells))].reset_index(drop=True)
            block.insert(0, h3index_column, pd.Series(cells, dtype="int64"))
            out_parts.append(block[list(pdf.columns)])
        return pd.concat(out_parts, ignore_index=True)

    return (
        df.withColumn("__grp", key)
        .groupBy("__grp")
        .applyInPandas(compact_group, schema)
    )


def _compact_levels_jvm(
    df: DataFrame,
    h3index_column: str,
    value_cols: list[str],
    max_res: int,
    persist: bool = True,
) -> DataFrame:
    """Window-aggregation compaction loop, one level per resolution
    (used for the coarse tail where rows are few but groups span the
    whole cell space)."""
    from pyspark.sql import Window

    out_levels: list[DataFrame] = []
    # duplicate (cell, values) rows must collapse before the
    # completeness count: the window counts ROWS, so duplicates could
    # fake a full sibling set (or, lacking a digit-0 duplicate, drop a
    # genuinely complete group). The pandas phase dedups implicitly
    # (compact_cells works on a set); this keeps both phases agreeing.
    cur = df.dropDuplicates([h3index_column, *value_cols])
    for r in range(max_res, 0, -1):
        at_r = cur.filter(hx.h3_get_resolution(F.col(h3index_column)) == r)
        rest = cur.filter(hx.h3_get_resolution(F.col(h3index_column)) != r)

        # single-shuffle sibling detection: count children per
        # (parent, attribute-values) group with a window — no self-join
        with_parent = at_r.withColumn(
            "__h3_parent", hx.h3_to_parent(F.col(h3index_column), r - 1)
        )
        w = Window.partitionBy("__h3_parent", *value_cols)
        counted = with_parent.withColumn("__n", F.count(F.lit(1)).over(w))
        if persist:
            # one lazy checkpoint per level: truncates lineage (the
            # loop would otherwise build a 2^levels plan via rest ∪
            # promoted) and shares the window shuffle between the
            # promoted and kept branches — eager=False so the whole
            # chain materializes in ONE job at the first action instead
            # of launching a job per level
            counted = counted.localCheckpoint(eager=False)
        need = F.when(
            hx.h3_is_pentagon(F.col("__h3_parent")), F.lit(6)
        ).otherwise(F.lit(7))
        complete = F.col("__n") == need
        # a complete group always contains the digit-0 (center) child —
        # emit the parent from that single row
        last_digit = F.shiftrightunsigned(
            F.col(h3index_column), 3 * (15 - r)
        ).bitwiseAND(F.lit(0x7))
        promoted = (
            counted.filter(complete & (last_digit == 0))
            .select(F.col("__h3_parent").alias(h3index_column), *value_cols)
        )
        kept = counted.filter(~complete).select(h3index_column, *value_cols)

        cur = rest.unionByName(promoted.select(*rest.columns))
        out_levels.append(kept.select(*df.columns))

    result = cur
    for lvl in out_levels:
        result = result.unionByName(lvl)
    return result


def uncompact_df(
    df: DataFrame,
    target_res: int,
    h3index_column: str = "h3index",
    cells_df: DataFrame | None = None,
    source_resolutions: list[int] | None = None,
    cells_count: int | None = None,
) -> DataFrame:
    """Expand mixed-resolution rows to ``target_res`` descendants.

    Rows already at ``target_res`` pass through; coarser rows are
    crossed with a broadcast child-offset table per source resolution
    (pure bit-OR arithmetic, JVM-side). Pentagon descendants that would
    carry a K-axis digit are filtered out with a validity bit-test.

    ``cells_df`` (single column named like ``h3index_column``)
    optionally restricts the result via a left-semi join — the
    reference's "uncompact subset" (``mod.rs:459-477``). The join is
    broadcast-hinted only when ``cells_count`` (the caller's bound on
    the restriction set's size, when known) is at most
    ``query.BROADCAST_MAX_CELLS``; an unknown size keeps the hint for
    backward compatibility with in-memory callers, so pass the bound
    whenever the set may be continent-scale.

    ``source_resolutions``: the resolutions that may occur in ``df``
    below ``target_res``. Pass it when the caller knows (the store
    does — each pyramid table holds exactly one resolution); otherwise
    it is discovered with an extra pass over the data.
    """
    spark = df.sparkSession
    h3col = F.col(h3index_column)
    res_col = hx.h3_get_resolution(h3col)

    at_target = df.filter(res_col == target_res)
    coarser = df.filter(res_col < target_res)

    if source_resolutions is not None:
        res_present = [r for r in source_resolutions if r < target_res]
    else:
        # distinct source resolutions present (small driver list; ≤ 16)
        res_present = [
            r["__r"]
            for r in coarser.select(res_col.alias("__r")).distinct().collect()
        ]

    parts = [at_target]
    for r in sorted(res_present):
        # staged expansion: no single offsets broadcast above
        # 7^MAX_OFFSET_DIFF rows even for res-0 rows under a fine
        # target; drops K-axis children under pentagon chains per stage
        lvl = hx.h3_expand_to_children(
            coarser.filter(res_col == r),
            h3index_column,
            r,
            target_res,
            filter_invalid=True,
        )
        parts.append(lvl.select(*df.columns))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if cells_df is not None:
        restrict = cells_df.select(
            F.col(cells_df.columns[0]).alias(h3index_column)
        ).distinct()
        if cells_count is None or cells_count <= build_query.BROADCAST_MAX_CELLS:
            restrict = F.broadcast(restrict)
        out = out.join(restrict, on=h3index_column, how="leftsemi")
    return out


def compact_cells_local(cells: list[int]) -> list[int]:
    """Driver-side exact compaction (delegates to the pure-Python core)."""
    return h3c.compact_cells(cells)
