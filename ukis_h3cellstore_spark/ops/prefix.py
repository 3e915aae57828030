"""Distributed global cumulative aggregation (prefix sums).

Spark's own answer to ``SUM(x) OVER (ORDER BY k)`` — a window with no
PARTITION BY — is a single-partition sort: the whole dataset funnels
through ONE task, which is the textbook scale-killer for running
totals, global ranks, and CDF-style statistics. The classic
distributed answer (the same two-phase scan MPI/GPU prefix sums use)
is:

1. **range partition** on the order key (`repartitionByRange`) so
   partition *i* holds strictly smaller keys than partition *i+1* and
   equal keys never straddle a boundary;
2. **within-partition running total** — embarrassingly parallel;
3. **partition offsets** — each partition's total is one row, so the
   per-partition totals are collected to the driver (npartitions
   rows, dim-lookup-sized by construction), exclusive-prefix-summed,
   and broadcast back as each partition's starting offset.

Every row then carries ``offset(pid) + within_cum``. Two shuffles of
the data (the range exchange + the window's hash exchange on the
materialized partition id) and one metadata-sized collect — vs. the
unbounded single-task sort of the naive window. All arithmetic stays
JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str | Column,
    out_col: str = "cum_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = running total of ``value_col`` over the
    GLOBAL ordering of ``order_cols`` (ties resolved by making
    ``order_cols`` a total order — include a unique key last, exactly
    as you would in the SQL ``OVER (ORDER BY ...)`` you are replacing).

    Scale notes: the range exchange samples the key distribution, so
    skewed keys still spread across partitions; the per-partition
    totals collect is ``num_partitions`` rows — metadata, not data.
    The within-partition window re-shuffles on the materialized
    partition id, preserving parallelism (one window group per range
    partition, NOT one global group).
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    ncols = [F.col(c) for c in order_cols]
    if num_partitions is None:
        rp = df.repartitionByRange(*ncols)
    else:
        rp = df.repartitionByRange(num_partitions, *ncols)
    # materialize the range-partition id BEFORE any further exchange:
    # spark_partition_id() is only meaningful on the range-partitioned
    # physical plan, so it must be pinned as data here
    staged = rp.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__v", value
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*ncols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # materialize once: the totals collect AND the final plan both
    # consume the range+window result; without lineage truncation the
    # exchange pair would run twice (Spark reuses exchanges within one
    # query, not across actions)
    within = staged.withColumn("__within", F.sum("__v").over(w)).localCheckpoint(
        eager=False
    )
    totals = (
        within.groupBy("__pid").agg(F.sum("__v").alias("__total")).collect()
    )
    by_pid = {int(r["__pid"]): r["__total"] for r in totals}
    # offsets stay in the value's OWN aggregate type (sum of longs is
    # long, sum of decimal(p,s) is decimal(p+10,s)), so integer and
    # decimal running totals remain exact — the float summation-order
    # caveat only exists where SQL itself has it
    sum_type = dict(
        within.groupBy("__pid").agg(F.sum("__v").alias("__total")).dtypes
    )["__total"]
    if sum_type in ("double", "float"):
        cast = float
    elif sum_type.startswith("decimal"):
        from decimal import Decimal

        cast = Decimal
    elif sum_type in ("bigint", "int", "smallint", "tinyint"):
        cast = int
    else:
        raise TypeError(
            f"global_cumsum: unsupported sum type {sum_type!r} for the "
            "partition offsets (numeric value_col required)"
        )
    offsets, acc = [], cast(0)
    for pid in sorted(by_pid):
        offsets.append((pid, acc))
        acc += cast(by_pid[pid] or 0)
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        offsets, f"__pid int, __offset {sum_type}"
    )
    zero = F.lit(0).cast(sum_type)
    return (
        within.join(F.broadcast(off_df), on="__pid", how="left")
        .withColumn(
            out_col, F.coalesce(F.col("__offset"), zero) + F.col("__within")
        )
        .drop("__pid", "__v", "__within", "__offset")
    )


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append the 1-based GLOBAL row number over ``order_cols`` (a
    total order — same contract as :func:`global_cumsum`) without a
    single-partition sort: range partition, within-partition
    ``row_number``, plus broadcast partition-count offsets."""
    ncols = [F.col(c) for c in order_cols]
    if num_partitions is None:
        rp = df.repartitionByRange(*ncols)
    else:
        rp = df.repartitionByRange(num_partitions, *ncols)
    # WINDOWLESS within-partition row number (r15): the old
    # ``Window.partitionBy("__pid")`` forced a SECOND full-data hash
    # exchange on the materialized partition id. Sort within the range
    # partitions instead and let ``monotonically_increasing_id()``
    # stamp (pid << 33 | position) MAP-SIDE; the partition-count
    # offsets collect also carries each partition's min id, so
    # rank = (offset − m0 + 1) + mid — one full-data exchange total.
    staged = rp.sortWithinPartitions(*ncols).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    within = staged.withColumn(
        "__pid", F.shiftrightunsigned("__mid", 33).cast("int")
    ).localCheckpoint(eager=False)
    counts = (
        within.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"), F.min("__mid").alias("__m0"))
        .collect()
    )
    by_pid = {int(r["__pid"]): (int(r["__n"]), int(r["__m0"])) for r in counts}
    offsets, acc = [], 0
    for pid in sorted(by_pid):
        n, m0 = by_pid[pid]
        offsets.append((pid, acc - m0 + 1))
        acc += n
    spark = df.sparkSession
    if offsets:
        off_df = spark.createDataFrame(offsets, "__pid int, __base long")
    else:
        off_df = spark.createDataFrame([], "__pid int, __base long")
    return (
        within.join(F.broadcast(off_df), on="__pid", how="left")
        .withColumn(
            out_col,
            (F.coalesce(F.col("__base"), F.lit(1)) + F.col("__mid")).cast(
                "long"
            ),
        )
        .drop("__pid", "__mid", "__base")
    )


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    tiebreak_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed ROC-AUC by the rank-sum (Mann-Whitney) identity:
    ``AUC = (Σ rank(positives) − P(P+1)/2) / (P·N)`` with ranks taken
    over the global score order — built on :func:`global_rank`, so the
    rank never funnels through a single-partition sort. Returns ONE
    row (auc, n_pos, n_neg).

    Ties: ranks are row_numbers under (score, *tiebreak_cols), so tied
    scores resolve deterministically rather than by midrank — exact
    midrank handling would need a per-score-group average; with
    continuous scores the two coincide. Give a unique tiebreak for
    reproducibility (same contract as the SQL window being replaced).
    """
    order = [score_col] + list(tiebreak_cols or [])
    ranked = global_rank(
        df.select(
            F.col(score_col), F.col(label_col).cast("boolean").alias("__pos"),
            *[F.col(c) for c in (tiebreak_cols or [])],
        ),
        order,
        out_col="__r",
        num_partitions=num_partitions,
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("__pos"), F.col("__r")).otherwise(F.lit(0))).alias(
            "__rs"
        ),
        F.sum(F.col("__pos").cast("long")).alias("n_pos"),
        F.sum((~F.col("__pos")).cast("long")).alias("n_neg"),
    )
    return agg.select(
        F.round(
            (
                F.col("__rs").cast("double")
                - F.col("n_pos").cast("double")
                * (F.col("n_pos").cast("double") + 1.0)
                / 2.0
            )
            / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double")),
            6,
        ).alias("auc"),
        "n_pos",
        "n_neg",
    )


def global_cummax(
    df: DataFrame,
    order_cols: list,
    value_col,
    out_col: str = "cum_max",
    exclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = running MAX of ``value_col`` over the
    global ordering of ``order_cols`` — the cummax twin of
    :func:`global_cumsum`, same range-partition + broadcast-offset
    shape (offsets combine by max, which is associative AND
    idempotent, so the per-partition collect is num_partitions rows of
    metadata). ``exclusive=True`` yields the max over STRICTLY
    preceding rows (NULL for the global first row) — the form
    dominance/skyline tests need. Column expressions are accepted in
    ``order_cols`` (e.g. ``F.col("x").desc()``)."""
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    ncols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    if num_partitions is None:
        rp = df.repartitionByRange(*ncols)
    else:
        rp = df.repartitionByRange(num_partitions, *ncols)
    staged = rp.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__v", value
    )
    hi = -1 if exclusive else 0
    w = (
        Window.partitionBy("__pid")
        .orderBy(*ncols)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    within = staged.withColumn("__within", F.max("__v").over(w)).localCheckpoint(
        eager=False
    )
    totals = (
        within.groupBy("__pid").agg(F.max("__v").alias("__total")).collect()
    )
    by_pid = {int(r["__pid"]): r["__total"] for r in totals}
    v_type = dict(staged.select(F.col("__v")).dtypes)["__v"]
    offsets, acc = [], None
    for pid in sorted(by_pid):
        offsets.append((pid, acc))
        t = by_pid[pid]
        if t is not None:
            acc = t if acc is None else max(acc, t)
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, f"__pid int, __offset {v_type}")
    return (
        within.join(F.broadcast(off_df), on="__pid", how="left")
        .withColumn(out_col, F.greatest("__offset", "__within"))
        .drop("__pid", "__v", "__within", "__offset")
    )
