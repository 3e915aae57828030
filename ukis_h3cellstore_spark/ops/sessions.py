"""Sessionization: gap-based event sessions, the batch twin of the
streaming session-window operator.

Classic two-window shape, all JVM-side:

1. ``lag(ts) over (partition by user order by ts)`` flags rows whose
   gap from the previous event exceeds the session gap;
2. a running sum of the flags numbers the sessions per user;
3. one hash-agg rolls each (user, session) up to its stats.

Scale: one shuffle on the user key (the window and the final agg share
the partitioning, so Catalyst reuses the exchange). Per-user data is
sorted within its partition — no global sort. A pathologically hot
user is an AQE skew-split away; there is no cross-user state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 30 minutes, the conventional web-analytics session gap
DEFAULT_GAP_US = 30 * 60 * 1_000_000


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    gap_us: int = DEFAULT_GAP_US,
) -> DataFrame:
    """Assign a per-user session number to every event: input columns
    plus ``session_seq`` (1-based, in time order). A new session
    starts when the gap from the user's previous event exceeds
    ``gap_us`` (strictly greater, first event always starts one)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    new_session = F.when(
        gap.isNull() | (gap > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_seq", F.sum(new_session).over(run))


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    gap_us: int = DEFAULT_GAP_US,
    value_col: str | None = None,
) -> DataFrame:
    """Roll sessions up to one row each: (user, session_seq,
    session_start, session_end, n_events, duration_us[, sum_value])."""
    s = sessionize(events, user_col, ts_col, gap_us)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration_us"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return s.groupBy(user_col, "session_seq").agg(*aggs)


def markov_transitions(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences — the sequence-modeling audit ("what follows what, and
    how deterministically") behind funnel design and synthetic-
    sequence validation. Consecutive-state pairs come from
    ``lead(state) over (partition by key order by order_cols)``
    (sequences never cross keys), then one (from, to) count
    aggregation with broadcast row totals:

    ``(from_state, to_state, n_transitions, row_total,
       cond_milli = (1000 * n) div row_total)`` — integral division,
    engine-exact.

    Scale: one shuffle on the key (the window), one partial-agg
    shuffle on the (from, to) pair — the matrix is |states|², a
    metadata-sized broadcast for categorical state columns. Per-key
    windows are parallel across keys; a pathologically hot key is
    bounded by that key's own event count (AQE skew-split applies).
    ``order_cols`` must totally order each key's events (append a
    unique id) or the transition multiset is engine-arbitrary."""
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = (
        df.withColumn("__to", F.lead(state_col).over(w))
        .filter(F.col("__to").isNotNull())
        .select(
            F.col(state_col).alias("from_state"),
            F.col("__to").alias("to_state"),
        )
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    totals = counts.groupBy("from_state").agg(
        F.sum("n_transitions").alias("row_total")
    )
    return (
        counts.join(F.broadcast(totals), on="from_state")
        .select(
            "from_state",
            "to_state",
            F.col("n_transitions").cast("long").alias("n_transitions"),
            F.col("row_total").cast("long").alias("row_total"),
            F.expr("(1000 * n_transitions) div row_total")
            .cast("long")
            .alias("cond_milli"),
        )
    )


def survival_at_horizons(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    horizons: list[int],
) -> DataFrame:
    """Empirical survival of per-key inter-event gaps at fixed
    horizons — the retention/churn curve ("what share of return gaps
    exceed 1h / 6h / 24h") in its assumption-free form. One row per
    horizon: ``(horizon, n_gaps, n_surviving,
    survival_milli = (1000 * n_surviving) div n_gaps)`` — integral,
    engine-exact.

    Gaps come from the same per-key lag window as sessionization
    (parallel across keys); each horizon is one conditional-sum column
    in a single reduction, so the horizon list adds expressions, not
    passes."""
    if not horizons:
        raise ValueError("horizons must not be empty")
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col))
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    gaps = df.withColumn("__gap", gap).filter(F.col("__gap").isNotNull())
    aggs = [F.count(F.lit(1)).alias("__n")]
    for h in horizons:
        aggs.append(
            F.sum((F.col("__gap") > int(h)).cast("long")).alias(f"__s{h}")
        )
    row = gaps.agg(*aggs)
    spark = df.sparkSession
    hdf = spark.createDataFrame(
        [(int(h),) for h in horizons], "horizon long"
    )
    out = row.crossJoin(F.broadcast(hdf))
    surv = None
    for h in horizons:
        c = F.when(F.col("horizon") == int(h), F.col(f"__s{h}"))
        surv = c if surv is None else F.coalesce(surv, c)
    return out.select(
        "horizon",
        F.col("__n").cast("long").alias("n_gaps"),
        surv.cast("long").alias("n_surviving"),
    ).withColumn(
        "survival_milli",
        F.expr("(1000 * n_surviving) div n_gaps").cast("long"),
    )
