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


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window=None,
    per_user: bool = False,
) -> DataFrame:
    """Ordered windowed conversion funnel — the product-analytics
    staple: per user, the earliest ``stages[0]`` event, then the
    earliest ``stages[1]`` at-or-after it within the per-hop
    conversion ``window``, and so on down the stage list. Reports per
    stage the users reaching it and the integral milli conversion
    from the previous stage: ``(stage, stage_name, n_users,
    conv_milli)`` with ``conv_milli = (1000 * n_users) div
    prev_n_users`` (stage 1 reports 1000; an empty previous stage
    converts nobody, not an error).

    ``window`` bounds each hop: a Column interval (e.g.
    ``F.expr("INTERVAL 24 HOURS")``) for timestamp ``ts_col``, a
    number in the column's own units for numeric ``ts_col``, or
    ``None`` for an unbounded strictly-ordered funnel.

    ``per_user=True`` returns the per-user stage hit times instead —
    ``(user, stage1_ts, ..., stageN_ts)``, NULL from the first missed
    stage on — for composition (time-to-convert, cohort splits).

    Each stage consumes a DISTINCT event: the fold tracks the sorted-
    array position of every anchoring event and later stages skip
    already-consumed positions, so a repeated-stage funnel
    (``["purchase", "purchase"]``) needs two purchase events — a
    single event can never satisfy two stages. Time comparison stays
    ``ts >= t_prev`` (equal-timestamp events of different types may
    chain), matching the relational min-ts-chain oracle.

    Scale shape: ONE events scan and ONE shuffle (groupBy user,
    sorted event array), then the whole stage chain is a per-user
    array fold in whole-stage codegen — ``filter(evs, type==s && ts
    in [t_prev, t_prev+window])[1]`` per stage. Compare the naive
    shape — one events-sized min-ts aggregation PER STAGE — which
    scans the stream |stages| times. The per-user fold is bounded by
    that user's own event count (the :func:`sessionize` skew posture:
    a pathologically hot user is that user's problem, never a global
    straggler, and AQE skew-split applies to the single shuffle). The
    |stages|-row report joins to itself broadcast for the ratio — no
    one-task window anywhere."""
    if not stages:
        raise ValueError("stages must not be empty")
    cur = events.groupBy(F.col(user_col).alias("__user")).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))
            )
        ).alias("__evs")
    )
    # attach the sorted-array position so later stages can exclude
    # already-consumed events (2-arg transform lambda receives the
    # element index)
    cur = cur.withColumn(
        "__evs",
        F.transform(
            F.col("__evs"),
            lambda e, i: F.struct(
                e["ts"].alias("ts"), e["et"].alias("et"), i.alias("pos")
            ),
        ),
    )

    def _stage_pred(s, prev_t, used):
        # factory: F.filter requires an EXACTLY-one-parameter callable
        # (defaults count toward the higher-order function's arity)
        if prev_t is None:
            return lambda e: e["et"] == s
        fresh = lambda e: ~F.array_contains(used, e["pos"])  # noqa: E731
        if window is None:
            return lambda e: (e["et"] == s) & (e["ts"] >= prev_t) & fresh(e)
        return lambda e: (
            (e["et"] == s)
            & (e["ts"] >= prev_t)
            & (e["ts"] <= prev_t + window)
            & fresh(e)
        )

    for i, s in enumerate(stages):
        prev_t = None if i == 0 else F.col(f"__t{i - 1}")
        used = F.array(*[F.col(f"__p{j}") for j in range(i)])
        hit = F.filter(F.col("__evs"), _stage_pred(s, prev_t, used))
        # try_element_at: ANSI element_at THROWS on the empty array a
        # user who never reaches the stage produces
        first = F.try_element_at(hit, F.lit(1))
        cur = cur.withColumn(f"__t{i}", first["ts"]).withColumn(
            f"__p{i}", first["pos"]
        )
    if per_user:
        return cur.select(
            F.col("__user").alias(user_col),
            *[
                F.col(f"__t{i}").alias(f"stage{i + 1}_ts")
                for i in range(len(stages))
            ],
        )
    wide = cur.agg(
        *[
            F.count(F.col(f"__t{i}")).cast("long").alias(f"__n{i}")
            for i in range(len(stages))
        ]
    )
    rep = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("stage"),
                        F.lit(s).alias("stage_name"),
                        F.col(f"__n{i}").alias("n_users"),
                    )
                    for i, s in enumerate(stages)
                ]
            )
        ).alias("r")
    ).select("r.stage", "r.stage_name", "r.n_users")
    prev_rep = rep.select(
        (F.col("stage") + 1).alias("stage"), F.col("n_users").alias("__pn")
    )
    return rep.join(F.broadcast(prev_rep), on="stage", how="left").select(
        "stage",
        "stage_name",
        "n_users",
        # ANSI: div throws on zero — an empty previous stage converts
        # nobody, not an error (stage 1 has NULL __pn)
        F.when(F.col("__pn").isNull(), F.lit(1000))
        .when(F.col("__pn") == 0, F.lit(0))
        .otherwise(F.expr("(1000 * n_users) div __pn"))
        .cast("long")
        .alias("conv_milli"),
    )


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
