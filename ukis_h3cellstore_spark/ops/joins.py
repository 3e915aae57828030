"""Relational extension joins Spark lacks as built-ins.

``range_join`` — events against time intervals without a cross join:
intervals explode into coarse time buckets, the event side computes
its single bucket, and the match becomes an equi-join on the bucket
key plus a residual ``start <= ts < end`` filter. This is the
bucketed interval-join strategy (what Databricks' range-join hints
and KDB window joins do): shuffle cost is one exchange on the bucket
key, replication cost is ``interval_length / bucket_width`` rows per
interval, and there is no N×M candidate space.

``salted_join`` — explicit skew mitigation for joins whose key
distribution is Zipfian: the big side salts each row into one of
``num_salts`` sub-keys (deterministically, from a hash of the whole
row), the small side replicates once per salt, and the join runs on
(key, salt) — a hot key's rows now spread over ``num_salts``
reducers. Output is EXACTLY the plain join's (each big-side row meets
each matching small-side row once, under its own salt). Complements
AQE's skew-join (which can only split sort-merge partitions after
materialization) and broadcast (which needs the small side to fit in
memory × executors).

``asof_join`` — for every left row, the most recent right row at or
before its timestamp (per key). Spark has no ASOF JOIN operator; the
naive formulations are a range join (quadratic worst case) or a
window over a cross join. This implementation is the linear
union-and-carry-forward shape used by stream processors for temporal
joins:

1. union the two sides with a side marker (right payload NULL on left
   rows);
2. one window per key ordered by (ts, side) carries the latest right
   payload forward (``last(..., ignorenulls=True)``);
3. keep the left rows, now annotated with the matched right values.

Cost: ONE shuffle on the join key and a per-partition sort — the same
cost as a regular sort-merge join, independent of time-range density.
Skewed keys split under AQE like any other exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class BlockSkewExceeded(RuntimeError):
    """Raised by :func:`fuzzy_join`'s ``max_block_share_milli``
    pre-flight when the hottest block's row share breaks the cap."""


def range_join(
    left: DataFrame,
    ranges: DataFrame,
    left_ts: str = "ts_us",
    range_start: str = "start_us",
    range_end: str = "end_us",
    on: str | list[str] | None = None,
    bucket: int = 3_600_000_000,
) -> DataFrame:
    """Interval join: every left row paired with every ``ranges`` row
    whose half-open interval ``[range_start, range_end)`` contains its
    timestamp (and whose equality keys ``on`` match, if given).

    Each interval is exploded to the coarse buckets it overlaps
    (``sequence`` — pure JVM, no UDF); each left row computes its one
    bucket; the pairing is then an equi-join on (keys..., bucket) with
    the exact containment predicate as a residual filter. A (left row,
    interval) pair can only meet in the left row's single bucket, so
    no post-join dedup is needed.

    ``bucket`` (same unit as the timestamps; default 1 h in µs) is the
    replication/shuffle knob: intervals produce
    ``ceil(length/bucket)+1`` rows, so set it near the TYPICAL
    interval length. Dense overlapping intervals concentrate in few
    buckets — that candidate growth is inherent to interval-join
    output size, and the skewed exchange splits under AQE."""
    keys = [on] if isinstance(on, str) else list(on or [])
    # Empty/inverted intervals ([s, e) with e <= s) contain nothing,
    # but sequence(s_bucket, e_bucket) with e_bucket < s_bucket would
    # DESCEND and replicate the corrupt row across spurious buckets —
    # drop them before exploding.
    ranges = ranges.filter(F.col(range_end) > F.col(range_start))
    # integer `div`, not float division: epoch-µs / bucket in DOUBLE
    # can land an exact boundary on x.9999... and truncate into the
    # wrong bucket (timestamps are non-negative, so div == floor)
    r = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"cast({range_start} as bigint) div {bucket}"),
                # end is exclusive; a range ending exactly on a bucket
                # boundary does not reach into that bucket
                F.expr(f"(cast({range_end} as bigint) - 1) div {bucket}"),
            )
        ),
    )
    l = left.withColumn("__bucket", F.expr(f"cast({left_ts} as bigint) div {bucket}"))
    out = l.join(r, on=[*keys, "__bucket"]).filter(
        (F.col(left_ts) >= F.col(range_start))
        & (F.col(left_ts) < F.col(range_end))
    )
    return out.drop("__bucket")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join of a large, possibly key-skewed ``left``
    against a small ``right``: left rows get a deterministic salt in
    ``[0, num_salts)`` hashed from the full row, right rows are
    replicated once per salt value, and the join key becomes
    (keys..., salt). Result set is identical to ``left.join(right,
    on, how)``; only the partitioning of the work changes.

    Only ``inner`` and ``left`` joins are supported — outer-right
    semantics would surface one NULL-padded row per unmatched right
    REPLICA, which is not the plain join's output."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(num_salts))
    l = left.withColumn("__salt", salt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return l.join(r, on=[*keys, "__salt"], how=how).drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts_us",
    right_ts: str = "ts_us",
    tolerance: int | None = None,
    right_prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left rows gain the payload of the closest right row
    for the same key(s) — ``backward`` (default) matches the latest
    right row with ``right_ts <= left_ts``, ``forward`` the earliest
    with ``right_ts >= left_ts``, ``nearest`` the closer of the two
    (exact ties and equidistant matches resolve BACKWARD, i.e. the
    earlier right row) — or NULLs if none (left outer semantics).

    ``tolerance`` (same unit as the timestamps) drops matches farther
    than ``tolerance`` from ``left_ts``. Right payload columns are
    prefixed with ``right_prefix``; the matched right timestamp is
    exposed as ``{right_prefix}{right_ts}``.

    ``nearest`` costs the SAME single sort shuffle as the one-sided
    directions: both carries are window functions over one union-and-
    sort frame (right rows sort before left at equal timestamps, so
    the forward carry cannot see an exact tie — harmless, because the
    backward carry matches it at distance 0 and wins every tie)."""
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, left_ts, right_ts, tolerance, right_prefix
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    backward = direction == "backward"
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys and c != right_ts]

    # side ordering puts the right row on the left row's side of the
    # window at equal timestamps, so an exact tie is always visible:
    # backward scans look back (right first), forward scans look
    # ahead (right last)
    right_side, left_side = (0, 1) if backward else (1, 0)
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__matched_ts"),
            *[F.col(c) for c in payload],
        ).alias("__r"),
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(left_side)
    )
    lcols = [c for c in left.columns]
    unioned = l.select(
        *[F.col(c) for c in lcols],
        "__ts",
        "__side",
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    ).unionByName(
        r.select(
            *[
                (
                    F.col(c)
                    if c in keys
                    else F.lit(None).cast(left.schema[c].dataType)
                ).alias(c)
                for c in lcols
            ],
            "__ts",
            "__side",
            "__r",
        ),
        allowMissingColumns=False,
    )
    base = Window.partitionBy(*keys).orderBy("__ts", "__side")
    if backward:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry = F.last("__r", ignorenulls=True).over(w)
        dist = F.col("__ts") - F.col("__m.__matched_ts")
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry = F.first("__r", ignorenulls=True).over(w)
        dist = F.col("__m.__matched_ts") - F.col("__ts")
    carried = unioned.withColumn("__m", carry)
    out = carried.filter(F.col("__side") == F.lit(left_side))
    if tolerance is not None:
        out = out.withColumn(
            "__m",
            F.when(dist <= F.lit(tolerance), F.col("__m")),
        )
    return out.select(
        *[F.col(c) for c in lcols],
        F.col("__m.__matched_ts").alias(f"{right_prefix}{right_ts}"),
        *[F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in payload],
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    tolerance: int | None,
    right_prefix: str,
) -> DataFrame:
    """``direction="nearest"`` kernel for :func:`asof_join`: one
    union-and-sort, TWO carries (backward ``last``, forward
    ``first``), closest wins, distance ties go backward."""
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__matched_ts"),
            *[F.col(c) for c in payload],
        ).alias("__r"),
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    lcols = list(left.columns)
    unioned = l.select(
        *[F.col(c) for c in lcols],
        "__ts",
        "__side",
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    ).unionByName(
        r.select(
            *[
                (
                    F.col(c)
                    if c in keys
                    else F.lit(None).cast(left.schema[c].dataType)
                ).alias(c)
                for c in lcols
            ],
            "__ts",
            "__side",
            "__r",
        )
    )
    base = Window.partitionBy(*keys).orderBy("__ts", "__side")
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    carried = unioned.withColumn(
        "__mb", F.last("__r", ignorenulls=True).over(wb)
    ).withColumn("__mf", F.first("__r", ignorenulls=True).over(wf))
    out = carried.filter(F.col("__side") == 1)
    db = F.col("__ts") - F.col("__mb.__matched_ts")
    df_ = F.col("__mf.__matched_ts") - F.col("__ts")
    mb = F.col("__mb")
    mf = F.col("__mf")
    if tolerance is not None:
        mb = F.when(db <= F.lit(tolerance), mb)
        mf = F.when(df_ <= F.lit(tolerance), mf)
    staged = out.withColumn("__cb", mb).withColumn("__cf", mf)
    pick = F.when(
        F.col("__cf").isNull()
        | (F.col("__cb").isNotNull() & (db <= df_)),
        F.col("__cb"),
    ).otherwise(F.col("__cf"))
    return staged.withColumn("__m", pick).select(
        *[F.col(c) for c in lcols],
        F.col("__m.__matched_ts").alias(f"{right_prefix}{right_ts}"),
        *[F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in payload],
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 2,
) -> DataFrame:
    """Market-basket association mining over (basket, item) rows:
    every unordered item pair co-occurring in at least
    ``min_pair_support`` baskets, with integer-exact support counts
    and milli-scaled confidence/lift:

    ``lift_milli  = (1000 · pair_n · n_baskets) div (a_n · b_n)``
    ``conf_milli  = (1000 · pair_n) div a_n``  (rule a → b, a < b)

    Scale shape: pairs are generated by a SELF-JOIN ON THE BASKET KEY
    (co-partitioned shuffle; work is Σ items-per-basket², bounded by
    the basket width, never corpus²), counts are one partial-agg
    groupBy, and the item-frequency margins join back BROADCAST
    (items-sized). All ratios are integral division on count cross
    products — engine-exact, no float."""
    b = F.col(basket_col)
    it = F.col(item_col)
    # base is consumed 4x (count, margins, both self-join sides):
    # truncate lineage once so the distinct shuffle never re-runs
    base = (
        baskets.select(b.alias("__b"), it.alias("__i"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_baskets = base.select("__b").distinct().count()
    items = base.groupBy("__i").agg(F.count(F.lit(1)).alias("__in"))
    pairs = (
        base.alias("l")
        .join(
            base.alias("r"),
            (F.col("l.__b") == F.col("r.__b"))
            & (F.col("l.__i") < F.col("r.__i")),
        )
        .groupBy(
            F.col("l.__i").alias("item_a"), F.col("r.__i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= int(min_pair_support))
    )
    dec = "decimal(18,0)"
    return (
        pairs.join(
            F.broadcast(items.select(F.col("__i").alias("item_a"),
                                     F.col("__in").alias("a_n"))),
            on="item_a",
        )
        .join(
            F.broadcast(items.select(F.col("__i").alias("item_b"),
                                     F.col("__in").alias("b_n"))),
            on="item_b",
        )
        .select(
            "item_a",
            "item_b",
            F.col("pair_n").cast("long").alias("pair_n"),
            F.col("a_n").cast("long").alias("a_n"),
            F.col("b_n").cast("long").alias("b_n"),
            F.expr(
                f"CAST(1000 * CAST(pair_n AS {dec}) * {int(n_baskets)} AS DECIMAL(38,0)) "
                f"div CAST(CAST(a_n AS {dec}) * CAST(b_n AS {dec}) AS DECIMAL(38,0))"
            ).cast("long").alias("lift_milli"),
            F.expr("(1000 * pair_n) div a_n").cast("long").alias("conf_milli"),
        )
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int = 3,
    block_expr=None,
    self_join: bool | None = None,
    max_block_share_milli: int | None = None,
) -> DataFrame:
    """Blocked fuzzy self/cross join for entity resolution: candidate
    pairs share a BLOCK KEY (default: the first whitespace token of
    ``text_col``), then survive an exact Levenshtein verify at
    ``<= max_distance``. The classic record-linkage shape — the
    blocking equi-join keeps candidate generation linear in the block
    sizes (Σ|block|², never |corpus|²), and the quadratic verify runs
    only inside blocks, exactly like the LSH-then-verify dedup path.

    Pass ``block_expr`` (a Column over ``text_col``'s row) to block on
    something stronger (phonetic key, prefix+length bucket). Output:
    (id_a, id_b, text_a, text_b, distance); JVM-side ``levenshtein`` —
    no Python in the verify.

    Pair orientation is ASYMMETRIC by ``self_join``: in self mode each
    unordered pair is emitted once with ``id_a < id_b``; for a genuine
    left-vs-right linkage (new batch vs corpus, disjoint id ranges)
    EVERY matching (left, right) pair is kept — id_a is always the
    left row and id_b the right row, and no ordering filter is applied
    (it would silently drop matches whenever the left id happens to
    exceed the right id). Self-pairs (same id on both sides) are still
    excluded in the cross case.

    ``max_block_share_milli`` arms the SKEW PRE-FLIGHT: before the
    blocking join ships, ``ops.report.key_skew_report`` measures the
    hottest block's row share on each side (one bounded scan per
    side; rank-1 only) and raises :class:`BlockSkewExceeded` when it
    exceeds the cap — candidates are Σ|block|², so one block holding
    share s contributes s² of the full quadratic, and a 300‰ block
    key is barely blocking at all. The error names the offending
    value so the caller can supply a stronger ``block_expr`` (see
    ``ops.report.suggest_skew_knobs`` for the accept test this
    mirrors). Default None keeps the historical unguarded behavior.

    ``self_join=None`` (the default) infers self mode from Python
    object identity (``left is right``) — convenient but UNSAFE for a
    logical self-join passed as two distinct DataFrame objects (e.g.
    ``df.select(...)`` called twice, or a cached copy), which would
    silently switch to cross semantics and emit BOTH orientations of
    every pair. Pass ``self_join=True``/``False`` explicitly whenever
    the two arguments may be distinct objects over the same rows."""
    blk = (
        block_expr
        if block_expr is not None
        else F.split(F.trim(F.col(text_col)), r"\s+").getItem(0)
    )
    l = left.select(
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("text_a"),
        blk.alias("__blk"),
    )
    r = right.select(
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("text_b"),
        blk.alias("__blk"),
    )
    if max_block_share_milli is not None:
        # guard-only slice of key_skew_report: the accept test needs
        # just (hottest count, total) — one map-side-combinable
        # count + a 3-column reduce per side, not the full ranked
        # report (which costs a checkpoint + two windows). max_by's
        # tie choice only labels the error message.
        sides = [l] if left is right else [l, r]
        for side in sides:
            row = (
                side.groupBy("__blk")
                .agg(F.count(F.lit(1)).alias("__n"))
                .agg(
                    F.max("__n").alias("mx"),
                    F.sum("__n").alias("tot"),
                    F.expr("max_by(__blk, __n)").alias("val"),
                )
                .collect()[0]
            )
            if row["tot"] is None:
                continue  # empty side: nothing to block on
            share = 1000 * row["mx"] // row["tot"]
            if share > max_block_share_milli:
                raise BlockSkewExceeded(
                    f"hottest block {row['val']!r} holds "
                    f"{share}‰ of rows (> "
                    f"{max_block_share_milli}‰): Σ|block|² is no longer "
                    "~linear — pass a stronger block_expr (e.g. prefix + "
                    "length bucket) or raise the cap (see "
                    "ops.report.suggest_skew_knobs for the full report)"
                )
    is_self = (left is right) if self_join is None else bool(self_join)
    pair_filter = (
        F.col("id_a") < F.col("id_b")
        if is_self
        else F.col("id_a") != F.col("id_b")
    )
    return (
        l.join(r, on="__blk")
        .filter(pair_filter)
        .withColumn(
            "distance", F.levenshtein(F.col("text_a"), F.col("text_b"))
        )
        .filter(F.col("distance") <= int(max_distance))
        .select("id_a", "id_b", "text_a", "text_b", "distance")
    )
