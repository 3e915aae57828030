"""Relational extension joins Spark lacks as built-ins.

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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts_us",
    right_ts: str = "ts_us",
    tolerance: int | None = None,
    right_prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: left rows gain the payload of the latest
    right row with ``right_ts <= left_ts`` for the same key(s), or
    NULLs if none (left outer semantics; ties on the timestamp match).

    ``tolerance`` (same unit as the timestamps) drops matches older
    than ``left_ts - tolerance``. Right payload columns are prefixed
    with ``right_prefix``; the matched right timestamp is exposed as
    ``{right_prefix}{right_ts}``.
    """
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
    # __side orders right (0) before left (1) at equal timestamps, so
    # an exactly-tied right row is visible to the left row
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "__m",
            F.when(
                F.col("__ts") - F.col("__m.__matched_ts") <= F.lit(tolerance),
                F.col("__m"),
            ),
        )
    return out.select(
        *[F.col(c) for c in lcols],
        F.col("__m.__matched_ts").alias(f"{right_prefix}{right_ts}"),
        *[F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in payload],
    )
