"""Data-selection operators (coreset construction).

Greedy k-center (farthest-point traversal, Gonzalez 1985) is the
classic coreset / data-pruning primitive: pick the point farthest
from the already-chosen set, k times.  It gives a 2-approximation to
the optimal k-center cover and is what embedding-based "diverse
subset" selection pipelines run.

Determinism discipline: embeddings are **floor-quantized to an
integer lattice** before any distance math, so distances are exact
int64 arithmetic — results are bit-identical across engines,
partitionings, and runs (the same fixed-point discipline as
ops/graph.pagerank).  ``floor`` of an IEEE double is reproducible
everywhere; a float L2 would not be.

Scale shape: k passes over the corpus, each ONE narrow projection
(zip_with on the quantized vector vs a broadcast center literal) plus
a single-row ``max`` aggregate — no shuffle wider than one row per
pass.  The running min-distance column is ``localCheckpoint``-ed each
round so lineage stays flat (k linear jobs, not k²).  The only
``collect`` is the new center's own vector (dims-sized, the same
driver-appropriate scalar k-means/IVF training uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kcenter_coreset", "first_fail_stage", "pareto_frontier"]


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """2-D Pareto frontier (skyline, both coordinates maximized): the
    distinct ``(x, y)`` points NOT weakly dominated by any other point
    (q dominates p iff ``qx >= px AND qy >= py`` with at least one
    strict). The curation use: "which (n_events, best_score) profiles
    are undominated" — the classic multi-criteria pick list.

    Scale shape — never the naive all-pairs dominance join: reduce to
    one candidate per distinct x (``groupBy(x).max(y)``, an ordinary
    partial-agg shuffle), then a single distributed cummax sweep in x-
    descending order (:func:`~ukis_h3cellstore_spark.ops.prefix.
    global_cummax`, range-partition + broadcast offsets — no one-task
    global window). A candidate survives iff its y strictly exceeds
    the EXCLUSIVE running max over larger x; ties in y across
    different x lose to the larger x (weak dominance), which the
    strict ``>`` encodes exactly. Output: ``(x, y)`` frontier points,
    x ascending semantics left to the caller."""
    cand = df.groupBy(F.col(x_col).alias("__x")).agg(
        F.max(F.col(y_col)).alias("__y")
    )
    from ukis_h3cellstore_spark.ops.prefix import global_cummax

    swept = global_cummax(
        cand,
        [F.col("__x").desc()],
        "__y",
        out_col="__m",
        exclusive=True,
        num_partitions=num_partitions,
    )
    return (
        swept.filter(F.col("__m").isNull() | (F.col("__y") > F.col("__m")))
        .select(F.col("__x").alias(x_col), F.col("__y").alias(y_col))
    )


def first_fail_stage(
    df: DataFrame, stages: list[tuple[str, "F.Column"]]
) -> DataFrame:
    """Filter-cascade attribution: append ``fail_stage`` — the NAME of
    the first stage (in order) whose predicate the row fails, or NULL
    if it passes every stage. This is the corpus-observability primitive
    behind attrition ("waterfall") reports: every dropped document is
    charged to exactly ONE stage, so per-stage drop counts sum to the
    total drop and the report answers "which filter is eating my data".

    Pure map-side projection — the staged predicates become one CASE
    chain in whole-stage codegen; any aggregation over ``fail_stage``
    is an ordinary partial-agg groupBy. Predicates that need corpus
    context (dup-canonicality, frequency cutoffs) should be joined on
    as boolean columns BEFORE calling this."""
    if not stages:
        raise ValueError("stages must not be empty")
    expr = F.lit(None).cast("string")
    for name, pred in reversed(stages):
        expr = F.when(~pred, F.lit(name)).otherwise(expr)
    return df.withColumn("fail_stage", expr)


def kcenter_coreset(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant_scale: int = 10_000,
) -> DataFrame:
    """Greedy k-center selection over an embedding table.

    Seeds at the minimum ``id_col`` (deterministic), then repeatedly
    selects the point maximizing the squared L2 distance (on the
    floor-quantized lattice) to the chosen set; ties break toward the
    smaller id.  Returns ``(sel_order long, vec_id long,
    dist_from_set long)`` — ``dist_from_set`` is the max-min squared
    lattice distance at selection time (0 for the seed), a useful
    radius/coverage curve for choosing k.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    q = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * quant_scale).cast("long"),
        ).alias("q"),
    ).persist()

    seed = q.orderBy("vec_id").limit(1).collect()[0]
    chosen = [(0, int(seed["vec_id"]), 0)]
    center_vec = list(seed["q"])
    state = q.select("vec_id", "q", F.lit(None).cast("long").alias("mind"))
    for step in range(1, k):
        c = F.array(*[F.lit(int(v)).cast("long") for v in center_vec])
        d = F.aggregate(
            F.zip_with("q", c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        state = state.select(
            "vec_id", "q", F.least(F.coalesce(F.col("mind"), d), d).alias("mind")
        ).localCheckpoint(eager=True)
        # one single-row agg per round: the struct max orders by
        # (mind, -vec_id) and carries the winner's vector along, so
        # no second lookup job is needed
        far = (
            state.select(
                F.max(
                    F.struct(
                        F.col("mind"), (-F.col("vec_id")).alias("nid"), F.col("q")
                    )
                ).alias("m")
            )
            .collect()[0]["m"]
        )
        chosen.append((step, int(-far["nid"]), int(far["mind"])))
        center_vec = list(far["q"])
    q.unpersist()
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        chosen, "sel_order long, vec_id long, dist_from_set long"
    )
