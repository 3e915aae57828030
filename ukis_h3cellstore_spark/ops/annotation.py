"""Annotation / labeling quality operators.

Human- and model-labeled training data needs agreement statistics
before the labels are trusted; Fleiss' kappa (Fleiss 1971) is the
standard chance-corrected agreement measure for a fixed panel of
``n`` raters per item.  The implementation is **integer-exact**: the
kappa is returned as an exact rational ``(kappa_num, kappa_den)``
rather than a float, so results are bit-reproducible across engines
and partitionings (no float-summation-order drift).

With ``N`` items, ``n`` raters, categories ``j``, ``n_ij`` ratings of
item ``i`` in category ``j``, ``A = sum n_ij^2``, ``c_j = sum_i
n_ij`` and ``S = sum c_j^2``::

    kappa = [(A - N*n) * N*n - S*(n-1)] / [((N*n)^2 - S) * (n-1)]

which is the textbook ``(P_bar - P_e) / (1 - P_e)`` put over the
common denominator ``(N*n)^2 * (n-1)`` — all quantities integers.

Scale: two partial aggregations (item×label counts, then global
sums) — no windows, no joins wider than the label-count table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fleiss_kappa"]


def fleiss_kappa(
    ratings: DataFrame,
    n_raters: int,
    item_col: str = "item_id",
    label_col: str = "label",
) -> DataFrame:
    """Fleiss' kappa over a ratings table (one row per rating).

    Items with a rating count other than ``n_raters`` are dropped
    (the statistic requires a complete panel); ``n_dropped_items``
    reports how many.  Returns one row:
    ``(n_items, n_raters, n_categories, n_dropped_items,
    kappa_num, kappa_den)`` — kappa as an exact fraction;
    ``kappa_den`` > 0 whenever more than one category occurs.
    """
    if n_raters < 2:
        raise ValueError("n_raters must be >= 2")
    nij = ratings.groupBy(item_col, label_col).agg(
        F.count("*").alias("nij")
    )
    per_item = nij.groupBy(item_col).agg(
        F.sum("nij").alias("ni"),
        F.sum(F.col("nij") * F.col("nij")).alias("sq"),
    )
    kept = per_item.filter(F.col("ni") == n_raters)
    dropped = per_item.filter(F.col("ni") != n_raters).agg(
        F.count("*").alias("n_dropped_items")
    )
    kept_items = kept.select(item_col)
    cj = (
        nij.join(kept_items, item_col)
        .groupBy(label_col)
        .agg(F.sum("nij").alias("cj"))
    )
    g1 = kept.agg(
        F.count("*").alias("n_items"), F.sum("sq").alias("a_sum")
    )
    g2 = cj.agg(
        F.count("*").alias("n_categories"),
        F.sum(F.col("cj") * F.col("cj")).alias("s_sum"),
    )
    n = F.lit(n_raters).cast("long")
    nn = F.col("n_items") * n  # N*n total ratings
    return (
        g1.crossJoin(g2)
        .crossJoin(dropped)
        .select(
            F.col("n_items").cast("long").alias("n_items"),
            n.alias("n_raters"),
            F.col("n_categories").cast("long").alias("n_categories"),
            F.col("n_dropped_items").cast("long").alias("n_dropped_items"),
            (
                (F.col("a_sum") - nn) * nn
                - F.col("s_sum") * (n - F.lit(1))
            ).cast("long").alias("kappa_num"),
            (
                (nn * nn - F.col("s_sum")) * (n - F.lit(1))
            ).cast("long").alias("kappa_den"),
        )
    )
