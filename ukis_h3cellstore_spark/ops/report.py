"""Corpus reporting: the one-row "data card" summary.

Every released training corpus ships a datasheet (Gebru 2021's
"Datasheets for Datasets"; model cards cite them) — size, composition,
duplication level, length distribution. This operator computes the
numeric core of that card in a handful of partial aggregations, each
engine-exact (integer counts, rank-selected exact median, milli
shares) so the card is reproducible evidence rather than a one-off
notebook number.

Scale notes: everything is a map-side-combinable hash aggregation over
one or two corpus scans; the only rank-based statistic (median doc
length) uses the range-partition + broadcast-offset grouped rank on a
constant group — no corpus-wide sort on one task, no interpolating
percentile buffering the corpus in one aggregation buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ukis_h3cellstore_spark.ops.text import tokens

__all__ = ["corpus_datacard", "l_diversity"]


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit — k-anonymity's sibling: a quasi-identifier
    class can be large (k-anonymous) yet still leak the SENSITIVE
    attribute if every member shares one value. Group by
    ``quasi_cols`` and report every equivalence class whose sensitive
    attribute takes fewer than ``l`` distinct values:
    (*quasi_cols, n_members, l_distinct).

    One hash aggregation (count + count-distinct per class), map-side
    combinable; output is classes-sized. Pair with the k-anonymity
    gate for the standard privacy-review duo."""
    if l < 2:
        raise ValueError("l must be >= 2")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.countDistinct(sensitive_col).cast("long").alias("l_distinct"),
        )
        .filter(F.col("l_distinct") < l)
    )


def corpus_datacard(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """ONE summary row: (n_docs, n_sources, n_langs, total_tokens,
    total_chars, median_chars, n_dup_groups, n_dup_docs,
    top_source_share_milli).

    - duplication: exact content-hash groups with >1 member and the
      number of docs inside them (the headline "X % of the corpus is
      exact-duplicate" number);
    - ``median_chars``: EXACT middle-rank median of document length
      (mean of the two middle order statistics);
    - ``top_source_share_milli``: the largest source's document share
      in thousandths — the skew-at-a-glance number."""
    from ukis_h3cellstore_spark.ops.robust import grouped_median

    n_tok = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(tokens(text_col)))
    base = df.select(
        F.col(id_col),
        F.col(source_col).alias("__src"),
        F.col(lang_col).alias("__lang"),
        F.length(F.col(text_col)).cast("long").alias("__chars"),
        n_tok.cast("long").alias("__toks"),
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("__h"),
    ).localCheckpoint(eager=True)  # one corpus pass feeds every agg
    totals = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("__src").alias("n_sources"),
        F.countDistinct("__lang").alias("n_langs"),
        F.sum("__toks").alias("total_tokens"),
        F.sum("__chars").alias("total_chars"),
    )
    dups = (
        base.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_dup_groups"),
            F.coalesce(F.sum("__n"), F.lit(0)).alias("n_dup_docs"),
        )
    )
    med = (
        grouped_median(
            base.withColumn("__one", F.lit(1)), "__one", "__chars"
        )
        .select(F.col("median").alias("median_chars"))
    )
    top_src = (
        base.groupBy("__src")
        .agg(F.count(F.lit(1)).alias("__sn"))
        .agg(F.max("__sn").alias("__top"))
    )
    return (
        totals.crossJoin(dups)
        .crossJoin(med)
        .crossJoin(top_src)
        .select(
            "n_docs",
            "n_sources",
            "n_langs",
            "total_tokens",
            "total_chars",
            "median_chars",
            "n_dup_groups",
            "n_dup_docs",
            F.expr("(1000 * __top) div n_docs").cast("long").alias(
                "top_source_share_milli"
            ),
        )
    )
