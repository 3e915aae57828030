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

__all__ = ["corpus_datacard", "l_diversity", "categorical_dependence", "psi_drift", "psi_from_counts", "rfm_segments", "key_skew_report", "suggest_skew_knobs"]


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
    approx: bool = False,
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
      in thousandths — the skew-at-a-glance number.

    ``approx=True`` — the datacard-at-100-TB path (same posture as
    ``ngram_diversity(approx=True)``): the two exact ``countDistinct``
    aggregates become HyperLogLog++ sketches (bounded state instead of
    a per-partition distinct set; HLL++ is EXACT below its sparse
    threshold, so low-cardinality source/lang columns usually still
    report exact numbers) and the exact middle-rank median becomes
    ``percentile_approx`` (bounded-state quantile sketch). The dup
    counts and top-source share stay exact — they are plain map-side-
    combinable hash aggregations, already scale-safe. Gates pin the
    exact form; divergence is test-bounded."""
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
    n_distinct = (
        (lambda c: F.approx_count_distinct(c, rsd=0.01))
        if approx
        else F.countDistinct
    )
    totals = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        n_distinct("__src").cast("long").alias("n_sources"),
        n_distinct("__lang").cast("long").alias("n_langs"),
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
    if approx:
        med = base.agg(
            F.percentile_approx("__chars", 0.5, 10_000)
            .cast("double")
            .alias("median_chars")
        )
    else:
        med = grouped_median(
            base.withColumn("__one", F.lit(1)), "__one", "__chars"
        ).select(F.col("median").alias("median_chars"))
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


def categorical_dependence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Dependence audit between two categorical columns — the
    contingency-table trio every dataset datasheet wants for "is my
    label confounded with my source": Pearson chi-squared, mutual
    information (nats), and Cramer's V, one output row.

    Definitions (o = observed cell count, r/c = margins, n = total):
    ``chi2 = sum (o - rc/n)^2 / (rc/n)`` over ALL margin pairs (zero
    cells contribute (rc/n)), ``mi = sum (o/n) ln(o n / (r c))`` over
    observed cells (0 ln 0 = 0), ``cramers_v =
    sqrt(chi2 / (n (min(|A|,|B|) - 1)))``.

    Scale shape: ONE data-sized aggregation (the |A| x |B| cell
    count, map-side combinable); margins and the zero-cell grid are
    cells-sized frames joined broadcast. Float enters only in the
    final per-cell terms (integer counts up to there), and the
    6-decimal rounding is far coarser than the ~1e-14 summation-order
    jitter of the cells-sized sums.

    Rows with a NULL in EITHER column are excluded up front: a NULL
    category would enter the margins but never equi-join back to the
    grid (its observed count would read 0 while its expected count
    still contributed, inflating chi2) and count_distinct would drop
    it from n_a/n_b — margins, cells, and cardinalities must agree."""
    df = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    cells = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("__o"))
    ra = cells.groupBy(col_a).agg(F.sum("__o").alias("__ra"))
    cb = cells.groupBy(col_b).agg(F.sum("__o").alias("__cb"))
    # full margin grid so zero cells still contribute their expected
    # count to chi2 (MI terms vanish at o = 0 by convention)
    grid = (
        ra.crossJoin(F.broadcast(cb))
        .join(cells, on=[col_a, col_b], how="left")
        .withColumn("__o", F.coalesce(F.col("__o"), F.lit(0)))
    )
    tot = cells.agg(
        F.sum("__o").alias("__n"),
        F.count_distinct(F.col(col_a)).alias("n_a"),
        F.count_distinct(F.col(col_b)).alias("n_b"),
    )
    o = F.col("__o").cast("double")
    n = F.col("__n").cast("double")
    e = F.col("__ra").cast("double") * F.col("__cb").cast("double") / n
    chi_term = (o - e) * (o - e) / e
    mi_term = F.when(
        F.col("__o") > 0,
        (o / n)
        * F.log(
            o * n / (F.col("__ra").cast("double") * F.col("__cb").cast("double"))
        ),
    ).otherwise(F.lit(0.0))
    return (
        grid.crossJoin(F.broadcast(tot))
        .withColumn("__chi", chi_term)
        .withColumn("__mi", mi_term)
        .groupBy("__n", "n_a", "n_b")
        .agg(F.sum("__chi").alias("__chi2"), F.sum("__mi").alias("__minat"))
        .select(
            F.col("__n").cast("long").alias("n"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            ((F.col("n_a") - 1) * (F.col("n_b") - 1)).cast("long").alias("dof"),
            F.round(F.col("__chi2"), 6).alias("chi2"),
            F.round(F.col("__minat"), 6).alias("mi_nats"),
            F.round(
                F.sqrt(
                    F.col("__chi2")
                    / (
                        F.col("__n").cast("double")
                        * (F.least(F.col("n_a"), F.col("n_b")) - 1).cast("double")
                    )
                ),
                6,
            ).alias("cramers_v"),
        )
    )


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col,
    bin_edges: list[float],
    smooth: int = 1,
) -> DataFrame:
    """Population Stability Index per group against the pooled
    corpus — the standard ML-ops drift score for "has this source's
    length/score distribution moved" (PSI < 0.1 stable, > 0.25
    shifted). Values are bucketed by the FIXED ``bin_edges``
    (B = len(edges) + 1 bins: (-inf, e1), [e1, e2), ..., [eB-1, inf)),
    counts are Laplace-smoothed by ``smooth`` so empty bins stay
    finite and the score is defined for every group:

    ``psi = sum_bins (p_g - p_all) * ln(p_g / p_all)``,
    ``p = (count + smooth) / (n + smooth * B)``, rounded to 6 dp.

    Scale shape: ONE data-sized aggregation (the (group, bin) count);
    the bin grid is groups x B rows built from broadcast margins, and
    the pooled distribution is a B-row broadcast. Same float posture
    as :func:`categorical_dependence`: integers until the final
    per-bin terms, 6-dp rounding far above summation-order jitter."""
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    edges = [float(e) for e in bin_edges]
    if sorted(edges) != edges or len(set(edges)) != len(edges):
        raise ValueError("bin_edges must be strictly increasing")
    nbins = len(edges) + 1
    b = F.lit(nbins - 1)
    for i in range(len(edges) - 1, -1, -1):
        b = F.when(val < F.lit(edges[i]), F.lit(i)).otherwise(b)
    # NULL values (and NULL groups) are excluded, matching
    # ks_vs_rest/w1_vs_rest — an unfiltered NULL would make every
    # when() condition null and fall through to the TOP bin,
    # silently skewing the top-bin mass for sparse columns.
    binned = df.filter(
        val.isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(group_col), b.cast("int").alias("__bin"))
    cells = binned.groupBy(group_col, "__bin").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return psi_from_counts(cells, group_col, "__bin", "__c", nbins, smooth)


def psi_from_counts(
    cells: DataFrame,
    group_col: str,
    bin_col: str,
    count_col: str,
    nbins: int,
    smooth: int = 1,
) -> DataFrame:
    """PSI from a pre-aggregated (group, bin, count) table — the shared
    tail of :func:`psi_drift`, exposed so STREAMING drift monitors can
    accumulate the (group, bin) counts incrementally (counts are
    associative, hence micro-batch-split-proof) and compute the same
    score at materialization time. ``bin_col`` must be dense ints in
    ``[0, nbins)``. NULL group rows are dropped (a NULL key would
    enter the margins but never equi-join back to the grid — same
    contract as :func:`psi_drift`/``ks_vs_rest``)."""
    cells = cells.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col),
        F.col(bin_col).cast("int").alias("__bin"),
        F.col(count_col).cast("long").alias("__c"),
    )
    groups = cells.groupBy(group_col).agg(F.sum("__c").alias("__ng"))
    pooled = cells.groupBy("__bin").agg(F.sum("__c").alias("__cp"))
    n_all = cells.agg(F.sum("__c").alias("__n"))
    spark = cells.sparkSession
    bins = spark.range(nbins).select(F.col("id").cast("int").alias("__bin"))
    grid = (
        groups.crossJoin(F.broadcast(bins))
        .join(cells, on=[group_col, "__bin"], how="left")
        .withColumn("__c", F.coalesce(F.col("__c"), F.lit(0)))
        .join(F.broadcast(pooled), on="__bin", how="left")
        .withColumn("__cp", F.coalesce(F.col("__cp"), F.lit(0)))
        .crossJoin(F.broadcast(n_all))
    )
    sm = int(smooth)
    pg = (F.col("__c") + sm).cast("double") / (
        F.col("__ng") + sm * nbins
    ).cast("double")
    pa = (F.col("__cp") + sm).cast("double") / (
        F.col("__n") + sm * nbins
    ).cast("double")
    return (
        grid.withColumn("__t", (pg - pa) * F.log(pg / pa))
        .groupBy(group_col, "__ng")
        .agg(F.round(F.sum("__t"), 6).alias("psi"))
        .select(
            group_col, F.col("__ng").cast("long").alias("n_group"), "psi"
        )
    )


def rfm_segments(
    df: DataFrame,
    id_col: str,
    recency_col: str,
    frequency_col: str,
    monetary_col: str,
) -> DataFrame:
    """RFM quintile segmentation — the classic customer/entity scoring
    grid (5 = best on each axis): input one row per entity with its
    recency (larger = more recent), frequency, and monetary metrics;
    output integer quintile scores and the composite segment code
    ``r*100 + f*10 + m``.

    Integer-exact: each metric is ranked ASCENDING with ``id_col`` as
    the deterministic tiebreak via the range-partitioned
    :func:`~ukis_h3cellstore_spark.ops.robust.grouped_rank` (constant
    group — still no one-task window, entities spread across range
    partitions), and the quintile is ``1 + ((rank - 1) * 5) div n`` —
    pure integral arithmetic, so any engine reproduces it
    bit-for-bit. Three rank sweeps + one scalar count; no all-pairs
    anything."""
    from ukis_h3cellstore_spark.ops.robust import grouped_rank

    base = df.select(
        F.col(id_col),
        F.col(recency_col).alias("__r"),
        F.col(frequency_col).alias("__f"),
        F.col(monetary_col).alias("__m"),
    ).withColumn("__one", F.lit(1))
    n_ent = int(base.count())
    out = base
    for metric, score in (
        ("__r", "r_score"),
        ("__f", "f_score"),
        ("__m", "m_score"),
    ):
        out = (
            grouped_rank(
                out,
                "__one",
                [metric, id_col],
                out_col="__rk",
                range_tiebreak=id_col,
            )
            .withColumn(
                score,
                F.expr(f"CAST(1 + ((__rk - 1) * 5) div {n_ent} AS INT)"),
            )
            .drop("__rk")
        )
    return out.select(
        id_col,
        "r_score",
        "f_score",
        "m_score",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("int").alias("segment"),
    )


def key_skew_report(
    df: DataFrame, cols: list[str], top_n: int = 10
) -> DataFrame:
    """Per-key-column skew diagnostics — the PRE-FLIGHT report you run
    before choosing a join/blocking/salting strategy at scale: for
    each candidate key column, the top-``top_n`` heaviest values with
    exact counts and integral milli shares, plus the column's exact
    distinct-value count. A 30%-hot key tells you to salt or split
    BEFORE the shuffle ships (the engine's AQE skew handling, the
    fuzzy-join blocking-key choice, `gemm_block_rows`, and
    `max_bucket_size` are all knobs this report parameterizes).

    Output: (column, value, n_rows, rank, share_milli, n_distinct),
    rank 1.. by (count desc, value asc) — deterministic; NULLs are a
    first-class key value (a classic hot key) reported as the
    ``<null>`` sentinel, which also pins identical NULL ordering
    across engines. CAVEAT: the sentinel is in-band — a column whose
    actual string value is the literal ``<null>`` merges its count
    with real NULLs in this report (both describe a hot key the
    caller must handle, so the knob suggestions below are unaffected,
    but the bucket's label is ambiguous; pre-map such values if the
    distinction matters).

    Scale shape: ONE corpus scan explodes (column, value) string
    pairs; per-(column, value) counts are a map-side-combinable hash
    aggregation, localCheckpoint'ed once for its 3 consumers (the
    multi-reference trap, docs/SCALE.md). The per-column top-N is a
    SINGLE two-phase pass (round-12, replacing a per-column
    ``orderBy().limit()`` loop that cost |cols| jobs): phase 1 ranks
    within (column, input-partition-id) — each window group is one
    shuffle partition's slice of one column, never a whole
    high-cardinality column in one task — and keeps ``top_n`` per
    group (≤ P·|cols|·top_n candidate rows, a guaranteed superset of
    every column's true top-N under ANY partitioning); phase 2 ranks
    the bounded candidates per column. The total and distinct counts
    ride the counts frame (column-count-sized aggregations)."""
    if not cols:
        raise ValueError("cols must be a non-empty list of column names")
    if len(set(cols)) != len(cols):
        # a duplicated column would silently double its counts (and,
        # for cols[0], the share denominator)
        raise ValueError(f"cols contains duplicates: {cols}")
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.coalesce(
                            F.col(c).cast("string"), F.lit("<null>")
                        ).alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.column", "kv.value")
    counts = (
        pairs.groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .localCheckpoint(eager=False)
    )
    total = counts.filter(F.col("column") == cols[0]).agg(
        F.sum("n_rows").alias("__total")
    )
    dist = counts.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    from pyspark.sql import Window

    order = [F.col("n_rows").desc(), F.col("value").asc()]
    # phase 1: partial top-N inside each (column, input partition)
    # slice — the window's own shuffle key bounds every sort group by
    # one partition's rows, and any candidate superset yields the
    # same final top-N because the ordering is a total order
    wp = Window.partitionBy("column", "__p").orderBy(*order)
    cand = (
        counts.withColumn("__p", F.spark_partition_id())
        .withColumn("__r", F.row_number().over(wp))
        .filter(F.col("__r") <= top_n)
        .drop("__p", "__r")
    )
    w = Window.partitionBy("column").orderBy(*order)
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .crossJoin(F.broadcast(total))
        .join(F.broadcast(dist), on="column")
        .withColumn(
            "share_milli",
            F.expr("(n_rows * 1000) div __total").cast("long"),
        )
        .select(
            "column", "value", "n_rows", "rank", "share_milli", "n_distinct"
        )
    )


def suggest_skew_knobs(
    report: DataFrame,
    max_share_milli: int = 100,
    num_salts_cap: int = 64,
) -> dict[str, dict]:
    """Map a :func:`key_skew_report` to CONCRETE operator knobs — the
    consumer the report was built for, so pipelines act on skew
    instead of reading it. Per column:

    - ``top_share_milli`` / ``top_value`` / ``n_distinct``: the
      report's rank-1 facts.
    - ``usable_block_key``: True iff the hottest value holds ≤
      ``max_share_milli`` ‰ of rows — the accept test for a fuzzy-join
      blocking key (candidates are Σ|block|²: one block at share s
      contributes s²·n² pairs, so a 300‰ key is ~9% of the full
      quadratic — not blocking at all).
    - ``num_salts``: the :func:`~ukis_h3cellstore_spark.ops.joins.
      salted_join` factor — 1 when under ``max_share_milli``, else
      the next power of two ≥ top_share/max_share (each salted slice
      of the hot key then fits the target share), capped.

    Collects the report (≤ |cols|·top_n rows — metadata, not data).
    The suggestions are deterministic in the report contents, and the
    knobs they feed never change RESULTS (salting is partitioning-
    only; a rejected block key raises before work ships)."""
    rows = [r for r in report.collect() if r["rank"] == 1]
    out: dict[str, dict] = {}
    for r in rows:
        share = int(r["share_milli"])
        if share <= max_share_milli:
            num_salts = 1
        else:
            num_salts = 1
            while (
                num_salts < num_salts_cap
                and share > max_share_milli * num_salts
            ):
                num_salts *= 2
        out[r["column"]] = {
            "top_value": r["value"],
            "top_share_milli": share,
            "n_distinct": int(r["n_distinct"]),
            "usable_block_key": share <= max_share_milli,
            "num_salts": num_salts,
        }
    return out
