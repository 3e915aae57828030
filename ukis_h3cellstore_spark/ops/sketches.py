"""Mergeable sketch operators.

``approx_count_distinct`` exists in Spark, but its HLL++ hashing is
JVM-private: two engines (or two Spark versions) can disagree, which
makes sketches impossible to reconcile across systems and impossible
to oracle-check.  This module implements HyperLogLog (Flajolet 2007)
on **md5-derived hashes**, so the register table — and therefore the
estimate — is bit-identical on any engine with md5.

Layout: a 60-bit hash ``h`` (15 md5 hex chars); bucket ``h mod m``;
the remaining 60-log2(m) bits are the rho-domain ``w``; ``rho =
(w_bits + 1) - bitlength(w)`` (the leading-zero count + 1, with
``w == 0`` mapping to ``w_bits + 1``).

The register table is a plain ``groupBy(idx).max(rho)`` — a partial
(map-side-combining) aggregation over at most ``m`` groups, the
textbook mergeable-sketch shape: shards sketch independently and
merge by register-wise max, so a 100 TB distinct count costs one
narrow scan and an m-row shuffle.  The summary keeps the harmonic
term as the exact integer ``sum_pow = sum(2^(w_bits+1 - M_j))``
(empty registers contribute ``2^(w_bits+1)``), leaving no float in
the hash-checked output; the float estimate ``alpha_m * m^2 *
2^(w_bits+1) / sum_pow`` is derived by callers (tests pin its
accuracy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_registers",
    "hll_summary",
    "hll_estimate",
    "cms_registers",
    "cms_estimate",
    "cms_heavy_hitters",
    "source_minhash_drift",
    "hll_registers_by",
]

_HASH_BITS = 60


def _rho_frame(values: DataFrame, col: str, b: int) -> DataFrame:
    m = 1 << b
    w_bits = _HASH_BITS - b
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    hdf = values.select(h.alias("h"))
    return hdf.select(
        F.pmod(F.col("h"), F.lit(m)).alias("idx"),
        F.expr(f"h div {m}").alias("w"),
    ).select(
        "idx",
        F.when(F.col("w") == 0, F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits + 1) - F.length(F.bin(F.col("w"))))
        .alias("rho"),
    )


def hll_registers(values: DataFrame, col: str, b: int = 9) -> DataFrame:
    """Register table ``(idx, mj)`` — at most ``2^b`` rows; merge two
    sketches by unioning register tables and taking ``max(mj)``."""
    return _rho_frame(values, col, b).groupBy("idx").agg(
        F.max("rho").alias("mj")
    )


def hll_summary(values: DataFrame, col: str, b: int = 9) -> DataFrame:
    """One-row exact-integer summary ``(m, n_empty_registers,
    sum_pow)`` of the HLL state (see module docstring)."""
    m = 1 << b
    w_bits = _HASH_BITS - b
    reg = hll_registers(values, col, b)
    return reg.agg(
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.count("*")).cast("long").alias("n_empty_registers"),
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({w_bits + 1} - mj AS INT))"))
            + (F.lit(m) - F.count("*"))
            * F.lit(1 << (w_bits + 1)).cast("long")
        ).cast("long").alias("sum_pow"),
    )


def hll_estimate(m: int, sum_pow: int, b: int = 9) -> float:
    """Driver-side float estimate from the exact summary (raw HLL
    formula without small/large-range corrections)."""
    w_bits = _HASH_BITS - b
    alpha = 0.7213 / (1 + 1.079 / m)
    return alpha * m * m * float(1 << (w_bits + 1)) / float(sum_pow)


# --- count-min sketch (Cormode & Muthukrishnan 2005) ------------------
#
# Same engine-reproducibility rationale as HLL above: the d hash rows
# are salted md5 hashes, so the register table is bit-identical on any
# engine.  ``cms_registers`` is a partial (map-side-combining)
# aggregation over at most ``d * w`` groups — shards sketch
# independently and merge by register-wise SUM, the mergeable-sketch
# contract.  At 100 TB the register table is KBs (d=3, w=1024 →
# 3072 rows) and broadcastable; estimating a candidate set then costs
# one broadcast join over the candidates, never a corpus re-scan.
# CMS guarantees est >= true count (one-sided error), so a
# threshold filter on the estimate has no false negatives.


def _cms_idx(col: str, j: int, w: int):
    """Row-``j`` bucket index: 60-bit salted md5 hash mod ``w``."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(j)), F.lit(":"), F.col(col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(w))


def cms_registers(values: DataFrame, col: str, d: int = 3, w: int = 1024) -> DataFrame:
    """Count-min register table ``(j, idx, cnt)`` — at most ``d * w``
    rows; merge two sketches by unioning register tables and summing
    ``cnt`` per ``(j, idx)``."""
    probes = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("j"),
                _cms_idx(col, j, w).cast("long").alias("idx"),
            )
            for j in range(d)
        ]
    )
    return (
        values.select(F.explode(probes).alias("p"))
        .groupBy(F.col("p.j").alias("j"), F.col("p.idx").alias("idx"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    candidates: DataFrame, registers: DataFrame, col: str, d: int = 3, w: int = 1024
) -> DataFrame:
    """Point-query the sketch for each distinct candidate value:
    ``est = min_j cnt[j][h_j(v)]``.  The register table is broadcast
    (``d * w`` rows), so the probe is candidate-sized — no corpus
    movement."""
    cand = candidates.select(col).distinct()
    probes = cand.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("j"),
                        _cms_idx(col, j, w).cast("long").alias("idx"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("p"),
    ).select(col, F.col("p.j").alias("j"), F.col("p.idx").alias("idx"))
    return (
        probes.join(F.broadcast(registers), ["j", "idx"])
        .groupBy(col)
        .agg(F.min("cnt").cast("long").alias("est"))
    )


def cms_heavy_hitters(
    values: DataFrame,
    col: str,
    threshold_frac: int = 64,
    d: int = 3,
    w: int = 1024,
) -> DataFrame:
    """Values whose CMS estimate is at least ``total / threshold_frac``
    — the classic heavy-hitters query.  One-sided error means the
    output is a superset of the true heavy hitters; the estimate is
    returned so callers can exact-verify the (tiny) candidate set."""
    regs = cms_registers(values, col, d=d, w=w)
    total = values.agg((F.count(F.lit(1)).cast("long")).alias("n_total"))
    est = cms_estimate(values, regs, col, d=d, w=w)
    return (
        est.crossJoin(F.broadcast(total))
        .where(F.col("est") >= F.expr(f"n_total div {threshold_frac}"))
        .select(col, "est", "n_total")
    )


def source_minhash_drift(
    df: DataFrame,
    k: int = 32,
    shingle_k: int = 3,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Corpus-level near-duplication BETWEEN sources: a k-permutation
    MinHash signature per source over its distinct token shingles,
    then pairwise signature agreement — the cheap screen for "crawl B
    is mostly a re-crawl of crawl A" before any document-level dedup
    runs (matches/k estimates the shingle-set Jaccard; Broder 1997).
    Returns (source_a < source_b, matches, est_jaccard_milli).

    Scale shape: the k mins are ONE partial aggregation (k ``min``
    columns over the shingle stream — no explode by k, no shuffle
    wider than sources × k); signatures are a sources-sized table, so
    the pairwise stage is a broadcast self-join over metadata. The
    permutations use the one-hash-k-perms idiom shared with
    ``ops.dedup.minhash_signatures``: ONE md5 per shingle row, staged
    in its own projection (HashAggregate does not CSE across aggregate
    inputs — k md5s per row cost 9× at the 1M-doc smoke), then k
    affine scrambles mod the MinHash prime. Bit-identical on any
    engine with md5."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from ukis_h3cellstore_spark.ops.dedup import (
        MINHASH_PRIME,
        _minhash_coeffs,
        shingle_df,
    )

    sh = shingle_df(
        df.select(F.col(source_col).alias("__src"), F.col(text_col)),
        text_col,
        "__src",
        shingle_k,
    ).select(F.col("__src"), F.col("shingle"))
    base = sh.select(
        "__src",
        (
            F.conv(
                F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10
            ).cast("long")
            % F.lit(MINHASH_PRIME)
        ).alias("__x"),
    )
    aggs = []
    for j in range(k):
        ca, cb = _minhash_coeffs(j)
        aggs.append(
            F.min(
                (F.lit(ca) * F.col("__x") + F.lit(cb)) % F.lit(MINHASH_PRIME)
            ).alias(f"h{j}")
        )
    sigs = base.groupBy("__src").agg(*aggs)
    a = sigs.select(
        F.col("__src").alias("source_a"),
        *[F.col(f"h{j}").alias(f"a{j}") for j in range(k)],
    )
    b = sigs.select(
        F.col("__src").alias("source_b"),
        *[F.col(f"h{j}").alias(f"b{j}") for j in range(k)],
    )
    matches = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(k)
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            matches.cast("long").alias("matches"),
        )
        .withColumn(
            "est_jaccard_milli",
            F.expr(f"(1000 * matches) div {k}").cast("long"),
        )
    )


def hll_registers_by(
    values: DataFrame, col: str, group_cols: list[str], b: int = 9
) -> DataFrame:
    """Per-group HLL register tables ``(*group_cols, idx, mj)`` — the
    groupable/STREAMING variant of :func:`hll_registers`: the
    register-wise ``max`` is associative, so the same expression runs
    over a micro-batched stream in complete/update mode with state
    bounded by groups × 2^b rows, and the final state equals the batch
    replay bit-for-bit (md5-derived hashes)."""
    m = 1 << b
    w_bits = _HASH_BITS - b
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    staged = values.select(*group_cols, h.alias("__h")).select(
        *group_cols,
        F.pmod(F.col("__h"), F.lit(m)).alias("idx"),
        F.expr(f"__h div {m}").alias("__w"),
    )
    rho = (
        F.when(F.col("__w") == 0, F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits + 1) - F.length(F.bin(F.col("__w"))))
    )
    return (
        staged.withColumn("__rho", rho)
        .groupBy(*group_cols, "idx")
        .agg(F.max("__rho").alias("mj"))
    )


def source_containment(
    df: DataFrame,
    shingle_k: int = 3,
    text_col: str = "text",
    source_col: str = "source",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """DIRECTED source-level overlap: ``|A∩B| / |A|`` over distinct
    token shingles for every ordered source pair with any overlap —
    the asymmetric companion to :func:`source_minhash_drift` (Jaccard
    misses "B simply contains A", the re-crawl-plus-extra case).
    Returns (source_a, source_b, inter, size_a, containment_milli).

    Scale shape: one distinct (source, shingle) table; the
    intersection is a shingle-keyed self-join (never sources² at
    corpus width) with ``max_shingle_df`` to drop boilerplate shingles
    shared by more than N sources (each surviving shingle fans out at
    most N²); sizes are a sources-sized broadcast."""
    from ukis_h3cellstore_spark.ops.dedup import shingle_df

    sh = (
        shingle_df(
            df.select(F.col(source_col).alias("__src"), F.col(text_col)),
            text_col,
            "__src",
            shingle_k,
        )
        .select(F.col("__src"), F.col("shingle"))
        .distinct()
    )
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(hot, on="shingle", how="left_anti")
    sizes = sh.groupBy("__src").agg(F.count(F.lit(1)).alias("size_a"))
    a = sh.select(F.col("__src").alias("source_a"), "shingle")
    b = sh.select(F.col("__src").alias("source_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("source_a") != F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("__src", "source_a")),
            on="source_a",
        )
        .withColumn(
            "containment_milli",
            F.expr("(1000 * inter) div size_a").cast("long"),
        )
    )
