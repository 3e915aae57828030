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

__all__ = ["hll_registers", "hll_summary", "hll_estimate"]

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
