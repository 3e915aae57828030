"""Dataset assembly operators for training pipelines: deterministic
splits and context-window packing.

- ``split_by_hash``: train/val/test assignment by a salted content-id
  hash — stable across runs and cluster sizes (no ``rand()``), exact
  in expectation, and reproducible by any engine that has md5. One
  projection, no shuffle: the split is a pure function of the row.
- ``pack_documents``: assign documents to fixed-token-budget context
  windows ("bins"). Documents are sharded by id hash, then packed
  within each shard by a running token cumsum over a deterministic
  order — the standard distributed approximation of greedy packing
  (exact greedy is inherently sequential). The only shuffle is the
  per-shard window sort, and shard count scales with the corpus so a
  shard's rows always fit an executor.

Both are whole-stage-codegen expressions — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ukis_h3cellstore_spark.ops.text import tokens

#: bucket space of the split hash — weights resolve to integer bucket
#: ranges out of this many (1e-4 weight granularity)
SPLIT_BUCKETS = 10_000


def split_by_hash(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named fraction.

    ``weights`` maps split name → fraction (must sum to ≤ 1; any
    remainder falls into the LAST split). Assignment hashes
    ``salt|id`` into ``SPLIT_BUCKETS`` buckets and carves contiguous
    bucket ranges in the given insertion order — so adding a new split
    at the end never reshuffles earlier ones."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights:
        raise ValueError("at least one split is required")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % SPLIT_BUCKETS
    )
    names = list(weights)
    expr = None
    hi = 0
    for name in names[:-1]:
        hi += int(round(weights[name] * SPLIT_BUCKETS))
        cond = bucket < hi
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-token-count chunks with optional
    overlap: (id, chunk_no, chunk_text, n_tokens) — the standard
    pre-tokenization windowing for context-length-bounded training.
    Chunk starts stride by ``chunk_tokens - overlap``; the final
    chunk may be short; empty documents yield no chunks.

    Pure explode over per-row slice offsets — no shuffle at all: the
    operator is a flatMap, so it pipelines into whatever follows."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    base = df.select(F.col(id_col), tokens(text_col).alias("__toks")).withColumn(
        "__n",
        F.when(F.length(F.concat_ws("", F.col("__toks"))) == 0, F.lit(0)).otherwise(
            F.size("__toks")
        ),
    )
    # chunk start offsets 1, 1+stride, ... <= n (1-based slice indexes)
    starts = F.when(
        F.col("__n") > 0,
        F.sequence(F.lit(1), F.col("__n"), F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    exploded = base.select(
        F.col(id_col),
        F.col("__toks"),
        F.col("__n"),
        F.posexplode(starts).alias("chunk_no", "__start"),
    )
    piece = F.slice(F.col("__toks"), F.col("__start"), chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_no"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.least(
            F.lit(chunk_tokens), F.col("__n") - F.col("__start") + 1
        ).alias("n_tokens"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the
    stratum is smaller), chosen deterministically: rows are ranked
    inside each stratum by a salted id hash (id as tiebreak) and the
    top-n kept. Unlike ``df.sampleBy`` this is exact, reproducible
    across runs/cluster sizes, and engine-portable. One shuffle on
    the stratum key; per-stratum sort is partition-local, and the
    rank window needs no global order."""
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    )
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def pack_documents(
    df: DataFrame,
    max_tokens: int = 2048,
    num_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each document to a (shard, bin) context window:
    (id, shard, n_tokens, bin, bin_offset).

    ``shard`` spreads the corpus (hash of the id); within a shard,
    documents pack in id order by running token count: a document's
    bin is the window its FIRST token lands in
    (``floor(exclusive_cumsum / max_tokens)``), and ``bin_offset`` is
    that starting position within the shard's token stream. Documents
    longer than ``max_tokens`` span bins (the trainer's splitter deals
    with those; they are flagged by ``n_tokens > max_tokens``)."""
    toks = tokens(text_col)
    n_tokens = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(toks))
    shard = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        ).cast("long"),
        F.lit(num_shards),
    ).cast("int")
    base = df.select(
        F.col(id_col),
        shard.alias("shard"),
        n_tokens.cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        F.col(id_col),
        "shard",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / F.lit(max_tokens))
        .cast("long")
        .alias("bin"),
        (cum - F.col("n_tokens")).cast("long").alias("bin_offset"),
    )


def packing_stats(
    df: DataFrame,
    max_tokens: int = 2048,
    num_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(shard, bin) packing report: (shard, bin, n_docs,
    total_tokens, fill_ratio) — how full the context windows are."""
    packed = pack_documents(df, max_tokens, num_shards, text_col, id_col)
    return (
        packed.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.col("total_tokens") / F.lit(float(max_tokens)), 4),
        )
    )


def subsample_by_source(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic mixture weighting: keep each row with its
    source's sampling rate, decided by a salted id hash (no rand(),
    so the mixture is reproducible and re-runnable incrementally —
    the standard way to down-weight overrepresented crawl sources in
    a training mix). Sources absent from ``rates`` use
    ``default_rate``; a rate of 1.0 keeps everything, 0.0 drops the
    source entirely."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % SPLIT_BUCKETS
    )
    thresh = F.lit(int(round(default_rate * SPLIT_BUCKETS)))
    for src, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(source_col) == src, F.lit(int(round(rate * SPLIT_BUCKETS)))
        ).otherwise(thresh)
    return df.filter(bucket < thresh)


def temperature_rates(counts: dict[str, int], tau: float) -> dict[str, float]:
    """Per-source keep rates for temperature-balanced sampling: the
    target share of source i is ``n_i^τ / Σ n_j^τ`` (τ=1 → natural
    distribution, τ→0 → uniform across sources; XLM-R uses τ=0.3 —
    the standard multilingual / multi-source rebalancing of LLM
    training mixes). Rates are per-ROW keep probabilities scaled so
    the largest is 1.0 (sampling can only remove, never duplicate).
    Deterministic: the normalizer sums in sorted-source order."""
    if tau <= 0:
        raise ValueError(f"tau must be > 0, got {tau}")
    shares = {s: float(c) ** tau for s, c in counts.items()}
    z = sum(shares[s] for s in sorted(shares))
    raw = {s: shares[s] / z / counts[s] for s in counts}
    mx = max(raw.values())
    return {s: raw[s] / mx for s in raw}


def temperature_mixture(
    df: DataFrame,
    tau: float = 0.7,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-balanced corpus: per-source counts (one tiny
    aggregate — n_sources rows collect to the driver, like any dim
    lookup) become keep rates via :func:`temperature_rates`, applied
    with the salted-hash :func:`subsample_by_source` — deterministic,
    re-runnable, no ``rand()``."""
    counts = {
        r[0]: r[1] for r in df.groupBy(source_col).count().collect()
    }
    rates = temperature_rates(counts, tau)
    return subsample_by_source(
        df, rates, default_rate=0.0,
        source_col=source_col, id_col=id_col, salt=salt,
    )
