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

import math

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
    order_cols: list | None = None,
) -> DataFrame:
    """Assign each document to a (shard, bin) context window:
    (id, shard, n_tokens, bin, bin_offset).

    ``shard`` spreads the corpus (hash of the id); within a shard,
    documents pack in ``order_cols`` order (default: id order) by
    running token count: a document's bin is the window its FIRST
    token lands in (``floor(exclusive_cumsum / max_tokens)``), and
    ``bin_offset`` is that starting position within the shard's token
    stream. Documents longer than ``max_tokens`` span bins (the
    trainer's splitter deals with those; they are flagged by
    ``n_tokens > max_tokens``).

    ``order_cols`` is the CURRICULUM knob: pass e.g. a difficulty
    score (with ``id_col`` appended as tiebreak for determinism) and
    early bins hold the easiest documents per shard — the
    shortest-first / easiest-first schedule, without any extra
    shuffle (the packing window runs per shard either way). Every
    column referenced must exist on ``df``."""
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
    order = (
        [F.col(c) if isinstance(c, str) else c for c in order_cols]
        if order_cols
        else [F.col(id_col)]
    )
    base = df.select(
        F.col(id_col),
        shard.alias("shard"),
        n_tokens.cast("long").alias("n_tokens"),
        *[o.alias(f"__ord{i}") for i, o in enumerate(order)],
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(*[F.col(f"__ord{i}") for i in range(len(order))])
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


def dsir_importance_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """DSIR-style importance weights for domain-targeted data
    selection (Xie et al. 2023, "Data Selection for Language Models
    via Importance Resampling"): score every corpus document by
    ``Σ_g log p_target(g) / p_source(g)`` over its n-gram occurrences,
    so resampling ∝ exp(weight) shifts the corpus toward the target
    domain's n-gram distribution. Returns (id, n_grams, weight).

    Differences from the paper, chosen for engine portability and
    bounded state: the feature space is the EXACT n-gram vocabulary of
    the *target* sample plus one OOV bucket (the paper hashes into a
    fixed bucket count purely to bound memory — the target-vocabulary
    cap bounds it the same way since the target sample is small by
    construction), with add-one smoothing on both distributions.

    Scale shape: the only corpus-sized operations are the n-gram
    explode and one per-document hash aggregation; the log-ratio table
    is vocabulary-sized and broadcast. Nothing corpus-sized is ever
    collected or broadcast. Deterministic: no hashing, no rand().
    """

    def grams(df: DataFrame) -> DataFrame:
        toks = tokens(text_col)
        n = F.size(toks)
        arr = F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - F.lit(k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        # occurrences, NOT distinct: the importance weight is over the
        # bag-of-ngrams likelihood, so multiplicity matters
        return df.select(
            F.col(id_col).alias("__id"), F.explode(arr).alias("__g")
        )

    g_corpus = grams(corpus)
    g_target = grams(target)
    ct = g_target.groupBy("__g").agg(F.count(F.lit(1)).alias("__ct"))
    # in-vocabulary source counts: semi-restrict to the target vocab,
    # everything else lands in the OOV bucket via the totals
    cs = (
        g_corpus.join(F.broadcast(ct.select("__g")), on="__g")
        .groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__cs"))
    )
    totals_t = g_target.agg(F.count(F.lit(1)).alias("n")).collect()[0].n
    totals_s = g_corpus.agg(F.count(F.lit(1)).alias("n")).collect()[0].n
    vocab = ct.join(cs, on="__g", how="left").select(
        "__g",
        F.col("__ct"),
        F.coalesce(F.col("__cs"), F.lit(0)).alias("__cs"),
    )
    invoc = vocab.agg(
        F.count(F.lit(1)).alias("v"),
        F.coalesce(F.sum("__cs"), F.lit(0)).alias("cs_in"),
    ).collect()[0]
    v_size = invoc.v
    oov_t = 0  # by construction: the vocabulary IS the target's grams
    oov_s = totals_s - invoc.cs_in
    denom_t = float(totals_t + v_size + 1)
    denom_s = float(totals_s + v_size + 1)
    oov_ratio = float(
        ((oov_t + 1) / denom_t) / ((oov_s + 1) / denom_s)
    )
    ratios = vocab.select(
        "__g",
        (
            ((F.col("__ct") + 1) / F.lit(denom_t))
            / ((F.col("__cs") + 1) / F.lit(denom_s))
        ).alias("__ratio"),
    )
    scored = (
        g_corpus.join(F.broadcast(ratios), on="__g", how="left")
        .select(
            "__id",
            F.log(F.coalesce(F.col("__ratio"), F.lit(oov_ratio))).alias(
                "__lw"
            ),
        )
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("__lw").alias("__w"),
        )
    )
    return (
        corpus.select(F.col(id_col))
        .join(scored, corpus[id_col] == scored["__id"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.round(F.coalesce(F.col("__w"), F.lit(0.0)), round_digits).alias(
                "weight"
            ),
        )
    )


def resample_by_source(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Mixture weighting with UP-sampling: rates above 1.0 repeat rows
    (epoch repetition — what a temperature-balanced mix needs when the
    rare source's target share exceeds its natural share). Each row
    becomes ``floor(rate)`` guaranteed copies plus one extra decided
    by the same salted id hash as :func:`subsample_by_source` (so for
    rates ≤ 1.0 the kept set is IDENTICAL to the down-sampling
    operator's). Output adds ``copy_no`` (0-based) — distinct
    (id, copy_no) keys keep downstream shuffles well-defined.

    Pure map-side: one ``explode(sequence(...))`` per row, no shuffle,
    no rand(); re-running yields the same physical mix, which is what
    makes checkpoint-resumable training-data builds possible."""
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
    # whole-copy counts and fractional thresholds are computed on the
    # DRIVER with the exact same Python round() as subsample_by_source
    # (banker's) — F.round is HALF_UP, and a rate whose frac*BUCKETS
    # lands on a half-integer (e.g. 0.00025) would otherwise keep a
    # DIFFERENT set than the down-sampling operator, breaking the
    # documented rates<=1.0 identity
    def _split(rate: float) -> tuple[int, int]:
        whole = int(math.floor(float(rate)))
        return whole, int(round((float(rate) - whole) * SPLIT_BUCKETS))

    d_whole, d_thresh = _split(default_rate)
    whole_expr = F.lit(d_whole).cast("long")
    thresh_expr = F.lit(d_thresh).cast("long")
    for src, rate in sorted(rates.items()):
        w, t = _split(rate)
        whole_expr = F.when(F.col(source_col) == src, F.lit(w)).otherwise(
            whole_expr
        )
        thresh_expr = F.when(F.col(source_col) == src, F.lit(t)).otherwise(
            thresh_expr
        )
    staged = df.withColumns(
        {
            "__whole": whole_expr.cast("long"),
            "__frac_keep": bucket < thresh_expr.cast("long"),
        }
    )
    n_copies = (
        F.col("__whole") + F.col("__frac_keep").cast("long")
    ).cast("int")
    return (
        staged.filter(n_copies > 0)
        .withColumn("copy_no", F.explode(F.sequence(F.lit(0), n_copies - 1)))
        .drop("__whole", "__frac_keep")
    )


def cap_per_group(
    df: DataFrame,
    cap: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "cap",
    margin: float = 1.3,
) -> DataFrame:
    """Hard frequency cap: keep at most ``cap`` rows per group,
    chosen by a deterministic salted id hash (web pipelines cap pages
    per domain exactly this way — reproducibly, not with rand()).

    Semantically identical to ``row_number() OVER (PARTITION BY group
    ORDER BY hash, id) <= cap`` — but that plan sorts EVERY row of
    every group, and at 100 TB the hot domains make it a skewed
    monster sort. This is the two-phase version:

    1. group counts (one partial agg, domains-sized result);
       groups at/under cap pass through with NO sort at all;
    2. over-cap groups are prefiltered to ``h < 2^60*margin*cap/n`` —
       a uniform-hash prefix, so the survivors (~margin*cap rows per
       group) contain the exact top-``cap`` whenever at least ``cap``
       survive, which a per-group survivor count verifies; the rare
       undershoot group (hash fluctuation beyond ``margin``) falls
       back to ranking its full rows.

    The window sort therefore touches O(domains * margin * cap) rows
    instead of the whole corpus, and the result is bit-identical to
    the naive plan.
    """
    if cap < 0:
        raise ValueError("cap must be >= 0")
    cols = df.columns
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    over = counts.filter(F.col("_n") > cap)
    hdf = df.withColumn("_h", h)
    under_rows = hdf.join(
        F.broadcast(over.select(group_col)), group_col, "left_anti"
    ).select(*cols)
    over_rows = hdf.join(F.broadcast(over), group_col)
    # survivors: uniform-hash prefix sized ~margin*cap (h < 2^60 * frac)
    thr = F.floor(
        F.lit(float(2**60) * margin * cap) / F.col("_n")
    ).cast("long")
    surv = over_rows.filter(F.col("_h") < thr)
    surv_ok = (
        surv.groupBy(group_col)
        .agg(F.count("*").alias("_ns"))
        .filter(F.col("_ns") >= cap)
        .select(group_col)
    )
    ranked_input = surv.join(F.broadcast(surv_ok), group_col).unionByName(
        # undershoot fallback: rank the full group (rare by margin)
        over_rows.join(F.broadcast(surv_ok), group_col, "left_anti")
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    kept_over = (
        ranked_input.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .select(*cols)
    )
    return under_rows.unionByName(kept_over)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    by: str | None = None,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep the
    ``k`` rows (per ``by`` group if given, else globally) won by the
    Efraimidis–Spirakis exponential race — each row draws
    ``u ~ Uniform(0,1]`` from a salted md5 of its id and races with
    key ``ln(u) / weight``; the k LARGEST keys are exactly a weighted
    sample without replacement. No ``rand()``: re-running, resharding,
    or resuming yields the same sample, which is what makes
    training-data builds reproducible.

    Scale shape: the key is one codegen projection. The global path is
    ``ORDER BY key LIMIT k`` — Spark plans TakeOrderedAndProject
    (per-partition top-k, then a k-sized merge), never a full sort.
    The per-group path windows only because each group's output is
    bounded by k. Rows with weight <= 0 or NULL can never win a race
    and are filtered up front (documented ES domain).

    Float caveat: keys are doubles, so an engine replaying the same
    formula (the DuckDB oracle does) agrees on the selected SET
    because 60-bit hash gaps dwarf double rounding; don't hash the raw
    key values across engines, only the selected rows."""
    if k <= 0:
        raise ValueError("k must be > 0")
    u = (
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
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**60))
    key = F.log(u) / F.col(weight_col).cast("double")
    staged = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__wkey", key)
    )
    if by is None:
        return staged.orderBy(
            F.col("__wkey").desc(), F.col(id_col)
        ).limit(k).drop("__wkey")
    w = Window.partitionBy(by).orderBy(F.col("__wkey").desc(), F.col(id_col))
    return (
        staged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__wkey", "__rn")
    )


def length_bucket_batches(
    df: DataFrame,
    batch_size: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batch assignment: round each document's token
    count up to a power of two ("bucket"), then number fixed-size
    batches WITHIN each bucket — the standard padding-waste
    minimization for sequence training (batching similar lengths
    together means padding to the bucket bound instead of the corpus
    max). Returns (id, n_tokens, bucket, batch_no, pad_tokens) where
    ``pad_tokens = bucket - n_tokens`` is the per-doc padding cost.
    Token-less documents are excluded (nothing to batch).

    Scale shape: the bucket is an integer bit-length projection (no
    float log2); batch numbering uses the range-partition +
    broadcast-offset ``grouped_rank`` — per-bucket ranks without
    funneling a bucket through one window task. Deterministic: ranks
    order by id, so re-runs produce identical batches."""
    if batch_size <= 0:
        raise ValueError("batch_size must be > 0")
    from ukis_h3cellstore_spark.ops.robust import grouped_rank

    n_tok = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(tokens(text_col)))
    base = (
        df.select(F.col(id_col), n_tok.cast("long").alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "bucket",
            F.when(F.col("n_tokens") <= 1, F.lit(1).cast("long")).otherwise(
                F.expr(
                    "shiftleft(cast(1 as bigint),"
                    " length(bin(n_tokens - 1)))"
                ).cast("long")
            ),
        )
    )
    ranked = grouped_rank(base, "bucket", [F.col(id_col)], out_col="__rk")
    return ranked.select(
        F.col(id_col),
        "n_tokens",
        "bucket",
        F.expr(f"(__rk - 1) div {int(batch_size)}").cast("long").alias(
            "batch_no"
        ),
        (F.col("bucket") - F.col("n_tokens")).alias("pad_tokens"),
    )


def batch_padding_stats(
    df: DataFrame,
    batch_size: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(bucket, batch) padding report for
    :func:`length_bucket_batches`: (bucket, batch_no, n_docs,
    total_tokens, padded_tokens, waste_milli) where ``padded_tokens =
    bucket * n_docs`` and ``waste_milli = 1000 * (padded - total) div
    padded`` — integer-exact so every engine agrees."""
    b = length_bucket_batches(df, batch_size, text_col, id_col)
    return (
        b.groupBy("bucket", "batch_no")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .withColumn("padded_tokens", F.col("bucket") * F.col("n_docs"))
        .withColumn(
            "waste_milli",
            F.expr(
                "(1000 * (padded_tokens - total_tokens)) div padded_tokens"
            ),
        )
    )


def token_budget_allocation(
    counts: DataFrame,
    budget: int,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Integer water-filling of a global token ``budget`` across
    sources: sources smaller than the waterline keep every token;
    the rest are capped at the common waterline λ chosen so the total
    fits the budget — the standard fair rebalancing when one crawl
    dwarfs the others. Input is the sources-sized count table; output
    adds ``alloc`` (tokens granted).

    Exact integer semantics (engine-portable, no float shares): sort
    sources by (tokens, source) ascending; for position j with
    exclusive prefix sum ``p_j`` over k sources, the candidate line is
    ``λ_j = (budget - p_j) div (k - j + 1)``; the waterline is λ at
    the FIRST j whose source exceeds it (every earlier source fits
    whole; every later one is at least as big, hence capped). No such
    j → the budget covers everything. The whole computation is
    relational over the sources-sized table (windows over metadata,
    not the corpus)."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    w_ord = Window.orderBy(F.col(tokens_col).asc(), F.col(source_col).asc())
    staged = counts.select(source_col, tokens_col).withColumns(
        {
            "__j": F.row_number().over(w_ord),
            "__p": F.coalesce(
                F.sum(tokens_col).over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
            "__k": F.count(F.lit(1)).over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        }
    )
    lam_j = F.expr(f"({int(budget)} - __p) div (__k - __j + 1)")
    flagged = staged.withColumn("__lam", lam_j).withColumn(
        "__over", F.col(tokens_col) > F.col("__lam")
    )
    line = flagged.filter(F.col("__over")).agg(
        F.min_by(F.col("__lam"), F.col("__j")).alias("__line")
    )
    return (
        flagged.crossJoin(F.broadcast(line))
        .withColumn(
            "alloc",
            F.when(
                F.col("__line").isNull(), F.col(tokens_col).cast("long")
            ).otherwise(F.least(F.col(tokens_col).cast("long"), F.col("__line"))),
        )
        .select(source_col, tokens_col, "alloc")
    )


def token_budget_mix(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "tb",
) -> DataFrame:
    """Budget-bounded corpus mix: water-fill a global token ``budget``
    across sources (:func:`token_budget_allocation`), then keep each
    source's documents in salted-hash order while the per-source
    running token total stays within its allocation — deterministic
    prefix truncation, the reproducible version of "sample each
    source down to its token share". Returns kept rows with
    (n_tokens, alloc, cum_tokens).

    Scale shape: the TEXT is tokenized exactly once — the (id, source,
    n_tokens) skeleton is checkpointed eagerly (doc-count-sized, not
    corpus-sized: three scalars per document), because the plan
    otherwise re-derives it for the source counts, the allocation's
    two references, the range sampling, the cumsum's offsets collect,
    and the final pass (~6 corpus re-tokenizations measured as a 14×
    slowdown at the 1M-doc smoke). The allocation is computed on the
    sources-sized count table (also checkpointed: it is re-read by
    two subplans); the per-source running totals come from the range-
    partition + broadcast-offset ``grouped_cumsum`` (no one-task
    source windows); the final keep test is a map-side comparison."""
    from ukis_h3cellstore_spark.ops.robust import grouped_cumsum

    n_tok = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(tokens(text_col)))
    base = (
        df.select(
            F.col(id_col),
            F.col(source_col),
            n_tok.cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .localCheckpoint(eager=True)
    )
    counts = base.groupBy(source_col).agg(
        F.sum("n_tokens").alias("__src_tokens")
    ).localCheckpoint(eager=True)
    alloc = token_budget_allocation(
        counts, budget, source_col=source_col, tokens_col="__src_tokens"
    ).select(source_col, "alloc")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    ordered = base.withColumn("__h", h)
    cum = grouped_cumsum(
        ordered,
        source_col,
        [F.col("__h"), F.col(id_col)],
        "n_tokens",
        out_col="cum_tokens",
    )
    return (
        cum.join(F.broadcast(alloc), on=source_col)
        .filter(F.col("cum_tokens") <= F.col("alloc"))
        .select(id_col, source_col, "n_tokens", "alloc", "cum_tokens")
    )


def split_by_group(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "gsplit",
) -> DataFrame:
    """Train/val/test assignment with GROUP integrity: the split is a
    salted hash of the GROUP key (domain, author, user), so every row
    of a group lands in the same split — the leak-proof variant of
    :func:`split_by_hash` (random row-level splits put near-identical
    pages of one domain on both sides of the train/test fence, which
    inflates eval; scikit-learn's GroupShuffleSplit exists for exactly
    this reason). Same bucket arithmetic and insertion-order carving
    as split_by_hash; fractions are of GROUPS, not rows."""
    return split_by_hash(df, weights, id_col=group_col, salt=salt)


def balanced_sample_by_group(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    salt: str = "bal",
    buckets: int = 1 << 20,
) -> DataFrame:
    """Group-balanced downsampling flags: keep each row with
    probability ``n_min / n_group`` (the smallest group keeps
    everything), so every group's EXPECTED surviving size equals the
    smallest group's — the uniform-across-clusters / topic-rebalancing
    mix (temperature τ→0 at the group level, but exactly computable
    and integer-decided). Appends (n_group, keep); deciding by a
    salted id-hash bucket keeps the sample reproducible and
    incremental (same id ⇒ same verdict on re-runs), and the keep
    test ``bucket · n_group < n_min · buckets`` is pure integer
    arithmetic — engine-exact, no float rates.

    Scale shape: one groups-sized count aggregate broadcast back plus
    a 1-row min; the verdict is a map-side projection."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_group"))
    n_min = counts.agg(F.min("n_group").alias("__mn"))
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt), F.lit("|"), F.col(id_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(buckets)
    )
    return (
        df.join(F.broadcast(counts), on=group_col)
        .crossJoin(F.broadcast(n_min))
        .withColumn(
            "keep",
            bucket * F.col("n_group") < F.col("__mn") * F.lit(buckets),
        )
        .drop("__mn")
    )
