"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (100 TB):

- **exact**: one hash-aggregate over the corpus; the canonical id per
  group is min(id) — deterministic and mergeable (map-side combine).
- **n-gram Jaccard**: shingle → explode → self-join on shingle →
  per-pair intersection counts → Jaccard. The shingle join is the
  classic "inverted index" pattern: it shuffles on the shingle hash,
  never materializes the O(n²) pair space, and hot shingles can be
  dropped by document frequency (``max_shingle_df``) — the standard
  spam-shingle guard at corpus scale.
- **MinHash+LSH**: k affine scrambles of one md5-derived base hash
  (one-hash-k-permutations, as in Spark MLlib) aggregated
  with ``min`` in one pass, then candidate pairs via equality joins on banded
  signature tuples (r rows per band). Only bucket-colliding pairs are
  compared — sub-quadratic, shuffle keyed on small band tuples.
- **SimHash**: 16-bit sign-aggregated fingerprint in one groupBy;
  hamming-0 groups join on exact fingerprint equality, hamming-k
  pairs via banded-XOR LSH (pigeonhole over max_hamming+1 strips)
  with an inline exact bit_count verification.

All of it is JVM-side expression work — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ukis_h3cellstore_spark.ops.text import tokens


def _hash64(col: Column, salt: str = "") -> Column:
    base = F.concat(F.lit(salt), F.lit("|"), col) if salt else col
    return F.conv(F.substring(F.md5(base), 1, 15), 16, 10).cast("long")


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalize: bool = True
) -> DataFrame:
    """Exact duplicate groups by content hash: (content_hash,
    canonical_id, n_dups). Normalization lowercases + trims."""
    content = F.lower(F.trim(F.col(text_col))) if normalize else F.col(text_col)
    return (
        df.select(F.md5(content).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(F.col(id_col)).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def shingle_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    spread: bool | None = None,
) -> DataFrame:
    """Distinct k-word shingles per document: (id, shingle).

    The token array is materialized in its OWN projection before the
    shingle transform: referencing ``tokens(text)`` directly inside
    the per-slot slice lambda re-inlines the regex split into every
    slot (no common-subexpression elimination across lambda bodies),
    re-tokenizing each document ~n_tokens times — measured 10× slower
    at sf0.1."""
    # a small input (e.g. one parquet file) would run the whole
    # tokenize+shingle explode in a single task — round-robin the RAW
    # text across the cluster first (cheaper to shuffle than token
    # arrays). ``spread``: None = auto-detect from the source file
    # count (``df.inputFiles()`` — plan-safe, works on Spark Connect,
    # and a file-backed frame narrower than the cluster is exactly the
    # case the respread targets); True = always repartition (the
    # explicit knob for synthetic/derived inputs); False = never.
    src = df.select(F.col(id_col), F.col(text_col))
    par = None
    try:
        par = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no sparkContext
        pass
    if spread is None and par is not None:
        try:
            n_files = len(df.inputFiles())
        except Exception:
            n_files = 0
        # non-file-backed frames report 0 files: leave them alone
        spread = 0 < n_files < par
    if spread:
        src = src.repartition(par) if par else src.repartition()
    toks_df = src.select(F.col(id_col), tokens(text_col).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    # NB: Spark's sequence(1, 0) yields a DESCENDING [1, 0] — guard
    # short documents with an empty array instead
    shingles = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # distinctness is PER DOCUMENT, so array_distinct on the shingle
    # array does it row-locally — a .distinct() over the exploded rows
    # would add a full (id, shingle) shuffle for the same result
    return toks_df.select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1
    shingle: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥
    threshold. ``max_shingle_df`` drops shingles appearing in more
    documents than the cap (scale guard).

    The shingle table is checkpointed lazily: it feeds the size
    aggregation and BOTH sides of the inverted-index self-join, and
    without lineage truncation each reference re-runs the scan +
    tokenize + explode (Spark does not reuse the exchange across the
    differently-aliased sides). Materialize-once costs one shuffle
    write of the shingle rows; recompute costs three full scans."""
    sh = shingle_df(df, text_col, id_col, k).localCheckpoint(eager=False)
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(
            F.broadcast(hot.filter(F.col("df") > max_shingle_df).select("shingle")),
            on="shingle",
            how="left_anti",
        )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # NB: the per-document size table is O(corpus) rows — it must NOT
    # be broadcast (that would put the whole corpus' ids on every
    # executor). Plain shuffle joins on the id keep memory bounded;
    # `inter` is already grouped on the same keys so one side of each
    # join arrives pre-shuffled.
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, on="id_a")
        .join(sb, on="id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "n_common", "jaccard")


def lsh_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    min_est_jaccard: float = 0.25,
    threshold: float = 0.5,
) -> DataFrame:
    """The canonical two-stage near-dup pipeline: MinHash-LSH
    generates CANDIDATE pairs sub-quadratically, then each candidate
    is VERIFIED with the exact shingle-set Jaccard and kept only at
    ``jaccard >= threshold``: (id_a, id_b, n_common, jaccard).

    This is what production dedup runs (candidates cheap and
    recall-oriented, verification exact and precision-oriented): the
    expensive shingle-intersection join touches only the candidate
    pairs — |candidates| ≪ |docs|² — so a loose ``min_est_jaccard``
    buys recall without an all-pairs blowup. Both shingle joins
    shuffle on (id, shingle); the per-document size tables join by
    shuffle, never broadcast (they are O(corpus) rows)."""
    # ONE shingle materialization feeds signature computation, the
    # size agg, and both verify-join sides — without sharing, the
    # candidate stage re-scans + re-tokenizes the corpus for its own
    # shingle table (same no-exchange-reuse rationale as
    # ngram_jaccard_pairs, applied across the two stages)
    sh = shingle_df(df, text_col, id_col, k).localCheckpoint(eager=False)
    cand = minhash_lsh_pairs(
        df, text_col, id_col, k, num_hashes, band_size, min_est_jaccard,
        shingles=sh,
    ).select("id_a", "id_b")
    return verify_pairs_jaccard(cand, sh, id_col, threshold)


def verify_pairs_jaccard(
    cand: DataFrame,
    shingles: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact shingle-set Jaccard over an arbitrary candidate-pair
    table (``id_a``/``id_b``): (id_a, id_b, n_common, jaccard ≥
    threshold). The verification backend shared by every two-stage
    dedup pipeline — candidates can come from MinHash-LSH, SimHash
    bands, or embedding buckets; the verify cost only ever touches
    |candidates|, not |docs|².

    ``shingles`` is the (id, shingle) table from :func:`shingle_df`
    (pass a lazily-checkpointed one when it also feeds the candidate
    stage). The intersection join shuffles on (id, shingle); the
    per-document size table joins by shuffle, never broadcast (it is
    O(corpus) rows)."""
    sh = shingles
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        cand.join(a, on="id_a")
        .join(b, on=["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, on="id_a")
        .join(sb, on="id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def embedding_verified_pairs(
    docs: DataFrame,
    embeddings: DataFrame,
    threshold: float = 0.3,
    cosine_threshold: float = 0.9,
    k: int = 3,
    num_tables: int = 4,
    num_planes: int = 6,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    text_col: str = "text",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cross-modal two-stage dedup: EMBEDDING-space LSH candidates
    (cheap, recall-oriented, catches paraphrase-level duplicates that
    shingle MinHash misses) verified by the exact TEXT shingle
    Jaccard: (id_a, id_b, cosine_sim, n_common, jaccard).

    Stage 1 is :func:`ops.similarity.embedding_dup_pairs` over the
    vector table; stage 2 re-keys the surviving pairs onto the
    document table (vec ids must equal doc ids, the paired-table
    convention) and runs :func:`verify_pairs_jaccard`. Both stages
    are sub-quadratic; nothing corpus-sized is broadcast."""
    from ukis_h3cellstore_spark.ops import similarity as _sim

    cand = _sim.embedding_dup_pairs(
        embeddings,
        threshold=cosine_threshold,
        num_tables=num_tables,
        num_planes=num_planes,
        id_col=vec_id_col,
        vec_col=vec_col,
    )
    sh = shingle_df(docs, text_col, doc_id_col, k)
    verified = verify_pairs_jaccard(
        cand.select("id_a", "id_b"), sh, doc_id_col, threshold
    )
    return verified.join(cand, on=["id_a", "id_b"]).select(
        "id_a", "id_b", "cosine_sim", "n_common", "jaccard"
    )


#: 31-bit prime of Spark MLlib's MinHashLSH — (a*x + b) % P stays
#: below 2^62, so the affine slot transforms never overflow a signed
#: 64-bit integer in either engine
MINHASH_PRIME = 2038074743


def _minhash_coeffs(slot: int) -> tuple[int, int]:
    """Deterministic per-slot affine coefficients drawn from an md5 of
    the slot index — NOT multiples of a shared constant: with
    ``a_i = i*a_1, b_i = i*b_1`` every slot is ``i * h_1(x) mod P``,
    the slot minima are strongly order-correlated, and est_jaccard
    overestimates ~2.5x (measured). ``a != 0`` keeps the transform a
    permutation mod P."""
    import hashlib

    d = hashlib.md5(f"minhash-slot-{slot}".encode()).hexdigest()
    a = int(d[:8], 16) % (MINHASH_PRIME - 1) + 1
    b = int(d[8:16], 16) % MINHASH_PRIME
    return a, b


def _hash64_slot(col: Column, slot: int) -> Column:
    """Signature-slot hash: ONE md5-derived base hash per shingle,
    scrambled per slot with an affine transform ``(a_i*x + b_i) % P``
    — the standard one-hash-k-permutations MinHash (what Spark MLlib's
    MinHashLSH computes). Naive ``h1 + i*h2`` double hashing is NOT
    used: its slots are positively correlated (the shingle minimizing
    h1 tends to minimize every slot), inflating est_jaccard ~2.5x
    (measured); the modular multiplication reorders the value space
    independently per slot.

    NOTE: canonical single-slot definition, used for parity docs and
    tests; ``minhash_signatures`` inlines the same math with the base
    hash materialized once per shingle (see its docstring)."""
    x = F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % F.lit(
        MINHASH_PRIME
    )
    a, b = _minhash_coeffs(slot)
    return (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_PRIME)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature columns m0..m{n-1}: per slot, the min
    md5-derived hash over the document's shingle set (one shared
    base digest, per-slot affine scrambles — see _hash64_slot).

    The base hash is materialized in its OWN projection before the
    aggregation: HashAggregate does NOT common-subexpression-eliminate
    across its aggregate input expressions, so min-agging
    ``_hash64_slot(shingle, i)`` directly evaluates the md5+conv once
    PER SLOT (measured 8x the hashing cost at 1M docs). After the
    projection each slot is two integer ops over the shared column.

    ``shingles`` lets a caller that ALSO needs the shingle table
    (e.g. :func:`lsh_verified_pairs`' exact verification) share one
    materialization instead of re-scanning + re-tokenizing the
    corpus."""
    sh = shingles if shingles is not None else shingle_df(df, text_col, id_col, k)
    base = sh.select(
        F.col(id_col),
        (
            F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("long")
            % F.lit(MINHASH_PRIME)
        ).alias("__x"),
    )
    aggs = []
    for i in range(num_hashes):
        a, b = _minhash_coeffs(i)
        aggs.append(
            F.min((F.lit(a) * F.col("__x") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(
                f"m{i}"
            )
        )
    return base.groupBy(id_col).agg(*aggs)


def minhash_band_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Banded MinHash rows (id, sig, band, band_key) — the shared
    substrate of the LSH self-join, the persisted index build, and
    incremental index queries. The signature table is checkpointed
    lazily: it feeds every band projection (and both sides of a
    self-join), and Spark does not reuse exchanges across
    differently-aliased consumers — unchecked, the plan re-ran the
    shingle explode + hashing + min-agg once per band per side
    (8 corpus scans at the 4-band default)."""
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes, shingles)
    msig = [f"m{i}" for i in range(num_hashes)]
    sig = sig.select(
        F.col(id_col).alias("id"),
        F.array(*[F.col(m) for m in msig]).alias("sig"),
    ).localCheckpoint(eager=False)
    n_bands = -(-num_hashes // band_size)  # ceil → remainder = short band
    band_parts = []
    for b in range(n_bands):
        lo = b * band_size
        width = min(band_size, num_hashes - lo)
        band_parts.append(
            sig.select(
                "id",
                "sig",
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|",
                    *[
                        F.element_at("sig", lo + j + 1).cast("string")
                        for j in range(width)
                    ],
                ).alias("band_key"),
            )
        )
    bands = band_parts[0]
    for p in band_parts[1:]:
        bands = bands.unionByName(p)
    return bands


def minhash_bucket_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    shingles: DataFrame | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate-volume pre-flight for the MinHash LSH join — the
    :func:`hamming_bucket_stats` twin on the banded-signature side:
    (band, band_key, n_docs, candidate_pairs, dropped) for every
    bucket with ≥2 members. ``candidate_pairs = C(n_docs, 2)`` is
    EXACT (the self-join generates precisely those pairs per bucket
    before the est-jaccard filter), so ``SUM(candidate_pairs)`` prices
    a :func:`minhash_lsh_pairs` run from one aggregation over the
    band rows — run it before committing a join on a corpus whose
    near-dup structure is unknown (a boilerplate-heavy crawl can put
    half the corpus in one bucket and the join at C(n/2, 2)).

    ``dropped`` marks buckets a ``max_bucket_size`` cap would skip.
    Unlike the hamming join's combination banding, an LSH bucket's
    pairs are NOT guaranteed to be caught by another band — a cap
    here trades RECALL for cost exactly like raising
    ``min_est_jaccard``; the stats make the trade visible."""
    bands = minhash_band_rows(
        df, text_col, id_col, k, num_hashes, band_size, shingles
    )
    return _bucket_stats_from_bands(bands, max_bucket_size)


def _bucket_stats_from_bands(
    bands: DataFrame, max_bucket_size: int | None = None
) -> DataFrame:
    """(band, band_key, n_docs, candidate_pairs, dropped) from
    already-built band rows — shared by :func:`minhash_bucket_stats`
    and the in-join pre-flight of :func:`minhash_lsh_pairs` so the
    guided path prices the SAME band frame it will join."""
    out = (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .withColumn(
            "candidate_pairs",
            F.expr("(n_docs * (n_docs - 1)) div 2").cast("long"),
        )
    )
    dropped = (
        F.lit(False)
        if max_bucket_size is None
        else F.col("n_docs") > F.lit(max_bucket_size)
    )
    return out.withColumn("dropped", dropped)


def guided_max_bucket_size(
    stats_df: DataFrame,
    pair_budget: int,
    policy: str = "tighten",
    requested: int | None = None,
) -> int | None:
    """Resolve the LARGEST ``max_bucket_size <= requested`` whose kept
    candidate volume (SUM of ``candidate_pairs`` over buckets with
    ``n_docs <= cap``) fits ``pair_budget`` — the MinHash analogue of
    :func:`guided_max_hamming`, consuming a
    :func:`minhash_bucket_stats` frame.

    Unlike the hamming side (where combination banding re-catches a
    capped bucket's pairs in another band), a dropped LSH bucket's
    pairs are gone unless another band independently collides them —
    tightening here is a RECALL trade, which is why the policy
    contract is identical and explicit: ``'tighten'`` returns the
    resolved cap (warning when even size-2 buckets blow the budget —
    a dup-saturated corpus — and returning 1, which drops every
    candidate); ``'fail'`` raises :class:`DensityBudgetExceeded`
    whenever the resolved cap differs from ``requested``
    (``requested=None`` = uncapped).

    One aggregation over the stats frame (grouped by bucket SIZE, so
    the collect is bounded by the number of distinct sizes — tens,
    not buckets); the cumulative fit is driver-side integer
    arithmetic."""
    if policy not in ("tighten", "fail"):
        raise ValueError(f"policy must be 'tighten' or 'fail', got {policy!r}")
    by_size = sorted(
        (int(r["n_docs"]), int(r["pairs"]))
        for r in stats_df.groupBy("n_docs")
        .agg(F.sum("candidate_pairs").cast("long").alias("pairs"))
        .collect()
    )
    return _resolve_bucket_cap(by_size, pair_budget, policy, requested)


def _resolve_bucket_cap(
    by_size: list[tuple[int, int]],
    pair_budget: int,
    policy: str = "tighten",
    requested: int | None = None,
) -> int | None:
    """The pure cumulative-fit of :func:`guided_max_bucket_size` —
    ``by_size`` is the ascending (bucket_size, total_pairs) histogram.
    Property-tested (hypothesis): the resolved cap's kept volume fits
    the budget, and the cap is MAXIMAL (admitting the next size would
    exceed it)."""
    total = 0
    best = 1  # cap below the smallest pairing bucket = no candidates
    over = False
    for n_docs, pairs in by_size:
        if requested is not None and n_docs > requested:
            break
        if total + pairs > pair_budget:
            over = True
            break
        total += pairs
        best = n_docs
    if not over:
        # every bucket within the requested range fits the budget —
        # the caller's cap (or uncapped) stands unchanged
        return requested
    if policy == "fail":
        raise DensityBudgetExceeded(
            f"predicted LSH candidate volume exceeds budget "
            f"{pair_budget} above max_bucket_size={best}; requested "
            f"{'uncapped' if requested is None else requested} "
            f"(size histogram: {by_size[:20]})"
        )
    if best == 1:
        import warnings

        warnings.warn(
            f"minhash bucket stats: even size-2 buckets exceed the "
            f"pair budget {pair_budget} (dup-saturated corpus); "
            "capping at 1 — NO candidates will be generated",
            UserWarning,
            stacklevel=2,
        )
    return best


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    min_est_jaccard: float = 0.5,
    shingles: DataFrame | None = None,
    max_bucket_size: int | None = None,
    pair_budget: int | str | None = None,
    policy: str = "tighten",
) -> DataFrame:
    """LSH candidate pairs: documents colliding in ≥1 band of the
    MinHash signature, with the estimated Jaccard (fraction of equal
    signature slots): (id_a, id_b, est_jaccard).

    Scale shape: signatures are computed ONCE (exchange reuse), bands
    unpivot to (id, band, band_key, sig-array) rows, and candidates
    come from a single self-equi-join on (band, band_key) — the bucket
    join shuffles on the band key, never the document corpus squared.
    The full signature ARRAY rides along on the band rows so
    ``est_jaccard`` is computed inline in the join output (zip_with
    slot comparison) instead of via two corpus-sized signature
    re-joins. When ``num_hashes`` is not divisible by ``band_size``,
    the remainder slots form a final short band (no silent recall
    loss).

    ``max_bucket_size`` drops band buckets larger than the cap before
    the self-join — the dense-corpus escape hatch. A dropped LSH
    bucket's pairs are recovered only if another band catches them
    (NOT guaranteed, unlike the hamming join's combination banding) —
    :func:`minhash_bucket_stats` reports exactly what a cap excludes.
    Default None = the historical exact-candidate behavior every gate
    pins.

    ``pair_budget`` arms the bucket-stats pre-flight (same contract
    as the simhash side's density probe, r12 verdict item #5): the
    EXACT candidate volume ``SUM C(n_docs, 2)`` is priced from one
    aggregation over the band rows BEFORE the self-join, and
    :func:`guided_max_bucket_size` resolves the cap —
    ``policy='tighten'`` lowers ``max_bucket_size`` to the largest
    value that fits (a visible recall trade), ``policy='fail'``
    raises :class:`DensityBudgetExceeded` instead of silently
    changing recall. ``'auto'`` sizes the budget as
    ``max(50·n_docs, 1e7)`` (one count job), mirroring
    :func:`guided_max_hamming`'s default."""
    bands = minhash_band_rows(
        df, text_col, id_col, k, num_hashes, band_size, shingles
    )
    checkpointed = False
    if pair_budget is not None:
        if pair_budget == "auto":
            pair_budget = max(50 * df.count(), 10_000_000)
        # bands feed the stats agg AND (below) the keep agg + both
        # join sides — truncate lineage once here
        bands = bands.localCheckpoint(eager=False)
        checkpointed = True
        max_bucket_size = guided_max_bucket_size(
            _bucket_stats_from_bands(bands),
            int(pair_budget),
            policy=policy,
            requested=max_bucket_size,
        )
    if max_bucket_size is not None:
        # three consumers of the exploded band rows (keep agg + both
        # join sides) — truncate lineage like the capped hamming path
        # (skipped when the budget pre-flight already materialized it:
        # a second localCheckpoint would store a redundant copy of the
        # exploded band rows in executor storage)
        if not checkpointed:
            bands = bands.localCheckpoint(eager=False)
        keep = (
            bands.groupBy("band", "band_key")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") <= max_bucket_size)
            .select("band", "band_key")
        )
        bands = bands.join(keep, on=["band", "band_key"], how="inner")

    left = bands.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "band_key"
    )
    right = bands.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "band_key"
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(num_hashes))
    return (
        left.join(right, on=["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .select("id_a", "id_b", "est_jaccard")
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components of the duplicate-pair graph:
    (node, component), where component is the MINIMUM node id
    reachable from the node — a deterministic canonical label, so a
    downstream "keep one doc per cluster" pass keeps min(id).

    Min-label propagation: every round each node takes the min of its
    own label and its neighbors' labels. Labels are monotone
    non-increasing, so the fixpoint is "zero rows changed" — measured
    EXACTLY by carrying each node's previous label through the same
    per-round aggregation (min over own-flagged rows) and counting
    ``new != old`` in a second, grouped-output-sized agg of the SAME
    job; no row-diff join, no numeric-only label-sum (node ids can be
    strings). Rounds needed = graph diameter; duplicate graphs from
    LSH / hash buckets are near-cliques of tiny diameter (2-4
    typical). Each round shuffles only (node, label) plus the edge
    list — never the pair space squared — and lineage is truncated
    per round with a localCheckpoint (an iterative plan otherwise
    grows super-linearly in Catalyst analysis time)."""
    sym = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionByName(
        pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    edges = sym.distinct().localCheckpoint(eager=True)  # reused every round
    # the first propagation round fused into initialization: labels
    # start at min(node, min(neighbor)) — one aggregation over the
    # edge list instead of an identity-label round plus a join round.
    # Checkpoints are LAZY: the convergence agg right after is the
    # action that materializes them, so each round costs ONE job, not
    # a materialize-job plus an agg-job.
    labels = (
        edges.select(
            F.col("src").alias("node"),
            F.least("src", "dst").alias("component"),
        )
        .groupBy("node")
        .agg(F.min("component").alias("component"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_rounds - 1):
        neigh = edges.join(
            labels.withColumnRenamed("node", "dst"), on="dst"
        ).select(
            F.col("src").alias("node"), "component", F.lit(False).alias("__own")
        )
        staged = (
            labels.withColumn("__own", F.lit(True))
            .unionByName(neigh)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("__own"), F.col("component"))).alias(
                    "__old"
                ),
            )
            .localCheckpoint(eager=False)
        )
        n_changed = staged.agg(
            F.count(F.when(F.col("component") != F.col("__old"), F.lit(1)))
        ).collect()[0][0]
        labels = staged.drop("__old")
        if n_changed == 0:
            break
    return labels


def duplicate_cluster_stats(
    pairs: DataFrame, src_col: str = "id_a", dst_col: str = "id_b"
) -> DataFrame:
    """Resolve the pair graph into duplicate clusters:
    (component, n_members, max_member). ``component`` doubles as the
    canonical (minimum) member id — the one a dedup pass would keep."""
    cc = connected_components(pairs, src_col, dst_col)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("node").alias("max_member"),
    )


def keep_best_per_cluster(
    pairs: DataFrame,
    meta: DataFrame,
    quality_col: str,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware duplicate resolution: resolve the near-duplicate
    pair graph into clusters and keep the HIGHEST-``quality_col``
    member of each (ties → smallest id) instead of the naive
    keep-first — the curation policy production pipelines actually
    want (e.g. keep the longest / highest-scoring page of a
    boilerplate family). Returns one row per multi-member cluster:
    (component, n_members, kept_id, kept_quality).

    Scale shape: components come from min-label propagation
    (:func:`connected_components` — never the pair space squared);
    the representative is a single partial-aggregating struct-min per
    component (``min(struct(-quality, id))`` — lexicographic struct
    ordering gives argmax-quality-with-smallest-id-ties without a
    window sort, and works for ANY orderable id type including
    strings; only ``quality_col`` must be numeric so its sign can be
    inverted), and ``meta`` is joined on the member id only (cluster
    membership is tiny relative to the corpus)."""
    cc = connected_components(pairs, src_col, dst_col)
    members = cc.join(
        meta.select(F.col(id_col), F.col(quality_col)),
        cc["node"] == meta[id_col],
    ).select("component", "node", quality_col)
    q_type = dict(members.dtypes)[quality_col]
    numeric = q_type in (
        "double",
        "float",
        "bigint",
        "int",
        "smallint",
        "tinyint",
    ) or q_type.startswith("decimal")
    if not numeric:
        raise TypeError(
            f"keep_best_per_cluster: quality_col {quality_col!r} must be "
            f"numeric (got {q_type!r}) — the argmax tie-break inverts its sign"
        )
    return (
        members.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min(
                F.struct(
                    (-F.col(quality_col)).alias("nq"),
                    F.col("node").alias("nid"),
                )
            ).alias("best"),
        )
        .select(
            "component",
            "n_members",
            F.col("best.nid").alias("kept_id"),
            (-F.col("best.nq")).alias("kept_quality"),
        )
    )


def decontaminate_flags(
    train: DataFrame,
    evalset: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: training documents sharing ≥1
    k-token shingle with ANY eval-set document: (train id,
    n_shared_shingles). The standard pre-training hygiene pass (e.g.
    the GPT-3 13-gram overlap filter), expressed as an inverted-index
    semi-join: distinct shingles per side, inner join on the shingle
    text, count per train doc. Shuffles on the shingle hash — the eval
    side is tiny in practice and broadcastable by AQE; never an
    all-pairs comparison. ``max_shingle_df`` drops boilerplate
    shingles by eval-side document frequency."""
    tr = shingle_df(train, text_col, id_col, k)
    ev = shingle_df(evalset, text_col, id_col, k).select("shingle").distinct()
    if max_shingle_df is not None:
        hot = (
            shingle_df(evalset, text_col, id_col, k)
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        ev = ev.join(hot, on="shingle", how="left_anti")
    return (
        tr.join(ev, on="shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    bits: int = 16,
) -> DataFrame:
    """Sign-aggregated SimHash fingerprint over shingle hashes:
    bit b set iff the count of shingles with hash-bit b set exceeds
    half the shingles. (id, simhash).

    The shingle hash is materialized in its OWN projection before the
    aggregation, same pattern as ``minhash_signatures``: the per-bit
    sums then read a shared long column instead of naming the md5
    expression ``bits`` times, keeping the plan's scaling with
    ``bits`` independent of whatever subexpression elimination the
    engine version applies inside HashAggregate (measured neutral on
    Spark 4.1, which already eliminates the duplicate md5; on engines
    without aggregate-input CSE it is the difference between 1 and
    ``bits`` digests per shingle)."""
    sh = shingle_df(df, text_col, id_col, k)
    base = sh.select(F.col(id_col), _hash64(F.col("shingle")).alias("__h"))
    h = F.col("__h")
    bit_sums = [
        F.sum(
            F.when(F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = base.groupBy(id_col).agg(*bit_sums)
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("long")
        )
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Documents sharing an identical SimHash (hamming-distance 0
    near-dup buckets): (simhash, canonical_id, n_docs) for buckets
    with ≥2 members."""
    s = simhash(df, text_col, id_col, k)
    return (
        s.groupBy("simhash")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    bits: int = 16,
    max_hamming: int = 3,
    clean_blocks: int | str = "auto",
    max_bucket_size: int | None = None,
    pair_budget: int | str | None = None,
    density_policy: str = "tighten",
) -> DataFrame:
    """ALL pairs with SimHash hamming distance ≤ ``max_hamming``:
    (id_a, id_b, hamming) with id_a < id_b — exact, not approximate.

    ``pair_budget`` arms the density pre-flight, same contract as
    ``ops.multimodal.phash_dup_pairs``: :func:`hamming_density_probe`
    predicts the true pair volume from a bounded sample and
    ``max_hamming`` is tightened to the largest threshold whose
    prediction fits (``"auto"`` = ``max(50·n, 1e7)``;
    ``density_policy='fail'`` raises instead). Default None keeps the
    unguarded behavior the fixed-threshold gates pin.

    Candidates come from :func:`hamming_pairs`' combination banding
    (``clean_blocks='auto'``: the classic max_hamming+1 strip split
    while the strip key space stays selective, deeper C(b, c) block-
    combination tables when it saturates); ``bit_count(xor)`` verifies
    the exact distance inline. The shuffle is keyed on (band, packed
    block values), never the corpus squared; ``max_bucket_size`` is
    the dense-regime escape hatch (:func:`hamming_bucket_stats`
    reports what a cap dropped).

    The fingerprint table is checkpointed before fanning out (under
    the default ``clean_blocks='auto'`` the depth-resolution count
    inside :func:`hamming_pairs` materializes it at construction;
    with an explicit depth, the join's first action does): it feeds
    ``max_hamming + 1`` band projections on BOTH sides of the
    self-join, and without lineage truncation Catalyst re-executes
    the shingle-explode + bit-sum aggregation once per reference
    (measured 2x the whole query at sf0.1 with 4 strips).
    """
    s = simhash(df, text_col, id_col, k, bits).localCheckpoint(eager=False)
    if pair_budget is not None:
        max_hamming = guided_max_hamming(
            s,
            "simhash",
            id_col=id_col,
            requested=max_hamming,
            pair_budget=None if pair_budget == "auto" else pair_budget,
            policy=density_policy,
        )
    return hamming_pairs(
        s,
        fp_col="simhash",
        id_col=id_col,
        bits=bits,
        max_hamming=max_hamming,
        clean_blocks=clean_blocks,
        max_bucket_size=max_bucket_size,
    )


def _auto_clean_blocks(
    n: int, bits: int, max_hamming: int, cap: int = 1024
) -> int:
    """Pick the combination-banding depth ``c`` for an exact hamming
    self-join over ``n`` fingerprints: smallest ``c`` whose expected
    RANDOM-collision candidate volume ``C(d+c, c) / 2^(c·bits/(d+c))
    · n²/2`` fits ``max(50·n, 1e7)`` (candidates should scale with
    the corpus, not its square), else the largest ``c`` whose table
    count stays under ``cap``. c=1 is the plain pigeonhole split —
    what small corpora (every test SF) resolve to."""
    import math

    best = 1
    for c in range(1, 9):
        b = max_hamming + c
        if b > bits:
            break
        tables = math.comb(b, c)
        if tables > cap:
            break
        best = c
        slack = tables / 2 ** (c * bits // b)
        if slack * n * n / 2 <= max(50 * n, 1e7):
            break
    return best


def _hamming_bands(
    fp_df: DataFrame,
    fp_col: str,
    id_col: str,
    bits: int,
    max_hamming: int,
    clean_blocks: int | str,
) -> DataFrame:
    """(id, __fp, band, band_key) — one row per fingerprint per
    combination table (see :func:`hamming_pairs` for the scheme)."""
    if clean_blocks == "auto":
        c = _auto_clean_blocks(fp_df.count(), bits, max_hamming)
    else:
        c = int(clean_blocks)
        if c < 1:
            raise ValueError(f"clean_blocks must be >= 1, got {c}")
    n_blocks = max_hamming + c
    if n_blocks > bits:
        raise ValueError(
            f"max_hamming + clean_blocks = {n_blocks} exceeds bits = {bits}"
        )
    widths = [
        bits // n_blocks + (1 if i < bits % n_blocks else 0)
        for i in range(n_blocks)
    ]
    offsets = []
    lo = 0
    for w in widths:
        offsets.append(lo)
        lo += w

    def block_val(i: int):
        shifted = F.shiftrightunsigned(F.col(fp_col), offsets[i])
        if widths[i] >= 64:
            # full-width block (max_hamming=0, clean_blocks=1): the
            # mask literal 2^64-1 overflows a signed long — and no
            # mask is needed, the shift-by-0 already IS the value
            return shifted
        return shifted.bitwiseAND(F.lit((1 << widths[i]) - 1))

    import itertools

    combos = list(itertools.combinations(range(n_blocks), c))
    tables = []
    for t, combo in enumerate(combos):
        key = block_val(combo[0])
        for i in combo[1:]:
            key = F.shiftleft(key, widths[i]).bitwiseOR(block_val(i))
        tables.append(F.struct(F.lit(t).alias("band"), key.alias("band_key")))
    return fp_df.select(
        F.col(id_col).alias("id"),
        F.col(fp_col).alias("__fp"),
        F.explode(F.array(*tables)).alias("__t"),
    ).select("id", "__fp", "__t.band", "__t.band_key")


def hamming_bucket_stats(
    fp_df: DataFrame,
    fp_col: str,
    id_col: str = "doc_id",
    bits: int = 64,
    max_hamming: int = 3,
    clean_blocks: int | str = "auto",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Per-(band, band_key) population report: (band, band_key,
    n_prints, dropped) — the :func:`~ukis_h3cellstore_spark.ops.
    similarity.lsh_bucket_stats` twin for the hamming join. ``dropped``
    marks buckets a ``max_bucket_size`` cap would discard; run it
    alongside a capped pair query so a cap never truncates silently —
    with an EXPLICIT shared ``clean_blocks`` (under 'auto' each call
    counts and resolves the depth independently; checkpoint ``fp_df``
    so both see the same rows).
    A hot bucket here means MANY prints share those agreement blocks —
    the dense-fingerprint regime (docs/SCALE.md): unlike LSH, dropping
    one bucket only loses pairs whose EVERY other agreeing combination
    is also hot."""
    if max_bucket_size is not None and clean_blocks == "auto":
        import warnings

        warnings.warn(
            "hamming_bucket_stats(max_bucket_size=..., clean_blocks='auto'): "
            "'auto' resolves the banding depth from THIS call's fp_df count "
            "— a paired capped hamming_pairs call resolves its own, and if "
            "the source is non-checkpointed or its count drifts the stats "
            "describe a different banding than the join. Pass the same "
            "explicit clean_blocks int to both calls.",
            UserWarning,
            stacklevel=2,
        )
    bands = _hamming_bands(
        fp_df, fp_col, id_col, bits, max_hamming, clean_blocks
    )
    out = bands.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("n_prints")
    )
    dropped = (
        F.lit(False)
        if max_bucket_size is None
        else F.col("n_prints") > F.lit(max_bucket_size)
    )
    return out.withColumn("dropped", dropped)


def hamming_pairs(
    fp_df: DataFrame,
    fp_col: str,
    id_col: str = "doc_id",
    bits: int = 64,
    max_hamming: int = 3,
    clean_blocks: int | str = "auto",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Generic banded-XOR hamming join over ANY integer fingerprint
    column (SimHash, perceptual hashes, binary sketches): exact all
    pairs with distance ≤ ``max_hamming`` as (id_a, id_b, hamming).

    Candidate generation is COMBINATION BANDING (the block-permuted
    tables of Manku et al., WWW'07, "Detecting near-duplicates for
    web crawling", generalized): the fingerprint splits into
    ``b = max_hamming + clean_blocks`` near-equal blocks; ``d``
    differing bits ruin at most ``d`` blocks, so every qualifying
    pair agrees on some ``c = clean_blocks`` whole blocks — the
    self-join keys on the packed values of every C(b, c) block
    combination and ``bit_count(xor)`` verifies inline. ``c=1`` is
    the classic pigeonhole strip split; it saturates when
    ``2^(bits/(d+1))`` falls below the corpus size (d=8 over 64 bits
    → 7-bit keys → ~n/128-row buckets → an n²/128 pair explosion at
    1M fingerprints — measured, docs/SCALE.md). Deeper ``c`` widens
    the agreement key to ``c·bits/b`` bits at the cost of C(b, c)-way
    row replication: candidates stay ~linear in n while the
    replication grows polynomially — the honest envelope is d ≲ 8 on
    64-bit prints; beyond that, use a wider fingerprint or a
    recall-bounded LSH.

    ``clean_blocks='auto'`` (default) counts ``fp_df`` and picks the
    smallest sufficient depth (:func:`_auto_clean_blocks`) — at every
    test SF that resolves to the c=1 strip split. ANY depth returns
    the same exact result set (supersets differ, the verified output
    doesn't), so the knob is purely physical. NOTE: 'auto' resolves
    at CONSTRUCTION time — building the DataFrame runs one count job
    (materializing a checkpointed ``fp_df``); pass an explicit
    ``clean_blocks`` int for fully-lazy construction (plan-only
    tooling, conditional execution), and pass the SAME int to
    :func:`hamming_bucket_stats` when pairing the two so both
    describe one banding. Callers should checkpoint ``fp_df`` — it
    feeds the count and both join sides.

    ``max_bucket_size`` drops (band, band_key) buckets larger than
    the cap before the self-join — the explicit RECALL-for-cost
    escape hatch for the dense-fingerprint regime, where the TRUE
    pair set is itself quadratic and exactness IS the explosion
    (docs/SCALE.md). Default None = exact (what every gate pins). A
    dropped bucket loses only pairs whose every other agreeing
    combination is also hot; :func:`hamming_bucket_stats` reports
    exactly what a cap excluded — no silent truncation."""
    bands = _hamming_bands(
        fp_df, fp_col, id_col, bits, max_hamming, clean_blocks
    )
    if max_bucket_size is not None:
        # the capped path reads the bands frame THREE times (the keep
        # aggregate + both self-join sides); without lineage truncation
        # the C(b,c)-way explode over fp_df re-executes per consumer —
        # at c=4 that is 495 tables rebuilt twice more even when fp_df
        # itself is checkpointed. Same lazy-localCheckpoint fix as
        # _topk_per_list_gemm's c_lists.
        bands = bands.localCheckpoint(eager=False)
        keep = (
            bands.groupBy("band", "band_key")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") <= max_bucket_size)
            .select("band", "band_key")
        )
        bands = bands.join(keep, on=["band", "band_key"], how="inner")

    left = bands.select(
        F.col("id").alias("id_a"), F.col("__fp").alias("fp_a"), "band", "band_key"
    )
    right = bands.select(
        F.col("id").alias("id_b"), F.col("__fp").alias("fp_b"), "band", "band_key"
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        left.join(right, on=["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


class DensityBudgetExceeded(RuntimeError):
    """Raised by :func:`guided_max_hamming` (policy='fail') when the
    probe predicts a pair volume over budget even after tightening."""


def hamming_density_probe(
    fp_df: DataFrame,
    fp_col: str,
    id_col: str = "doc_id",
    max_hamming: int = 8,
    sample_mod: int | None = None,
    target_sample: int = 2000,
    salt: str = "hdprobe",
) -> DataFrame:
    """Corpus-level fingerprint DENSITY pre-flight: a deterministic
    hash-sampled inter-print hamming distribution extrapolated to the
    full corpus — (hamming, sample_pairs_le, n_sample, n_total,
    predicted_pairs_le) for every distance 0..``max_hamming``,
    cumulative (``_le`` = at-or-below that distance).

    This is the :func:`hamming_bucket_stats` twin one level up: bucket
    stats describe ONE banding's bucket populations after the banding
    is chosen; the density probe predicts the TRUE pair volume before
    any join runs, so a caller can tighten ``max_hamming`` (or refuse
    to run) when the corpus sits in the dense-fingerprint regime where
    the exact pair set is itself quadratic (docs/SCALE.md: the 1M
    dense-print flagship smoke quarantined 58% of the corpus because
    nothing priced the threshold against the density).

    Mechanics: prints whose ``md5(salt|id)``-derived hash is ``0 mod
    sample_mod`` form the sample (``sample_mod=None`` → ``max(1,
    n // target_sample)``, one count job); the sample self-joins ALL
    pairs (O(s²) bounded by ``target_sample``, a broadcast
    nested-loop over ≲2·target_sample rows — the bounded cost IS the
    point), the per-distance histogram cumulates over a ≤65-row
    non-equi join, and ``predicted_pairs_le`` scales sample pairs by
    C(n,2)/C(s,2) in exact integer arithmetic (``div``, matching the
    DuckDB oracle bit-for-bit; NULL when the sample has <2 prints).
    Envelope: the integer product overflows past n ≈ 3e9 × 500k
    sample pairs — shrink ``target_sample`` for larger corpora.

    Callers should checkpoint ``fp_df``: it feeds the auto-mod count,
    the sample filter, and the n_total aggregate."""
    spark = fp_df.sparkSession
    if sample_mod is None:
        sample_mod = max(1, fp_df.count() // target_sample)
    samp = (
        fp_df.select(F.col(id_col).alias("__id"), F.col(fp_col).alias("__fp"))
        .filter(
            F.pmod(
                _hash64(F.col(id_col).cast("string"), salt), F.lit(sample_mod)
            )
            == 0
        )
        .localCheckpoint(eager=False)  # feeds both join sides + n_sample
    )
    a = samp.select(F.col("__id").alias("id_a"), F.col("__fp").alias("fp_a"))
    b = samp.select(F.col("__id").alias("id_b"), F.col("__fp").alias("fp_b"))
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("int")
    hist = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(ham.alias("__d"))
        .groupBy("__d")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    dists = spark.range(max_hamming + 1).select(
        F.col("id").cast("int").alias("hamming")
    )
    cum = (
        dists.join(hist, F.col("__d") <= F.col("hamming"), "left")
        .groupBy("hamming")
        .agg(
            F.coalesce(F.sum("__cnt"), F.lit(0))
            .cast("long")
            .alias("sample_pairs_le")
        )
    )
    totals = fp_df.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    scount = samp.agg(F.count(F.lit(1)).cast("long").alias("n_sample"))
    return cum.crossJoin(totals).crossJoin(scount).select(
        "hamming",
        "sample_pairs_le",
        "n_sample",
        "n_total",
        F.when(
            F.col("n_sample") >= 2,
            F.expr(
                "sample_pairs_le * ((n_total * (n_total - 1)) div 2) "
                "div ((n_sample * (n_sample - 1)) div 2)"
            ),
        )
        .cast("long")
        .alias("predicted_pairs_le"),
    )


def guided_max_hamming(
    fp_df: DataFrame,
    fp_col: str,
    id_col: str = "doc_id",
    requested: int = 8,
    pair_budget: int | None = None,
    policy: str = "tighten",
    **probe_kw,
) -> int:
    """Resolve the LARGEST ``max_hamming <= requested`` whose
    :func:`hamming_density_probe`-predicted pair volume fits
    ``pair_budget`` (default ``max(50·n, 1e7)`` — pairs should scale
    with the corpus, the same target :func:`_auto_clean_blocks` sizes
    candidates against).

    ``policy='tighten'`` returns the resolved threshold (0 with a
    ``UserWarning`` when even exact duplicates blow the budget — a
    dup-saturated corpus); ``policy='fail'`` raises
    :class:`DensityBudgetExceeded` whenever tightening would change
    the requested threshold, for pipelines where a silent recall
    change is worse than an abort. Collects ≤ requested+1 probe rows
    (metadata-sized); the probe itself is the only cluster work."""
    if policy not in ("tighten", "fail"):
        raise ValueError(f"policy must be 'tighten' or 'fail', got {policy!r}")
    rows = sorted(
        hamming_density_probe(
            fp_df, fp_col, id_col, max_hamming=requested, **probe_kw
        ).collect(),
        key=lambda r: r["hamming"],
    )
    n = rows[0]["n_total"] if rows else 0
    budget = pair_budget if pair_budget is not None else max(50 * n, 10_000_000)
    best = None
    for r in rows:
        pred = r["predicted_pairs_le"]
        if pred is not None and pred > budget:
            break
        best = r["hamming"]
    if best == requested:
        return requested
    if policy == "fail":
        raise DensityBudgetExceeded(
            f"predicted pair volume exceeds budget {budget} above "
            f"max_hamming={best}; requested {requested} "
            f"(n={n}, probe rows: "
            f"{[(r['hamming'], r['predicted_pairs_le']) for r in rows]})"
        )
    if best is None:
        import warnings

        warnings.warn(
            f"hamming density probe: even exact-duplicate pairs exceed "
            f"the budget {budget} (dup-saturated corpus, n={n}); "
            "tightening to max_hamming=0",
            UserWarning,
            stacklevel=2,
        )
        best = 0
    return best


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Asymmetric near-SUBSET detection: directed pairs (id_sub,
    id_super, containment) where ``containment = |A∩B| / |A|`` ≥
    threshold for A = the smaller-or-equal shingle set. Jaccard misses
    excerpts — a 100-word quote inside a 10k-word page has Jaccard
    ≈ 0.01 but containment ≈ 1.0 — and excerpt/quote duplication is a
    major leakage channel in web training corpora.

    Same inverted-index plan as :func:`ngram_jaccard_pairs` (shared
    checkpointed shingle table, shuffle-joined size tables, never a
    broadcast of O(corpus) rows); the direction is decided per pair
    (smaller set = the contained side, ties → lower id)."""
    sh = shingle_df(df, text_col, id_col, k).localCheckpoint(eager=False)
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(
            F.broadcast(hot.filter(F.col("df") > max_shingle_df).select("shingle")),
            on="shingle",
            how="left_anti",
        )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    sized = inter.join(sa, on="id_a").join(sb, on="id_b")
    smaller_is_a = F.col("n_a") <= F.col("n_b")
    out = sized.select(
        F.when(smaller_is_a, F.col("id_a")).otherwise(F.col("id_b")).alias("id_sub"),
        F.when(smaller_is_a, F.col("id_b")).otherwise(F.col("id_a")).alias("id_super"),
        "n_common",
        (
            F.col("n_common").cast("double")
            / F.least(F.col("n_a"), F.col("n_b"))
        ).alias("containment"),
    )
    return out.filter(F.col("containment") >= threshold)


def positional_shingle_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """POSITIONAL k-token shingles: (id, pos, sh) with ``pos`` the
    1-based token offset and ``sh`` a 60-bit md5-derived hash of the
    space-joined k-gram. Unlike :func:`shingle_df` repeats are KEPT —
    positions are the whole point (they let the span finder chain
    adjacent matches into maximal shared substrings). The token array
    is staged in its own projection for the same CSE reason
    (docs/SCALE.md "pitfalls"); the hash keeps the exploded table and
    the inverted-index shuffle 16 bytes wide instead of k words."""
    toks_df = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks_df.select(
        F.col(id_col), F.posexplode(grams).alias("pos0", "gram")
    ).select(
        F.col(id_col),
        (F.col("pos0") + 1).alias("pos"),
        _hash64(F.col("gram")).alias("sh"),
    )


def substring_span_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_span: int = 10,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact-substring duplication discovery (the Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better" shape,
    re-expressed relationally): for every document pair that shares a
    verbatim run of ≥ ``min_span`` consecutive tokens, report
    (id_a, id_b, max_span_tokens, n_spans) with id_a < id_b —
    ``max_span_tokens`` the longest shared run and ``n_spans`` the
    number of distinct alignment offsets carrying a qualifying run.

    Plan (reference suffix arrays are a single-machine construct; the
    distributed shape is an inverted index + diagonal chaining, the
    seed-and-extend idiom genomics uses at cluster scale):

    1. positional k-gram hashes — one narrow exploded table,
       checkpointed once, feeding BOTH join sides.
    2. inverted-index self-join on the hash (shuffle keyed on gram
       hash, never O(n²) pairs; ``max_shingle_df`` drops grams whose
       occurrence count exceeds the cap — the stop-phrase guard).
    3. a run of L shared tokens appears as L-k+1 consecutive ``pos_a``
       values at ONE alignment offset ``diag = pos_a - pos_b``:
       group by (id_a, id_b, diag) and find the longest consecutive
       run with the shuffle-free sorted-fold (array_sort + aggregate —
       no window sort; per-group rows are bounded by the shorter
       document's gram count).
    4. span = run + k - 1; keep diagonals with span ≥ ``min_span``,
       then one hash-agg per pair for the max/count.
    """
    sh = positional_shingle_df(df, text_col, id_col, k).localCheckpoint(
        eager=False
    )
    if max_shingle_df is not None:
        hot = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(
            F.broadcast(hot.filter(F.col("df") > max_shingle_df).select("sh")),
            on="sh",
            how="left_anti",
        )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("pos").alias("pos_a"), "sh")
    b = sh.select(F.col(id_col).alias("id_b"), F.col("pos").alias("pos_b"), "sh")
    matches = (
        a.join(b, on="sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", (F.col("pos_a") - F.col("pos_b")).alias("diag"), "pos_a"
        )
    )
    # longest consecutive run per diagonal: sorted positions folded
    # left-to-right — (prev, cur, best) carried through the array
    run = F.aggregate(
        F.array_sort(F.collect_list("pos_a")),
        F.struct(
            F.lit(-2).alias("prev"), F.lit(0).alias("cur"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev + 1, acc.cur + 1).otherwise(F.lit(1)).alias("cur"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev + 1, acc.cur + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    diag_spans = (
        matches.groupBy("id_a", "id_b", "diag")
        .agg((run + F.lit(k - 1)).alias("span"))
        .filter(F.col("span") >= min_span)
    )
    return diag_spans.groupBy("id_a", "id_b").agg(
        F.max("span").alias("max_span_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep_regex: str = "\\n+",
    out_sep: str = "\n",
    normalize: bool = True,
) -> DataFrame:
    """Corpus-wide segment (line / paragraph) deduplication with
    document reassembly — the C4/CCNet/RefinedWeb line-dedup stage:
    split every document on ``sep_regex``, keep only the globally
    FIRST occurrence of each distinct segment (order = (id, position),
    deterministic), and rebuild each document from its surviving
    segments in original order. Returns (id, text_clean, n_segments,
    n_kept).

    Scale shape: one shuffle keyed on the segment hash decides
    canonical occurrences (``min(struct(id, pos))`` — partial-agg
    friendly, so a boilerplate line repeated a billion times collapses
    map-side instead of flooding one reducer), one join back on the
    same key, and one per-document hash-agg whose sorted-fold
    reassembly needs no window sort. Nothing corpus-sized is ever
    broadcast or collected; per-group state is one (id, pos) pair for
    the canonical agg and one document's segments for the rebuild.
    ``normalize`` lowercases+trims the MATCH key only — the rebuilt
    text keeps original casing."""
    segs = (
        df.select(F.col(id_col), F.col(text_col))
        .select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep_regex)).alias(
                "pos", "seg"
            ),
        )
        .filter(F.trim(F.col("seg")) != "")
    )
    key = F.lower(F.trim(F.col("seg"))) if normalize else F.col("seg")
    segs = segs.withColumn("__key", F.md5(key))
    canon = segs.groupBy("__key").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias(
            "__first"
        )
    )
    kept = segs.join(canon, on="__key").withColumn(
        "__kept",
        (F.col(id_col) == F.col("__first.i")) & (F.col("pos") == F.col("__first.p")),
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.col("__kept").cast("long")).alias("n_kept"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("__kept"),
                    F.struct(F.col("pos").alias("p"), F.col("seg").alias("s")),
                )
            )
        ).alias("__segs"),
    )
    return rebuilt.select(
        F.col(id_col),
        F.array_join(
            F.transform(F.col("__segs"), lambda st: st["s"]), out_sep
        ).alias("text_clean"),
        "n_segments",
        "n_kept",
    )


def substring_span_extents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_span: int = 10,
    max_shingle_df: int | None = None,
    cut_min_id: int | None = None,
) -> DataFrame:
    """Like :func:`substring_span_pairs` but keeps the COORDINATES of
    each diagonal's first-longest qualifying run: (id_a, id_b, diag,
    span_tokens, a_start, a_end, b_start, b_end), token positions
    1-based inclusive. This is what a removal stage needs — the pair
    report says WHO shares text, the extents say WHERE to cut.

    Same inverted-index + diagonal-chaining plan; the sorted fold
    additionally carries the end position of the best run (updated
    exactly when a new best is set, so ties resolve to the FIRST
    maximal run in position order — deterministic and replayable by
    the windowed SQL oracle).

    ``cut_min_id`` restricts the CUT side: only extents with
    ``id_b >= cut_min_id`` are produced (identical to filtering the
    full output on that bound — cuts land on the higher id, so a pair
    whose higher id is below the bound can never contribute). For the
    incremental-ingest shape (a small batch offset above an
    established corpus) this shrinks the join's b-side from the whole
    corpus to the batch, which the planner can then broadcast — the
    corpus-side gram shuffle disappears (guide §3.1/§3.3)."""
    sh = positional_shingle_df(df, text_col, id_col, k).localCheckpoint(
        eager=False
    )
    if max_shingle_df is not None:
        hot = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(
            F.broadcast(hot.filter(F.col("df") > max_shingle_df).select("sh")),
            on="sh",
            how="left_anti",
        )
    b_src = (
        sh if cut_min_id is None else sh.filter(F.col(id_col) >= cut_min_id)
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("pos").alias("pos_a"), "sh")
    b = b_src.select(F.col(id_col).alias("id_b"), F.col("pos").alias("pos_b"), "sh")
    matches = (
        a.join(b, on="sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", (F.col("pos_a") - F.col("pos_b")).alias("diag"), "pos_a"
        )
    )
    best = F.aggregate(
        F.array_sort(F.collect_list("pos_a")),
        F.struct(
            F.lit(-2).alias("prev"),
            F.lit(0).alias("cur"),
            F.lit(0).alias("best"),
            F.lit(0).alias("bend"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev + 1, acc.cur + 1).otherwise(F.lit(1)).alias("cur"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev + 1, acc.cur + 1).otherwise(F.lit(1)),
            ).alias("best"),
            F.when(
                F.when(x == acc.prev + 1, acc.cur + 1).otherwise(F.lit(1))
                > acc.best,
                x,
            )
            .otherwise(acc.bend)
            .alias("bend"),
        ),
        lambda acc: F.struct(acc.best.alias("run"), acc.bend.alias("bend")),
    )
    ext = (
        matches.groupBy("id_a", "id_b", "diag")
        .agg(best.alias("__b"))
        .select(
            "id_a",
            "id_b",
            "diag",
            (F.col("__b.run") + F.lit(k - 1)).alias("span_tokens"),
            (F.col("__b.bend") - F.col("__b.run") + 1).alias("a_start"),
            (F.col("__b.bend") + F.lit(k - 1)).alias("a_end"),
        )
        .filter(F.col("span_tokens") >= min_span)
    )
    return ext.select(
        "id_a",
        "id_b",
        "diag",
        "span_tokens",
        "a_start",
        "a_end",
        (F.col("a_start") - F.col("diag")).alias("b_start"),
        (F.col("a_end") - F.col("diag")).alias("b_end"),
    )


def excise_shared_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_span: int = 10,
    max_shingle_df: int | None = None,
    cut_min_id: int | None = None,
) -> DataFrame:
    """The Lee et al. 2021 dedup ACTION: for every qualifying shared
    run, the lower-id document keeps its copy and the HIGHER-id
    document has the run's token range cut out; overlapping cuts
    merge via a per-token keep mask. Returns every document as
    (id, text_clean, n_tokens, n_cut) — untouched docs pass through
    with n_cut = 0.

    ``cut_min_id`` restricts BOTH the cut side and the rewritten
    output to documents with id >= the bound: byte-identical to
    ``excise_shared_spans(df).filter(id >= bound)`` (cuts land only
    on the higher id of a pair), but documents below the bound are
    never rewritten and the extents join's cut side shrinks to the
    batch — the incremental-ingest fast path.

    Scale shape: the extents stage is the inverted-index plan above;
    the rewrite is one per-document hash-agg of cut ranges (bounded by
    the doc's own diagonal count) joined LEFT onto the corpus, then a
    pure array projection (position-indexed keep mask, no explode of
    the token stream, no shuffle beyond the one cut-range agg)."""
    ext = substring_span_extents(
        df, text_col, id_col, k, min_span, max_shingle_df, cut_min_id
    )
    cuts = (
        ext.select(
            F.col("id_b").alias(id_col),
            F.struct(
                F.col("b_start").alias("s"), F.col("b_end").alias("e")
            ).alias("__cut"),
        )
        .groupBy(id_col)
        .agg(F.collect_list("__cut").alias("__cuts"))
    )
    toks_df = df.select(
        F.col(id_col), F.col(text_col).alias("__t")
    ).withColumn("__toks", tokens("__t"))
    if cut_min_id is not None:
        toks_df = toks_df.filter(F.col(id_col) >= cut_min_id)
    joined = toks_df.join(cuts, on=id_col, how="left")
    n = F.size("__toks")
    kept = F.filter(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda p: F.struct(
                p.alias("p"), F.element_at("__toks", p).alias("w")
            ),
        ),
        lambda s: ~F.exists(
            F.coalesce(
                F.col("__cuts"),
                F.array().cast("array<struct<s:int,e:int>>"),
            ),
            lambda c: s["p"].between(c["s"], c["e"]),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.array_join(F.transform(kept, lambda s: s["w"]), " ").alias(
            "text_clean"
        ),
        n.cast("long").alias("n_tokens"),
        (n - F.size(kept)).cast("long").alias("n_cut"),
    )


def build_minhash_index(
    df: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    num_buckets: int = 16,
) -> None:
    """Persist the corpus's banded MinHash rows as a BUCKETED catalog
    table keyed on (band, band_key) — the incremental-dedup index. The
    corpus-sized shuffle is paid ONCE here; every later batch query
    joins against the index without re-shuffling it (Spark reads the
    buckets in place — the index side plans Exchange-free, and only
    the new batch, by construction the small side, moves)."""
    from ukis_h3cellstore_spark import layout

    bands = minhash_band_rows(df, text_col, id_col, k, num_hashes, band_size)
    layout.write_bucketed(
        bands,
        ["band", "band_key"],
        table,
        num_buckets=num_buckets,
        sort_by=["band", "band_key"],
    )


def dedup_against_index(
    new_df: DataFrame,
    index_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Incremental near-dup screening: band the NEW batch with the
    same MinHash parameters and join it against the persisted index —
    (id_new, id_indexed, est_jaccard ≥ threshold). This is the
    day-2 shape of corpus dedup: the existing corpus never re-shuffles
    (bucketed index), the batch is the only moving side, and flagged
    ids feed whatever keep/drop policy the ingest applies. Ids present
    in both sides are ignored (a re-ingested document is not its own
    duplicate)."""
    spark = new_df.sparkSession
    idx = spark.table(index_table).select(
        F.col("id").alias("id_indexed"),
        F.col("sig").alias("sig_idx"),
        "band",
        "band_key",
    )
    nb = minhash_band_rows(
        new_df, text_col, id_col, k, num_hashes, band_size
    ).select(
        F.col("id").alias("id_new"), F.col("sig").alias("sig_new"), "band", "band_key"
    )
    est = F.aggregate(
        F.zip_with("sig_new", "sig_idx", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(num_hashes))
    return (
        nb.join(idx, on=["band", "band_key"])
        .filter(F.col("id_new") != F.col("id_indexed"))
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .select("id_new", "id_indexed", "est_jaccard")
        .distinct()
    )


def novelty_against_corpus(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-document NOVELTY of an incoming batch vs the established
    corpus: the fraction of the document's distinct k-shingles that
    appear nowhere in the corpus — (id, n_shingles, n_novel,
    novelty_milli) with ``novelty_milli = (1000 · n_novel) div
    n_shingles``. The incremental-crawl triage metric: near-zero
    novelty means the crawl is re-fetching known content (skip it
    BEFORE paying full dedup), high novelty means genuinely new text.
    Documents too short to form a shingle yield no row.

    Scale shape: the corpus side reduces to its DISTINCT shingle set
    once (one shuffle, vocabulary-sized output); the batch's shingles
    anti-join it keyed on the shingle — the same inverted-index
    semi-join plan as decontamination, never a pair explosion. Exact
    integer counts, engine-reproducible."""
    new_sh = shingle_df(new_df, text_col, id_col, k)
    corpus_sh = shingle_df(corpus_df, text_col, id_col, k).select(
        "shingle"
    ).distinct()
    totals = new_sh.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    novel = (
        new_sh.join(corpus_sh, on="shingle", how="left_anti")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_novel"))
    )
    return (
        totals.join(novel, on=id_col, how="left")
        .withColumn("n_novel", F.coalesce(F.col("n_novel"), F.lit(0)))
        .withColumn(
            "novelty_milli",
            F.expr("(1000 * n_novel) div n_shingles").cast("long"),
        )
    )


def bloom_membership_flags(
    corpus: DataFrame,
    keys: DataFrame,
    key_col: str = "text",
    bits: int = 16_384,
    n_hashes: int = 3,
) -> DataFrame:
    """Bloom-filter prefilter for membership/decontamination checks.

    The scale problem: testing a 100 TB corpus against a small eval
    set must NOT shuffle the corpus. A Bloom filter solves it: the
    eval side is reduced to a ``bits``-wide bitmap (built with one
    small aggregation, collected at KB size — metadata, the same
    driver-appropriate scale as the SQ8 codebook), and the corpus
    check is a single map-side projection against the bitmap literal:
    a row "passes" iff all ``n_hashes`` of its bit positions are set.
    No corpus-sized shuffle, no join — whole-stage codegen end to
    end.  The exact verify (if needed) then runs on the tiny passing
    subset, the same two-stage discipline as ``lsh_dedup_verified``.

    Determinism: positions are independent md5 slices
    (``md5(i + '|' + key)`` -> 10 hex chars -> mod ``bits``), exactly
    reproducible by any engine with md5 — no JVM-private hashing.

    Returns the corpus frame plus ``pass_bloom boolean`` (no rows
    dropped, so callers can count false positives against an exact
    check).  False-positive rate ~ (1-e^{-kn/m})^k; with the default
    16 Kbit / 3 hashes and a 1 000-key set, ~0.5 %.
    """
    if bits % 64 != 0:
        raise ValueError("bits must be a multiple of 64")

    def positions(col):
        return [
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(str(i)), F.lit("|"), col)), 1, 10
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(bits),
            )
            for i in range(n_hashes)
        ]

    # eval side -> distinct positions (<= bits rows) -> driver bitmap
    pos_rows = (
        keys.select(F.explode(F.array(*positions(F.col(key_col)))).alias("pos"))
        .distinct()
        .collect()
    )
    words = [0] * (bits // 64)
    for r in pos_rows:
        p = int(r["pos"])
        words[p >> 6] |= 1 << (p & 63)
    # signed 64-bit literals for the LongType array
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    bitmap = F.array(*[F.lit(w).cast("long") for w in words])

    cols = corpus.columns
    tmp = corpus.withColumn("_bloom", bitmap)
    for i, pc in enumerate(positions(F.col(key_col))):
        tmp = tmp.withColumn(f"_p{i}", pc)
    passed = F.expr(
        " AND ".join(
            f"((shiftright(_bloom[CAST(_p{i} DIV 64 AS INT)],"
            f" CAST(_p{i} % 64 AS INT)) & 1) = 1)"
            for i in range(n_hashes)
        )
    )
    return tmp.withColumn("pass_bloom", passed).select(*cols, "pass_bloom")


def minhash_estimate_error(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    min_est_jaccard: float = 0.25,
) -> DataFrame:
    """Estimator-quality audit for the MinHash pipeline: over the LSH
    candidate pairs, compare the SIGNATURE-estimated Jaccard against
    the exact shingle-set Jaccard and summarize the absolute error —
    the number that tells you whether ``num_hashes`` is adequate
    before you trust the estimate as a dedup threshold.

    Integer-exact: ``est_milli = (1000 * n_match) div H`` (n_match
    recovered exactly — est is an exact multiple of 1/H in binary),
    ``true_milli = (1000 * n_common) div (n_a + n_b - n_common)``,
    error ``|est - true|`` in milli; ONE summary row
    ``(n_pairs, mean_abs_err_milli, max_abs_err_milli)`` with the mean
    floor-divided. Candidates with no common shingle (possible only
    under raw hash collisions) follow the verify join's inner
    semantics on both engines.

    Scale shape: exactly the two-stage LSH pipeline's cost — one
    shared shingle materialization, banded candidate join, verify join
    over candidates only — plus a one-row reduction."""
    sh = shingle_df(df, text_col, id_col, k).localCheckpoint(eager=False)
    cand = minhash_lsh_pairs(
        df, text_col, id_col, k, num_hashes, band_size, min_est_jaccard,
        shingles=sh,
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        cand.select("id_a", "id_b")
        .join(a, on="id_a")
        .join(b, on=["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    joined = (
        cand.join(common, on=["id_a", "id_b"])
        .join(sa, on="id_a")
        .join(sb, on="id_b")
        .withColumn(
            "__nm", F.round(F.col("est_jaccard") * num_hashes).cast("long")
        )
        .withColumn(
            "__un", (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("long")
        )
        .withColumn(
            "__err",
            F.abs(
                F.expr(f"(1000 * __nm) div {int(num_hashes)}")
                - F.expr("(1000 * n_common) div __un")
            ),
        )
    )
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr("CAST(sum(__err) div count(1) AS BIGINT)").alias(
            "mean_abs_err_milli"
        ),
        F.max("__err").cast("long").alias("max_abs_err_milli"),
    )
