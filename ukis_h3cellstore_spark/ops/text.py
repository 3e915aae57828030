"""Text-analysis operators over a document table.

Everything here is pure ``pyspark.sql.functions`` — no Python UDFs —
so the operators whole-stage-codegen and scale linearly. Tokenization
convention shared with the DuckDB oracles: trim, split on ``\\s+``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: deterministic marker-word lists for the n-gram language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "und", "ein", "zu"],
    "fr": ["le", "la", "et", "un", "de"],
    "es": ["el", "la", "y", "un", "que"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "on", "for"]


def tokens(text_col: Column | str) -> Column:
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(col), r"\s+")


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality-scoring features: token count, char count, average token
    length, punctuation ratio, stopword ratio, and a deterministic
    composite quality score."""
    toks = tokens(text_col)
    n_tokens = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    n_chars = F.length(F.col(text_col))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(STOPWORDS))
    )
    out = df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        n_punct.alias("n_punct"),
        stop_hits.alias("n_stopwords"),
    ).withColumn(
        "punct_ratio",
        F.when(F.col("n_chars") > 0, F.col("n_punct").cast("double") / F.col("n_chars"))
        .otherwise(F.lit(0.0)),
    ).withColumn(
        "stopword_ratio",
        F.when(
            F.col("n_tokens") > 0,
            F.col("n_stopwords").cast("double") / F.col("n_tokens"),
        ).otherwise(F.lit(0.0)),
    ).withColumn(
        "quality_score",
        (
            F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0))
            - F.col("punct_ratio")
        ),
    )
    return out


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language heuristic: per-language hit counts over the
    token set; predicted language = argmax with lexicographic
    tiebreak (deterministic)."""
    toks = tokens(text_col)
    score_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        hits = F.size(F.filter(toks, lambda t: t.isin(markers)))
        score_cols.append(hits.alias(f"score_{lang}"))
    scored = df.select(F.col(id_col), *score_cols)
    # argmax with name tiebreak: fold over sorted languages
    langs = sorted(LANG_MARKERS)
    best_lang = F.lit(langs[0])
    best_score = F.col(f"score_{langs[0]}")
    for lang in langs[1:]:
        cond = F.col(f"score_{lang}") > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, F.col(f"score_{lang}")).otherwise(best_score)
    return scored.withColumn("predicted_lang", best_lang).withColumn(
        "predicted_score", best_score.cast("long")
    )


#: GPT-2-style pre-tokenization: letter runs, digit runs, punct runs
#: (portable between Java regex and RE2, so the oracle reproduces it)
PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Three token-count flavors per document:

    - ``n_tokens_ws``: whitespace tokens;
    - ``n_pieces_regex``: BPE-style *pre-tokens* (letter / digit /
      punctuation runs, the GPT-2 pre-tokenizer shape);
    - ``n_tokens_bpe``: subword estimate — each pre-token contributes
      ``ceil(len/4)`` pieces, a deterministic proxy for byte-pair
      merges.
    """
    toks = tokens(text_col)
    n_ws = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE), 0)
    bpe = F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
    )
    return df.select(
        F.col(id_col),
        n_ws.alias("n_tokens_ws"),
        F.size(pieces).alias("n_pieces_regex"),
        bpe.alias("n_tokens_bpe"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive document fingerprint: XOR of position-weighted
    40-bit token hashes (rolling-hash flavor; md5-derived so the DuckDB
    oracle reproduces it exactly)."""
    toks = tokens(text_col)
    hashed = F.transform(
        toks,
        lambda t, i: F.conv(F.substring(F.md5(t), 1, 10), 16, 10).cast("long")
        * ((i % 16) + 1),
    )
    fp = F.aggregate(
        hashed, F.lit(0).cast("long"), lambda acc, h: acc.bitwiseXOR(h)
    )
    return df.select(
        F.col(id_col),
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0).cast("long"))
        .otherwise(fp)
        .alias("fingerprint"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition metrics over token
    2-grams: (id, n_2grams, top_2gram_frac, dup_2gram_frac) — the
    fraction of 2-gram occurrences belonging to the most common
    2-gram, and to any 2-gram occurring more than once. High values
    flag boilerplate / TEMPLATE spam for a quality filter. Short
    documents (<2 tokens) report zero fractions.

    SHUFFLE-FREE: the metrics are per-document, so they never need a
    (doc, gram) exchange — the grams array is sorted in place and one
    sequential fold counts total/top-run/dup-run occurrences (run
    lengths of a sorted array ARE the gram counts). Entirely
    whole-stage codegen; the previous two-hash-agg + join formulation
    shuffled 50 gram-rows per document three times and ran ~6× slower
    at the 1M-doc smoke."""
    # token array materialized in its own projection (no CSE across
    # lambda bodies — same trap as shingle_df)
    base = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    grams = F.when(
        n >= 2,
        F.array_sort(
            F.zip_with(
                F.slice(toks, 1, n - 1),
                F.slice(toks, 2, n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = base.select(F.col(id_col), grams.alias("__grams"))
    # one pass over the sorted grams: run lengths = per-gram counts
    acc0 = F.struct(
        F.lit("\x00").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("top"),
        F.lit(0).cast("long").alias("dup"),
    )

    def step(acc, g):
        same = acc.prev == g
        closed_top = F.greatest(acc.top, acc.run)
        closed_dup = acc.dup + F.when(acc.run > 1, acc.run).otherwise(F.lit(0))
        return F.struct(
            g.alias("prev"),
            F.when(same, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.when(same, acc.top).otherwise(closed_top).alias("top"),
            F.when(same, acc.dup).otherwise(closed_dup).alias("dup"),
        )

    def finish(acc):
        return F.struct(
            F.greatest(acc.top, acc.run).alias("top"),
            (
                acc.dup + F.when(acc.run > 1, acc.run).otherwise(F.lit(0))
            ).alias("dup"),
        )

    folded = staged.select(
        F.col(id_col),
        F.size("__grams").cast("long").alias("n_2grams"),
        F.aggregate(F.col("__grams"), acc0, step, finish).alias("__s"),
    )
    return folded.select(
        F.col(id_col),
        "n_2grams",
        F.when(
            F.col("n_2grams") > 0,
            F.col("__s.top").cast("double") / F.col("n_2grams"),
        )
        .otherwise(F.lit(0.0))
        .alias("top_2gram_frac"),
        F.when(
            F.col("n_2grams") > 0,
            F.col("__s.dup").cast("double") / F.col("n_2grams"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_2gram_frac"),
    )


def token_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus token-frequency table: (token, freq, doc_freq) — total
    occurrences and distinct-document counts. The input to vocabulary
    construction / BPE seeding. One explode + one hash-agg; partial
    aggregation makes the shuffle carry only (token, partial counts),
    not the exploded rows."""
    toks = tokens(text_col)
    nonempty = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    return (
        nonempty.select(F.col(id_col), F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.count_distinct(F.col(id_col)).alias("doc_freq"),
        )
    )


def tfidf_topk(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document top-k keywords by smoothed tf-idf:
    ``score = tf * (ln((N+1)/(df+1)) + 1)`` (the sklearn smoothing, so
    corpus-wide terms still score > 0), rounded to 4 decimals BEFORE
    ranking so the cut is engine-reproducible; ties break on token
    text.  Returns (id, token, tf, doc_freq, score).

    Scale shape: term frequencies are one partial hash-agg on
    (doc, token); document frequencies reuse that table (one more
    token-keyed agg — never a second corpus scan); N is a scalar
    cross-joined in.  The per-document top-k window partitions on the
    doc id — the same key the tf agg already shuffled on, so AQE
    plans it without a second exchange."""
    toks = tokens(text_col)
    nonempty = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    tf = (
        nonempty.select(F.col(id_col), F.explode(toks).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "token",
            "tf",
            "doc_freq",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("doc_freq") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                4,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def vocab_topk(
    df: DataFrame, k: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k vocabulary by total frequency, deterministically ordered
    (freq DESC, token ASC — ties cannot reorder the cut). Spark plans
    the orderBy+limit as TakeOrderedAndProject: per-partition top-k
    then a single driver merge, never a global sort."""
    return (
        token_frequencies(df, text_col, id_col)
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(k)
    )


#: PII scrubbing patterns — deliberately simple character-class
#: regexes that parse identically under Java regex (Spark) and RE2
#: (DuckDB), so the operation is oracle-reproducible. Scrub order is
#: the list order: more specific shapes first (an IPv4 would
#: otherwise be consumed by the looser phone pattern).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"),
    ("phone", r"\+?[0-9][0-9()\-\. ]{7,}[0-9]"),
]


#: the Gopher/MassiveText stop-word list — a document must contain at
#: least ``min_stopword_hits`` DISTINCT of these to pass
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The Gopher (MassiveText) document-quality rule set as one
    codegen'd projection: per document, every rule's measured value
    plus the combined ``gopher_pass`` verdict. The published rules
    (word-count bounds, mean-word-length bounds, symbol-to-word
    ratio for ``#``/``...``, bullet-started and ellipsis-ended line
    fractions, alphabetic-word fraction, distinct-stop-word floor)
    are the standard first-stage web-corpus filter.

    All higher-order-function expressions over the split arrays — no
    shuffle, no Python; the operator is a map and pipelines into the
    downstream filter/agg."""
    t = F.col("__t")
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda w: F.length(w) > 0)
    n_words = F.size("__words").cast("long")
    sum_len = F.aggregate(
        "__words", F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    # try_divide: ANSI mode (Spark 4 default) raises on /0; an empty
    # document must yield NULL measurements and a False verdict
    mean_word_len = F.round(F.try_divide(sum_len, n_words), 6)
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = F.floor(
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    )
    symbol_ratio = F.round(F.try_divide(n_hash + n_ellipsis, n_words), 6)
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    bullet_frac = F.round(
        F.try_divide(
            F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[•\-\*]"))),
            n_lines,
        ),
        6,
    )
    ellipsis_frac = F.round(
        F.try_divide(
            F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))), n_lines
        ),
        6,
    )
    alpha_frac = F.round(
        F.try_divide(
            F.size(F.filter("__words", lambda w: w.rlike("[a-zA-Z]"))), n_words
        ),
        6,
    )
    stop_hits = F.size(
        F.array_intersect(
            F.transform("__words", F.lower),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    flags = df.select(
        F.col(id_col), F.col(text_col).alias("__t")
    ).withColumn("__words", words)
    out = flags.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.cast("int").alias("stopword_hits"),
    )
    gopher_pass = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stopword_hits") >= min_stopword_hits)
    )
    return out.withColumn("gopher_pass", gopher_pass)


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact common PII shapes from the text column: each match is
    replaced with ``<KIND>`` and per-kind match counts are reported:
    (id, text_scrubbed, n_email, n_phone, n_ipv4). Pure
    ``regexp_replace``/``regexp_count`` expressions — JVM-side,
    vectorized, linear in corpus size."""
    out = df.select(F.col(id_col), F.col(text_col).alias("__t"))
    counts = []
    scrubbed = F.col("__t")
    for kind, pat in PII_PATTERNS:
        counts.append(
            F.regexp_count(F.col("__t"), F.lit(pat)).cast("int").alias(f"n_{kind}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return out.select(
        F.col(id_col), scrubbed.alias("text_scrubbed"), *counts
    )


def length_percentile_cutoffs(
    df: DataFrame,
    lower: float = 0.05,
    upper: float = 0.95,
    length_col: str = "n_chars",
    part_col: str = "lang",
) -> DataFrame:
    """Per-group exact percentile cutoffs of a length column:
    (part_col, lo_cut, hi_cut). Deliberately NOT a window
    percent_rank over the corpus — ``percentile`` is a partial-
    aggregable function, so this is one small shuffled aggregate
    (bytes ~ n_groups) instead of a full per-group sort of 100 TB."""
    pct = F.percentile(F.col(length_col), F.array(F.lit(lower), F.lit(upper)))
    return df.groupBy(part_col).agg(
        pct[0].alias("lo_cut"), pct[1].alias("hi_cut")
    )


def length_percentile_filter(
    df: DataFrame,
    lower: float = 0.05,
    upper: float = 0.95,
    length_col: str = "n_chars",
    part_col: str = "lang",
) -> DataFrame:
    """Quality filter: keep documents whose length lies inside the
    per-group [lower, upper] percentile band — the standard
    outlier-trim of web-corpus curation (cf. Gopher's per-source
    length rules). Two-pass plan: tiny cutoff table (one row per
    group) broadcast back onto the corpus; the filter itself is
    map-side, no second shuffle, no window sort."""
    cuts = length_percentile_cutoffs(df, lower, upper, length_col, part_col)
    out = df.join(F.broadcast(cuts), on=part_col)
    return out.filter(
        F.col(length_col).cast("double").between(F.col("lo_cut"), F.col("hi_cut"))
    ).drop("lo_cut", "hi_cut")


def vocab_oov_report(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    part_col: str = "lang",
    approx: bool = False,
) -> DataFrame:
    """Out-of-vocabulary rate against the corpus's own top-``k``
    vocabulary, reported per group: (part_col, n_docs, total_tokens,
    oov_tokens, oov_rate). The vocab is k rows — broadcast; the token
    stream is never re-shuffled: explode → broadcast-hash left join →
    one aggregate. The measurement every tokenizer-budget decision
    needs before committing a vocab size.

    ``approx=True`` replaces the per-group exact ``countDistinct`` of
    doc ids — whose aggregation state is a distinct-id SET per group
    over the token-EXPLODED stream, the one unbounded-state piece of
    this report — with a HyperLogLog++ sketch (n_docs is descriptive
    here; the rates are ratios of exact token counts either way).
    Gates pin the exact form; divergence is test-bounded."""
    vocab = vocab_topk(df, k, text_col, id_col).select(
        F.col("token").alias("__v")
    )
    toks = tokens(text_col)
    exploded = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col), F.col(part_col), F.explode(toks).alias("__t")
    )
    flagged = exploded.join(
        F.broadcast(vocab), exploded["__t"] == F.col("__v"), "left"
    )
    n_docs = (
        F.approx_count_distinct(id_col, rsd=0.01)
        if approx
        else F.countDistinct(id_col)
    )
    return (
        flagged.groupBy(part_col)
        .agg(
            n_docs.cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("total_tokens"),
            F.sum(F.when(F.col("__v").isNull(), 1).otherwise(0)).alias(
                "oov_tokens"
            ),
        )
        .withColumn(
            "oov_rate",
            F.round(
                F.col("oov_tokens").cast("double") / F.col("total_tokens"), 6
            ),
        )
    )


def cross_source_duplicates(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    key: Column | None = None,
) -> DataFrame:
    """Which sources carry the same documents? Documents with the same
    identity ``key`` appearing in MORE than one source, counted per
    unordered source pair: (source_a, source_b, n_shared). The
    curation signal for mirror/scrape overlap between crawl dumps.
    ``key`` defaults to exact-text md5; pass e.g.
    ``F.md5(F.substring("text", 1, 80))`` for prefix/boilerplate
    keying or a shingle fingerprint for fuzzier identity.

    Plan: distinct (key, source) pairs first (map-side combine
    collapses per-source repeats), then a self-equi-join on the key.
    Join fan-out per key is bounded by the source count, not the
    duplicate count — safe at corpus scale."""
    if key is None:
        key = F.md5(F.col(text_col))
    hs = df.select(
        key.alias("__h"), F.col(source_col).alias("__s")
    ).distinct()
    a, b = hs.alias("a"), hs.alias("b")
    return (
        a.join(b, (F.col("a.__h") == F.col("b.__h")) & (F.col("a.__s") < F.col("b.__s")))
        .groupBy(
            F.col("a.__s").alias("source_a"), F.col("b.__s").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Shannon entropy (nats) of each document's character
    distribution: (id, n_chars, entropy). Low entropy flags repeated-
    character junk and boilerplate; implausibly high entropy flags
    random-looking noise — a standard cheap gibberish screen.

    Pure higher-order array expressions (split → sorted distinct →
    per-char count via filter → sequential fold), whole-stage-codegen,
    no shuffle, no UDF. The fold visits characters in SORTED order so
    the float sum is bit-reproducible across engines. Per-doc cost is
    O(distinct_chars × len); for natural-language documents
    distinct_chars is a small constant."""
    chars = F.split(F.col(text_col), "")
    uniq = F.array_sort(F.array_distinct(chars))
    n = F.size(chars)
    ent = -F.aggregate(
        uniq,
        F.lit(0.0),
        lambda acc, c: acc
        + (
            F.size(F.filter(chars, lambda x: x == c)).cast("double")
            / n.cast("double")
        )
        * F.log(
            F.size(F.filter(chars, lambda x: x == c)).cast("double")
            / n.cast("double")
        ),
    )
    return df.select(
        F.col(id_col),
        n.alias("n_chars"),
        F.when(n > 0, F.round(ent, 6)).otherwise(F.lit(0.0)).alias("entropy"),
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "norm_text",
) -> DataFrame:
    """Canonical text normalization for dedup keys and tokenizer
    pre-passes: lowercase, strip every non-alphanumeric character to a
    space, collapse whitespace runs, trim. The normalized form is what
    exact/fuzzy dedup should key on — raw text differs on punctuation
    and casing that carries no identity.

    Pure string expressions (whole-stage codegen, zero shuffle); the
    regex class is ASCII-explicit so Spark (Java regex) and any SQL
    oracle (POSIX-ish engines) agree byte-for-byte. ONE regex pass:
    ``[^a-z0-9]+ → ' '`` collapses punctuation AND whitespace runs
    together (equivalent to strip-then-collapse, measured ~2× faster
    at the 1M-doc smoke since regex cost dominates this operator)."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")
    )
    return df.select(F.col(id_col), norm.alias(out_col))


def boilerplate_chunk_stats(
    df: DataFrame,
    chunk_words: int = 8,
    min_doc_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RefinedWeb-style boilerplate removal, lifted to word-chunks
    (the driver corpus has no newlines, so fixed-``chunk_words``
    windows stand in for lines): a chunk occurring in at least
    ``min_doc_freq`` DISTINCT documents is boilerplate; per document
    report how much survives — (id, n_chunks, n_kept, kept_words).

    Plan shape (scale-first): tokenize → non-overlapping chunk
    explode (flatMap, no shuffle) → ONE hash-agg computing each
    chunk's distinct-document frequency (map-side combine on the
    md5 key) → shuffle join back on the chunk key → per-doc agg.
    Chunk frequency is corpus-sized, so it is NOT broadcast — the
    equi-join shuffles both sides on the chunk hash, the same
    discipline as ops/dedup.py's size tables."""
    toks = tokens(text_col)
    base = df.select(F.col(id_col).alias("__id"), toks.alias("__toks")).withColumn(
        "__n",
        F.when(F.length(F.concat_ws("", F.col("__toks"))) == 0, F.lit(0)).otherwise(
            F.size("__toks")
        ),
    )
    starts = F.when(
        F.col("__n") > 0, F.sequence(F.lit(1), F.col("__n"), F.lit(chunk_words))
    ).otherwise(F.array().cast("array<int>"))
    chunks = base.select(
        F.col("__id"),
        F.col("__n"),
        F.posexplode(starts).alias("__chunk_no", "__start"),
        F.col("__toks"),
    ).select(
        "__id",
        "__chunk_no",
        F.md5(F.concat_ws(" ", F.slice(F.col("__toks"), F.col("__start"), chunk_words))).alias(
            "__h"
        ),
        F.least(F.lit(chunk_words), F.col("__n") - F.col("__start") + 1).alias(
            "__words"
        ),
    )
    freq = chunks.groupBy("__h").agg(
        F.countDistinct("__id").alias("__df")
    )
    kept = F.col("__df") < F.lit(min_doc_freq)
    return (
        chunks.join(freq, "__h")
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(kept, F.col("__words")).otherwise(0)).alias("kept_words"),
        )
    )


#: integer milli-weights for the linear quality model — deterministic
#: stand-in for a trained fasttext/logistic classifier; all arithmetic
#: stays in BIGINT so every engine agrees bit-for-bit.
QUALITY_WEIGHTS_MILLI: dict[str, int] = {
    "bias": -500,
    "tokens_capped": 10,     # per token, capped at 200
    "stop_permille": 3,      # per ‰ stopwords
    "punct_permille": -5,    # per ‰ punctuation chars
}


def quality_logit(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Linear quality classifier with INTEGER milli-weights:
    (id, logit_milli, quality_bucket). The feature→weight dot product
    is exact BIGINT arithmetic — the shape of a learned quality
    filter (fasttext/logistic) without a model artifact, so the gate
    hash is engine-independent. Buckets: keep (>0), review
    ([-1000,0]), drop (<-1000).

    STAGED projections on purpose: expressions inside ``when()``
    branches are excluded from Spark's subexpression elimination, so
    inlining the whole feature tree into the bucket CASE re-computes
    the split/regex features at every reference (measured ~20× slower
    at the 1M-doc smoke). Naming each tier as a column keeps every
    feature computed once — CollapseProject does not re-inline a
    non-cheap expression referenced more than once."""
    toks = tokens(text_col)
    feats = df.select(
        F.col(id_col),
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
        .otherwise(F.size(toks))
        .cast("long")
        .alias("__n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("__n_chars"),
        F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
        .cast("long")
        .alias("__n_punct"),
        F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
        .cast("long")
        .alias("__n_stop"),
    )
    pm = feats.select(
        F.col(id_col),
        "__n_tokens",
        F.when(
            F.col("__n_tokens") > 0,
            (F.col("__n_stop") * 1000) / F.col("__n_tokens"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__stop_pm"),
        F.when(
            F.col("__n_chars") > 0,
            (F.col("__n_punct") * 1000) / F.col("__n_chars"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__punct_pm"),
    )
    w = QUALITY_WEIGHTS_MILLI
    scored = pm.select(
        F.col(id_col),
        (
            F.lit(w["bias"])
            + F.least(F.col("__n_tokens"), F.lit(200)) * w["tokens_capped"]
            + F.col("__stop_pm") * w["stop_permille"]
            + F.col("__punct_pm") * w["punct_permille"]
        )
        .cast("long")
        .alias("logit_milli"),
    )
    return scored.select(
        F.col(id_col),
        "logit_milli",
        F.when(F.col("logit_milli") > 0, "keep")
        .when(F.col("logit_milli") >= -1000, "review")
        .otherwise("drop")
        .alias("quality_bucket"),
    )


def unigram_surprisal(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Frequency-based quality scoring — the shape of a unigram-LM
    perplexity filter with EXACT integer arithmetic: per token the
    surprisal is ``bits(total_tokens) - bits(corpus_count)``
    (an integer ≈ -log2 p computed as binary-digit counts, so every
    engine agrees bit-for-bit, unlike float ln sums whose value
    depends on accumulation order), and per document we report
    (id, n_tokens, sum_surprisal, avg_surprisal_milli). High average
    surprisal = rare-token-heavy (OOV junk / gibberish); implausibly
    low = boilerplate of stop words. This is the cheap stand-in for
    the KenLM-style perplexity gate production pipelines run.

    Plan: one corpus frequency hash-agg (map-side combine), a 1-row
    total broadcast, then the (doc, token)→freq equi-join SHUFFLES on
    the token key — the frequency table is vocabulary-sized, never
    broadcast. Head tokens ('the') are skewed keys by nature; AQE
    skew-join splits them, and the join fan-out is 1 (freq is unique
    per token), so no row multiplication."""
    toks = tokens(text_col)
    tok_rows = df.select(
        F.col(id_col).alias("__id"), F.explode(toks).alias("__tok")
    ).filter(F.length("__tok") > 0)
    freq = tok_rows.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    total = freq.agg(F.sum("__c").alias("__total"))
    scored = (
        tok_rows.join(freq, "__tok")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__surprisal",
            (F.length(F.bin(F.col("__total"))) - F.length(F.bin(F.col("__c"))))
            .cast("long"),
        )
    )
    return (
        scored.groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__surprisal").alias("sum_surprisal"),
        )
        .withColumn(
            "avg_surprisal_milli",
            F.expr("(1000 * sum_surprisal) div n_tokens"),
        )
    )


#: line-level boilerplate markers from the C4 cleaning recipe — a line
#: mentioning any of these is dropped regardless of its shape
C4_POLICY_RE = r"(?i)\b(javascript|cookie|cookies|privacy policy|terms of use)\b"


def c4_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """The C4 (Raffel et al. 2020) page-cleaning recipe as one
    codegen'd projection: per document, LINE-level filtering (keep
    only lines that end in terminal punctuation, carry at least
    ``min_line_words`` words, and mention none of the
    :data:`C4_POLICY_RE` boilerplate markers) followed by PAGE-level
    verdicts (≥ ``min_sentences`` sentences measured on the cleaned
    text, no "lorem ipsum", no ``{``). Returns (id, text_clean,
    n_lines, n_kept_lines, n_sentences, has_lorem_ipsum,
    has_curly_brace, c4_pass).

    Complements :func:`gopher_quality_flags` (the other published
    first-stage web filter): Gopher measures document statistics, C4
    rewrites the document line-by-line. Pure array/regex expressions —
    no shuffle, no Python — so it pipelines map-side into any
    downstream dedup or sampling stage at corpus scale."""
    t = F.col("__t")
    lines = F.split(t, "\n")

    def _line_ok(line: Column) -> Column:
        w = F.filter(F.split(F.trim(line), r"\s+"), lambda x: F.length(x) > 0)
        return (
            F.trim(line).rlike(r"[.!?\"]$")
            & (F.size(w) >= min_line_words)
            & ~line.rlike(C4_POLICY_RE)
        )

    kept = F.filter(lines, _line_ok)
    text_clean = F.array_join(kept, "\n")
    n_sentences = F.size(
        F.filter(
            F.split(F.col("text_clean"), r"[.!?]"),
            lambda s: F.length(F.trim(s)) > 0,
        )
    )
    staged = df.select(
        F.col(id_col), F.col(text_col).alias("__t")
    ).withColumns(
        {
            "text_clean": text_clean,
            "n_lines": F.size(lines).cast("long"),
            "n_kept_lines": F.size(kept).cast("long"),
        }
    )
    out = staged.withColumns(
        {
            "n_sentences": n_sentences.cast("long"),
            "has_lorem_ipsum": F.lower(F.col("__t")).contains("lorem ipsum"),
            "has_curly_brace": F.col("__t").contains("{"),
        }
    )
    c4_pass = (
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_lorem_ipsum")
        & ~F.col("has_curly_brace")
    )
    return out.select(
        F.col(id_col),
        "text_clean",
        "n_lines",
        "n_kept_lines",
        "n_sentences",
        "has_lorem_ipsum",
        "has_curly_brace",
        c4_pass.alias("c4_pass"),
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int | None = None,
) -> DataFrame:
    """Corpus-wide adjacent-token-pair frequencies — the statistic a
    BPE/WordPiece tokenizer trainer recomputes every merge round:
    (left, right, n_pairs), optionally truncated to the ``top_k`` most
    frequent (ties broken lexicographically for determinism).

    One pass: per document the token array zips with its own tail
    (``slice`` + ``zip_with`` — no explode of token STREAMS, only the
    final pair rows), then a single partial-agg count keyed on the
    pair. At corpus scale that is the canonical one-shuffle heavy-
    hitter count; the top-k truncation plans as TakeOrderedAndProject
    (no global sort materialization)."""
    toks_df = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    t = F.col("__toks")
    n = F.size(t)
    prs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    counts = (
        toks_df.select(F.explode(prs).alias("__p"))
        .groupBy(
            F.col("__p.l").alias("left"), F.col("__p.r").alias("right")
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    if top_k is not None:
        counts = counts.orderBy(
            F.desc("n_pairs"), F.asc("left"), F.asc("right")
        ).limit(top_k)
    return counts


def bpe_apply_merge(
    df: DataFrame,
    left: str,
    right: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    joiner: str = "",
) -> DataFrame:
    """Apply ONE BPE merge greedily left-to-right: every
    non-overlapping adjacent occurrence of (``left``, ``right``)
    collapses into the single token ``left + joiner + right`` —
    including the self-pair case (aa aa → floor(run/2) merges), where
    greedy equals "merge at odd offsets within each run". Returns
    (id, text, n_merged).

    Per document this is a map-side array projection, no explode, no
    shuffle. ``left != right`` (the overwhelmingly common case — a
    self-pair can win the argmax only once per run) takes a fully
    vectorized path: matches can never overlap, so the rebuild is one
    position filter + transform (O(n) lookups, no per-element array
    copies — the sequential fold's append-per-token is O(n²) in
    copied cells and measured 2.1× slower at the 1M-doc smoke). The
    self-pair case keeps the sequential fold, whose consumed-flag
    accumulator is what implements "merge at odd offsets within each
    run"."""
    toks_df = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    t = F.col("__toks")
    n = F.size(t)
    merged_tok = F.lit(left + joiner + right)

    if left != right:
        # F.get is 0-based and total (NULL out of bounds, no ANSI
        # throw) — every guard coalesces NULL to False
        def is_start(i):
            return F.coalesce(
                (F.get(t, i - 1) == left) & (F.get(t, i) == right),
                F.lit(False),
            )

        def consumed(i):
            return F.coalesce(
                (F.get(t, i - 2) == left) & (F.get(t, i - 1) == right),
                F.lit(False),
            )

        kept = F.filter(F.sequence(F.lit(1), n), lambda i: ~consumed(i))
        folded = F.transform(
            kept,
            lambda i: F.when(is_start(i), merged_tok).otherwise(
                F.get(t, i - 1)
            ),
        )
    else:

        def step(acc, i):
            starts = (
                (i < n)
                & (F.element_at(t, i) == left)
                # try_element_at: i+1 may exceed the array, and ANSI
                # element_at raises instead of returning NULL
                & (F.try_element_at(t, i + 1) == right)
                & ~acc["skip"]
            )
            return F.struct(
                F.when(acc["skip"], acc["arr"])
                .when(starts, F.concat(acc["arr"], F.array(merged_tok)))
                .otherwise(F.concat(acc["arr"], F.array(F.element_at(t, i))))
                .alias("arr"),
                starts.alias("skip"),
            )

        folded = F.aggregate(
            F.sequence(F.lit(1), n),
            F.struct(
                F.array().cast("array<string>").alias("arr"),
                F.lit(False).alias("skip"),
            ),
            step,
            lambda acc: acc["arr"],
        )
    out = toks_df.select(
        F.col(id_col), n.alias("__n"), folded.alias("__m")
    )
    return out.select(
        F.col(id_col),
        F.array_join("__m", " ").alias(text_col),
        (F.col("__n") - F.size("__m")).cast("long").alias("n_merged"),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    joiner: str = "",
    return_corpus: bool = False,
) -> list[tuple[int, str, str, int]] | tuple[list, DataFrame]:
    """Train ``n_merges`` BPE merge rules on the corpus: each round
    takes the most frequent adjacent pair (ties lexicographic — the
    deterministic convention of :func:`bpe_pair_counts`) and rewrites
    the corpus with :func:`bpe_apply_merge`. Returns
    [(rank, left, right, count), ...].

    Driver involvement per round is ONE one-row collect (the argmax
    pair — metadata-sized by definition); the corpus itself never
    leaves the cluster, and each round's rewrite is a map-only fold
    stacked onto the previous round's frame (checkpointed per round so
    lineage stays flat across many merges).

    100-TB posture: the per-merge driver round-trip is inherent to BPE
    (merge k's argmax depends on the corpus rewritten with merges
    1..k-1 — it cannot be batched), so TRAIN ON A SAMPLE: a few GB of
    representative text pins the merge table to within-noise of the
    full-corpus table (BPE statistics concentrate fast), and sampling
    bounds the sequential round cost by sample size, not corpus size.
    APPLYING the trained table is the distributed path —
    :func:`bpe_apply_merge` per rule is a map-only projection over the
    full corpus with zero driver involvement. See docs/SCALE.md.

    ``return_corpus=True`` returns ``(merges, corpus)`` where
    ``corpus`` is the training frame with every merge already applied
    (the loop's final checkpointed state). A caller that trains on the
    FULL corpus and then applies the merge table to it was re-running
    the whole rewrite chain from raw text — the trained frame IS that
    result, already materialized."""
    cur = df.select(F.col(id_col), F.col(text_col))
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = bpe_pair_counts(cur, text_col, id_col, top_k=1).collect()
        if not top:
            break
        row = top[0]
        merges.append((rank, row["left"], row["right"], int(row["n_pairs"])))
        cur = bpe_apply_merge(
            cur, row["left"], row["right"], text_col, id_col, joiner
        ).select(F.col(id_col), F.col(text_col)).localCheckpoint(eager=False)
    if return_corpus:
        return merges, cur
    return merges


def bigram_surprisal(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Conditional bigram-LM scoring — one rung up from
    :func:`unigram_surprisal` toward the KenLM perplexity gate: per
    token position the surprisal of w given its predecessor under an
    add-1-smoothed corpus bigram model, in the same EXACT integer
    arithmetic (``bits(c(prev) + V) - bits(c(prev, w) + 1)`` with
    ``bits`` = binary digit count ≈ floor(log2)+1), so every engine
    agrees bit-for-bit. Reports (id, n_bigrams, sum_surprisal,
    avg_surprisal_milli). Word-salad text scores HIGH here even when
    its unigram frequencies look natural — sequence structure is what
    the bigram term measures.

    Plan: bigram rows via one zip_with projection (no token-stream
    explode beyond the pair rows), a pair-count hash-agg and a
    context-count hash-agg (both map-side combinable), a 1-row vocab
    size broadcast; the scoring joins shuffle on the pair / context
    keys with fan-out exactly 1 — both count tables are
    vocabulary-sized, never broadcast."""
    toks_df = df.select(F.col(id_col).alias("__id"), tokens(text_col).alias("__toks"))
    t = F.col("__toks")
    n = F.size(t)
    prs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.struct(a.alias("p"), b.alias("w")),
        ),
    ).otherwise(F.array().cast("array<struct<p:string,w:string>>"))
    big = toks_df.select(F.col("__id"), F.explode(prs).alias("__b")).select(
        "__id", F.col("__b.p").alias("__p"), F.col("__b.w").alias("__w")
    )
    # NO lineage barrier here: the r14 localCheckpoint on this frame
    # materialized the corpus-sized bigram stream to save two tokenize
    # passes, and the driver's cold min-of-3 measured it 2.3× SLOWER
    # (0.91 → 2.05 s) — writing every pair row to block storage costs
    # more than re-running the map-only tokenize+zip_with chain, the
    # same wash the 2-consumer collocations A/B measured. Reverted.
    c2 = big.groupBy("__p", "__w").agg(F.count(F.lit(1)).alias("__c2"))
    c1 = big.groupBy("__p").agg(F.count(F.lit(1)).alias("__c1"))
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("__tok"))
        .filter(F.length("__tok") > 0)
        .agg(F.countDistinct("__tok").alias("__v"))
    )
    # attach the context count to the pair count FIRST: c2⋈c1 is
    # pair-vocabulary-sized, so the corpus-sized bigram stream crosses
    # the wire ONCE instead of twice (73.8s → 39.5s at the 1M-doc
    # smoke — the saved 46M-row shuffle was half the operator)
    counts = c2.join(c1, "__p")
    scored = (
        big.join(counts, ["__p", "__w"])
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "__s",
            (
                F.length(F.bin(F.col("__c1") + F.col("__v")))
                - F.length(F.bin(F.col("__c2") + 1))
            ).cast("long"),
        )
    )
    return (
        scored.groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__s").alias("sum_surprisal"),
        )
        .withColumn(
            "avg_surprisal_milli",
            F.expr("(1000 * sum_surprisal) div n_bigrams"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """BM25 lexical retrieval (Robertson/Sparck Jones probabilistic
    ranking — the function behind Lucene/Elasticsearch relevance):
    for each query return the ``topk`` documents ranked by
    ``sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`` with
    ``idf = ln((N-df+0.5)/(df+0.5) + 1)``.

    Plan, sized for a corpus-scale doc table and a dim-sized query
    table: the corpus is scanned twice, both projection-only — once
    for the 1-row (N, sum_dl) stats aggregate, once to explode
    postings. Postings are pre-filtered by a BROADCAST semi-join on
    the distinct query-term list before any shuffle, so tf and df
    aggregations touch only matched postings (scales with hits, not
    |corpus| x |vocab|). Doc length rides the posting rows as a
    grouping key, so no corpus-sized dl join exists. df per term is
    computable post-filter because df(t) only counts docs containing
    t. The idf table is query-term-sized and broadcast back; the
    final per-(query, doc) sum folds term scores in sorted term
    order (deterministic double accumulation, the documented
    sorted-fold convention), then a per-query window takes top-k.

    All arithmetic constants are Python-computed doubles fed to both
    engines, and the fold order is fixed, so results hash-match the
    DuckDB oracle bit-for-bit at round(4).
    """
    toks = F.filter(tokens(text_col), lambda t: F.length(t) > 0)
    base = docs.select(
        F.col(id_col).alias("__doc"), toks.alias("__toks")
    ).withColumn("__dl", F.size("__toks"))

    stats = base.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.sum("__dl").alias("__sum_dl"),
    )

    q_terms = (
        queries.select(
            F.col(query_id_col).alias("__qid"),
            F.explode(F.filter(tokens(query_text_col), lambda t: F.length(t) > 0)).alias(
                "__term"
            ),
        )
        .distinct()
    )
    term_list = q_terms.select("__term").distinct()

    posts = base.select(
        "__doc", "__dl", F.explode("__toks").alias("__term")
    ).join(F.broadcast(term_list), "__term")

    # ONE materialization of the matched-postings tf table feeds both
    # the df/idf aggregate and the scoring join — without it Catalyst
    # re-plans the whole explode+filter subtree for the idf branch and
    # the corpus text column is scanned twice more (same
    # no-exchange-reuse rationale as lsh_verified_pairs)
    tf = (
        posts.groupBy("__term", "__doc", "__dl")
        .agg(F.count(F.lit(1)).alias("__tf"))
        .localCheckpoint(eager=False)
    )
    df_tbl = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))

    idf_tbl = df_tbl.crossJoin(F.broadcast(stats)).withColumn(
        "__idf",
        F.log(
            (F.col("__n_docs") - F.col("__df") + F.lit(0.5))
            / (F.col("__df") + F.lit(0.5))
            + F.lit(1.0)
        ),
    )

    k1p1 = k1 + 1.0
    one_m_b = 1.0 - b
    scored = (
        tf.join(F.broadcast(idf_tbl.select("__term", "__idf", "__n_docs", "__sum_dl")), "__term")
        .join(F.broadcast(q_terms), "__term")
        .withColumn(
            "__avgdl",
            F.col("__sum_dl").cast("double") / F.col("__n_docs"),
        )
        .withColumn(
            "__score",
            F.col("__idf")
            * (
                (F.col("__tf") * F.lit(k1p1))
                / (
                    F.col("__tf")
                    + F.lit(k1)
                    * (
                        F.lit(one_m_b)
                        + F.lit(b) * F.col("__dl") / F.col("__avgdl")
                    )
                )
            ),
        )
    )

    per_qd = (
        scored.groupBy("__qid", "__doc")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__term"), F.col("__score")))
            ).alias("__ts")
        )
        .withColumn(
            "__bm25",
            F.round(
                F.aggregate(
                    "__ts",
                    F.lit(0.0),
                    lambda acc, x: acc + x["__score"],
                ),
                4,
            ),
        )
    )

    from pyspark.sql import Window

    w = Window.partitionBy("__qid").orderBy(
        F.col("__bm25").desc(), F.col("__doc").asc()
    )
    return (
        per_qd.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topk)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__doc").alias(id_col),
            F.col("__bm25").alias("bm25"),
            "rank",
        )
    )


def trigram_backoff_surprisal(
    train: DataFrame,
    score: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Held-out trigram LM scoring with stupid backoff (Brants et al.
    2007): n-gram counts come from ``train``; each trigram in
    ``score`` is charged integer-bit surprisal at the deepest level
    with a nonzero training count —

    - trigram seen:       ``bits(c(w1 w2)) - bits(c(w1 w2 w3))``
    - else bigram seen:   ``2 + bits(c(w2)) - bits(c(w2 w3))``
    - else unigram seen:  ``4 + bits(N) - bits(c(w3))``
    - else (full OOV):    ``4 + bits(N)``

    where ``bits(x) = floor(log2 x) + 1`` (binary digit count — every
    engine agrees bit-for-bit, unlike float ln sums) and the +2-bit
    per-level penalty is the integer stand-in for the published
    lambda = 0.4 backoff discount. Reports per scored document
    (id, n_trigrams, sum_surprisal, avg_surprisal_milli, n_backoff1,
    n_backoff2, n_oov) — high average = unseen-sequence-heavy
    relative to the training corpus; this is the cheap distributed
    stand-in for a KenLM held-out-perplexity filter.

    Plan: three count tables from one pass over ``train`` (trigram /
    bigram / unigram hash-aggs, all map-side combinable) plus a 1-row
    token total. The scored trigram stream shuffles THREE times —
    once per distinct key shape (w1,w2,w3), (w2,w3), (w3) — with the
    context counts pre-joined onto the count tables (vocabulary-sized
    joins), per the join-the-lookup-tables-first lesson from
    bigram_surprisal. Fan-out of every stream join is exactly 1."""

    def _toks(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("__id"),
            F.filter(tokens(text_col), lambda t: F.length(t) > 0).alias("__t"),
        )

    def _tri(df: DataFrame) -> DataFrame:
        t = F.col("__t")
        n = F.size(t)
        idx = F.when(n >= 3, F.sequence(F.lit(1), n - 2)).otherwise(
            F.array().cast("array<int>")
        )
        g = F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(t, i).alias("w1"),
                F.element_at(t, i + 1).alias("w2"),
                F.element_at(t, i + 2).alias("w3"),
            ),
        )
        return df.select("__id", F.explode(g).alias("__g")).select(
            "__id",
            F.col("__g.w1").alias("__w1"),
            F.col("__g.w2").alias("__w2"),
            F.col("__g.w3").alias("__w3"),
        )

    tr_toks = _toks(train)
    tr_tri = _tri(tr_toks)
    c3 = tr_tri.groupBy("__w1", "__w2", "__w3").agg(
        F.count(F.lit(1)).alias("__c3")
    )
    tr_big = tr_toks.select(
        "__id",
        F.explode(
            F.when(
                F.size("__t") >= 2,
                F.zip_with(
                    F.slice("__t", 1, F.size("__t") - 1),
                    F.slice("__t", 2, F.size("__t") - 1),
                    lambda a, b: F.struct(a.alias("p"), b.alias("w")),
                ),
            ).otherwise(F.array().cast("array<struct<p:string,w:string>>"))
        ).alias("__b"),
    ).select(F.col("__b.p").alias("__p"), F.col("__b.w").alias("__w"))
    cb = tr_big.groupBy("__p", "__w").agg(F.count(F.lit(1)).alias("__cb"))
    uni = tr_toks.select(F.explode("__t").alias("__u"))
    cu = uni.groupBy("__u").agg(F.count(F.lit(1)).alias("__cu"))
    total = uni.agg(F.count(F.lit(1)).alias("__n_tok"))

    # pre-join contexts onto the count tables (vocab-sized joins):
    # trigram rows carry c(w1,w2); bigram rows carry c(w2)
    t3 = c3.join(
        cb.select(
            F.col("__p").alias("__w1"),
            F.col("__w").alias("__w2"),
            F.col("__cb").alias("__ctx12"),
        ),
        ["__w1", "__w2"],
    )
    b23 = cb.select(
        F.col("__p").alias("__w2"), F.col("__w").alias("__w3"),
        F.col("__cb").alias("__c23"),
    ).join(
        cu.select(F.col("__u").alias("__w2"), F.col("__cu").alias("__ctx2")),
        "__w2",
    )

    bits = lambda c: F.length(F.bin(c)).cast("long")  # noqa: E731
    stream = (
        _tri(_toks(score))
        .join(t3, ["__w1", "__w2", "__w3"], "left")
        .join(b23, ["__w2", "__w3"], "left")
        .join(
            cu.select(F.col("__u").alias("__w3"), F.col("__cu").alias("__cu3")),
            "__w3",
            "left",
        )
        .crossJoin(F.broadcast(total))
    )
    lvl = (
        F.when(F.col("__c3").isNotNull(), F.lit(0))
        .when(F.col("__c23").isNotNull(), F.lit(1))
        .when(F.col("__cu3").isNotNull(), F.lit(2))
        .otherwise(F.lit(3))
    )
    s = (
        F.when(lvl == 0, bits(F.col("__ctx12")) - bits(F.col("__c3")))
        .when(lvl == 1, F.lit(2) + bits(F.col("__ctx2")) - bits(F.col("__c23")))
        .when(lvl == 2, F.lit(4) + bits(F.col("__n_tok")) - bits(F.col("__cu3")))
        .otherwise(F.lit(4) + bits(F.col("__n_tok")))
    )
    return (
        stream.withColumn("__lvl", lvl)
        .withColumn("__s", s)
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("__s").alias("sum_surprisal"),
            F.sum((F.col("__lvl") == 1).cast("long")).alias("n_backoff1"),
            F.sum((F.col("__lvl") == 2).cast("long")).alias("n_backoff2"),
            F.sum((F.col("__lvl") == 3).cast("long")).alias("n_oov"),
        )
        .withColumn(
            "avg_surprisal_milli",
            F.expr("(1000 * sum_surprisal) div n_trigrams"),
        )
    )


def taxonomy_tag(
    df: DataFrame,
    keyword_topics: dict[str, str],
    text_col: str = "text",
    id_col: str = "doc_id",
    default_topic: str = "other",
    method: str = "map",
) -> DataFrame:
    """FlashText-style keyword taxonomy tagging at corpus scale: map a
    keyword→topic dictionary over every document's tokens and return
    one row per document: (id, topic counts map, n_matches,
    dominant_topic) — the standard cheap topical router for training-
    mix composition (e.g. bucket web pages into code / science / news
    shares before temperature mixing). Documents with no keyword hit
    get ``default_topic``. Dominant-topic ties break lexicographically
    (min topic name) so results are partitioning-invariant. Tokens are
    lowercased before matching; keys must be lowercase single tokens.

    ``method``:

    - ``"map"`` (default) — the dictionary becomes a LITERAL map and
      everything is ONE shuffle-free codegen projection: per-row hit
      list via ``transform`` + map lookup, per-topic counts by
      filtering the (bounded) hit list, argmax by a fold over
      name-sorted entries. This is a per-document aggregate, and per-
      document aggregates never need a shuffle (13× faster than the
      join path at the 1M-doc smoke: 30k → 390k docs/s). Right for
      dictionaries up to a few thousand keys (the literal map lives
      in the plan).
    - ``"join"`` — explode tokens and broadcast-join the dictionary
      table, per-doc histogram as a partial agg. Right when the
      dictionary is too big to inline (100k+ keyword gazetteers);
      identical output."""
    if not keyword_topics:
        raise ValueError("keyword_topics must not be empty")
    for kw in keyword_topics:
        if kw != kw.lower() or " " in kw:
            raise ValueError(f"keys must be lowercase single tokens: {kw!r}")
    if method not in ("map", "join"):
        raise ValueError(f"method must be map|join, got {method!r}")
    empty_map = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<bigint>")
    )
    if method == "map":
        kw_map = F.create_map(
            *[
                F.lit(x)
                for k, v in sorted(keyword_topics.items())
                for x in (k, v)
            ]
        )
        # stage the hit list as a named column: expressions inside
        # when() branches are excluded from subexpression elimination
        hits = F.filter(
            F.transform(
                tokens(F.lower(F.col(text_col))),
                # try_element_at: NULL for non-keyword tokens (plain
                # element_at throws MAP_KEY_DOES_NOT_EXIST under ANSI)
                lambda t: F.try_element_at(kw_map, t),
            ),
            lambda x: x.isNotNull(),
        )
        staged = df.select(F.col(id_col), hits.alias("__hits"))
        entries = F.sort_array(
            F.transform(
                F.array_distinct(F.col("__hits")),
                lambda t: F.struct(
                    t.alias("key"),
                    F.size(
                        F.filter(F.col("__hits"), lambda h: h == t)
                    )
                    .cast("bigint")
                    .alias("value"),
                ),
            )
        )
        staged2 = staged.select(
            F.col(id_col), entries.alias("__entries")
        )
        # fold over name-sorted entries: strict > keeps the earliest
        # (lexicographically smallest) name on count ties
        best = F.aggregate(
            F.col("__entries"),
            F.struct(
                F.lit(0).cast("bigint").alias("c"),
                F.lit(None).cast("string").alias("t"),
            ),
            lambda acc, e: F.when(
                e["value"] > acc["c"],
                F.struct(e["value"].alias("c"), e["key"].alias("t")),
            ).otherwise(acc),
        )
        return staged2.select(
            F.col(id_col),
            F.coalesce(
                F.map_from_entries(F.col("__entries")), empty_map
            ).alias("topic_counts"),
            F.coalesce(
                F.aggregate(
                    F.col("__entries"),
                    F.lit(0).cast("bigint"),
                    lambda acc, e: acc + e["value"],
                ),
                F.lit(0).cast("bigint"),
            ).alias("n_matches"),
            F.coalesce(best["t"], F.lit(default_topic)).alias(
                "dominant_topic"
            ),
        )
    spark = df.sparkSession
    dim = spark.createDataFrame(
        sorted(keyword_topics.items()), "__kw string, __topic string"
    )
    toks = df.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("__kw"),
    )
    per_topic = (
        toks.join(F.broadcast(dim), on="__kw")
        .groupBy(id_col, "__topic")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    per_doc = per_topic.groupBy(id_col).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("__topic", "__n")))
        ).alias("topic_counts"),
        F.sum("__n").alias("n_matches"),
        # min (-count, name) == most-frequent, ties -> min topic name
        F.min_by(
            F.col("__topic"),
            F.struct((-F.col("__n")).alias("nn"), F.col("__topic").alias("t")),
        ).alias("dominant_topic"),
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("topic_counts"), empty_map).alias("topic_counts"),
            F.coalesce(F.col("n_matches"), F.lit(0)).alias("n_matches"),
            F.coalesce(F.col("dominant_topic"), F.lit(default_topic)).alias(
                "dominant_topic"
            ),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style corpus split by language-model score: rank every
    document by :func:`unigram_surprisal` (integer-exact ≈ -log2 p,
    the cheap stand-in for the KenLM perplexity CCNet uses) and cut
    the corpus into ``n_buckets`` equal-count tiers — bucket 0
    ("head") is the most-fluent third, the classic pretraining
    curation signal (Wenzek 2020). Returns (id, n_tokens,
    avg_surprisal_milli, bucket_no, bucket) — token-less documents
    have no score and are excluded, as in CCNet.

    Scale shape: the rank comes from the range-partition +
    broadcast-offset :func:`~ukis_h3cellstore_spark.ops.prefix.
    global_rank` (never a single-partition ORDER BY); the corpus size
    is one count job (metadata result); the bucket is then a pure
    integer projection ``(n_buckets * (rank-1)) div n`` — exact
    equal-count tiers, deterministic ties by id, no percentile
    interpolation for engines to disagree on."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    from ukis_h3cellstore_spark.ops.prefix import global_rank

    # materialize once: the corpus-count job AND global_rank's range
    # exchange both consume the surprisal result — without the barrier
    # the explode + freq join + per-doc agg subtree runs twice
    scored = unigram_surprisal(df, text_col, id_col).localCheckpoint(
        eager=False
    )
    n = scored.count()
    ranked = global_rank(
        scored, ["avg_surprisal_milli", id_col], out_col="__gr"
    )
    bucket_no = F.expr(f"({n_buckets} * (__gr - 1)) div {max(n, 1)}").cast(
        "int"
    )
    labels = (
        ["head", "middle", "tail"]
        if n_buckets == 3
        else [f"b{i}" for i in range(n_buckets)]
    )
    label = F.element_at(
        F.array(*[F.lit(x) for x in labels]), F.col("bucket_no") + 1
    )
    return (
        ranked.withColumn("bucket_no", bucket_no)
        .withColumn("bucket", label)
        .select(id_col, "n_tokens", "avg_surprisal_milli", "bucket_no", "bucket")
    )


def collocations_by_lift(
    df: DataFrame,
    min_count: int = 5,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Collocation mining: the ``top_k`` adjacent token pairs with the
    highest LIFT ``P(l,r) / (P(l)·P(r)) = c2·N / (c1(l)·c1(r))`` —
    the association-rule form of PMI (PMI = log lift), kept as an
    EXACT integer ``lift_milli = (1000·c2·N) div (c1(l)·c1(r))`` so
    ranking is bit-reproducible across engines (no float log). Pairs
    below ``min_count`` are dropped first (the classic support cut —
    rare pairs have unreliable lift). Ties break on (left, right).
    The standard phrase detector (word2vec's phrase pass uses the
    same score).

    Plan: pair rows via one zip_with projection; pair and unigram
    count hash-aggs (map-side combinable); the two count attachments
    shuffle the PAIR-VOCABULARY-sized table on the token keys (fan-out
    1), never the corpus; the global top-k is TakeOrdered, never a
    full sort. N (total unigram positions) is a 1-row broadcast."""
    toks_df = df.select(tokens(text_col).alias("__toks"))
    t = F.col("__toks")
    n = F.size(t)
    prs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    big = toks_df.select(F.explode(prs).alias("__b")).select(
        F.col("__b.l").alias("__l"), F.col("__b.r").alias("__r")
    )
    uni = (
        df.select(F.explode(tokens(text_col)).alias("__tok"))
        .filter(F.length("__tok") > 0)
        .groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__c1"))
    )
    total = uni.agg(F.sum("__c1").alias("__N"))
    c2 = (
        big.groupBy("__l", "__r")
        .agg(F.count(F.lit(1)).alias("__c2"))
        .filter(F.col("__c2") >= min_count)
    )
    scored = (
        c2.join(uni.withColumnRenamed("__tok", "__l"), "__l")
        .withColumnRenamed("__c1", "__cl")
        .join(uni.withColumnRenamed("__tok", "__r"), "__r")
        .withColumnRenamed("__c1", "__cr")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lift_milli",
            F.expr("(1000 * __c2 * __N) div (__cl * __cr)").cast("long"),
        )
    )
    return (
        scored.orderBy(
            F.col("lift_milli").desc(), F.col("__l"), F.col("__r")
        )
        .limit(top_k)
        .select(
            F.col("__l").alias("left"),
            F.col("__r").alias("right"),
            F.col("__c2").cast("long").alias("pair_count"),
            "lift_milli",
        )
    )


def readability(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Integer-exact Flesch-style readability features per document —
    the classic grade-level quality screen (education-level mix audits
    for a training corpus). Counts words (whitespace tokens), sentence
    terminator runs (``[.!?]+``, min 1 so the score is total), and a
    vowel-group syllable proxy (``[aeiouy]+`` runs over the lowercased
    text — the standard hyphenation-free approximation; one run per
    syllable nucleus), then the Flesch reading-ease score in MILLI
    units by pure integral division:

    ``flesch_milli = 206835 - (1015 * words) div sents
      - (84600 * syll) div words``

    No float anywhere, so the score is reproducible bit-for-bit by any
    engine with the same regex semantics (the patterns are character
    classes only — identical under Java regex and RE2). Pure map-side
    projection in whole-stage codegen; empty docs yield zero counts
    and a NULL score."""
    txt = F.col(text_col)
    n_words = F.when(F.length(F.trim(txt)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text_col))
    )
    n_sents = F.regexp_count(txt, F.lit(r"[.!?]+"))
    n_syll = F.regexp_count(F.lower(txt), F.lit(r"[aeiouy]+"))
    out = (
        df.select(
            F.col(id_col),
            n_words.cast("long").alias("n_words"),
            F.greatest(n_sents.cast("long"), F.lit(1)).alias("n_sents"),
            n_syll.cast("long").alias("n_syllables"),
        )
    )
    return out.withColumn(
        "flesch_milli",
        F.when(
            F.col("n_words") > 0,
            F.lit(206835)
            - F.expr("(1015 * n_words) div n_sents")
            - F.expr("(84600 * n_syllables) div n_words"),
        ).cast("long"),
    )


def zipf_slope(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 1000,
) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of
    ``ln(freq)`` on ``ln(rank)`` for the ``top_n`` most frequent
    terms — the one-number "is this corpus natural language"
    diagnostic (natural text sits near -1; templated/boilerplate
    corpora flatten, OCR noise steepens). Pairs with the Heaps'-law
    point of ``vocab_profile``.

    Returns ONE row ``(n_terms, slope, intercept)`` (6 dp). Ranks come
    from the range-partitioned
    :func:`~ukis_h3cellstore_spark.ops.prefix.global_rank`
    (freq desc, term asc — deterministic under ties), the fit is the
    explicit normal-equations formula over at most ``top_n`` points,
    so the float work is a bounded final reduction."""
    from ukis_h3cellstore_spark.ops.prefix import global_rank

    vocab = (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("__negf", -F.col("freq"))
    )
    ranked = global_rank(vocab, ["__negf", "term"], out_col="rank").filter(
        F.col("rank") <= int(top_n)
    )
    pts = ranked.select(
        F.log(F.col("rank").cast("double")).alias("__x"),
        F.log(F.col("freq").cast("double")).alias("__y"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
    )
    n = F.col("__n").cast("double")
    slope = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / (
        n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    )
    return agg.select(
        F.col("__n").cast("long").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("__sy") - slope * F.col("__sx")) / n, 6
        ).alias("intercept"),
    )


def js_divergence_by_source(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Jensen-Shannon divergence (nats) between each group's token
    distribution and the POOLED corpus distribution — the fine-grained
    lexical-drift audit (PSI bins lengths; this compares the actual
    vocabularies). ``JSD(p, m) = 0.5 KL(p||m) + 0.5 KL(q||m)`` with
    ``m = 0.5 (p + q)`` and q the pooled distribution; bounded by
    ln 2, zero iff identical.

    Shape: one (group, term) count aggregation (map-side combinable),
    pooled term counts by a second partial agg, one shuffle join on
    the term key (never broadcast — vocabulary is corpus-scale), and a
    per-group reduction. Terms absent from a group contribute only
    through the q-side sum, handled in closed form (no |V|x|G| grid
    anywhere): for p_i = 0, the KL(q||m) term is q_i ln 2, summed as
    ``ln 2 - sum over present terms of q_i ln 2``-complement. Float
    enters in the final per-term expressions, 6-dp rounded."""
    toks = df.select(
        F.col(group_col), F.explode(tokens(text_col)).alias("__t")
    ).filter(F.col("__t") != "")
    cells = toks.groupBy(group_col, "__t").agg(
        F.count(F.lit(1)).alias("__c")
    ).localCheckpoint(eager=False)
    grp = cells.groupBy(group_col).agg(F.sum("__c").alias("__ng"))
    pooled = cells.groupBy("__t").agg(F.sum("__c").alias("__cp"))
    tot = cells.agg(F.sum("__c").alias("__n"))
    j = (
        cells.join(pooled, on="__t")
        .join(F.broadcast(grp), on=group_col)
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("__c").cast("double") / F.col("__ng").cast("double")
    q = F.col("__cp").cast("double") / F.col("__n").cast("double")
    m = (p + q) / 2.0
    # per present term: 0.5 p ln(p/m) + 0.5 q ln(q/m); absent terms
    # (p = 0) contribute 0.5 q ln 2 each, i.e. 0.5 ln 2 * (1 - sum of
    # present q) added in closed form after the reduction
    term = 0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)
    ln2 = 0.6931471805599453
    return (
        j.withColumn("__term", term)
        .withColumn("__q", q)
        .groupBy(group_col, "__ng")
        .agg(
            F.sum("__term").alias("__s"),
            F.sum("__q").alias("__qs"),
        )
        .select(
            F.col(group_col),
            F.col("__ng").cast("long").alias("n_tokens"),
            F.round(
                F.col("__s") + 0.5 * ln2 * (1.0 - F.col("__qs")), 6
            ).alias("jsd_nats"),
        )
    )


def term_burstiness(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 20,
) -> DataFrame:
    """Per-term burstiness (variance-to-mean ratio of per-document
    counts) for the ``top_n`` most frequent terms — the corpus-
    linguistics content/function-word discriminator (function words
    are Poisson-ish, VMR ~ 1; topical words are bursty, VMR >> 1) and
    a templated-corpus tell (VMR << 1 means suspiciously uniform).

    Integer-exact: with S1 = total occurrences, S2 = sum of squared
    per-doc counts (absent docs contribute 0), n = total docs,
    ``vmr_milli = (1000 * (n*S2 - S1^2)) div (n * S1)`` — population
    variance over mean, decimal products + integral division.

    Shape: one (doc, term) count aggregation, term totals by a second
    partial agg, top-n via TakeOrderedAndProject (freq desc, term asc),
    then one bounded reduction. Output:
    (term, total_count, n_docs_with, vmr_milli)."""
    pairs = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__t"))
        .filter(F.col("__t") != "")
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).alias("__c"))
    ).localCheckpoint(eager=False)
    n_docs = df.select(id_col).distinct().count()
    stats = pairs.groupBy("__t").agg(
        F.sum("__c").alias("__s1"),
        F.sum(F.col("__c").cast("decimal(18,0)") * F.col("__c")).alias("__s2"),
        F.count(F.lit(1)).alias("__nd"),
    )
    top = stats.orderBy(F.desc("__s1"), F.asc("__t")).limit(int(top_n))
    dec = "decimal(18,0)"
    return top.select(
        F.col("__t").alias("term"),
        F.col("__s1").cast("long").alias("total_count"),
        F.col("__nd").cast("long").alias("n_docs_with"),
        F.expr(
            f"CAST(1000 * ({int(n_docs)} * __s2 - CAST(__s1 AS {dec}) * __s1) "
            f"AS DECIMAL(38,0)) div "
            f"CAST({int(n_docs)} * CAST(__s1 AS {dec}) AS DECIMAL(38,0))"
        ).cast("long").alias("vmr_milli"),
    )


def code_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Code-vs-prose routing screen: integer-exact structural features
    that separate source code from natural text — the filter corpus
    pipelines run before sending documents down language-specific
    processing (code wants different dedup/quality rules than prose).

    Features (all milli ratios by integral division, zero float):
    ``symbol_milli`` (non-alnum-nonspace chars / chars),
    ``brace_milli`` (``{}()[];=`` chars / chars),
    ``digit_milli`` (digits / chars), and the composite
    ``code_score_milli = brace_milli + (symbol_milli div 2)
    + (digit_milli div 4)`` — a monotone codegen-only heuristic, not a
    learned model (swap in quality_logit-style weights when labels
    exist). Pure whole-stage-codegen projection; empty docs score
    NULL."""
    txt = F.col(text_col)
    n_chars = F.length(txt)
    n_sym = n_chars - F.length(F.regexp_replace(txt, r"[^A-Za-z0-9\s]", ""))
    n_brace = n_chars - F.length(F.regexp_replace(txt, r"[{}()\[\];=]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(txt, r"[0-9]", ""))
    out = df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_sym.cast("long").alias("n_symbols"),
        n_brace.cast("long").alias("n_braces"),
        n_digit.cast("long").alias("n_digits"),
    )
    return (
        out.withColumn(
            "symbol_milli",
            F.expr("CASE WHEN n_chars > 0 THEN (1000 * n_symbols) div n_chars END").cast("long"),
        )
        .withColumn(
            "brace_milli",
            F.expr("CASE WHEN n_chars > 0 THEN (1000 * n_braces) div n_chars END").cast("long"),
        )
        .withColumn(
            "digit_milli",
            F.expr("CASE WHEN n_chars > 0 THEN (1000 * n_digits) div n_chars END").cast("long"),
        )
        .withColumn(
            "code_score_milli",
            F.expr(
                "brace_milli + (symbol_milli div 2) + (digit_milli div 4)"
            ).cast("long"),
        )
    )


def ngram_diversity(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
    approx: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group n-gram diversity report: distinct n-grams over total
    n-gram instances (milli) — the self-repetition audit that catches
    template-generated or boilerplate-heavy sources before they skew
    training (low diversity = the group repeats itself). Output:
    ``(group, n_docs, total_tokens, total_ngrams, distinct_ngrams,
    diversity_milli)``.

    ``approx=False`` (exact): ``count_distinct`` over the exploded
    n-grams — two partial-aggregable shuffles, but the per-group
    distinct state is proportional to the group's UNIQUE n-gram count,
    which at 100 TB is the dominant cost for what is a datacard
    metric. ``approx=True`` switches the distinct count to
    ``approx_count_distinct`` (HyperLogLog++, relative standard
    deviation ``rsd``, default 2 %): per-group state collapses to one
    2^p-register HLL sketch (~2.5 KB at 2 %; Spark derives p from
    rsd), independent of cardinality — the right default for the
    report path. diversity_milli inherits the estimate's error, so
    hash-gate exactness needs ``approx=False`` (the
    corpus_ngram_diversity gate keeps the exact form).
    """
    toks = tokens(text_col)
    nt = F.size(toks)
    grams = F.when(
        nt >= n,
        F.transform(
            F.sequence(F.lit(1), nt - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = df.select(group_col, nt.alias("__nt"), grams.alias("__g"))
    tot = base.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").cast("long").alias("total_tokens"),
        F.sum(F.size("__g")).cast("long").alias("total_ngrams"),
    )
    exploded = base.select(group_col, F.explode("__g").alias("__gram"))
    dcount = (
        F.approx_count_distinct("__gram", rsd)
        if approx
        else F.count_distinct("__gram")
    )
    dist = exploded.groupBy(group_col).agg(
        dcount.cast("long").alias("distinct_ngrams")
    )
    return tot.join(dist, on=group_col).select(
        group_col,
        "n_docs",
        "total_tokens",
        "total_ngrams",
        "distinct_ngrams",
        F.when(F.col("total_ngrams") == 0, F.lit(0))
        .otherwise(F.expr("(1000 * distinct_ngrams) div total_ngrams"))
        .cast("long")
        .alias("diversity_milli"),
    )
