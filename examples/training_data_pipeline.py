"""Training-data curation walkthrough: the beyond-reference operator
suite (text quality → language ID → dedup → similarity) composed over
the synthetic documents/embeddings tables.

Run: ``python examples/training_data_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ukis_h3cellstore_spark.ops import dedup as D
from ukis_h3cellstore_spark.ops import similarity as S
from ukis_h3cellstore_spark.ops import text as X


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("training-data-pipeline")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    print(f"corpus: {docs.count()} docs, {embs.count()} embeddings")

    # 1. quality scoring + language ID (pure JVM column expressions)
    stats = X.text_stats(docs)
    lang = X.language_id(docs).select("doc_id", "predicted_lang")
    good = stats.filter(
        (F.col("quality_score") > 0.1) & (F.col("n_tokens") >= 5)
    )
    print(f"quality-pass: {good.count()}")

    # 2. exact dedup: one canonical doc per content hash
    canon = D.dedup_exact(docs).select(
        F.col("canonical_id").alias("doc_id"), "n_docs"
    )
    print(f"exact-dup groups removed: {canon.filter('n_docs > 1').count()}")

    # 3. near-dup candidates via MinHash LSH (bucket join, no n² scan)
    pairs = D.minhash_lsh_pairs(docs, min_est_jaccard=0.5)
    print(f"near-dup candidate pairs (est J >= 0.5): {pairs.count()}")

    # 4. the surviving corpus, by language
    kept = good.join(canon.select("doc_id"), "doc_id").join(lang, "doc_id")
    kept.groupBy("predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    ).show()

    # 5. resolve near-dup pairs into clusters; keep min-id per cluster
    clusters = D.duplicate_cluster_stats(pairs)
    print(f"duplicate clusters: {clusters.count()}")

    # 6. decontaminate against a held-out eval set (src0 stands in)
    flagged = D.decontaminate_flags(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        k=5,
    )
    print(f"eval-contaminated training docs: {flagged.count()}")

    # 7. boilerplate screen: drop documents dominated by one 2-gram
    rep = X.repetition_stats(docs).filter(F.col("top_2gram_frac") < 0.2)
    print(f"repetition-pass: {rep.count()}")

    # 8. embedding-space: exact top-3 neighbors for the first 5 vectors
    queries = embs.filter(F.col("vec_id") < 5)
    S.cosine_topk(embs, queries, k=3).show()

    # 9. the memory-bound path: IVF-PQ (coarse lists + residual codes)
    S.ivfpq_topk(embs, queries, k=3, n_coarse=8, nprobe=2).show()

    # 10. per-language length trim + OOV report (broadcast cutoffs)
    kept_len = X.length_percentile_filter(docs)
    print(f"length-percentile survivors: {kept_len.count()}")
    X.vocab_oov_report(docs, k=50).show()

    # 11. learned-filter-shaped screens: integer-logit quality model,
    # unigram-surprisal (frequency "perplexity") and boilerplate-chunk
    # doc-frequency removal — all exact-integer, all shuffle-lean
    ql = X.quality_logit(docs).filter(F.col("quality_bucket") != "drop")
    print(f"logit-quality keep/review: {ql.count()}")
    sur = X.unigram_surprisal(docs)
    sur.agg(
        F.min("avg_surprisal_milli"), F.max("avg_surprisal_milli")
    ).show()
    bp = X.boilerplate_chunk_stats(docs, chunk_words=8, min_doc_freq=2)
    print(
        "boilerplate-free docs:",
        bp.filter(F.col("n_kept") == F.col("n_chunks")).count(),
    )

    # 12. cross-modal dedup: embedding-LSH candidates verified by
    # exact text Jaccard on the paired documents table
    xm = D.embedding_verified_pairs(
        docs, embs, threshold=0.0, cosine_threshold=0.2, k=1
    )
    print(f"cross-modal verified pairs: {xm.count()}")

    # 13. SemDeDup-style semantic pruning over the embedding space
    sem = S.semantic_dedup(embs, n_clusters=8, threshold=0.2)
    print(f"semantic-dedup survivors: {sem.filter('kept').count()}")

    # 14. temperature-balanced source mixture for the final training mix
    from ukis_h3cellstore_spark.ops import sampling as SM

    mix = SM.temperature_mixture(docs, tau=0.7)
    mix.groupBy("source").count().show()

    # 15. publish Z-ordered on (lang-ish, length) for 2-dim pruning
    import tempfile, os
    from ukis_h3cellstore_spark.layout import write_zordered

    out = os.path.join(tempfile.mkdtemp(prefix="zpub_"), "docs")
    write_zordered(
        docs.withColumn("lang_id", F.crc32("lang") % 64),
        ["lang_id", "n_chars"],
        out,
        bits=10,
    )
    print(f"z-ordered publish: {spark.read.parquet(out).count()} rows at {out}")

    # 16. (round 8) the daily ingest, end to end: screen the incoming
    # snapshot against the persisted MinHash index, drop near-dups,
    # excise exact shared spans from the survivors
    corpus = docs.filter(F.col("doc_id") >= 100).select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") < 100).select("doc_id", "text")
    D.build_minhash_index(corpus, "example_mh_index")
    hits = D.dedup_against_index(batch, "example_mh_index", min_est_jaccard=0.25)
    print(f"incoming docs flagged as near-dups of the corpus: {hits.count()}")
    nov = D.novelty_against_corpus(batch, corpus)
    nov.agg(F.min("novelty_milli"), F.max("novelty_milli")).show()
    spark.sql("DROP TABLE IF EXISTS example_mh_index")

    # 17. (round 8) attrition waterfall: which filter eats the data
    from ukis_h3cellstore_spark.ops import selection as SEL

    att_base = docs.select(
        "doc_id",
        "source",
        F.size(X.tokens("text")).cast("long").alias("nt"),
        F.size(F.array_distinct(X.tokens("text"))).cast("long").alias("nd"),
    )
    SEL.first_fail_stage(
        att_base,
        [("min_tokens", F.col("nt") >= 20), ("ttr", 10 * F.col("nd") >= 3 * F.col("nt"))],
    ).groupBy("fail_stage").count().show()

    # 18. (round 8) tokenize -> pack -> shard: train a BPE merge table
    # (on a sample at scale), apply it, pack 512-token windows, export
    merges = X.bpe_train(docs.select("doc_id", "text"), n_merges=2)
    print(f"learned merges: {[(l, r) for _, l, r, _ in merges]}")
    cur = docs.select("doc_id", "text")
    for _, l, r, _ in merges:
        cur = X.bpe_apply_merge(cur, l, r).select("doc_id", "text")
    packed = SM.pack_documents(cur, max_tokens=512, num_shards=8)
    from ukis_h3cellstore_spark.layout import write_jsonl_shards

    shard_dir = tempfile.mkdtemp(prefix="shards_")
    manifest = write_jsonl_shards(
        cur.join(packed, "doc_id"), shard_dir, docs_per_shard=2000
    )
    print(f"exported {manifest.count()} jsonl shards to {shard_dir}")

    # 19. (round 8) statistical audits: KS drift per source, PSI of the
    # length distribution, scorer rank agreement, Zipf diagnostic
    from ukis_h3cellstore_spark.ops.report import psi_drift
    from ukis_h3cellstore_spark.ops.robust import ks_vs_rest, spearman_milli

    lens = docs.select("source", F.size(X.tokens("text")).cast("long").alias("nt"))
    ks_vs_rest(lens, "source", "nt").orderBy(F.desc("ks_scaled")).show(3)
    psi_drift(lens, "source", "nt", [30.0, 50.0, 70.0, 90.0]).orderBy(
        F.desc("psi")
    ).show(3)
    rd = X.readability(docs).filter(F.col("n_words") > 0)
    spearman_milli(rd, "n_words", "flesch_milli", "doc_id").show()
    X.zipf_slope(docs, top_n=200).show()

    # 20. (round 10) corpus-vs-corpus alignment mining + diversity
    # datacard: every embedding mined against the whole corpus through
    # the IVF probed lists (no broadcast of the query side), and the
    # self-repetition audit in its fixed-state approximate form
    from ukis_h3cellstore_spark.ops.similarity import margin_pairs_ivf

    margin_pairs_ivf(embs, embs, n_centroids=16, nprobe=4).orderBy(
        F.desc("margin")
    ).show(5)
    X.ngram_diversity(docs, "source", "text", approx=True).orderBy(
        "diversity_milli"
    ).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
