"""Unit tests for the round-8 operators against serial brute force:
novelty_against_corpus, first_fail_stage, l_diversity,
balanced_sample_by_group, and the streaming novelty operator's
batch-replay equivalence (the gate checks it vs DuckDB; this checks
the in-row shingle construction against ops.dedup.shingle_df)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ukis_h3cellstore_spark.ops import dedup as D
from ukis_h3cellstore_spark.ops import report as RP
from ukis_h3cellstore_spark.ops import sampling as SM
from ukis_h3cellstore_spark.ops import selection as SEL


def _shingles(text: str, k: int = 3) -> set:
    toks = text.strip().split()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_novelty_against_corpus_matches_brute_force(spark):
    corpus_rows = [
        (100, "a b c d e f"),
        (101, "x y z w v u"),
    ]
    new_rows = [
        (1, "a b c d q r"),        # shingles abc bcd overlap; cdq dqr novel
        (2, "p q r s t"),           # fully novel
        (3, "a b c"),               # single shingle, known
        (4, "a b"),                 # too short: no row
    ]
    df_c = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    df_n = spark.createDataFrame(new_rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_shingles, r.n_novel, r.novelty_milli)
        for r in D.novelty_against_corpus(df_n, df_c).collect()
    }
    corpus_sh = set().union(*[_shingles(t) for _, t in corpus_rows])
    for i, t in new_rows:
        sh = _shingles(t)
        if not sh:
            assert i not in out
            continue
        novel = len(sh - corpus_sh)
        assert out[i] == (len(sh), novel, (1000 * novel) // len(sh)), i


def test_first_fail_stage_orders_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 5, 100), (2, 50, 100), (3, 50, 2000), (4, 5, 2000)],
        "id long, a long, b long",
    )
    out = {
        r.id: r.fail_stage
        for r in SEL.first_fail_stage(
            df, [("s_a", F.col("a") >= 10), ("s_b", F.col("b") <= 1000)]
        ).collect()
    }
    # first failing stage wins; passing rows get NULL
    assert out == {1: "s_a", 2: None, 3: "s_b", 4: "s_a"}

    import pytest

    with pytest.raises(ValueError):
        SEL.first_fail_stage(df, [])


def test_l_diversity_flags_homogeneous_classes(spark):
    rows = [
        ("s1", 1, "en"), ("s1", 1, "en"), ("s1", 1, "en"),   # 1 lang -> flag
        ("s1", 2, "en"), ("s1", 2, "de"),                    # 2 langs -> flag (l=3)
        ("s2", 1, "en"), ("s2", 1, "de"), ("s2", 1, "fr"),   # 3 langs -> pass
    ]
    df = spark.createDataFrame(rows, "source string, b int, lang string")
    out = {
        (r.source, r.b): (r.n_members, r.l_distinct)
        for r in RP.l_diversity(df, ["source", "b"], "lang", l=3).collect()
    }
    assert out == {("s1", 1): (3, 1), ("s1", 2): (2, 2)}

    import pytest

    with pytest.raises(ValueError):
        RP.l_diversity(df, ["source"], "lang", l=1)


def test_balanced_sample_by_group_matches_hash_rule(spark):
    rows = [(i, "big" if i % 4 else "small") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    out = SM.balanced_sample_by_group(df, "g", id_col="doc_id", salt="t")
    got = {r.doc_id: (r.n_group, r.keep) for r in out.collect()}
    n_small = sum(1 for _, g in rows if g == "small")
    n_big = len(rows) - n_small
    buckets = 1 << 20
    for i, g in rows:
        n_g = n_big if g == "big" else n_small
        h = hashlib.md5(f"t|{i}".encode()).hexdigest()
        bucket = int(h[:15], 16) % buckets
        assert got[i] == (n_g, bucket * n_g < n_small * buckets), i
    # the smallest group keeps everything
    assert all(keep for i, (n, keep) in got.items() if n == n_small)
    # expected kept in the big group ~ n_small (binomial, loose bound)
    kept_big = sum(1 for n, keep in got.values() if n == n_big and keep)
    assert 0 < kept_big < n_big


def test_streaming_novelty_shingles_match_shingle_df(spark):
    """The in-row shingle construction used by the streaming operator
    must produce exactly shingle_df's distinct per-doc shingle sets."""
    rows = [
        (1, "src", "a b c d e"),
        (2, "src", "a b"),
        (3, "src", ""),
        (4, "src", "  x   y  z  "),
        (5, "src", "a a a a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    from ukis_h3cellstore_spark.streaming import novelty_against_static

    empty_corpus = spark.createDataFrame([], "shingle string")
    # batch mode: same code path, no stream — counts per source equal
    # the union of per-doc distinct shingle sizes from shingle_df
    out = novelty_against_static(df, empty_corpus, "text", "doc_id").collect()
    got = {r.doc_id: r.n_shingles for r in out}
    want = {
        r.doc_id: r.n
        for r in D.shingle_df(df, "text", "doc_id", 3)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    # with the real corpus everything known -> zero novel
    corpus_sh = D.shingle_df(df, "text", "doc_id", 3).select("shingle").distinct()
    out2 = novelty_against_static(df, corpus_sh, "text", "doc_id").collect()
    assert all(r.n_novel == 0 for r in out2)
