"""Round-11 additions: approx (bounded-state) variants of the
report-family distinct counts, and the CDC tableset gate's operator
plumbing already covered by tests/test_store_upsert.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_corpus_datacard_approx_close_to_exact(spark):
    """approx=True (HLL++ distincts + percentile_approx median) must
    track the exact datacard within tight bounds on the fixture —
    HLL++ is exact below its sparse threshold, so the low-cardinality
    source/lang counts should be IDENTICAL; the approx median sits
    within one length unit of the exact middle-rank median; everything
    else is exact by construction in both modes."""
    from ukis_h3cellstore_spark.ops import report as RP

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    er = RP.corpus_datacard(docs).collect()[0]
    ar = RP.corpus_datacard(docs, approx=True).collect()[0]
    assert ar.n_docs == er.n_docs
    assert ar.n_sources == er.n_sources  # HLL sparse mode: exact
    assert ar.n_langs == er.n_langs
    assert ar.total_tokens == er.total_tokens
    assert ar.total_chars == er.total_chars
    assert (ar.n_dup_groups, ar.n_dup_docs) == (er.n_dup_groups, er.n_dup_docs)
    assert ar.top_source_share_milli == er.top_source_share_milli
    assert abs(ar.median_chars - er.median_chars) <= 1.0, (
        ar.median_chars,
        er.median_chars,
    )


def test_vocab_oov_report_approx_close_to_exact(spark):
    """approx=True replaces only the per-group distinct-doc count; all
    token counts and rates stay exact. On fixture-scale cardinalities
    the HLL++ estimate must stay within 5x its 1% rsd."""
    from ukis_h3cellstore_spark.ops import text as X

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact = {r["lang"]: r for r in X.vocab_oov_report(docs, k=50).collect()}
    approx = {
        r["lang"]: r
        for r in X.vocab_oov_report(docs, k=50, approx=True).collect()
    }
    assert set(exact) == set(approx)
    for lang, er in exact.items():
        ar = approx[lang]
        assert ar.total_tokens == er.total_tokens
        assert ar.oov_tokens == er.oov_tokens
        assert ar.oov_rate == er.oov_rate
        rel = abs(ar.n_docs - er.n_docs) / max(er.n_docs, 1)
        assert rel <= 0.05, (lang, er.n_docs, ar.n_docs)


def test_datacard_gate_pins_exact_form(spark):
    """The registry gate must keep calling the exact datacard (oracle
    hash parity depends on it)."""
    import inspect

    from ukis_h3cellstore_spark import entry_queries_ops as EQ

    src = inspect.getsource(EQ.q_corpus_datacard)
    assert "approx=True" not in src


def test_auto_clean_blocks_ladder():
    """The auto depth must stay at the plain pigeonhole split (c=1)
    for every test-SF-sized corpus and climb only where the c=1 key
    space saturates: d=8 over 64 bits has 7-bit strip keys, so at 1M
    prints the expected collision volume forces the deep combination
    tables; d=3 keeps 16-bit strips that remain selective at 1M."""
    from ukis_h3cellstore_spark.ops.dedup import _auto_clean_blocks

    assert _auto_clean_blocks(6_000, 64, 8) == 1
    assert _auto_clean_blocks(13_000, 64, 8) == 1
    assert _auto_clean_blocks(1_000_000, 64, 3) == 1
    assert _auto_clean_blocks(1_000_000, 64, 8) == 4
    # the table cap binds before the volume target at extreme n
    import math

    c = _auto_clean_blocks(10**9, 64, 8)
    assert math.comb(8 + c, c) <= 1024


def test_hamming_pairs_combination_banding_exact(spark):
    """Every clean_blocks depth is an exact superset generator: the
    verified pair set must be IDENTICAL across c=1 (classic strips),
    c=2..4 (combination tables), and auto — including fingerprints
    differing in exactly max_hamming bits (kept) and max_hamming+1
    bits (dropped), with the differing bits adversarially packed into
    one block and spread across all blocks."""
    from ukis_h3cellstore_spark.ops.dedup import hamming_pairs

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    base = 0x0123_4567_89AB_CDEF
    rows = [
        (0, signed(base)),
        (1, signed(base ^ 0xFF)),                  # 8 bits, one low block
        (2, signed(base ^ 0x1FF)),                 # 9 bits -> excluded
        (3, signed(base ^ (1 << 63) ^ 1)),         # 2 bits, extreme blocks
        (4, signed(base ^ 0x8040_2010_0804_0201)), # 8 bits, spread over all
        (5, signed(base ^ 0x8040_2010_0804_0301)), # 9 bits spread -> excluded
        (6, signed(0x7777_7777_7777_7777)),        # far from everything
    ]
    fp = spark.createDataFrame(rows, "doc_id long, fp long")
    expected = None
    for c in (1, 2, 3, 4, "auto"):
        got = sorted(
            (r["id_a"], r["id_b"], r["hamming"])
            for r in hamming_pairs(
                fp, "fp", bits=64, max_hamming=8, clean_blocks=c
            ).collect()
        )
        if expected is None:
            expected = got
            assert (0, 1, 8) in got and (0, 3, 2) in got and (0, 4, 8) in got
            assert (1, 2, 1) in got and (4, 5, 1) in got
            assert all(p[2] <= 8 for p in got)
            dropped = {(0, 2), (0, 5)}  # 9-bit distances
            assert not any((a, b) in dropped for a, b, _ in got)
            assert not any(6 in (a, b) for a, b, _ in got)
        else:
            assert got == expected, c


def test_hamming_bucket_cap_and_stats(spark):
    """max_bucket_size drops only pairs whose EVERY agreeing
    combination bucket is hot: a planted hot bucket (many prints
    sharing one strip value) is excluded, while a near-dup pair that
    also agrees on an uncapped strip survives. hamming_bucket_stats
    must report exactly the buckets the cap dropped."""
    from ukis_h3cellstore_spark.ops.dedup import (
        hamming_bucket_stats,
        hamming_pairs,
    )

    # bits=16, d=1, c=1 -> 2 strips of 8 bits. 40 prints share LOW
    # byte 0x55 with EVEN-PARITY high bytes (a distance-2 code: no
    # qualifying d<=1 pair among them — the hot low-strip bucket holds
    # only non-pairs); ids 100/101 differ by 1 bit in the LOW byte so
    # they agree on the HIGH strip (0x3300) only.
    evens = [b for b in range(256) if bin(b).count("1") % 2 == 0][:40]
    rows = [(i, (evens[i] << 8) | 0x55) for i in range(40)]
    rows += [(100, 0x3300 | 0x0F), (101, 0x3300 | 0x0E)]
    fp = spark.createDataFrame(rows, "doc_id long, fp long")

    uncapped = {
        (r["id_a"], r["id_b"])
        for r in hamming_pairs(
            fp, "fp", bits=16, max_hamming=1, clean_blocks=1
        ).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in hamming_pairs(
            fp, "fp", bits=16, max_hamming=1, clean_blocks=1,
            max_bucket_size=10,
        ).collect()
    }
    # the hot bucket held no qualifying pairs, and (100, 101) agrees
    # on the uncapped high strip -> capped output is identical here
    assert (100, 101) in capped and capped == uncapped

    stats = hamming_bucket_stats(
        fp, "fp", bits=16, max_hamming=1, clean_blocks=1,
        max_bucket_size=10,
    ).collect()
    dropped = [(r["band"], r["band_key"], r["n_prints"])
               for r in stats if r["dropped"]]
    # ids 100/101 carry low bytes 0x0F/0x0E, not 0x55, so exactly the
    # 40 planted prints populate the one hot bucket
    assert dropped == [(0, 0x55, 40)]


def test_key_skew_report_semantics(spark):
    """Exact counts, deterministic tie ranks (count desc, value asc),
    NULL as a first-class reported key, per-column distincts, and
    integral milli shares — checked against a hand-computed frame."""
    from ukis_h3cellstore_spark.ops.report import key_skew_report

    rows = [
        ("a", "x"), ("a", "x"), ("a", "x"), ("a", None),
        ("b", "x"), ("b", "y"), ("c", "y"), ("c", "y"), ("d", "z"),
        ("d", "z"),
    ]
    df = spark.createDataFrame(rows, "k string, v string")
    out = {
        (r["column"], r["rank"]): (
            r["value"], r["n_rows"], r["share_milli"], r["n_distinct"]
        )
        for r in key_skew_report(df, ["k", "v"], top_n=3).collect()
    }
    # k: a=4, b=2, c=2, d=2 -> ties at rank 2 break on value asc
    assert out[("k", 1)] == ("a", 4, 400, 4)
    assert out[("k", 2)] == ("b", 2, 200, 4)
    assert out[("k", 3)] == ("c", 2, 200, 4)
    # v: x=4, y=3, z=2, <null>=1 (NULL is a reported key value)
    assert out[("v", 1)] == ("x", 4, 400, 4)
    assert out[("v", 2)] == ("y", 3, 300, 4)
    assert out[("v", 3)] == ("z", 2, 200, 4)
    assert len(out) == 6  # top_n=3 per column

    full = key_skew_report(df, ["v"], top_n=10).collect()
    assert ("<null>", 1) in {(r["value"], r["n_rows"]) for r in full}


def test_hamming_pairs_max_hamming_zero_full_width(spark):
    """max_hamming=0 with c=1 is one FULL-WIDTH 64-bit block — the
    mask literal 2^64-1 would overflow a signed long, so the block
    extractor must skip the mask (shift-by-0 IS the value). Semantics:
    exact-duplicate fingerprint pairs only."""
    from ukis_h3cellstore_spark.ops.dedup import hamming_pairs

    rows = [(0, 7), (1, 7), (2, 6), (3, -1), (4, -1)]
    fp = spark.createDataFrame(rows, "doc_id long, fp long")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_pairs(
            fp, "fp", bits=64, max_hamming=0, clean_blocks=1
        ).collect()
    )
    assert got == [(0, 1, 0), (3, 4, 0)]


def test_key_skew_report_rejects_duplicate_cols(spark):
    from ukis_h3cellstore_spark.ops.report import key_skew_report

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="duplicates"):
        key_skew_report(df, ["k", "k"])
