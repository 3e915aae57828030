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
