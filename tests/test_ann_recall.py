"""Frozen ANN recall floors.

The correctness gates pin PARAMETERS (exact hashes, fixed seeds), so a
quantization regression that degrades neighbor quality while keeping
the pipeline deterministic is invisible to them. This test freezes the
measured recall@3 of each approximate family against the exact
brute-force baseline (cosine for the hash/partition families, L2 for
the quantized-code families — PQ/SQ8 approximate L2 ranking) on the
500×64 sf0.001 embeddings with 25 query vectors.

Every path is seed-fixed and order-independent, so the measured recall
is bit-stable (verified across repeated runs and parallelism levels);
the floors are set AT the measured values — any drop fails, any
improvement passes. Re-freeze deliberately (tools/ann_recall.py prints
the full sweep) when a quantizer is intentionally retrained.

Absolute levels are honest context, not indictments: the synthetic
embeddings are i.i.d. noise with no cluster structure, the worst case
for ANN (distances concentrate), and these configs are the aggressive
compression rungs. Relative movement is what the floors watch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ukis_h3cellstore_spark.ops import similarity as S

K = 3
N_QUERIES = 25

# measured 2026-08-15 (round 8) on /root/testdata/sf0.001 embeddings;
# integer hits out of N_QUERIES * K = 75 exact pairs (recall floors
# 0.28 / 0.84 / 0.267 / 0.133 / 0.827) — integers, so no float-edge
# flakiness in the comparison
FLOOR_HITS_COSINE = {
    "lsh_8x6": 21,
    "ivf_16c_p4": 63,
}
FLOOR_HITS_L2 = {
    "pq_m8_k16": 20,
    "ivfpq_8c_p4": 10,
    "sq8": 62,
}

# measured 2026-08-15 (round 9): prefix-dim retrieval quality for the
# matryoshka family — recall@3 hits out of 75 vs exact full-width
# cosine. The prefix stage alone degrades hard on i.i.d. noise (no
# learned matryoshka structure), while the tiered full-width rerank of
# a 20-deep shortlist recovers most of it; the floors watch BOTH so a
# slicing or rerank regression can't hide.
FLOOR_HITS_MATRYOSHKA = {8: 6, 16: 9, 32: 18}
FLOOR_HITS_TIERED = {8: 17, 16: 30, 32: 53}


def _pairs(df) -> set:
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    return e, q


@pytest.fixture(scope="module")
def exact_cos(corpus):
    e, q = corpus
    got = _pairs(S.cosine_topk(e, q, k=K))
    assert len(got) == N_QUERIES * K
    return got


@pytest.fixture(scope="module")
def exact_l2(corpus):
    e, q = corpus
    got = _pairs(S.l2_topk(e, q, k=K))
    assert len(got) == N_QUERIES * K
    return got


def _hits(approx: set, exact: set) -> int:
    return len(approx & exact)


def test_lsh_recall_floor(corpus, exact_cos):
    e, q = corpus
    got = _hits(_pairs(S.lsh_topk(e, q, k=K, num_tables=8, num_planes=6)), exact_cos)
    assert got >= FLOOR_HITS_COSINE["lsh_8x6"], got


def test_ivf_recall_floor(corpus, exact_cos):
    e, q = corpus
    got = _hits(_pairs(S.ivf_topk(e, q, k=K, n_centroids=16, nprobe=4)), exact_cos)
    assert got >= FLOOR_HITS_COSINE["ivf_16c_p4"], got


def test_pq_recall_floor(corpus, exact_l2):
    e, q = corpus
    got = _hits(_pairs(S.pq_topk(e, q, k=K, m=8, n_centroids=16)), exact_l2)
    assert got >= FLOOR_HITS_L2["pq_m8_k16"], got


def test_ivfpq_recall_floor(corpus, exact_l2):
    e, q = corpus
    got = _hits(_pairs(S.ivfpq_topk(e, q, k=K, n_coarse=8, nprobe=4)), exact_l2)
    assert got >= FLOOR_HITS_L2["ivfpq_8c_p4"], got


def test_sq8_recall_floor(corpus, exact_l2):
    e, q = corpus
    got = _hits(_pairs(S.sq8_topk(e, q, k=K)), exact_l2)
    assert got >= FLOOR_HITS_L2["sq8"], got


@pytest.mark.parametrize("dims", [8, 16, 32])
def test_matryoshka_recall_floor(corpus, exact_cos, dims):
    e, q = corpus
    got = _hits(_pairs(S.matryoshka_topk(e, q, dims=dims, k=K)), exact_cos)
    assert got >= FLOOR_HITS_MATRYOSHKA[dims], (dims, got)


@pytest.mark.parametrize("dims", [8, 16, 32])
def test_tiered_rerank_recall_floor(corpus, exact_cos, dims):
    e, q = corpus
    got = _hits(
        _pairs(S.tiered_rerank(e, q, dims=dims, shortlist_k=20, k=K)),
        exact_cos,
    )
    assert got >= FLOOR_HITS_TIERED[dims], (dims, got)
    # the rerank must never do worse than its own prefix stage
    pre = _hits(_pairs(S.matryoshka_topk(e, q, dims=dims, k=K)), exact_cos)
    assert got >= pre, (dims, got, pre)


# measured 2026-08-15 (round 10): corpus-vs-corpus margin mining.
# Top-1 agreement with exact margin_pairs over all 500 queries —
# i.i.d. noise embeddings make probed-list recall the binding factor
# (same regime as the raw IVF floors above); nprobe trades cost for
# recall exactly as documented.
FLOOR_MARGIN_TOP1 = {2: 195, 4: 290}  # measured 215 / 316


@pytest.mark.parametrize("alt", ["arrow", "gemm"])
def test_ivf_vectorized_scorers_agree_with_hof(corpus, alt):
    """The vectorized scorers (per-pair mapInArrow, per-list GEMM) and
    the JVM fold must produce the SAME ranked candidates: float sums
    differ only in add order (blocked/BLAS vs sequential), which the
    4-digit output rounding dominates by ~10 orders of magnitude on
    unit-scale vectors, so the full rounded rows — not just the
    ranking — must agree here. (Gates still pin scorer='hof' via the
    auto threshold at 32 dims; this test is what licenses the
    vectorized paths as the same operator at high dims.)"""
    e, q = corpus
    kw = dict(k=K, n_centroids=16, nprobe=4, train_iters=2)
    rows_hof = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
        for r in S.ivf_topk(e, q, scorer="hof", **kw).collect()
    }
    rows_alt = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
        for r in S.ivf_topk(e, q, scorer=alt, **kw).collect()
    }
    assert rows_hof == rows_alt


def test_gemm_hot_list_block_split_exact(corpus):
    """Forcing the hot-list split (block_rows=7 → every ~31-row
    inverted list shatters into ~5 hash blocks, queries replicated to
    each) must leave the ranked output IDENTICAL to the unsplit gemm
    scorer and the JVM fold: per-block top-k union ⊇ per-list top-k,
    and the global rank window downstream picks the same exact rows.
    This is what licenses the split as a pure physical-skew knob —
    at 100 TB a hot list becomes ceil(|list|/block_rows) tasks instead
    of pinning one grouped-pandas task."""
    e, q = corpus
    kw = dict(k=K, n_centroids=16, nprobe=4, train_iters=2)

    def rows(**extra):
        return {
            (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
            for r in S.ivf_topk(e, q, **kw, **extra).collect()
        }

    split = rows(scorer="gemm", gemm_block_rows=7)
    assert split == rows(scorer="gemm")
    assert split == rows(scorer="gemm", gemm_block_rows=0)  # no-split path
    assert split == rows(scorer="hof")


@pytest.mark.parametrize("nprobe", [2, 4])
def test_margin_pairs_ivf_recall_floor(corpus, nprobe):
    e, _ = corpus
    exact = {
        r["query_id"]: r["neighbor_id"] for r in S.margin_pairs(e, e).collect()
    }
    ivf = {
        r["query_id"]: r["neighbor_id"]
        for r in S.margin_pairs_ivf(
            e, e, n_centroids=16, nprobe=nprobe
        ).collect()
    }
    # coverage can only shrink vs exact: a query whose probed lists
    # hold fewer than 2 other vectors is dropped by the margin pivot's
    # cos_top2 IS NOT NULL filter. With this fixture (500 vecs / 16
    # centroids) every probed list has >= 2 members so coverage is
    # total in practice, but the operator contract only bounds it
    assert len(ivf) <= len(exact)
    assert len(ivf) >= int(0.95 * len(exact)), (len(ivf), len(exact))
    hits = sum(1 for q, n in exact.items() if ivf.get(q) == n)
    assert hits >= FLOOR_MARGIN_TOP1[nprobe], (nprobe, hits)
