"""Property tests for the round-9 operators: structural invariants
that must hold on any input — funnel monotonicity, diversity bounds,
curriculum packing order, margin non-negativity.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 9),                  # user
            st.sampled_from(["signup", "view", "click", "purchase"]),
            st.integers(0, 1_000),              # ts (seconds)
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**SETTINGS)
def test_funnel_counts_non_increasing(spark, rows):
    from ukis_h3cellstore_spark.entry_queries_ops import (
        q_events_funnel_conversion,
    )
    import tempfile

    df = spark.createDataFrame(
        [(u, t, float(s)) for u, t, s in rows],
        "user_id long, event_type string, sec double",
    ).select("user_id", "event_type", F.timestamp_seconds("sec").alias("ts"))
    d = tempfile.mkdtemp(prefix="funnel_prop_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {r["stage"]: r for r in q_events_funnel_conversion(spark, d).collect()}
    assert set(got) == {1, 2, 3, 4}
    for k in (2, 3, 4):
        # a user must reach stage k-1 (at an earlier-or-equal ts) to
        # reach stage k
        assert got[k]["n_users"] <= got[k - 1]["n_users"]
        assert 0 <= got[k]["conv_milli"] <= 1000 or got[k - 1]["n_users"] == 0
    assert got[1]["conv_milli"] == 1000


@given(
    docs=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_ngram_diversity_bounds(spark, docs):
    import tempfile

    from ukis_h3cellstore_spark.entry_queries_ops import (
        q_corpus_ngram_diversity,
    )

    df = spark.createDataFrame(
        [(i, t, "s0") for i, t in enumerate(docs)],
        "doc_id long, text string, source string",
    )
    d = tempfile.mkdtemp(prefix="ngram_prop_")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = q_corpus_ngram_diversity(spark, d).collect()
    for r in rows:
        assert 0 <= r["distinct_trigrams"] <= r["total_trigrams"]
        if r["total_trigrams"] > 0:
            assert 0 <= r["diversity_milli"] <= 1000
        assert r["total_trigrams"] <= r["total_tokens"]


@given(
    lengths=st.lists(st.integers(0, 40), min_size=1, max_size=25),
    max_tokens=st.integers(5, 64),
)
@settings(**SETTINGS)
def test_curriculum_pack_invariants(spark, lengths, max_tokens):
    from ukis_h3cellstore_spark.ops.sampling import pack_documents

    df = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lengths)],
        "doc_id long, text string",
    ).withColumn(
        "nt",
        F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
            F.size(F.split(F.trim(F.col("text")), r"\s+"))
        ),
    )
    packed = pack_documents(
        df, max_tokens=max_tokens, num_shards=2, order_cols=["nt", "doc_id"]
    ).collect()
    by_shard: dict = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r)
    total = 0
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["bin_offset"])
        run = 0
        last_nt = -1
        for r in rs:
            # offsets are the exclusive cumsum in curriculum order,
            # which is non-decreasing in n_tokens
            assert r["bin_offset"] == run
            assert r["bin"] == run // max_tokens
            assert r["n_tokens"] >= last_nt
            run += r["n_tokens"]
            last_nt = r["n_tokens"]
        total += len(rs)
    assert total == len(lengths)


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-1, 1, allow_nan=False, width=32).map(
                lambda v: round(v, 3)
            ),
            min_size=4,
            max_size=4,
        ).filter(lambda v: sum(x * x for x in v) > 1e-6),
        min_size=3,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_margin_pairs_invariants(spark, vecs):
    from ukis_h3cellstore_spark.ops.similarity import margin_pairs

    corpus = spark.createDataFrame(
        [(i + 100, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(1, vecs[0])], "vec_id long, embedding array<float>"
    )
    rows = margin_pairs(corpus, q).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["cos_top1"] >= r["cos_top2"]
    assert r["margin"] >= 0
    assert abs(r["margin"] - round(r["cos_top1"] - r["cos_top2"], 4)) < 1e-9
