"""Round-9 hardening tests: NULL-handling contracts for the drift /
dependence auditors and cross-join semantics for fuzzy_join — the three
low-severity findings from the round-8 advisor, pinned so they stay
fixed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ukis_h3cellstore_spark.ops.joins import fuzzy_join
from ukis_h3cellstore_spark.ops.report import categorical_dependence, psi_drift
from ukis_h3cellstore_spark.ops.robust import ks_vs_rest, w1_vs_rest


def test_fuzzy_join_self_emits_each_pair_once(spark):
    df = spark.createDataFrame(
        [(1, "acme corp"), (2, "acme corp."), (3, "zebra inc")],
        ["id", "name"],
    )
    got = {(r["id_a"], r["id_b"]) for r in
           fuzzy_join(df, df, "name", "id", max_distance=3).collect()}
    assert got == {(1, 2)}


def test_fuzzy_join_cross_keeps_pairs_regardless_of_id_order(spark):
    # left ids are HIGHER than right ids — under the old id_a < id_b
    # filter every one of these valid matches was silently dropped.
    left = spark.createDataFrame(
        [(100, "acme corp"), (101, "zebra inc")], ["id", "name"]
    )
    right = spark.createDataFrame(
        [(1, "acme corp."), (2, "zebra incx")], ["id", "name"]
    )
    got = {(r["id_a"], r["id_b"]) for r in
           fuzzy_join(left, right, "name", "id", max_distance=3).collect()}
    assert got == {(100, 1), (101, 2)}


def test_fuzzy_join_cross_excludes_same_id_only(spark):
    # cross join with overlapping id ranges: both orientations of a
    # distinct-id match survive; identical ids are excluded.
    left = spark.createDataFrame(
        [(1, "acme corp"), (2, "acme corps")], ["id", "name"]
    )
    right = spark.createDataFrame(
        [(1, "acme corp"), (2, "acme corps")], ["id", "name"]
    )
    got = {(r["id_a"], r["id_b"]) for r in
           fuzzy_join(left, right, "name", "id", max_distance=3).collect()}
    assert got == {(1, 2), (2, 1)}


def test_psi_drift_ignores_null_values_and_groups(spark):
    base = [("a", float(v)) for v in (1, 2, 3, 60)] + [
        ("b", float(v)) for v in (1, 2, 3, 60)
    ]
    clean = spark.createDataFrame(base, ["g", "v"])
    dirty = spark.createDataFrame(
        base + [("a", None)] * 50 + [(None, 5.0)] * 50,
        "g string, v double",
    )
    edges = [10.0, 50.0]
    ref = {(r["g"], r["psi"]) for r in
           psi_drift(clean, "g", "v", edges).collect()}
    got = {(r["g"], r["psi"]) for r in
           psi_drift(dirty, "g", "v", edges).collect()}
    # NULL values used to fall through every when() into the TOP bin
    # (and NULL groups formed a phantom group); both must be no-ops.
    assert got == ref
    assert all(g is not None for g, _ in got)


def test_categorical_dependence_ignores_null_categories(spark):
    base = [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"), ("x", "p")]
    clean = spark.createDataFrame(base, ["a", "b"])
    dirty = spark.createDataFrame(
        base + [(None, "p")] * 20 + [("x", None)] * 20 + [(None, None)] * 5,
        "a string, b string",
    )
    ref = categorical_dependence(clean, "a", "b").collect()[0]
    got = categorical_dependence(dirty, "a", "b").collect()[0]
    assert got.asDict() == ref.asDict()
    assert got["n"] == len(base)


def test_ks_and_w1_ignore_null_groups(spark):
    base = [("a", v) for v in (1, 2, 3, 4)] + [("b", v) for v in (101, 102)]
    clean = spark.createDataFrame(base, ["g", "v"])
    dirty = spark.createDataFrame(
        base + [(None, 50)] * 30, "g string, v bigint"
    )
    for fn in (ks_vs_rest, w1_vs_rest):
        ref = sorted(
            (tuple(r) for r in fn(clean, "g", "v").collect())
        )
        got_rows = fn(dirty, "g", "v").collect()
        assert all(r["g"] is not None for r in got_rows)
        # the NULL rows change the POOLED curve only via their absence:
        # with them filtered, the dirty frame equals the clean one.
        assert sorted(tuple(r) for r in got_rows) == ref


def test_pack_documents_order_cols_curriculum(spark):
    from ukis_h3cellstore_spark.ops.sampling import pack_documents

    rows = [(i, " ".join(["w"] * n)) for i, n in
            enumerate([50, 10, 30, 20, 40, 5, 25, 15])]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "nt", F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    default = pack_documents(df, max_tokens=60, num_shards=1)
    curric = pack_documents(
        df, max_tokens=60, num_shards=1, order_cols=["nt", "doc_id"]
    )
    # default packs in id order; curriculum packs shortest-first
    d = {r["doc_id"]: r["bin_offset"] for r in default.collect()}
    c = {r["doc_id"]: r["bin_offset"] for r in curric.collect()}
    assert d[0] == 0  # id order: doc 0 first
    assert c[5] == 0  # curriculum: the 5-token doc first
    # offsets under curriculum are the exclusive cumsum of sorted lengths
    order = sorted(rows, key=lambda r: (len(r[1].split()), r[0]))
    run = 0
    for i, text in order:
        assert c[i] == run
        run += len(text.split())
    # same bins content-wise when order_cols is the id (back-compat)
    same = pack_documents(df, max_tokens=60, num_shards=1, order_cols=["doc_id"])
    assert {tuple(r) for r in same.collect()} == {
        tuple(r) for r in default.collect()
    }


def test_margin_pairs_hand_computed(spark):
    from ukis_h3cellstore_spark.ops.similarity import margin_pairs

    # query q is collinear with c1 (cos 1.0), at 45° to c2 (~0.7071),
    # orthogonal to c3 — margin = 1.0 - 0.7071
    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [1.0, 1.0]), (12, [0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    q = spark.createDataFrame([(1, [2.0, 0.0])], ["vec_id", "embedding"])
    r = margin_pairs(corpus, q).collect()[0]
    assert r["query_id"] == 1 and r["neighbor_id"] == 10
    assert r["cos_top1"] == 1.0 and abs(r["cos_top2"] - 0.7071) < 1e-9
    assert abs(r["margin"] - 0.2929) < 1e-9


def test_margin_pairs_requires_two_neighbors(spark):
    from ukis_h3cellstore_spark.ops.similarity import margin_pairs

    corpus = spark.createDataFrame([(10, [1.0, 0.0])], ["vec_id", "embedding"])
    q = spark.createDataFrame([(1, [1.0, 0.0])], ["vec_id", "embedding"])
    assert margin_pairs(corpus, q).count() == 0


def test_psi_from_counts_drops_null_groups(spark):
    from ukis_h3cellstore_spark.ops.report import psi_from_counts

    clean = spark.createDataFrame(
        [("a", 0, 5), ("a", 1, 5), ("b", 0, 2), ("b", 1, 8)],
        "g string, bin int, c long",
    )
    dirty = spark.createDataFrame(
        [("a", 0, 5), ("a", 1, 5), ("b", 0, 2), ("b", 1, 8),
         (None, 0, 100), (None, 1, 100)],
        "g string, bin int, c long",
    )
    ref = {(r["g"], r["n_group"]) for r in
           psi_from_counts(clean, "g", "bin", "c", 2).collect()}
    got_rows = psi_from_counts(dirty, "g", "bin", "c", 2).collect()
    assert all(r["g"] is not None for r in got_rows)
    # NULL counts must not leak into the pooled curve either
    assert {(r["g"], r["n_group"]) for r in got_rows} == ref


def test_centroid_drift_hand_computed(spark):
    from ukis_h3cellstore_spark.ops.similarity import centroid_drift

    # group a: mean = [1, 0]; group b: mean = [0, 1];
    # pooled mean = [0.5, 0.5] -> cosine with each = 1/sqrt(2)
    df = spark.createDataFrame(
        [("a", [2.0, 0.0]), ("a", [0.0, 0.0]),
         ("b", [0.0, 2.0]), ("b", [0.0, 0.0])],
        "g string, embedding array<float>",
    )
    got = {r["g"]: r for r in centroid_drift(df, "g").collect()}
    assert got["a"]["n_vecs"] == 2 and got["b"]["n_vecs"] == 2
    import math
    want = round(1 / math.sqrt(2), 4)
    assert abs(got["a"]["centroid_cos"] - want) < 1e-9
    assert abs(got["b"]["centroid_cos"] - want) < 1e-9


def test_centroid_drift_identical_groups_cos_one(spark):
    from ukis_h3cellstore_spark.ops.similarity import centroid_drift

    df = spark.createDataFrame(
        [(g, [1.0, 2.0, 3.0]) for g in ("a", "b", "a", "b")],
        "g string, embedding array<float>",
    )
    for r in centroid_drift(df, "g").collect():
        assert r["centroid_cos"] == 1.0
