"""Unit tests for the round-8 second-wave operators against serial
brute force: ks_vs_rest (explicit ECDF sweep), categorical_dependence
(hand contingency math), pareto_frontier (O(n^2) dominance), the
global_cummax primitive (inclusive + exclusive), readability
(hand-counted fixtures), matryoshka_topk (numpy prefix cosine), and
cdc_upsert micro-batch-split invariance with tombstone semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ukis_h3cellstore_spark.ops.prefix import global_cummax
from ukis_h3cellstore_spark.ops.report import categorical_dependence
from ukis_h3cellstore_spark.ops.robust import ks_vs_rest
from ukis_h3cellstore_spark.ops.selection import pareto_frontier
from ukis_h3cellstore_spark.ops.similarity import matryoshka_topk
from ukis_h3cellstore_spark.ops.text import readability


def _brute_ks(rows, scale=1_000_000):
    """Serial KS-vs-rest: evaluate both ECDF numerators at every
    pooled distinct value, integer arithmetic throughout."""
    all_vals = sorted({v for _, v in rows})
    n = len(rows)
    out = {}
    for g in {g for g, _ in rows}:
        gvals = sorted(v for gg, v in rows if gg == g)
        ng = len(gvals)
        d = 0
        for v in all_vals:
            cg = sum(1 for x in gvals if x <= v)
            c = sum(1 for _, x in rows if x <= v)
            d = max(d, abs(cg * n - c * ng))
        out[g] = (ng, (d * scale) // (ng * n))
    return out


def test_ks_vs_rest_matches_brute_force(spark):
    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 9.0),
        ("b", 2.0), ("b", 3.0), ("b", 4.0), ("b", 4.0), ("b", 5.0),
        ("c", 0.5), ("c", 9.5),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: (r["n_group"], r["ks_scaled"])
        for r in ks_vs_rest(df, "g", "v").collect()
    }
    assert got == _brute_ks(rows)


def test_ks_vs_rest_identical_distribution_is_zero(spark):
    # two groups with IDENTICAL value multisets -> pooled equals each,
    # D = 0 exactly
    rows = [("a", float(v)) for v in (1, 2, 3)] + [
        ("b", float(v)) for v in (1, 2, 3)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    for r in ks_vs_rest(df, "g", "v").collect():
        assert r["ks_scaled"] == 0


def test_categorical_dependence_hand_computed(spark):
    # 2x2 table: o = [[20, 10], [10, 20]], n = 60
    rows = (
        [("x", 0)] * 20 + [("x", 1)] * 10 + [("y", 0)] * 10 + [("y", 1)] * 20
    )
    df = spark.createDataFrame(rows, "a string, b int")
    r = categorical_dependence(df, "a", "b").collect()[0]
    assert (r["n"], r["n_a"], r["n_b"], r["dof"]) == (60, 2, 2, 1)
    # chi2 = sum (o-e)^2/e with e = 15 everywhere: 4 * 25/15 = 20/3
    assert r["chi2"] == round(20 / 3, 6)
    mi = sum(
        (o / 60) * math.log(o * 60 / (30 * 30))
        for o in (20, 10, 10, 20)
    )
    assert r["mi_nats"] == round(mi, 6)
    assert r["cramers_v"] == round(math.sqrt((20 / 3) / 60), 6)


def test_categorical_dependence_independent_is_zero(spark):
    # perfectly proportional table -> chi2 = mi = 0
    rows = [("x", 0)] * 8 + [("x", 1)] * 4 + [("y", 0)] * 4 + [("y", 1)] * 2
    df = spark.createDataFrame(rows, "a string, b int")
    r = categorical_dependence(df, "a", "b").collect()[0]
    assert r["chi2"] == 0.0 and r["mi_nats"] == 0.0 and r["cramers_v"] == 0.0


def _brute_frontier(pts):
    pts = set(pts)
    return {
        p
        for p in pts
        if not any(
            q != p and q[0] >= p[0] and q[1] >= p[1] for q in pts
        )
    }


def test_pareto_frontier_matches_brute_force(spark):
    pts = [
        (1, 9.0), (2, 9.0), (2, 3.0), (3, 7.0), (4, 7.0), (4, 1.0),
        (5, 0.5), (1, 9.0),
    ]
    df = spark.createDataFrame(pts, "x long, y double")
    got = {(r["x"], r["y"]) for r in pareto_frontier(df, "x", "y").collect()}
    assert got == _brute_frontier(pts)
    # (2, 9.0) dominates (1, 9.0); (4, 7.0) dominates (3, 7.0)
    assert got == {(2, 9.0), (4, 7.0), (5, 0.5)}


def test_pareto_frontier_single_point(spark):
    df = spark.createDataFrame([(7, 7.0)], "x long, y double")
    assert [tuple(r) for r in pareto_frontier(df, "x", "y").collect()] == [
        (7, 7.0)
    ]


def test_global_cummax_inclusive_and_exclusive(spark):
    rows = [(i, v) for i, v in enumerate([3, 1, 4, 1, 5, 9, 2, 6])]
    df = spark.createDataFrame(rows, "i long, v long").repartition(4)
    inc = {
        r["i"]: r["cum_max"]
        for r in global_cummax(df, ["i"], "v", num_partitions=3).collect()
    }
    exc = {
        r["i"]: r["cum_max"]
        for r in global_cummax(
            df, ["i"], "v", exclusive=True, num_partitions=3
        ).collect()
    }
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    run = None
    for i, v in enumerate(vals):
        assert exc[i] == run
        run = v if run is None else max(run, v)
        assert inc[i] == run


def test_readability_hand_counted(spark):
    df = spark.createDataFrame(
        [(1, "The cat sat. It purred!"), (2, ""), (3, "no terminator here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in readability(df).collect()}
    # doc 1: 5 words, 2 sentence runs, syllable nuclei: e-a-a-I-u-e = 6
    r1 = got[1]
    assert (r1["n_words"], r1["n_sents"], r1["n_syllables"]) == (5, 2, 6)
    assert r1["flesch_milli"] == 206835 - (1015 * 5) // 2 - (84600 * 6) // 5
    # empty doc: zero words -> NULL score, sentence floor still 1
    assert got[2]["n_words"] == 0 and got[2]["flesch_milli"] is None
    # no [.!?] at all -> n_sents floored at 1
    assert got[3]["n_sents"] == 1


def test_matryoshka_topk_equals_prefix_cosine(spark):
    import numpy as np

    rng = np.random.default_rng(8)
    vecs = rng.normal(size=(12, 8)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = matryoshka_topk(df, df.filter(F.col("vec_id") < 2), dims=4, k=2)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cosine_sim"])
        )
    for qid in (0, 1):
        q = vecs[qid][:4].astype("float64")
        sims = []
        for nid in range(12):
            if nid == qid:
                continue
            c = vecs[nid][:4].astype("float64")
            sims.append(
                (
                    round(float(q @ c / (np.linalg.norm(q) * np.linalg.norm(c))), 4),
                    nid,
                )
            )
        sims.sort(key=lambda t: (-t[0], t[1]))
        want = [(i + 1, nid, s) for i, (s, nid) in enumerate(sims[:2])]
        assert sorted(by_q[qid]) == want


def test_cdc_upsert_split_invariant_with_tombstones(spark, tmp_path):
    from ukis_h3cellstore_spark import streaming as st

    # key 1: update then delete (tombstoned); key 2: delete then
    # update (resurrected); key 3: plain updates
    rows = [
        (1, 10, False, 100), (1, 20, True, 0),
        (2, 11, True, 0), (2, 21, False, 200),
        (3, 12, False, 300), (3, 22, False, 333),
    ]
    src = spark.createDataFrame(
        rows, "user_id long, seq long, is_del boolean, cents long"
    )

    def run(maxf, tag):
        d = str(tmp_path / f"cdc_{tag}")
        src.repartition(6).write.mode("overwrite").parquet(d)
        stream = st.read_stream(
            spark, d, src.schema, max_files_per_trigger=maxf
        )
        out = st.cdc_upsert(stream, "user_id", "seq", "is_del", "cents")
        sink = f"t_cdc_{tag}"
        q = (
            out.writeStream.format("memory").queryName(sink)
            .outputMode("update").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(120)
        return {
            r["user_id"]: (r["last_seq"], r["is_deleted"], r["last_value"])
            for r in (
                spark.table(sink)
                .groupBy("user_id")
                .agg(
                    F.max(
                        F.struct("last_seq", "is_deleted", "last_value")
                    ).alias("m")
                )
                .select("user_id", "m.last_seq", "m.is_deleted", "m.last_value")
                .collect()
            )
        }

    one = run(1, "one")
    allf = run(6, "all")
    want = {1: (20, True, 0), 2: (21, False, 200), 3: (22, False, 333)}
    assert one == want and allf == want


def test_association_rules_hand_computed(spark):
    # baskets: {1:(a,b), 2:(a,b), 3:(a,c), 4:(b,)} -> pair (a,b) n=2
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"),
            (4, "b"), (2, "a")]  # duplicate (2, a) must not double-count
    from ukis_h3cellstore_spark.ops.joins import association_rules

    df = spark.createDataFrame(rows, "b long, i string")
    out = {(r["item_a"], r["item_b"]): r
           for r in association_rules(df, "b", "i", min_pair_support=2).collect()}
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    # a in 3 baskets, b in 3, pair in 2, 4 baskets total
    assert (r["pair_n"], r["a_n"], r["b_n"]) == (2, 3, 3)
    assert r["lift_milli"] == (1000 * 2 * 4) // (3 * 3)  # 888
    assert r["conf_milli"] == (1000 * 2) // 3             # 666


def test_fuzzy_join_blocks_and_verifies(spark):
    from ukis_h3cellstore_spark.ops.joins import fuzzy_join

    rows = [
        (1, "red widget"), (2, "red wodget"),   # same block, dist 1
        (3, "red wormgear"),                     # same block, dist > 3
        (4, "blue widget"),                      # different block
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r["id_a"], r["id_b"], r["distance"])
           for r in fuzzy_join(df, df, "name", "id", max_distance=3).collect()}
    assert got == {(1, 2, 1)}


def test_cusum_changepoint_hand_computed(spark):
    from ukis_h3cellstore_spark.ops.robust import cusum_changepoint

    # series: 0,0,0,10,10 (mean 4): S_i (scaled by n=5) over
    # dev = 5x - 20: -20,-40,-60,-30,0 -> peak |S|=60 at k=3
    rows = [("g", k, v) for k, v in enumerate([0, 0, 0, 10, 10], start=1)]
    df = spark.createDataFrame(rows, "g string, k long, v long")
    r = cusum_changepoint(df, "g", ["k"], "v").collect()[0]
    assert (r["n_group"], r["peak_abs_dev"], r["peak_k"]) == (5, 60 // 5, 3)


def test_psi_drift_single_group_is_zero(spark):
    from ukis_h3cellstore_spark.ops.report import psi_drift

    rows = [("s", float(v)) for v in (1, 5, 12, 30, 77)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = psi_drift(df, "g", "v", [10.0, 50.0]).collect()[0]
    # the only group IS the pooled corpus -> p_g == p_all -> PSI = 0
    assert r["psi"] == 0.0 and r["n_group"] == 5


def test_psi_drift_hand_computed_two_groups(spark):
    from ukis_h3cellstore_spark.ops.report import psi_drift

    rows = [("a", 1.0)] * 4 + [("b", 100.0)] * 6
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r["psi"] for r in psi_drift(df, "g", "v", [10.0]).collect()}
    # bins: (<10, >=10); counts a=(4,0), b=(0,6), pooled=(4,6); B=2
    def psi(cs, ng):
        ps = [(c + 1) / (ng + 2) for c in cs]
        pa = [(c + 1) / (10 + 2) for c in (4, 6)]
        return round(sum((g - a) * math.log(g / a) for g, a in zip(ps, pa)), 6)

    assert got["a"] == psi((4, 0), 4)
    assert got["b"] == psi((0, 6), 6)


def test_hits_star_graph_hand_computed(spark):
    from ukis_h3cellstore_spark.ops.graph import hits

    # star: u1,u2,u3 -> t ; u1 -> t2. After 1 iteration:
    # a_raw(t)=3s, a_raw(t2)=s (s=1e9); tot=4s -> a(t)=0.75s, a(t2)=0.25s
    # h_raw(u1)=a(t)+a(t2)=1.0s, h_raw(u2)=h_raw(u3)=0.75s; tot=2.5s
    # -> h(u1)=0.4s, h(u2)=h(u3)=0.3s
    edges = spark.createDataFrame(
        [("u1", "t"), ("u2", "t"), ("u3", "t"), ("u1", "t2")],
        "src string, dst string",
    )
    got = {r["node"]: (r["hub_fp"], r["auth_fp"])
           for r in hits(edges, iterations=1).collect()}
    s = 10**9
    assert got["t"] == (0, 3 * s // 4)
    assert got["t2"] == (0, s // 4)
    assert got["u1"] == (4 * s // 10, 0)
    assert got["u2"] == (3 * s // 10, 0)
    assert got["u3"] == (3 * s // 10, 0)


def test_hits_iterations_preserve_normalization(spark):
    from ukis_h3cellstore_spark.ops.graph import hits

    edges = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "y"), ("c", "x"), ("c", "z")],
        "src string, dst string",
    )
    rows = hits(edges, iterations=3).collect()
    s = 10**9
    hub_tot = sum(r["hub_fp"] for r in rows)
    auth_tot = sum(r["auth_fp"] for r in rows)
    # floor division loses at most 1 unit per node
    assert s - len(rows) <= hub_tot <= s
    assert s - len(rows) <= auth_tot <= s


def test_rfm_segments_hand_computed(spark):
    from ukis_h3cellstore_spark.ops.report import rfm_segments

    # 5 entities, metrics are permutations of 1..5 -> quintiles are
    # exactly the ascending rank of each metric
    rows = [
        (1, 10, 3, 500), (2, 20, 1, 400), (3, 30, 4, 300),
        (4, 40, 5, 200), (5, 50, 2, 100),
    ]
    df = spark.createDataFrame(rows, "id long, rec long, freq long, mon long")
    got = {r["id"]: (r["r_score"], r["f_score"], r["m_score"], r["segment"])
           for r in rfm_segments(df, "id", "rec", "freq", "mon").collect()}
    assert got[1] == (1, 3, 5, 135)
    assert got[4] == (4, 5, 2, 452)
    assert got[5] == (5, 2, 1, 521)


def test_zipf_slope_exact_power_law(spark):
    from ukis_h3cellstore_spark.ops.text import zipf_slope

    # construct a corpus whose term frequencies are freq(r) = 2^(8-r)
    # for ranks 1..4: ln(freq) = ln(2^8) - r' ... not linear in
    # ln(rank), so just verify against the serial normal equations
    words = []
    for i, f in enumerate([64, 32, 16, 8]):
        words += [f"w{i}"] * f
    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    r = zipf_slope(df, top_n=10).collect()[0]
    xs = [math.log(k + 1) for k in range(4)]
    ys = [math.log(f) for f in [64, 32, 16, 8]]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert r["n_terms"] == 4
    assert abs(r["slope"] - round(slope, 6)) <= 1e-6
    assert abs(r["intercept"] - round((sy - slope * sx) / n, 6)) <= 1e-6


def test_spearman_milli_matches_brute_force(spark):
    from ukis_h3cellstore_spark.ops.robust import spearman_milli

    rows = [(1, 10, 100), (2, 20, 90), (3, 30, 95), (4, 40, 70), (5, 50, 60)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    r = spearman_milli(df, "x", "y", "id").collect()[0]
    xr = {i: k + 1 for k, (i, _, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))}
    yr = {i: k + 1 for k, (i, _, _) in enumerate(sorted(rows, key=lambda t: (t[2], t[0])))}
    sd2 = sum((xr[i] - yr[i]) ** 2 for i, _, _ in rows)
    n = 5
    want = (1000 * (n * (n * n - 1) - 6 * sd2)) // (n * (n * n - 1))
    # python // floors; both engines truncate toward zero — equal here
    # because the test numerator is chosen negative-safe via int()
    num = 1000 * (n * (n * n - 1) - 6 * sd2)
    den = n * (n * n - 1)
    want = int(num / den) if num < 0 else num // den
    assert (r["n"], r["rho_milli"]) == (5, want)


def test_spearman_milli_perfect_and_inverse(spark):
    from ukis_h3cellstore_spark.ops.robust import spearman_milli

    rows = [(i, i, i * 7) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    assert spearman_milli(df, "x", "y", "id").collect()[0]["rho_milli"] == 1000
    inv = [(i, i, 100 - i) for i in range(1, 9)]
    df2 = spark.createDataFrame(inv, "id long, x long, y long")
    assert spearman_milli(df2, "x", "y", "id").collect()[0]["rho_milli"] == -1000


def test_minhash_estimate_error_zero_on_exact_dups(spark):
    from ukis_h3cellstore_spark.ops import dedup as D

    # identical docs: est = true = 1.0 exactly -> zero error on the
    # 3 candidate pairs; the unrelated doc never collides
    text = "a b c d e f g h i j"
    rows = [(1, text), (2, text), (3, text),
            (4, "zz yy xx ww vv uu tt ss rr qq")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = D.minhash_estimate_error(df, min_est_jaccard=0.25).collect()[0]
    assert r["n_pairs"] == 3
    assert r["mean_abs_err_milli"] == 0 and r["max_abs_err_milli"] == 0


def test_minhash_estimate_error_bounds(spark):
    from ukis_h3cellstore_spark.ops import dedup as D

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base + f" tail{i % 3}") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = D.minhash_estimate_error(df, min_est_jaccard=0.25).collect()[0]
    assert r["n_pairs"] >= 1
    assert 0 <= r["mean_abs_err_milli"] <= r["max_abs_err_milli"] <= 1000


def test_disk_smooth_matches_python_grid(spark):
    from ukis_h3cellstore_spark import geo as G

    grid = G.SquareGrid()
    # occupied cells: a 2x2 block plus one far cell, res 4
    coords = [(10.0, 10.0), (10.0, 12.0), (12.0, 10.0), (12.0, 12.0),
              (-60.0, -170.0)]
    cells = {}
    for k, (lat, lng) in enumerate(coords):
        cells[grid.latlng_to_cell(lat, lng, 4)] = (k + 1) * 10
    df = spark.createDataFrame(
        sorted(cells.items()), "cell long, cents long"
    )
    got = {r["cell"]: (r["n_present"], r["disk_sum"], r["mean_milli"])
           for r in G.disk_smooth(df, "cell", "cents", k=1).collect()}
    for c, v in cells.items():
        disk = set(grid.grid_disk(c, 1))
        present = [cells[d] for d in disk if d in cells]
        want = (len(present), sum(present),
                (1000 * sum(present)) // len(present))
        assert got[c] == want


def test_disk_smooth_pole_and_antimeridian(spark):
    from ukis_h3cellstore_spark import geo as G

    grid = G.SquareGrid()
    # cells hugging the pole (j clamps) and the antimeridian (i wraps)
    pts = [(89.0, 179.5), (89.0, -179.5), (-89.0, 0.0)]
    cells = {grid.latlng_to_cell(lat, lng, 3): 100 for lat, lng in pts}
    df = spark.createDataFrame(sorted(cells.items()), "cell long, cents long")
    got = {r["cell"]: r["n_present"]
           for r in G.disk_smooth(df, "cell", "cents", k=1).collect()}
    for c in cells:
        disk = set(grid.grid_disk(c, 1))
        assert got[c] == sum(1 for d in disk if d in cells)


def test_benford_digit_extraction_and_constants(spark):
    from ukis_h3cellstore_spark.entry_queries_ops import _BENFORD_MILLI

    assert sum(_BENFORD_MILLI) == 995  # nine floors each drop < 1 milli
    rows = [(float(v),) for v in (0.01, 0.19, 2.0, 95.5, 10.0, 0.0, -1.0)]
    df = spark.createDataFrame(rows, "value double")
    from pyspark.sql import functions as F2

    cents = df.select(
        F2.round(F2.col("value") * 100).cast("long").alias("c")
    ).filter(F2.col("c") > 0)
    dig = {
        r["c"]: int(str(r["c"])[0]) for r in cents.collect()
    }
    # 0.01->1c->1, 0.19->19c->1, 2.0->200c->2, 95.5->9550c->9, 10->1000c->1
    assert dig == {1: 1, 19: 1, 200: 2, 9550: 9, 1000: 1}


def test_abc_classes_hand_computed(spark):
    from ukis_h3cellstore_spark.ops.prefix import global_cumsum
    from pyspark.sql import functions as F2

    # revenues 50, 30, 15, 5 (total 100): cum shares 500, 800, 950, 1000
    # -> classes A, A, B, C
    rev = spark.createDataFrame(
        [(1, 50), (2, 30), (3, 15), (4, 5)], "k long, cents long"
    ).withColumn("__negc", -F2.col("cents"))
    cum = global_cumsum(rev, ["__negc", "k"], "cents", out_col="c")
    rows = {r["k"]: (1000 * r["c"]) // 100 for r in cum.collect()}
    assert rows == {1: 500, 2: 800, 3: 950, 4: 1000}


def test_markov_transitions_hand_computed(spark):
    from ukis_h3cellstore_spark.ops.sessions import markov_transitions

    # user 1: a -> b -> a -> b ; user 2: a -> a -> c
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
        (2, 1, "a"), (2, 2, "a"), (2, 3, "c"),
    ]
    df = spark.createDataFrame(rows, "u long, t long, s string")
    got = {(r["from_state"], r["to_state"]):
           (r["n_transitions"], r["row_total"], r["cond_milli"])
           for r in markov_transitions(df, "u", ["t"], "s").collect()}
    # from a: a->b twice (user 1), a->a once, a->c once -> total 4
    assert got[("a", "b")] == (2, 4, 500)
    assert got[("a", "a")] == (1, 4, 250)
    assert got[("a", "c")] == (1, 4, 250)
    # from b: b->a once (user 1; the trailing b has no successor)
    assert got[("b", "a")] == (1, 1, 1000)
    # sequences never cross users: no c->anything
    assert not any(k[0] == "c" for k in got)


def test_gini_by_group_known_values(spark):
    from ukis_h3cellstore_spark.ops.robust import gini_by_group

    # perfectly equal -> 0; one doc owns everything -> (n-1)/n
    rows = [("eq", i, 10) for i in range(1, 6)] + [
        ("uneq", 1, 0), ("uneq", 2, 0), ("uneq", 3, 0), ("uneq", 4, 100),
    ]
    df = spark.createDataFrame(rows, "g string, id long, x long")
    got = {r["g"]: r["gini_milli"]
           for r in gini_by_group(df, "g", "x", "id").collect()}
    assert got["eq"] == 0
    # n=4, all mass on the top rank: G = (2*4*100 - 5*100)/(4*100) = 0.75
    assert got["uneq"] == 750


def test_jsd_identical_distribution_is_zero(spark):
    from ukis_h3cellstore_spark.ops.text import js_divergence_by_source

    # one source: its distribution IS the pooled distribution
    df = spark.createDataFrame(
        [(1, "s", "a b b c"), (2, "s", "c a b")],
        "doc_id long, source string, text string",
    )
    r = js_divergence_by_source(df).collect()[0]
    assert r["jsd_nats"] == 0.0


def test_jsd_disjoint_vocabulary_is_ln2_bound(spark):
    import math

    from ukis_h3cellstore_spark.ops.text import js_divergence_by_source

    # two sources with disjoint vocab, equal mass: JSD(p, pooled) where
    # pooled = (p + other)/2 ... brute-force the expectation serially
    df = spark.createDataFrame(
        [(1, "x", "a a b"), (2, "y", "c d d")],
        "doc_id long, source string, text string",
    )
    got = {r["source"]: r["jsd_nats"]
           for r in js_divergence_by_source(df).collect()}
    for src, counts in (("x", {"a": 2, "b": 1}), ("y", {"c": 1, "d": 2})):
        pooled = {"a": 2 / 6, "b": 1 / 6, "c": 1 / 6, "d": 2 / 6}
        p = {t: c / 3 for t, c in counts.items()}
        want = 0.0
        for t, q in pooled.items():
            pi = p.get(t, 0.0)
            m = (pi + q) / 2
            if pi > 0:
                want += 0.5 * pi * math.log(pi / m)
            want += 0.5 * q * math.log(q / m)
        assert abs(got[src] - round(want, 6)) <= 1e-6


def test_two_nn_intrinsic_dim_on_a_line(spark):
    # points on a 1-D line embedded in 4-D: intrinsic dim ~ 1. Use
    # irrational-ish spacing so no two gaps tie after rounding.
    from ukis_h3cellstore_spark.ops.similarity import two_nn_intrinsic_dim

    xs = [0.0, 1.0, 2.7, 4.1, 6.3, 9.2, 11.0, 14.9, 17.3, 21.8]
    rows = [(i, [x, 2.0 * x, -x, 0.5 * x]) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = two_nn_intrinsic_dim(df, df).collect()[0]
    assert r["n_queries"] == 10
    # the MLE on a 1-D manifold should sit near 1 (small-sample noise)
    assert 0.4 <= r["lid_estimate"] <= 2.5


def test_two_nn_excludes_exact_duplicates(spark):
    from ukis_h3cellstore_spark.ops.similarity import two_nn_intrinsic_dim

    rows = [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0]),
            (4, [3.0, 0.0]), (5, [7.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = two_nn_intrinsic_dim(df, df).collect()[0]
    # vectors 1 and 2 are exact duplicates -> their d1 = 0 -> excluded
    assert r["n_queries"] == 3


def test_survival_at_horizons_hand_computed(spark):
    from ukis_h3cellstore_spark.ops.sessions import survival_at_horizons

    # user 1 gaps: 5, 15, 50 ; user 2 gaps: 25
    rows = [(1, 0), (1, 5), (1, 20), (1, 70), (2, 100), (2, 125)]
    df = spark.createDataFrame(rows, "u long, t long")
    got = {r["horizon"]: (r["n_gaps"], r["n_surviving"], r["survival_milli"])
           for r in survival_at_horizons(df, "u", "t", [10, 30]).collect()}
    assert got[10] == (4, 3, 750)   # 15, 50, 25 exceed 10
    assert got[30] == (4, 1, 250)   # only 50 exceeds 30


def test_term_burstiness_hand_computed(spark):
    from ukis_h3cellstore_spark.ops.text import term_burstiness

    # 4 docs; "f" appears once everywhere (Poisson-flat), "b" bursts
    rows = [
        (1, "f b b b"), (2, "f"), (3, "f"), (4, "f"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["term"]: r for r in term_burstiness(df, top_n=5).collect()}
    # f: counts (1,1,1,1): S1=4, S2=4, n=4 -> vmr = (16-16)/(16) = 0
    assert (got["f"]["total_count"], got["f"]["n_docs_with"]) == (4, 4)
    assert got["f"]["vmr_milli"] == 0
    # b: counts (3,0,0,0): S1=3, S2=9, n=4 -> (1000*(36-9))/(12) = 2250
    assert (got["b"]["total_count"], got["b"]["n_docs_with"]) == (3, 1)
    assert got["b"]["vmr_milli"] == 2250


def test_ring_profile_matches_python_grid(spark):
    from ukis_h3cellstore_spark import geo as G

    grid = G.SquareGrid()
    center = grid.latlng_to_cell(0.0, 0.0, 4)
    # occupied: the center, a ring-1 cell, a ring-2 cell, a far cell
    pts = [(0.0, 0.0), (0.0, 3.0), (6.0, 6.0), (40.0, 90.0)]
    cells = {grid.latlng_to_cell(lat, lng, 4): 10 * (i + 1)
             for i, (lat, lng) in enumerate(pts)}
    df = spark.createDataFrame(sorted(cells.items()), "cell long, cents long")
    got = {r["ring"]: (r["n_cells"], r["value_sum"])
           for r in G.ring_profile(df, "cell", "cents", center, k=3).collect()}
    # serial expectation via unpack arithmetic
    res, ci, cj = grid.unpack(center)
    n = 1 << (res + 3)
    want = {}
    for c, v in cells.items():
        _, i, j = grid.unpack(c)
        ring = max(min(abs(i - ci), n - abs(i - ci)), abs(j - cj))
        if ring <= 3:
            a, b = want.get(ring, (0, 0))
            want[ring] = (a + 1, b + v)
    assert got == want and 0 in got


def test_tiered_rerank_recall_vs_exact(spark):
    import numpy as np

    from ukis_h3cellstore_spark.ops.similarity import (
        cosine_topk,
        tiered_rerank,
    )

    rng = np.random.default_rng(88)
    vecs = rng.normal(size=(40, 8)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 3)
    tiered = {(r["query_id"], r["rank"]): r["neighbor_id"]
              for r in tiered_rerank(df, q, dims=4, shortlist_k=40, k=2).collect()}
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in cosine_topk(df, q, k=2).collect()}
    # with the shortlist covering the whole corpus, the tiered result
    # must equal the exact full-width top-k
    assert tiered == exact


def test_w1_vs_rest_matches_brute_force(spark):
    from ukis_h3cellstore_spark.ops.robust import w1_vs_rest

    rows = [("a", 1), ("a", 2), ("a", 2), ("a", 9),
            ("b", 2), ("b", 3), ("b", 4), ("b", 4), ("b", 5), ("c", 7)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: (r["n_group"], r["w1_scaled"])
           for r in w1_vs_rest(df, "g", "v").collect()}
    vals = sorted({v for _, v in rows})
    n = len(rows)
    want = {}
    for g in {g for g, _ in rows}:
        gv = [v for gg, v in rows if gg == g]
        ng = len(gv)
        W = 0
        for v, vn in zip(vals, vals[1:]):
            cg = sum(1 for x in gv if x <= v)
            c = sum(1 for _, x in rows if x <= v)
            W += abs(cg * n - c * ng) * (vn - v)
        want[g] = (ng, (W * 1_000_000) // (ng * n))
    assert got == want


def test_w1_identical_distribution_is_zero(spark):
    from ukis_h3cellstore_spark.ops.robust import w1_vs_rest

    rows = [("a", v) for v in (1, 5, 9)] + [("b", v) for v in (1, 5, 9)]
    df = spark.createDataFrame(rows, "g string, v long")
    for r in w1_vs_rest(df, "g", "v").collect():
        assert r["w1_scaled"] == 0


def test_code_score_separates_code_from_prose(spark):
    from ukis_h3cellstore_spark.ops.text import code_score

    rows = [
        (1, "def f(x): return {'k': x[0] + 1};"),
        (2, "The quiet afternoon passed without any event at all"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in code_score(df).collect()}
    assert got[1]["code_score_milli"] > got[2]["code_score_milli"]
    # hand-check doc 2: no symbols/braces/digits at all
    assert (got[2]["n_symbols"], got[2]["n_braces"], got[2]["n_digits"]) == (0, 0, 0)
    assert got[2]["code_score_milli"] == 0
    # empty doc: NULL ratios
    assert got[3]["code_score_milli"] is None
