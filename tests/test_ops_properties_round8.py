"""Property-based tests (hypothesis) for the round-8 statistical
operators — randomized inputs checked against independent serial
references, so the distributed formulations (range-partitioned ECDF
sweeps, exclusive cummax frontiers, rank-identity Gini, per-key
transition windows) can't quietly drift from the declared semantics."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ukis_h3cellstore_spark.ops.robust import (
    gini_by_group,
    ks_vs_rest,
    spearman_milli,
)
from ukis_h3cellstore_spark.ops.selection import pareto_frontier
from ukis_h3cellstore_spark.ops.sessions import markov_transitions

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _brute_ks(rows, scale=1_000_000):
    all_vals = sorted({v for _, v in rows})
    n = len(rows)
    out = {}
    for g in {g for g, _ in rows}:
        gvals = [v for gg, v in rows if gg == g]
        ng = len(gvals)
        d = 0
        for v in all_vals:
            cg = sum(1 for x in gvals if x <= v)
            c = sum(1 for _, x in rows if x <= v)
            d = max(d, abs(cg * n - c * ng))
        out[g] = (ng, (d * scale) // (ng * n))
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=2,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_ks_vs_rest_property(spark, rows):
    frows = [(g, float(v)) for g, v in rows]
    df = spark.createDataFrame(frows, "g string, v double")
    got = {
        r["g"]: (r["n_group"], r["ks_scaled"])
        for r in ks_vs_rest(df, "g", "v").collect()
    }
    assert got == _brute_ks(frows)


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_pareto_frontier_property(spark, pts):
    df = spark.createDataFrame(
        [(x, float(y)) for x, y in pts], "x long, y double"
    )
    got = {(r["x"], r["y"]) for r in pareto_frontier(df, "x", "y").collect()}
    pset = {(x, float(y)) for x, y in pts}
    want = {
        p
        for p in pset
        if not any(
            q != p and q[0] >= p[0] and q[1] >= p[1] for q in pset
        )
    }
    assert got == want


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=100), min_size=1, max_size=25
    )
)
@settings(**_SETTINGS)
def test_gini_property(spark, vals):
    if sum(vals) == 0:
        vals = [v + 1 for v in vals]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, id long, x long")
    got = gini_by_group(df, "g", "x", "id").collect()[0]["gini_milli"]
    xs = sorted(vals)
    n, sx = len(xs), sum(xs)
    six = sum((i + 1) * x for i, x in enumerate(xs))
    want = (1000 * (2 * six - (n + 1) * sx)) // (n * sx)
    assert got == want


@given(
    seqs=st.dictionaries(
        st.integers(min_value=1, max_value=4),
        st.lists(st.sampled_from("xyz"), min_size=1, max_size=8),
        min_size=1,
        max_size=4,
    )
)
@settings(**_SETTINGS)
def test_markov_transitions_property(spark, seqs):
    rows = [
        (u, t, s) for u, seq in seqs.items() for t, s in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, "u long, t long, s string")
    got = {
        (r["from_state"], r["to_state"]): (r["n_transitions"], r["row_total"])
        for r in markov_transitions(df, "u", ["t"], "s").collect()
    }
    pairs: dict = {}
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    totals: dict = {}
    for (a, _), c in pairs.items():
        totals[a] = totals.get(a, 0) + c
    want = {k: (c, totals[k[0]]) for k, c in pairs.items()}
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-100, max_value=100),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=2,
        max_size=20,
        unique_by=lambda t: t,
    )
)
@settings(**_SETTINGS)
def test_spearman_property(spark, rows):
    data = [(i, x, y) for i, (x, y) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, x long, y long")
    got = spearman_milli(df, "x", "y", "id").collect()[0]
    xr = {i: k + 1 for k, (i, _, _) in enumerate(
        sorted(data, key=lambda t: (t[1], t[0])))}
    yr = {i: k + 1 for k, (i, _, _) in enumerate(
        sorted(data, key=lambda t: (t[2], t[0])))}
    sd2 = sum((xr[i] - yr[i]) ** 2 for i, _, _ in data)
    n = len(data)
    num = 1000 * (n * (n * n - 1) - 6 * sd2)
    den = n * (n * n - 1)
    want = int(num / den) if num < 0 else num // den
    assert (got["n"], got["rho_milli"]) == (n, want)
