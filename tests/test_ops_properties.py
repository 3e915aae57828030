"""Property-based tests (hypothesis) for the relational extension
operators — each Spark operator is checked against an independent
brute-force Python reference on randomized inputs, so the DataFrame
formulations (carry-forward windows, label propagation, gap
sessionization) can't quietly drift from the declared semantics."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ukis_h3cellstore_spark.ops import dedup as D
from ukis_h3cellstore_spark.ops import joins as J
from ukis_h3cellstore_spark.ops import sessions as SS

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------- helpers


def _cc_reference(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find ground truth: node -> min reachable node."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _asof_reference(
    left: list[tuple[int, int, int]],
    right: list[tuple[int, int, int]],
) -> dict[int, tuple[int | None, int | None]]:
    """(lid, key, ts) x (key, ts, payload) -> lid: latest at-or-before."""
    out = {}
    for lid, key, ts in left:
        best = None
        for rkey, rts, payload in right:
            if rkey == key and rts <= ts and (best is None or rts > best[0]):
                best = (rts, payload)
        out[lid] = best if best else (None, None)
    return out


def _sessions_reference(
    events: list[tuple[int, int]], gap: int
) -> set[tuple[int, int, int, int, int]]:
    """(user, ts) -> {(user, seq, start, end, n)} with gap>g new session."""
    byuser: dict[int, list[int]] = {}
    for u, t in events:
        byuser.setdefault(u, []).append(t)
    out = set()
    for u, tss in byuser.items():
        tss.sort()
        seq, start, prev, n = 0, None, None, 0
        for t in tss:
            if prev is None or t - prev > gap:
                if start is not None:
                    out.add((u, seq, start, prev, n))
                seq += 1
                start, n = t, 0
            n += 1
            prev = t
        out.add((u, seq, start, prev, n))
    return out


# ------------------------------------------------------------------ tests


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.component for r in D.connected_components(pairs).collect()}
    assert got == _cc_reference(edges)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=20
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 99)),
        min_size=0,
        max_size=20,
    ),
)
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, lrows, rrows):
    # dedupe right rows on (key, ts) — ambiguous-payload ties are
    # out of contract (the gate pre-aggregates them)
    seen: dict[tuple[int, int], int] = {}
    for k, t, p in rrows:
        seen[(k, t)] = p
    rrows = [(k, t, p) for (k, t), p in seen.items()]
    left = [(i, k, t) for i, (k, t) in enumerate(lrows)]
    ldf = spark.createDataFrame(left, "lid long, key long, ts_us long")
    rdf = spark.createDataFrame(
        rrows or [(999, -1, 0)], "key long, ts_us long, payload long"
    )
    got = {
        r.lid: (r.asof_ts_us, r.asof_payload)
        for r in J.asof_join(ldf, rdf, on="key").collect()
    }
    assert got == _asof_reference(left, rrows or [(999, -1, 0)])


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=1,
        max_size=30,
        unique=True,
    ),
    st.integers(1, 2_000),
)
@settings(**_SETTINGS)
def test_session_stats_matches_bruteforce(spark, events, gap):
    df = spark.createDataFrame(events, "user_id long, ts_us long")
    got = {
        (r.user_id, r.session_seq, r.session_start, r.session_end, r.n_events)
        for r in SS.session_stats(df, gap_us=gap).collect()
    }
    assert got == _sessions_reference(events, gap)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 200)),  # (key, ts)
        min_size=1,
        max_size=25,
    ),
    st.lists(
        # (rid, key, start, length)
        st.tuples(st.integers(0, 99), st.integers(0, 3),
                  st.integers(0, 200), st.integers(1, 60)),
        min_size=1,
        max_size=10,
        unique_by=lambda r: r[0],
    ),
    st.integers(1, 50),  # bucket width
)
@settings(**_SETTINGS)
def test_range_join_matches_bruteforce(spark, lrows, ranges, bucket):
    left = [(i, k, t) for i, (k, t) in enumerate(lrows)]
    rrows = [(rid, k, s, s + n) for rid, k, s, n in ranges]
    ldf = spark.createDataFrame(left, "eid long, k long, ts_us long")
    rdf = spark.createDataFrame(rrows, "rid long, k long, start_us long, end_us long")
    got = {
        (r.eid, r.rid)
        for r in J.range_join(ldf, rdf, on="k", bucket=bucket).collect()
    }
    want = {
        (eid, rid)
        for eid, lk, t in left
        for rid, rk, s, e in rrows
        if lk == rk and s <= t < e
    }
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 5)),  # (key, value)
        min_size=1,
        max_size=30,
    ),
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 100)),  # (key, weight)
        min_size=0,
        max_size=8,
    ),
    st.integers(1, 7),
    st.sampled_from(["inner", "left"]),
)
@settings(**_SETTINGS)
def test_salted_join_matches_plain_join(spark, lrows, rrows, num_salts, how):
    ldf = spark.createDataFrame(lrows, "k long, v long")
    rdf = spark.createDataFrame(rrows or [(99, 0)], "k long, w long")
    plain = sorted(map(tuple, ldf.join(rdf, on="k", how=how).collect()))
    salted = sorted(
        map(
            tuple,
            J.salted_join(ldf, rdf, on="k", how=how, num_salts=num_salts).collect(),
        )
    )
    assert salted == plain


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "e"]), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_repetition_fold_matches_counter(spark, docs):
    """The sorted-array fold in repetition_stats must agree with a
    Counter over the exploded 2-grams for ANY token sequence — run
    lengths of a sorted array are exactly the multiset counts."""
    from collections import Counter

    from ukis_h3cellstore_spark.ops import text as X

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in X.repetition_stats(df).collect()
    }
    for i, toks in enumerate(docs):
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        r = out[i]
        assert r.n_2grams == len(grams)
        if not grams:
            assert r.top_2gram_frac == 0.0 and r.dup_2gram_frac == 0.0
            continue
        c = Counter(grams)
        assert r.top_2gram_frac == max(c.values()) / len(grams)
        dup = sum(v for v in c.values() if v > 1)
        assert r.dup_2gram_frac == dup / len(grams)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_normalize_text_matches_python_reference(spark, texts):
    """The single-pass [^a-z0-9]+ collapse must equal the literal
    strip-then-collapse-then-trim reference for ANY printable-ASCII
    input (the r4 perf rewrite's equivalence claim)."""
    import re

    from ukis_h3cellstore_spark.ops import text as X

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {r.doc_id: r.norm_text for r in X.normalize_text(df).collect()}
    for i, t in enumerate(texts):
        ref = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()
        assert out[i] == ref


_WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12),
        min_size=1,
        max_size=7,
    ),
    threshold=st.sampled_from([0.5, 0.8, 1.0]),
)
@settings(**_SETTINGS)
def test_containment_pairs_matches_set_arithmetic(spark, docs, threshold):
    """containment_pairs must equal direct set arithmetic over the
    per-document distinct k-gram sets for ANY corpus: pair direction
    (smaller set contained, ties -> lower id), |A∩B|, and the
    containment ratio."""
    k = 2
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_sub, r.id_super): (r.n_common, r.containment)
        for r in D.containment_pairs(df, k=k, threshold=threshold).collect()
    }
    sets = {
        i: {" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)}
        for i, toks in enumerate(docs)
    }
    want = {}
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            na, nb = len(sets[a]), len(sets[b])
            sub, sup = (a, b) if na <= nb else (b, a)
            cont = inter / min(na, nb)
            if cont >= threshold:
                want[(sub, sup)] = (inter, cont)
    assert set(got) == set(want)
    for key, (n_common, cont) in want.items():
        assert got[key][0] == n_common
        assert abs(got[key][1] - cont) < 1e-9


@given(
    counts=st.dictionaries(
        st.sampled_from(["web", "code", "books", "wiki", "forums"]),
        st.integers(min_value=1, max_value=10**9),
        min_size=1,
        max_size=5,
    ),
    tau=st.sampled_from([0.1, 0.3, 0.7, 1.0]),
)
@settings(**_SETTINGS)
def test_temperature_rates_closed_form(spark, counts, tau):
    """temperature_rates must equal the closed-form target shares
    n_i^tau / sum n_j^tau converted to per-row keep rates and scaled
    so the max is exactly 1.0 (tau=1 -> every rate is 1.0: the
    natural distribution needs no resampling)."""
    from ukis_h3cellstore_spark.ops import sampling as SP

    rates = SP.temperature_rates(counts, tau)
    z = sum(c ** tau for c in counts.values())
    raw = {s: (c ** tau) / z / c for s, c in counts.items()}
    mx = max(raw.values())
    assert set(rates) == set(counts)
    assert abs(max(rates.values()) - 1.0) < 1e-12
    for s in counts:
        assert abs(rates[s] - raw[s] / mx) < 1e-9
        assert 0.0 < rates[s] <= 1.0
    if tau == 1.0:
        for s in counts:
            assert abs(rates[s] - 1.0) < 1e-12
    # smaller sources never get a lower keep rate than larger ones
    by_n = sorted(counts, key=lambda s: counts[s])
    for sm, lg in zip(by_n, by_n[1:]):
        assert rates[sm] >= rates[lg] - 1e-12


def _span_reference(
    docs: list[tuple[int, list[str]]], k: int, min_span: int
) -> dict[tuple[int, int], tuple[int, int]]:
    """Brute force: (id_a, id_b) -> (max shared token run >= min_span,
    number of alignment offsets carrying one). A run at offset d means
    tokens a[i + d] == b[i] over a maximal consecutive stretch."""
    out: dict[tuple[int, int], tuple[int, int]] = {}
    for ai in range(len(docs)):
        for bi in range(len(docs)):
            ida, ta = docs[ai]
            idb, tb = docs[bi]
            if ida >= idb:
                continue
            best: dict[int, int] = {}
            for d in range(-(len(tb) - 1), len(ta)):
                run = mx = 0
                for j in range(len(tb)):
                    i = j + d
                    if 0 <= i < len(ta) and ta[i] == tb[j]:
                        run += 1
                        mx = max(mx, run)
                    else:
                        run = 0
                if mx >= k:
                    best[d] = mx
            quals = [m for m in best.values() if m >= min_span]
            if quals:
                out[(ida, idb)] = (max(quals), len(quals))
    return out


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=1, max_size=24
        ),
        min_size=2,
        max_size=6,
    ),
    k=st.sampled_from([2, 3]),
)
@settings(**_SETTINGS)
def test_substring_span_pairs_matches_brute_force(spark, docs, k):
    """Tiny alphabet forces repeated grams, multiple diagonals, and
    periodic self-similar documents — the adversarial cases for the
    diagonal-chaining fold."""
    min_span = k + 1
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): (r.max_span_tokens, r.n_spans)
        for r in D.substring_span_pairs(
            df, k=k, min_span=min_span
        ).collect()
    }
    want = _span_reference(list(enumerate(docs)), k, min_span)
    assert got == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=6
        ).map(lambda ws: " ".join(ws)),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_segment_dedup_matches_brute_force(spark, docs):
    """Each doc is lines of tiny-alphabet words (collisions likely);
    keep-first-global semantics and rebuilt text must match a serial
    scan."""
    # each document takes a sliding window of up to 3 of the random
    # lines, so lines repeat across documents by construction
    rows = [
        (i, "\n".join(docs[j] for j in range(i, min(i + 3, len(docs)))))
        for i in range(len(docs))
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_clean, r.n_segments, r.n_kept)
        for r in D.segment_dedup(df).collect()
    }
    seen: set[str] = set()
    want = {}
    for i, text in rows:
        segs = [s for s in text.split("\n") if s.strip()]
        kept = []
        for s in segs:
            key = s.strip().lower()
            if key not in seen:
                seen.add(key)
                kept.append(s)
        want[i] = ("\n".join(kept), len(segs), len(kept))
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b"]), min_size=1, max_size=16),
        min_size=1,
        max_size=5,
    ),
    pair=st.tuples(st.sampled_from(["a", "b"]), st.sampled_from(["a", "b"])),
)
@settings(**_SETTINGS)
def test_bpe_apply_merge_matches_serial_greedy(spark, docs, pair):
    """Two-letter alphabet maximizes overlapping-run cases (aaaa with
    pair (a,a)); the array fold must equal the serial greedy scan."""
    from ukis_h3cellstore_spark.ops import text as X

    left, right = pair
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_merged)
        for r in X.bpe_apply_merge(df, left, right).collect()
    }
    for i, ws in enumerate(docs):
        out, j = [], 0
        while j < len(ws):
            if j + 1 < len(ws) and ws[j] == left and ws[j + 1] == right:
                out.append(left + right)
                j += 2
            else:
                out.append(ws[j])
                j += 1
        assert got[i] == (" ".join(out), len(ws) - len(out))


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["u", "v", "w"]), min_size=1, max_size=10),
        min_size=1,
        max_size=5,
    )
)
@settings(**_SETTINGS)
def test_bigram_surprisal_matches_serial_reference(spark, docs):
    """Integer bit-count surprisal against a serial Python replay:
    bits(c1(prev)+V) - bits(c2(prev,w)+1) summed per document."""
    from collections import Counter

    from ukis_h3cellstore_spark.ops import text as X

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.sum_surprisal)
        for r in X.bigram_surprisal(df).collect()
    }
    c2, c1 = Counter(), Counter()
    vocab = set()
    for i, ws in enumerate(docs):
        vocab.update(w for w in ws if w)
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    V = len(vocab)
    want = {}
    for i, ws in enumerate(docs):
        n = len(ws) - 1
        if n <= 0:
            continue
        s = sum(
            (c1[a] + V).bit_length() - (c2[(a, b)] + 1).bit_length()
            for a, b in zip(ws, ws[1:])
        )
        want[i] = (n, s)
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),                     # group
            st.integers(-50, 50),                  # value
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(2, 7),                             # partitions
)
@settings(**_SETTINGS)
def test_grouped_rank_median_cumsum_match_serial(spark, rows, nparts):
    """The range-partition + broadcast-offset grouped machinery must
    equal serial per-group ranks, middle-rank medians, and running
    totals on arbitrary shapes (dup values, singleton/empty groups,
    any partition count)."""
    from ukis_h3cellstore_spark.ops import robust as R

    data = [(i, f"g{g}", float(v)) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, g string, v double").repartition(
        3
    )
    ranked = {
        (r.g, r.id): r.rank
        for r in R.grouped_rank(
            df, "g", ["v", "id"], num_partitions=nparts
        ).collect()
    }
    med = {
        r.g: (r.n, r.median)
        for r in R.grouped_median(df, "g", "v", num_partitions=nparts).collect()
    }
    cum = {
        (r.g, r.id): r.cum_sum
        for r in R.grouped_cumsum(
            df, "g", ["v", "id"], "v", num_partitions=nparts
        ).collect()
    }
    by_g: dict = {}
    for i, g, v in data:
        by_g.setdefault(g, []).append((v, i))
    for g, items in by_g.items():
        items.sort()
        acc = 0.0
        for rk, (v, i) in enumerate(items, start=1):
            assert ranked[(g, i)] == rk
            acc += v
            assert cum[(g, i)] == acc
        vs = sorted(v for v, _ in items)
        n = len(vs)
        assert med[g] == (n, (vs[(n - 1) // 2] + vs[n // 2]) / 2)


# ------------------------------------------- hamming combination banding


@given(
    fps=st.lists(
        st.integers(min_value=0, max_value=(1 << 64) - 1),
        min_size=2,
        max_size=60,
    ),
    max_hamming=st.integers(min_value=1, max_value=10),
    clean_blocks=st.sampled_from([1, 2, 3, "auto"]),
)
@settings(**_SETTINGS)
def test_hamming_pairs_matches_bruteforce(spark, fps, max_hamming, clean_blocks):
    """hamming_pairs is EXACT at every combination-banding depth: the
    (id_a, id_b, hamming) set must equal the brute-force all-pairs
    popcount reference for random 64-bit prints and random d — the
    property that licenses `clean_blocks` as a purely physical knob."""
    expected = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            h = bin(fps[i] ^ fps[j]).count("1")
            if h <= max_hamming:
                expected.add((i, j, h))

    signed = [v - (1 << 64) if v >= (1 << 63) else v for v in fps]
    df = spark.createDataFrame(
        list(enumerate(signed)), "doc_id long, fp long"
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.hamming_pairs(
            df, "fp", bits=64, max_hamming=max_hamming,
            clean_blocks=clean_blocks,
        ).collect()
    }
    assert got == expected
