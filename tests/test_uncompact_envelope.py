"""Uncompaction-offsets envelope tests (round-13 verdict item #4).

A single child-offset frame has 7^diff rows and is always broadcast;
``h3_expand_to_children`` caps every broadcast at 7^MAX_OFFSET_DIFF
rows by chaining stages, and hash-repartitions between stages so the
7^k fan-out of a FEW coarse rows parallelizes instead of running in
the input's original (often single) task.

Measured envelope (local[32], one input row):

====  ===========  ==============  ========
diff  rows          exact count     wall (s)
====  ===========  ==============  ========
8     7^8           5,764,801       12.1
8p    pentagon      4,804,001        9.2
10    7^10          282,475,249     235.9
====  ===========  ==============  ========

The diff-10 full count is env-gated (H3CS_SLOW=1) — its value is the
recorded number above; the default suite verifies diff 8 end-to-end
(hexagon AND pentagon exact closed-form counts) plus the stage
arithmetic through diff 15.

Reference behavior mirrored: ``h3_uncompact_dataframe_subset``
(crates/ukis_h3cellstore_deckgl/... mod.rs:459-477) — uncompaction is
client-side there and bounded by memory; here it is a distributed
plan, so the envelope is about broadcast/bcast-NLJ sizing instead.
"""

from __future__ import annotations

import os

import pytest

from ukis_h3cellstore_spark.h3 import cells as h3c
from ukis_h3cellstore_spark.h3 import expressions as hx


def pentagon_descendants(diff: int) -> int:
    # a pentagon has 6 children (1 pentagon + 5 hexagons):
    # p(k) = 1 + 5*(7^k - 1)/6
    return 1 + 5 * (7**diff - 1) // 6


def test_stage_arithmetic_bounds():
    for diff in range(1, 16):
        stages = hx.h3_uncompact_stages(0, diff)
        # contiguous, complete, each stage within the cap
        assert stages[0][0] == 0 and stages[-1][1] == diff
        for (lo, hi), nxt in zip(stages, stages[1:]):
            assert hi == nxt[0]
        assert all(
            0 < hi - lo <= hx.MAX_OFFSET_DIFF for lo, hi in stages
        )
        # broadcast bound: every offsets frame <= 7^MAX_OFFSET_DIFF rows
        assert all(
            7 ** (hi - lo) <= 7**hx.MAX_OFFSET_DIFF for lo, hi in stages
        )
    assert hx.h3_uncompact_stages(1, 9) == [(1, 7), (7, 9)]
    assert hx.h3_uncompact_stages(1, 11) == [(1, 7), (7, 11)]
    assert hx.h3_uncompact_stages(0, 15) == [(0, 6), (6, 12), (12, 15)]
    assert hx.h3_uncompact_stages(4, 8) == [(4, 8)]
    assert hx.h3_uncompact_stages(3, 3) == []


def test_expand_diff8_hexagon_exact(spark):
    base = h3c.build_cell(20, [3])  # res-1 hexagon
    assert h3c.is_valid_cell(base) and not h3c.is_pentagon(base)
    df = spark.createDataFrame([(base,)], "h3index long")
    out = hx.h3_expand_to_children(df, "h3index", 1, 9, filter_invalid=True)
    assert out.count() == 7**8
    # spot-check: every sampled child resolves back to the parent
    sample = [r["h3index"] for r in out.limit(100).collect()]
    assert all(h3c.cell_to_parent(c, 1) == base for c in sample)
    assert all(h3c.get_resolution(c) == 9 for c in sample)


def test_expand_diff8_pentagon_exact(spark):
    pent = h3c.build_cell(4)  # base cell 4 is a pentagon
    assert h3c.is_pentagon(pent)
    df = spark.createDataFrame([(pent,)], "h3index long")
    out = hx.h3_expand_to_children(df, "h3index", 0, 8, filter_invalid=True)
    assert out.count() == pentagon_descendants(8)


def test_expand_diff9_matches_local_oracle(spark):
    # diff 9 crosses the stage boundary (1,7)+(7,10); exact count vs
    # the pure-Python closed form
    base = h3c.build_cell(20, [3])
    df = spark.createDataFrame([(base,)], "h3index long")
    out = hx.h3_expand_to_children(df, "h3index", 1, 10, filter_invalid=True)
    assert out.count() == h3c.cell_to_children_count(base, 10)


def test_expand_passthrough_columns(spark):
    # attribute columns repeat on every descendant row (uncompaction
    # semantics of mod.rs:459-477)
    base = h3c.build_cell(20, [3])
    df = spark.createDataFrame([(base, 42.5, "a")], "h3index long, v double, tag string")
    out = hx.h3_expand_to_children(df, "h3index", 1, 3, filter_invalid=True)
    rows = out.collect()
    assert len(rows) == 7**2
    assert all(r["v"] == 42.5 and r["tag"] == "a" for r in rows)
    assert out.columns == ["h3index", "v", "tag"]


@pytest.mark.skipif(
    os.environ.get("H3CS_SLOW") != "1",
    reason="diff-10 full count is ~4 min on local[32]; recorded value in module docstring",
)
def test_expand_diff10_exact_slow(spark):
    base = h3c.build_cell(20, [3])
    df = spark.createDataFrame([(base,)], "h3index long")
    out = hx.h3_expand_to_children(df, "h3index", 1, 11, filter_invalid=True)
    assert out.count() == 7**10


def test_multi_stage_expansion_repartitions_between_stages(spark):
    # the inter-stage redistribution is the fix for the single-task
    # fan-out (one coarse row expanding 7^10 in the input's original
    # partition); guard it at the plan level: multi-stage expansions
    # carry a hash repartition, single-stage ones add NO shuffle
    from pyspark.sql import functions as F

    base = h3c.build_cell(20, [3])
    df = spark.createDataFrame([(base,)], "h3index long")

    multi = hx.h3_expand_to_children(df, "h3index", 1, 9)  # 2 stages
    plan_multi = multi._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression" in plan_multi

    single = hx.h3_expand_to_children(df, "h3index", 1, 5)  # 1 stage
    plan_single = single._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression" not in plan_single
    assert "Repartition" not in plan_single
