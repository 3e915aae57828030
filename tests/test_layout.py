"""Z-order layout: Morton-value known answers + a footer-stats proof
that the written files cluster BOTH dimensions (per-file min/max
ranges much narrower than the global range — the property row-group
skipping feeds on)."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from ukis_h3cellstore_spark import layout as L
from ukis_h3cellstore_spark.layout import morton_value, rank_scale, write_zordered


def _morton2(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_morton_known_answers(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (70000, -3)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", morton_value(["x", "y"]).alias("z")
    ).collect()
    for r in got:
        cx = min(max(r.x, 0), 65535)  # clamping contract
        cy = min(max(r.y, 0), 65535)
        assert r.z == _morton2(cx, cy), (r.x, r.y)


def test_morton_width_guard(spark):
    import pytest

    with pytest.raises(ValueError):
        morton_value(["a", "b", "c", "d"], bits=16)  # 64 bits > 63


def test_rank_scale_uniformizes_skew(spark):
    # heavily skewed (cubic) but distinct values spread across buckets
    df = spark.createDataFrame([(i, i * i * i) for i in range(64)], "i long, v long")
    out = df.select(rank_scale("v", buckets=8).alias("b")).collect()
    assert {r.b for r in out} == set(range(8))


def test_write_zordered_clusters_both_dims(spark):
    # 64×64 grid, shuffled input order
    rows = [((i * 37) % 64, (i * 53) % 64) for i in range(4096)]
    df = spark.createDataFrame(rows, "x long, y long").repartition(8)
    with tempfile.TemporaryDirectory(prefix="zorder_") as d:
        path = os.path.join(d, "t")
        write_zordered(df, ["x", "y"], path, bits=6, num_files=16)
        import pyarrow.parquet as pq

        spans_x, spans_y, n_files = [], [], 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            if md.num_rows == 0:
                continue
            n_files += 1
            cols = {
                md.row_group(0).column(i).path_in_schema: i
                for i in range(md.row_group(0).num_columns)
            }
            mins = {c: None for c in cols}
            maxs = {c: None for c in cols}
            for g in range(md.num_row_groups):
                for c, i in cols.items():
                    st = md.row_group(g).column(i).statistics
                    mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                    maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
            spans_x.append(maxs["x"] - mins["x"])
            spans_y.append(maxs["y"] - mins["y"])
        assert n_files >= 8
        # Z-order: average per-file span well under the global span of
        # 63 in BOTH dims (a single-column sort gives ~63 on the other
        # dim for every file)
        assert sum(spans_x) / len(spans_x) < 40
        assert sum(spans_y) / len(spans_y) < 40
        # round-trip completeness
        back = spark.read.parquet(path)
        assert back.count() == 4096
        assert back.select(F.sum("x")).first()[0] == sum(r[0] for r in rows)


def test_write_bucketed_join_is_shuffle_free(spark):
    from ukis_h3cellstore_spark.layout import write_bucketed

    a = spark.range(5000).withColumnRenamed("id", "k").withColumn(
        "va", F.col("k") * 2
    )
    b = spark.range(5000).withColumnRenamed("id", "k").withColumn(
        "vb", F.col("k") * 3
    )
    write_bucketed(a, ["k"], "zbkt_a", num_buckets=8, sort_by=["k"])
    write_bucketed(b, ["k"], "zbkt_b", num_buckets=8, sort_by=["k"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("zbkt_a").join(spark.table("zbkt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located: no shuffle exchange anywhere in the join plan
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
        assert j.count() == 5000
        # aggregation on the bucket key is also exchange-free
        agg = spark.table("zbkt_a").groupBy("k").count()
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in aplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS zbkt_a")
        spark.sql("DROP TABLE IF EXISTS zbkt_b")


def test_write_jsonl_shards_bounds_and_manifest(spark, tmp_path):
    import math

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(250)], "doc_id long, text string"
    ).repartition(2)
    out = str(tmp_path / "shards")
    manifest = L.write_jsonl_shards(df, out, docs_per_shard=40)
    rows = manifest.collect()
    # every shard respects the cap, and the manifest accounts for all docs
    assert all(r.n_docs <= 40 for r in rows)
    assert sum(r.n_docs for r in rows) == 250
    # at least ceil(250/40) shards must exist
    assert len(rows) >= math.ceil(250 / 40)
    # round-trip: the shards re-read to the same id set
    back = spark.read.json(out)
    assert back.count() == 250
    assert set(r.doc_id for r in back.select("doc_id").collect()) == set(range(250))


def test_write_jsonl_shards_empty_input(spark, tmp_path):
    df = spark.createDataFrame([], "doc_id long, text string")
    out = str(tmp_path / "empty_shards")
    manifest = L.write_jsonl_shards(df, out, docs_per_shard=40)
    assert manifest.collect() == []
    assert [f.name for f in manifest.schema.fields] == ["shard", "n_docs"]


def test_write_jsonl_shards_manifest_plan_has_no_json_parse(spark, tmp_path):
    """The manifest must come from a line-count text scan, not a JSON
    re-parse of the export: its plan reads the text source with only
    the synthetic value column (no inferred JSON schema)."""
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
    )
    out = str(tmp_path / "plan_shards")
    manifest = L.write_jsonl_shards(df, out, docs_per_shard=40)
    plan = manifest._jdf.queryExecution().optimizedPlan().toString()
    assert "doc_id" not in plan  # no JSON schema inference happened
    assert manifest.agg(F.sum("n_docs")).collect()[0][0] == 50
