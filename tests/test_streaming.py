"""Structured Streaming tests: windowed rollup with watermark,
foreachBatch tableset ingestion, and the stateful accumulator — all
driven with availableNow triggers + memory sinks over a parquet copy
of the events table (bounded, deterministic)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ukis_h3cellstore_spark import CellStore, CompactedTableSchemaBuilder
from ukis_h3cellstore_spark import streaming as st
from ukis_h3cellstore_spark.h3 import cells as h3c
from ukis_h3cellstore_spark.h3 import expressions as hx


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory, sf_dir):
    """events with a synthetic res-7 h3index, written as a 4-file
    parquet dir so the file source has multiple input splits."""
    out = str(tmp_path_factory.mktemp("stream") / "events")
    region = h3c.build_cell(60, [1, 2, 3, 4, 5])
    children = h3c.cell_to_children(region, 7)
    # source ts has shipped as TIMESTAMP(NANOS) (read as BIGINT nanos
    # via nanosAsLong) and as TIMESTAMP(MICROS) (read as a timestamp
    # type directly); normalize either to a µs TIMESTAMP stream copy
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = (
        F.col("ts").cast("timestamp")
        if dict(raw.dtypes)["ts"].startswith("timestamp")
        else F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )
    df = (
        raw.withColumn("ts", ts)
        .withColumn(
            "h3index",
            F.element_at(
                F.array(*[F.lit(c) for c in children]),
                (F.col("event_id") % len(children) + 1).cast("int"),
            ),
        )
        .select("h3index", "ts", "event_type", "value", "event_id")
    )
    df.repartition(4).write.mode("overwrite").parquet(out)
    return out


def _run_available_now(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name.endswith("_agg") else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_cell_rollup_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    stream = st.read_stream(spark, events_dir, batch.schema)
    assert stream.isStreaming

    rolled = st.windowed_cell_rollup(
        stream,
        "h3index",
        "ts",
        window_duration="1 hour",
        watermark="2 hours",
        parent_resolution=5,
        agg_columns=["value"],
    )
    q = (
        rolled.writeStream.format("memory")
        .queryName("rollup_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from rollup_agg").toPandas()

    expected = (
        batch.groupBy(
            hx.h3_to_parent(F.col("h3index"), 5).alias("cell"),
            F.window("ts", "1 hour").alias("window"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.avg("value").alias("avg_value"),
        )
        .toPandas()
    )
    assert len(got) == len(expected)
    assert got["n_events"].sum() == expected["n_events"].sum() == batch.count()
    assert abs(got["sum_value"].sum() - expected["sum_value"].sum()) < 1e-6


def test_stream_insert_into_tableset(spark, events_dir, tmp_path):
    store = CellStore(spark, str(tmp_path / "wh"))
    # cross-micro-batch totals need the Summing engine: per-batch
    # rollups only aggregate within their own insert (reference
    # schema/column.rs:23-28); the engine merges across inserts
    schema = (
        CompactedTableSchemaBuilder("stream_set")
        .table_engine("SummingMergeTree", ["value"])
        .h3_base_resolutions([5, 6, 7])
        .add_h3index_column()
        .add_aggregated_column("value", "Float64", "Sum")
        .build()
    )
    batch = spark.read.parquet(events_dir)
    stream = st.read_stream(
        spark, events_dir, batch.schema, max_files_per_trigger=2
    ).select("h3index", "value")

    q = st.stream_insert_into_tableset(
        store,
        schema,
        stream,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(300)

    region = h3c.build_cell(60, [1, 2, 3, 4, 5])
    out = store.query_tableset_cells("stream_set", [region], 5).df.toPandas()
    # Sum rollup across micro-batches must equal the batch total
    assert len(out) == 1
    assert abs(
        float(out["value"][0]) - batch.agg(F.sum("value")).collect()[0][0]
    ) < 1e-6


def test_stateful_cell_accumulator(spark, events_dir):
    batch = spark.read.parquet(events_dir).withColumn(
        "value", F.col("value").cast("long")
    )
    stream = st.read_stream(spark, events_dir, spark.read.parquet(events_dir).schema)
    stream = stream.withColumn("value", F.col("value").cast("long"))

    acc = st.stateful_cell_accumulator(stream, "h3index", "value")
    q = (
        acc.writeStream.format("memory")
        .queryName("acc_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select h3index, max(n_events) as n, max(total_value) as t "
        "from acc_out group by h3index"
    ).toPandas()
    expected = (
        batch.groupBy("h3index")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .toPandas()
    )
    assert got["n"].sum() == expected["n"].sum()
    m_got = dict(zip(got["h3index"], got["n"]))
    m_exp = dict(zip(expected["h3index"], expected["n"]))
    assert m_got == m_exp


def test_interval_join_streams_matches_batch_across_batches(spark, tmp_path):
    """Two time-ordered micro-batches: the second file's rows are all
    newer than the first's, so even with the watermark advancing
    between batches nothing is late and the stream-stream interval
    join must equal the batch interval join exactly."""
    h = 3_600  # seconds
    rows = []
    # file 0: hours 0-9; file 1: hours 10-19 (strictly later)
    for i in range(20):
        rows.append((i, i % 3, i * h, "click" if i % 2 == 0 else "error", i * 10))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec long, kind string, v long"
    ).withColumn("ts", F.timestamp_seconds(F.col("sec"))).drop("sec")
    src = str(tmp_path / "ij_src")
    df.filter(F.col("event_id") < 10).coalesce(1).write.parquet(f"{src}/f0")
    df.filter(F.col("event_id") >= 10).coalesce(1).write.parquet(f"{src}/f1")
    # register both files under one dir for the file source
    import glob
    import shutil

    for j, part in enumerate(sorted(glob.glob(f"{src}/f*/part-*.parquet"))):
        shutil.copy(part, f"{src}/{j:02d}.parquet")
    schema = df.schema
    clicks_s = (
        st.read_stream(spark, src, schema, max_files_per_trigger=1)
        .filter(F.col("kind") == "click")
        .select("event_id", "user_id", "ts")
    )
    errors_s = (
        st.read_stream(spark, src, schema, max_files_per_trigger=1)
        .filter(F.col("kind") == "error")
        .select("user_id", F.col("ts").alias("err_ts"), F.col("v").alias("err_v"))
    )
    joined = st.interval_join_streams(
        clicks_s, errors_s, on="user_id", left_ts="ts", right_ts="err_ts",
        lookback="4 hours", watermark="1 hour",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ij_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.event_id, r.user_id, r.err_v)
        for r in spark.table("ij_out").collect()
    )
    clicks = df.filter(F.col("kind") == "click").select("event_id", "user_id", "ts")
    errors = df.filter(F.col("kind") == "error").select(
        F.col("user_id").alias("eu"), F.col("ts").alias("err_ts"), F.col("v").alias("err_v")
    )
    expected = sorted(
        (r.event_id, r.user_id, r.err_v)
        for r in clicks.join(
            errors,
            (F.col("user_id") == F.col("eu"))
            & (F.col("err_ts") >= F.col("ts") - F.expr("INTERVAL 4 hours"))
            & (F.col("err_ts") <= F.col("ts")),
        ).collect()
    )
    assert got == expected and len(got) > 0


def test_windowed_topk_matches_batch_rank(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    stream = st.read_stream(spark, events_dir, schema, max_files_per_trigger=1)
    counts = st.windowed_key_counts(
        stream, "ts", "event_type", window_duration="1 hour", watermark="2 hours"
    )
    _run_available_now(counts, "topk_agg")
    got = (
        st.topk_per_window(spark.table("topk_agg"), "event_type", k=2)
        .select(
            F.unix_micros(F.col("window.start")).alias("ws"),
            "event_type",
            "n_events",
            "rank",
        )
        .collect()
    )
    # batch recomputation: hourly counts + deterministic rank
    from pyspark.sql import Window

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(
            F.window("ts", "1 hour").alias("window"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("window").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    expected = (
        batch.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .select(
            F.unix_micros(F.col("window.start")).alias("ws"),
            "event_type",
            "n_events",
            "rank",
        )
        .collect()
    )
    key = lambda r: (r.ws, r.rank)
    assert sorted(got, key=key) == sorted(expected, key=key)
    assert len(got) > 0


def test_capped_admission_batch_split_proof(spark, tmp_path):
    """The admitted set must not depend on micro-batch boundaries:
    1-file-per-trigger vs all-at-once must agree with each other and
    with the batch cap_per_group replay."""
    from ukis_h3cellstore_spark.ops import sampling as SM

    docs = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(500)], "doc_id long, source string"
    )
    withh = docs.withColumn(
        "_h",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cap|"), F.col("doc_id").cast("string"))),
                1, 15,
            ), 16, 10,
        ).cast("long"),
    )
    d = str(tmp_path / "capsrc")
    withh.repartition(6).write.parquet(d)

    def run(mft):
        stream = st.read_stream(spark, d, withh.schema, max_files_per_trigger=mft)
        capped = st.capped_admission(stream, cap=25, hash_col="_h")
        name = f"capsink_{mft}"
        q = (capped.writeStream.format("memory").queryName(name)
             .outputMode("update").trigger(availableNow=True).start())
        assert q.awaitTermination(120)
        return {
            (r["source"], r["n_seen"], r["n_kept"], r["sum_kept_ids"])
            for r in spark.table(name)
            .groupBy("source")
            .agg(F.max(F.struct("n_seen", "n_kept", "sum_kept_ids")).alias("m"))
            .select("source", "m.n_seen", "m.n_kept", "m.sum_kept_ids")
            .collect()
        }

    one_by_one, all_at_once = run(1), run(100)
    assert one_by_one == all_at_once
    batch = {
        r["source"]: (r["n"], r["s"])
        for r in SM.cap_per_group(docs, cap=25)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("doc_id").alias("s"))
        .collect()
    }
    for src, n_seen, n_kept, sum_ids in one_by_one:
        assert n_seen == 125
        assert batch[src] == (n_kept, sum_ids)
