"""Cooperative-abort test (reference §2.9: Ctrl-C wired to a shared
abort flag checked between insert stages; Spark realization: job-group
cancellation interrupting running tasks)."""

from __future__ import annotations

import threading
import time

import pytest
from pyspark.sql import functions as F

from ukis_h3cellstore_spark import CellStore, CompactedTableSchemaBuilder
from ukis_h3cellstore_spark.h3 import cells as h3c


def test_cancel_insert_interrupts(spark, tmp_path):
    store = CellStore(spark, str(tmp_path / "wh"))
    schema = (
        CompactedTableSchemaBuilder("abort_set")
        .h3_base_resolutions([6])
        .add_h3index_column()
        .add_column("v", "Int64")
        .build()
    )
    region = h3c.build_cell(60, [1, 2])
    children = h3c.cell_to_children(region, 6)

    # a dataframe whose write is slow enough to cancel mid-flight
    slow = F.udf(lambda x: (time.sleep(0.02), x)[1], "long")
    big = (
        spark.range(200_000)
        .select(
            F.element_at(
                F.array(*[F.lit(c) for c in children[:49]]),
                (F.col("id") % 49 + 1).cast("int"),
            ).alias("h3index"),
            slow(F.col("id")).alias("v"),
        )
    )

    errors: list[Exception] = []

    def run():
        try:
            store.insert_h3dataframe_into_tableset(schema, big)
        except Exception as e:  # cancellation surfaces as a Spark error
            errors.append(e)

    t = threading.Thread(target=run)
    t.start()
    # wait until the insert's job group is registered and jobs running
    deadline = time.time() + 60
    while getattr(store, "_insert_job_group", None) is None and time.time() < deadline:
        time.sleep(0.1)
    time.sleep(2.0)
    store.cancel_insert()
    t.join(timeout=120)
    assert not t.is_alive(), "insert did not stop after cancellation"
    assert errors, "cancelled insert should raise"
    assert "cancel" in str(errors[0]).lower() or "killed" in str(errors[0]).lower()
