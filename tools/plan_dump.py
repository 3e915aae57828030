"""Dump ``explain("formatted")`` for headline queries to
``plans/r14/<query>_<tag>.txt`` — the before/after evidence files the
optimization round commits alongside each plan claim. Segment-aware via
plan_report._SegmentCapture: composed gates that truncate lineage with
``localCheckpoint`` / shard exports get one formatted block per segment
plus the final frame. Usage:

    python tools/plan_dump.py <tag> [sf_dir] [query ...]

``tag`` is normally ``before`` or ``after``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from plan_report import _SegmentCapture  # noqa: E402


def _formatted(spark, jdf_or_plan) -> str:
    return spark._jvm.PythonSQLUtils.explainString(
        jdf_or_plan.queryExecution(), "formatted"
    )


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    names = sys.argv[3:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # capture the formatted plan at each segment boundary, not just the
    # node-count stats plan_report records
    import plan_report as _pr

    formatted_segs: list[tuple[str, str]] = []
    orig_plan_str = _pr._plan_str

    def _plan_and_formatted(df):
        formatted_segs.append(("", _formatted(spark, df._jdf)))
        return orig_plan_str(df)

    for name in names:
        formatted_segs.clear()
        _pr._plan_str = _plan_and_formatted
        try:
            with _SegmentCapture() as cap:
                df = queries[name](spark, sf_dir)
        finally:
            _pr._plan_str = orig_plan_str
        blocks = []
        for i, ((lbl, _), (_, fmt)) in enumerate(
            zip(cap.segments, formatted_segs), 1
        ):
            blocks.append(
                f"-- segment {i}/{len(cap.segments)} [{lbl}]\n{fmt}"
            )
        blocks.append(f"-- final (returned frame)\n{_formatted(spark, df._jdf)}")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"== {name} [{tag}] sf_dir={sf_dir}\n\n")
            fh.write("\n\n".join(blocks))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
