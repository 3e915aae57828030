"""SparkSession factory with the engine's recommended configuration.

The store and operators work on any session, but these settings are
the ones every scale note in docs/SCALE.md assumes:

- **AQE on, with partition coalescing and skew-join splitting** —
  runtime re-planning is the first line of defense against skewed
  cell/key distributions and over-partitioned shuffles.
- **`spark.sql.shuffle.partitions` sized to the parallelism** — the
  static pre-AQE partition count; 2 x cores locally keeps every core
  busy through stragglers without flooding tiny tasks. On a cluster,
  set it near 2-3 x total executor cores (AQE coalesces down, it
  never splits up a too-small setting).
- **Arrow transfers on** — `toPandas`/`mapInPandas`/`applyInPandas`
  (compaction, multimodal decode) move columnar batches instead of
  pickled rows.

``recommended_conf`` is a pure function so callers (and tests) can
inspect or merge the settings without constructing a session;
``build_session`` applies it. Neither touches ``master`` unless a
local core count is requested — under spark-submit the cluster
manager owns that.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def recommended_conf(
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
) -> dict[str, str]:
    """The engine's recommended Spark conf as a plain dict.

    ``parallelism`` is the core count the session will run with (used
    only to derive the default shuffle-partition count);
    ``shuffle_partitions`` overrides the derived value."""
    if shuffle_partitions is None:
        shuffle_partitions = 2 * parallelism if parallelism else 200
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }


def build_session(
    app_name: str = "ukis-h3cellstore-spark",
    local_cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """A SparkSession with :func:`recommended_conf` applied.

    ``local_cores`` sets ``master=local[n]`` for single-node use;
    leave it None under a cluster manager. ``extra_conf`` entries win
    over the recommendations."""
    builder = SparkSession.builder.appName(app_name)
    if local_cores is not None:
        builder = builder.master(f"local[{local_cores}]")
    conf = recommended_conf(local_cores, shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
