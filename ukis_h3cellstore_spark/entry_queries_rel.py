"""Round-4 relational-surface gates: the remaining common query
shapes with no prior oracle coverage — semi/anti joins, VariantType
path access, a CSV source round-trip, multi-distinct aggregation,
ntile/percent_rank windows, explicit GROUPING SETS, collect_set
signatures, and the regexp/string-function suite.

Every entry is a (Spark callable, DuckDB oracle SQL) pair with
bit-matched column aliases — see entry_queries.py for the
determinism conventions (cents-integer money, epoch-µs timestamps,
unique ordering keys under every window).

The reference's query surface is SQL-over-ClickHouse
(crates/ukis_h3cellstore/src/clickhouse/mod.rs query path); these
gates exercise the same relational algebra a user would push through
``GenericCellStore.query`` on Spark.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ukis_h3cellstore_spark.entry_queries import _cents, _events, _t


# --------------------------------------------------------------------------
# semi / anti joins


def q_orders_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI / LEFT ANTI join surface: customers partitioned by
    whether they have at least one finished ('F') order, counted per
    market segment. Both branches are existence joins — no row
    multiplication, and Catalyst turns them into broadcast
    semi/anti-hash joins when the right side is small."""
    c = _t(spark, sf_dir, "customer")
    f_orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_custkey")
    cond = c.c_custkey == F.col("o_custkey")
    semi = (
        c.join(f_orders, cond, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .withColumn("bucket", F.lit("has_f"))
    )
    anti = (
        c.join(f_orders, cond, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .withColumn("bucket", F.lit("no_f"))
    )
    return semi.unionByName(anti).select("c_mktsegment", "bucket", "n_customers")


Q_ORDERS_SEMI_ANTI_SQL = """
SELECT c_mktsegment, 'has_f' AS bucket, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
GROUP BY 1
UNION ALL
SELECT c_mktsegment, 'no_f' AS bucket, COUNT(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
GROUP BY 1
"""


# --------------------------------------------------------------------------
# VariantType path access


def q_events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` once, then typed ``variant_get`` path extraction —
    the open-schema alternative to from_json's fixed struct (which
    events_json_props covers). Binary variant encoding keeps the
    extraction JVM-side and shreddable; no UDF."""
    e = _events(spark, sf_dir)
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        e.withColumn("k_mod", F.pmod(k, F.lit(7)))
        .groupBy("k_mod")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.sum(_cents(F.col("value"))).alias("sum_value_cents"),
        )
    )


Q_EVENTS_VARIANT_SQL = """
SELECT CAST(json_extract(props, '$.k') AS INT) % 7 AS k_mod,
       COUNT(*) AS n_events,
       MIN(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# CSV source round-trip


def q_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source round-trip: the exact-typed subset of events
    is written as headered CSV and read back with an explicit schema
    (schema-on-read — no inference job), then aggregated. Proves the
    text-format source path end-to-end; the oracle recomputes the
    same aggregate from the original parquet, so any encode/decode
    drift fails the hash. Only exactly-representable columns
    (BIGINT/VARCHAR) cross the text boundary — float round-tripping
    through CSV is a known non-goal of the format."""
    e = _events(spark, sf_dir).select("event_id", "user_id", "event_type")
    out = f"/tmp/ukis_csv_roundtrip_{os.getpid()}_{abs(hash(sf_dir)) % 10_000}"
    e.write.mode("overwrite").option("header", "true").csv(out)
    back = (
        spark.read.schema("event_id BIGINT, user_id BIGINT, event_type STRING")
        .option("header", "true")
        .csv(out)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("event_id").alias("sum_event_id"),
        F.countDistinct("user_id").alias("n_users"),
    )


Q_SOURCE_CSV_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


def q_source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source round-trip — the interchange format of
    LLM corpus pipelines. Exact-typed columns of the documents table
    written as JSONL, read back with an explicit schema (no inference
    pass over the data), aggregated; the oracle recomputes from the
    original parquet, so serialization drift fails the hash."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    out = f"/tmp/ukis_jsonl_roundtrip_{os.getpid()}_{abs(hash(sf_dir)) % 10_000}"
    d.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT"
    ).json(out)
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


Q_SOURCE_JSONL_SQL = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM documents GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# multi-distinct aggregation


def q_events_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT ...) in one aggregation — Spark plans
    this as an expand + two-phase aggregate (one shuffle per distinct
    set, map-side partials first), the shape dashboards hit
    constantly for daily-active-user counts."""
    e = _events(spark, sf_dir)
    day = (F.col("ts_us") / (86_400 * 1_000_000)).cast("long")
    return (
        e.withColumn("day_id", day)
        .groupBy("day_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


Q_EVENTS_DISTINCT_DAILY_SQL = """
SELECT (epoch_us(ts) // 86400000000) AS day_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT event_type) AS n_types
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# ntile / percent_rank / cume_dist windows


def q_events_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: NTILE(4) quartiles per event
    type (ordered by the unique (value, event_id) key so tile
    boundaries are deterministic), with the quartile's max
    percent_rank and cume_dist — one window, one shuffle, then a
    small aggregate."""
    from pyspark.sql.window import Window

    e = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        e.select(
            "event_type",
            "value",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        .groupBy("event_type", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("sum_value_cents"),
            F.round(F.max("pr"), 6).alias("max_pr"),
            F.round(F.max("cd"), 6).alias("max_cd"),
        )
    )


Q_EVENTS_NTILE_SQL = """
WITH w AS (
  SELECT event_type, value,
         NTILE(4)       OVER win AS quartile,
         PERCENT_RANK() OVER win AS pr,
         CUME_DIST()    OVER win AS cd
  FROM events
  WINDOW win AS (PARTITION BY event_type ORDER BY value, event_id)
)
SELECT event_type, quartile, COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       round(MAX(pr), 6) AS max_pr,
       round(MAX(cd), 6) AS max_cd
FROM w GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# explicit GROUPING SETS


def q_events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the general form that ROLLUP/CUBE
    (already gated) specialize: per-type totals, per-day totals, and
    the grand total in ONE pass (Expand + single hash aggregate, not
    three scans). GROUPING() flags disambiguate real NULL keys from
    subtotal rows."""
    e = _events(spark, sf_dir)
    day = (F.col("ts_us") / (86_400 * 1_000_000)).cast("long")
    e.withColumn("day_id", day).createOrReplaceTempView("__gs_events")
    return spark.sql(
        """
        SELECT event_type, day_id,
               GROUPING(event_type) AS g_type,
               GROUPING(day_id) AS g_day,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                 AS sum_value_cents
        FROM __gs_events
        GROUP BY GROUPING SETS ((event_type), (day_id), ())
        """
    )


Q_EVENTS_GROUPING_SETS_SQL = """
WITH e AS (
  SELECT event_type, (epoch_us(ts) // 86400000000) AS day_id, value FROM events
)
SELECT event_type, day_id,
       GROUPING(event_type) AS g_type,
       GROUPING(day_id) AS g_day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM e
GROUP BY GROUPING SETS ((event_type), (day_id), ())
"""


def q_events_lateral_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: each user's top-2 events by value
    — the per-row-parameterized-subquery surface (Spark plans the
    correlated LIMIT as a rewritten window internally, but the USER
    expresses it as LATERAL, and the gate proves that path)."""
    _events(spark, sf_dir).createOrReplaceTempView("__lat_events")
    return spark.sql(
        """
        SELECT u.user_id, l.event_id, l.value_cents
        FROM (SELECT DISTINCT user_id FROM __lat_events) u,
        LATERAL (
          SELECT event_id,
                 CAST(round(value * 100) AS BIGINT) AS value_cents
          FROM __lat_events e
          WHERE e.user_id = u.user_id
          ORDER BY value DESC, event_id LIMIT 2
        ) l
        """
    )


Q_EVENTS_LATERAL_SQL = """
SELECT u.user_id, l.event_id, l.value_cents
FROM (SELECT DISTINCT user_id FROM events) u,
LATERAL (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS value_cents
  FROM events e
  WHERE e.user_id = u.user_id
  ORDER BY value DESC, event_id LIMIT 2
) l
"""


def q_events_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: sparse daily observations (days under
    70 events are 'missing') re-densified onto a generated per-type
    day spine, value forward-filled with last-ignore-nulls. One small
    agg builds the spine bounds; the fill is a single window over the
    (type, day) table — rows ~ types × days, never event-grained."""
    from pyspark.sql.window import Window

    e = _events(spark, sf_dir)
    day = (F.col("ts_us") / (86_400 * 1_000_000)).cast("long")
    daily = (
        e.withColumn("day_id", day)
        .groupBy("event_type", "day_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("sum_cents"),
        )
    )
    observed = daily.filter(F.col("n_events") >= 70)
    spine = (
        observed.groupBy("event_type")
        .agg(F.min("day_id").alias("d0"), F.max("day_id").alias("d1"))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day_id"),
        )
    )
    joined = spine.join(observed, on=["event_type", "day_id"], how="left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "day_id",
        F.last("sum_cents", ignorenulls=True).over(w).alias("filled_cents"),
        F.col("n_events").isNull().alias("was_gap"),
    )


Q_EVENTS_GAPFILL_SQL = """
WITH daily AS (
  SELECT event_type, (epoch_us(ts) // 86400000000) AS day_id,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM events GROUP BY 1, 2
),
observed AS (SELECT * FROM daily WHERE n_events >= 70),
spine AS (
  SELECT event_type, unnest(generate_series(d0, d1)) AS day_id
  FROM (SELECT event_type, MIN(day_id) AS d0, MAX(day_id) AS d1
        FROM observed GROUP BY 1)
)
SELECT s.event_type, s.day_id,
       last_value(o.sum_cents IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.day_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents,
       o.n_events IS NULL AS was_gap
FROM spine s LEFT JOIN observed o USING (event_type, day_id)
"""


def q_events_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-type surface: daily per-type counts collected into a
    map<string,long> (map_from_entries), transformed with
    transform_values, pruned with map_filter, and exploded back to
    rows — proving the map round-trip against a purely relational
    oracle. All JVM higher-order functions; one aggregation shuffle."""
    e = _events(spark, sf_dir)
    day = (F.col("ts_us") / (86_400 * 1_000_000)).cast("long")
    daily = (
        e.withColumn("day_id", day)
        .groupBy("day_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    mapped = (
        daily.groupBy("day_id")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
            ).alias("m")
        )
        .withColumn("m", F.transform_values("m", lambda k, v: v * 2))
        .withColumn("m", F.map_filter("m", lambda k, v: v >= 100))
    )
    return mapped.select(
        "day_id", F.explode("m").alias("event_type", "boosted_count")
    )


Q_EVENTS_MAP_OPS_SQL = """
SELECT (epoch_us(ts) // 86400000000) AS day_id, event_type,
       CAST(COUNT(*) * 2 AS BIGINT) AS boosted_count
FROM events
GROUP BY 1, 2
HAVING COUNT(*) * 2 >= 100
"""


# --------------------------------------------------------------------------
# collect_set signature


def q_events_user_type_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-valued aggregation: each user's distinct event types
    collapsed to a canonical sorted signature string
    (collect_set → array_sort → concat_ws, all JVM expressions), then
    users counted per signature — the behavioral-cohort shape."""
    # the value filter keeps per-user type sets PARTIAL (~19 distinct
    # signatures at sf0.01) — without it every user has every type
    # and the gate degenerates to one row
    e = _events(spark, sf_dir).filter(F.col("value") > 100)
    sig = F.concat_ws(",", F.array_sort(F.collect_set("event_type")))
    per_user = e.groupBy("user_id").agg(sig.alias("type_signature"))
    return per_user.groupBy("type_signature").agg(
        F.count(F.lit(1)).alias("n_users")
    )


Q_EVENTS_SIGNATURE_SQL = """
WITH per_user AS (
  SELECT user_id,
         string_agg(DISTINCT event_type ORDER BY event_type)
           AS type_signature
  FROM events WHERE value > 100 GROUP BY 1
)
SELECT type_signature, COUNT(*) AS n_users FROM per_user GROUP BY 1
"""


def q_events_window_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation-window surface in one pass: lag/lead with defaults,
    first_value, nth_value, and a running (unbounded-preceding) sum
    over the per-type daily series — one shuffle on the partition
    key, every function sharing the same window frame family."""
    from pyspark.sql.window import Window

    e = _events(spark, sf_dir)
    day = (F.col("ts_us") / (86_400 * 1_000_000)).cast("long")
    daily = (
        e.withColumn("day_id", day)
        .groupBy("event_type", "day_id")
        .agg(F.sum(_cents(F.col("value"))).alias("cents"))
    )
    w = Window.partitionBy("event_type").orderBy("day_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return daily.select(
        "event_type",
        "day_id",
        "cents",
        F.lag("cents", 1, 0).over(w).alias("prev_cents"),
        F.lead("cents", 1, 0).over(w).alias("next_cents"),
        F.first_value("cents").over(wrun).alias("first_cents"),
        F.nth_value("cents", 3).over(wall).alias("third_cents"),
        F.sum("cents").over(wrun).alias("running_cents"),
    )


Q_EVENTS_WINDOW_NAV_SQL = """
WITH daily AS (
  SELECT event_type, (epoch_us(ts) // 86400000000) AS day_id,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
)
SELECT event_type, day_id, cents,
       lag(cents, 1, 0)  OVER w AS prev_cents,
       lead(cents, 1, 0) OVER w AS next_cents,
       first_value(cents) OVER
         (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_cents,
       nth_value(cents, 3) OVER
         (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS third_cents,
       CAST(SUM(cents) OVER
         (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS running_cents
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day_id)
"""


# --------------------------------------------------------------------------
# regexp / string functions


def q_part_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface over the part dim: regexp_extract (the
    brand ordinal out of 'Brand#NN'), split + element_at (the noun of
    the two-word name), upper/length — grouped to a compact report.
    All codegen'd JVM string expressions; the whole query is one scan
    and one small aggregate."""
    p = _t(spark, sf_dir, "part")
    brand_num = F.regexp_extract(F.col("p_brand"), r"Brand#(\d+)", 1).cast("int")
    noun = F.upper(F.element_at(F.split(F.col("p_name"), " "), 2))
    return (
        p.select(
            noun.alias("noun"),
            brand_num.alias("brand_num"),
            F.length(F.col("p_type")).alias("type_len"),
            "p_size",
            "p_type",
        )
        .groupBy("noun")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("brand_num").alias("min_brand"),
            F.max("brand_num").alias("max_brand"),
            F.sum("p_size").alias("sum_size"),
            F.countDistinct("p_type").alias("n_types"),
            F.sum("type_len").alias("sum_type_len"),
        )
    )


Q_PART_STRING_SQL = """
SELECT upper(split_part(p_name, ' ', 2)) AS noun,
       COUNT(*) AS n_parts,
       MIN(CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT)) AS min_brand,
       MAX(CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT)) AS max_brand,
       CAST(SUM(p_size) AS BIGINT) AS sum_size,
       COUNT(DISTINCT p_type) AS n_types,
       CAST(SUM(length(p_type)) AS BIGINT) AS sum_type_len
FROM part GROUP BY 1
"""


def q_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source round-trip (the third columnar container a
    warehouse migration meets, after parquet and text formats): full
    typed events subset written as ORC, read back, aggregated with
    exact-cents arithmetic. ORC is binary-typed, so unlike CSV the
    value columns cross losslessly; the oracle recomputes from the
    original parquet, pinning the whole encode/decode path."""
    e = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    out = f"/tmp/ukis_orc_roundtrip_{os.getpid()}_{abs(hash(sf_dir)) % 10_000}"
    e.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("event_id").alias("sum_event_id"),
        F.sum("value_cents").alias("sum_value_cents"),
        F.countDistinct("user_id").alias("n_users"),
    )


Q_SOURCE_ORC_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


def q_source_zordered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order publish + selective scan (layout.write_zordered): the
    documents table is clustered on the Morton interleave of
    (source-hash bucket, n_chars), re-read, and range-filtered on BOTH
    clustering dimensions — the multi-dimensional-pruning layout the
    engine publishes curated corpora in. The oracle recomputes the
    same filter+aggregate from the original parquet, so the gate
    fails on any write/read corruption; row-group pruning itself is
    footer-stats-proven in tests/test_layout.py."""
    from ukis_h3cellstore_spark.layout import write_zordered

    from ukis_h3cellstore_spark.entry_queries import _hash64

    docs = _t(spark, sf_dir, "documents").withColumn(
        "src_bucket", F.pmod(_hash64(F.col("source")), F.lit(64))
    )
    out = f"/tmp/ukis_zorder_gate_{os.getpid()}_{abs(hash(sf_dir)) % 10_000}"
    write_zordered(docs, ["src_bucket", "n_chars"], out, bits=10)
    back = spark.read.parquet(out)
    return (
        back.filter((F.col("src_bucket") < 32) & (F.col("n_chars") >= 200))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
        )
    )


Q_SOURCE_ZORDERED_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM (SELECT *,
             (('0x' || substr(md5(source), 1, 15))::BIGINT) % 64 AS src_bucket
      FROM documents)
WHERE src_bucket < 32 AND n_chars >= 200
GROUP BY 1
"""


# --------------------------------------------------------------------------
# ordered-set / statistical aggregates


def q_lineitem_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (ordered-set aggregate surface):
    p50/p90/p99 of the discounted price in integer cents, per return
    flag. Spark's exact ``percentile`` and DuckDB's ``quantile_cont``
    share the lower+(upper-lower)*frac definition over the sorted
    values, and the inputs are exact BIGINTs, so the interpolated
    doubles match bit-for-bit. (Exact percentile is a full sort per
    group — at 100 TB use approx_percentile; this gate pins the exact
    semantics the approximation is judged against.)"""
    l = _t(spark, sf_dir, "lineitem")
    price = (_cents(F.col("l_extendedprice")) * (
        F.lit(100) - _cents(F.col("l_discount"))
    )).alias("price_c100")
    return (
        l.select("l_returnflag", price)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr("percentile(price_c100, 0.5)").alias("p50"),
            F.expr("percentile(price_c100, 0.9)").alias("p90"),
            F.expr("percentile(price_c100, 0.99)").alias("p99"),
        )
    )


Q_LINEITEM_PERCENTILES_SQL = """
WITH p AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice*100) AS BIGINT)
         * (100 - CAST(round(l_discount*100) AS BIGINT)) AS price_c100
  FROM lineitem
)
SELECT l_returnflag, COUNT(*) AS n_items,
       quantile_cont(price_c100, 0.5) AS p50,
       quantile_cont(price_c100, 0.9) AS p90,
       quantile_cont(price_c100, 0.99) AS p99
FROM p GROUP BY 1
"""


def q_events_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance/stddev surface with EXACT integer moment sums: per
    event type, n / Σx / Σx² in BIGINT cents, sample variance derived
    from them in one double expression — bit-identical across engines,
    unlike streaming Welford accumulators whose result depends on
    accumulation order. (This is also the map-side-combinable way to
    compute distributed variance: the moment sums merge
    associatively.)"""
    e = _events(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    agged = (
        e.select("event_type", cents.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("c").alias("sum_cents"),
            F.sum(F.col("c") * F.col("c")).alias("sum_sq_cents"),
        )
    )
    var = (
        F.col("sum_sq_cents").cast("double")
        - F.col("sum_cents").cast("double")
        * F.col("sum_cents").cast("double")
        / F.col("n_events").cast("double")
    ) / (F.col("n_events") - 1).cast("double")
    return agged.withColumn("var_cents2", F.round(var, 6))


Q_EVENTS_MOMENTS_SQL = """
WITH c AS (
  SELECT event_type, CAST(round(value*100) AS BIGINT) AS c FROM events
),
m AS (
  SELECT event_type, COUNT(*) AS n_events,
         CAST(SUM(c) AS BIGINT) AS sum_cents,
         CAST(SUM(c*c) AS BIGINT) AS sum_sq_cents
  FROM c GROUP BY 1
)
SELECT event_type, n_events, sum_cents, sum_sq_cents,
       round((CAST(sum_sq_cents AS DOUBLE)
              - CAST(sum_cents AS DOUBLE) * CAST(sum_cents AS DOUBLE)
                / CAST(n_events AS DOUBLE))
             / CAST(n_events - 1 AS DOUBLE), 6) AS var_cents2
FROM m
"""


def q_events_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling anomaly score: per event type, each day's event count
    z-scored against the trailing 7-day window (ROWS 6 PRECEDING).
    Rolling mean/variance come from exact integer window sums (Σx,
    Σx², n) combined in ONE double expression — frame-order-proof,
    unlike a windowed stddev accumulator. The window partitions by
    event_type over day counts: tiny state per key, no skew."""
    e = _events(spark, sf_dir)
    daily = (
        e.select(
            "event_type",
            F.expr("ts_us div 86400000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    rolled = daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("k"),
    )
    mean = F.col("s1").cast("double") / F.col("k").cast("double")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
        / F.col("k").cast("double")
    ) / F.col("k").cast("double")
    return (
        rolled.filter(F.col("k") == 7)
        .withColumn("z_milli", F.floor(
            (F.col("n").cast("double") - mean)
            / F.sqrt(var) * 1000.0
        ).cast("long"))
        .filter(var > 0)
        .select("event_type", "day", "n", "z_milli")
    )


Q_EVENTS_ZSCORE_SQL = """
WITH daily AS (
  SELECT event_type,
         epoch_us(ts) // CAST(86400000000 AS BIGINT) AS day,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
rolled AS (
  SELECT event_type, day, n,
         SUM(n) OVER w AS s1,
         SUM(n*n) OVER w AS s2,
         COUNT(*) OVER w AS k
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, CAST(n AS BIGINT) AS n,
       CAST(floor((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
            / sqrt((CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
                   / CAST(k AS DOUBLE)) * 1000.0) AS BIGINT) AS z_milli
FROM rolled
WHERE k = 7
  AND (CAST(s2 AS DOUBLE)
       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
      / CAST(k AS DOUBLE) > 0
"""


def q_events_global_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global running total WITHOUT the single-partition sort
    (ops/prefix.py: global_cumsum): range partition on the order key,
    parallel within-partition windows, broadcast partition offsets —
    the distributed prefix-sum pattern. Integer cents keep the
    cross-partition regrouping bit-exact vs the serial SQL window."""
    from ukis_h3cellstore_spark.ops import prefix as P

    e = _events(spark, sf_dir).select(
        "event_id", "ts_us", _cents(F.col("value")).alias("value_cents")
    )
    out = P.global_cumsum(
        e, ["ts_us", "event_id"], "value_cents", out_col="cum_cents",
        num_partitions=8,
    )
    return out.select(
        "event_id", "value_cents", F.col("cum_cents").cast("long").alias("cum_cents")
    )


Q_EVENTS_GLOBAL_CUMSUM_SQL = """
SELECT event_id,
       CAST(round(value * 100) AS BIGINT) AS value_cents,
       CAST(SUM(CAST(round(value * 100) AS BIGINT))
              OVER (ORDER BY epoch_us(ts), event_id) AS BIGINT) AS cum_cents
FROM events
"""


QUERIES_REL: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_global_cumsum": q_events_global_cumsum,
    "lineitem_percentiles": q_lineitem_percentiles,
    "events_value_moments": q_events_value_moments,
    "events_zscore": q_events_zscore,
    "source_orc_roundtrip": q_source_orc_roundtrip,
    "source_zordered_scan": q_source_zordered_scan,
    "orders_semi_anti_join": q_orders_semi_anti,
    "events_variant_props": q_events_variant_props,
    "source_csv_roundtrip": q_source_csv_roundtrip,
    "events_distinct_daily": q_events_distinct_daily,
    "events_window_ntile": q_events_window_ntile,
    "events_grouping_sets": q_events_grouping_sets,
    "events_user_type_signature": q_events_user_type_signature,
    "part_string_funcs": q_part_string_funcs,
    "source_jsonl_roundtrip": q_source_jsonl_roundtrip,
    "events_lateral_top2": q_events_lateral_top2,
    "events_gapfill_daily": q_events_gapfill_daily,
    "events_map_ops": q_events_map_ops,
    "events_window_nav": q_events_window_nav,
}

ORACLES_REL: dict[str, str] = {
    "events_global_cumsum": Q_EVENTS_GLOBAL_CUMSUM_SQL,
    "lineitem_percentiles": Q_LINEITEM_PERCENTILES_SQL,
    "events_value_moments": Q_EVENTS_MOMENTS_SQL,
    "events_zscore": Q_EVENTS_ZSCORE_SQL,
    "source_orc_roundtrip": Q_SOURCE_ORC_SQL,
    "source_zordered_scan": Q_SOURCE_ZORDERED_SQL,
    "orders_semi_anti_join": Q_ORDERS_SEMI_ANTI_SQL,
    "events_variant_props": Q_EVENTS_VARIANT_SQL,
    "source_csv_roundtrip": Q_SOURCE_CSV_SQL,
    "events_distinct_daily": Q_EVENTS_DISTINCT_DAILY_SQL,
    "events_window_ntile": Q_EVENTS_NTILE_SQL,
    "events_grouping_sets": Q_EVENTS_GROUPING_SETS_SQL,
    "events_user_type_signature": Q_EVENTS_SIGNATURE_SQL,
    "part_string_funcs": Q_PART_STRING_SQL,
    "source_jsonl_roundtrip": Q_SOURCE_JSONL_SQL,
    "events_lateral_top2": Q_EVENTS_LATERAL_SQL,
    "events_gapfill_daily": Q_EVENTS_GAPFILL_SQL,
    "events_map_ops": Q_EVENTS_MAP_OPS_SQL,
    "events_window_nav": Q_EVENTS_WINDOW_NAV_SQL,
}
