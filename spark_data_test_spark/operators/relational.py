"""Relational operator queries for the driver contract (SURVEY.md §2).

Each query is a callable ``(spark, sf_dir) -> DataFrame`` registered in
``QUERIES``; ``ORACLES`` holds the equivalent ANSI SQL for the DuckDB
cross-check. Design rules that make Spark and DuckDB results
bit-identical:

* no raw double aggregation — money/metric sums go through per-row
  ``CAST(ROUND(x*100) AS BIGINT)`` "cents" so the sum is integer
  (order-independent, exact in both engines);
* every computed column is aliased identically on both sides;
* timestamps are compared/grouped via UTC session time and surfaced as
  epoch-microsecond BIGINTs (``unix_micros`` / ``epoch_us``) or kept
  as raw parquet values;
* deterministic tie-breaks on every rank/top-k (the 4-column lineitem
  key is unique; ``o_orderkey``/``event_id`` are unique).

Scale notes are inline per query: broadcast hints for dimension joins,
single-shuffle aggregation patterns, and partial-agg-friendly shapes.
"""

import pyspark.sql.functions as F
from pyspark.sql import Window
from pyspark.sql.types import LongType

from spark_data_test_spark.constants import (
    MISSING_AT_SOURCE_STATUS,
    MISSING_AT_TARGET_STATUS,
    PRESENT_IN_BOTH_STATUS,
)

QUERIES = {}
ORACLES = {}


def query(name, sql=None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def prepare_session(spark):
    """Session prep for cross-engine determinism: UTC session time and
    plain TIMESTAMP (not NTZ) so ``unix_micros`` etc. resolve and agree
    with DuckDB's naive-as-UTC reading; legacy nanos-as-long so the
    events file (TIMESTAMP(NANOS), which Spark refuses natively) reads.
    Shared by the batch loader and the streaming source — the
    streaming-equals-batch oracles require both paths identical."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def events_ts_to_micros(df):
    """Normalize ``events.ts`` to a microsecond TIMESTAMP regardless of
    how the parquet writer stored it: TIMESTAMP(NANOS) files surface as
    nanos-long (via ``nanosAsLong``) and are floor-divided to match
    DuckDB's ns->us truncation; micros TIMESTAMP files pass through."""
    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def t(spark, sf_dir, name):
    """S2 parquet scan. Column pruning / predicate pushdown happen via
    Catalyst once callers select/filter on the returned frame."""
    prepare_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = events_ts_to_micros(df)
    return df


def cents(col):
    """Exact integer representation of a 2-decimal metric: the
    cross-engine-deterministic aggregation currency."""
    return F.round(col * 100).cast("long")


# ---------------------------------------------------------------------------
# Scans / projections / row transforms (S2, P1-P10)
# ---------------------------------------------------------------------------


@query(
    "scan_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity < 5
    """,
)
def scan_filter_project(spark, sf_dir):
    """S2+P1+P5: filter and projection both push into the parquet scan
    (PushedFilters + pruned ReadSchema in the formatted plan)."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") < 5)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query(
    "select_drop_rename",
    """
    SELECT p_partkey AS part_id, p_name AS part_name, p_brand AS brand, p_type
    FROM part
    """,
)
def select_drop_rename(spark, sf_dir):
    """P1+P2+P4: select, drop, bulk rename."""
    return (
        t(spark, sf_dir, "part")
        .drop("p_retailprice", "p_size")
        .withColumnsRenamed(
            {"p_partkey": "part_id", "p_name": "part_name", "p_brand": "brand"}
        )
        .select("part_id", "part_name", "brand", "p_type")
    )


@query(
    "case_when_bucket",
    """
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS price_bucket,
           o_orderstatus,
           COUNT(*) AS cnt
    FROM orders GROUP BY 1, 2
    """,
)
def case_when_bucket(spark, sf_dir):
    """P8/F6: CASE WHEN chain feeding a hash aggregate."""
    return (
        t(spark, sf_dir, "orders")
        .withColumn(
            "price_bucket",
            F.when(F.col("o_totalprice") < 50000, "low")
            .when(F.col("o_totalprice") < 150000, "mid")
            .otherwise("high"),
        )
        .groupBy("price_bucket", "o_orderstatus")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "null_default_coalesce",
    """
    SELECT event_id, COALESCE(NULLIF(event_type, 'view'), 'VIEW_REDACTED') AS etype
    FROM events
    """,
)
def null_default_coalesce(spark, sf_dir):
    """P7/F5: NULL-default via coalesce (reference set_value_ifnull)."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(
            F.nullif(F.col("event_type"), F.lit("view")), F.lit("VIEW_REDACTED")
        ).alias("etype"),
    )


@query(
    "checksum_sha2",
    """
    SELECT doc_id,
           sha256(concat_ws('', text, lang, source, CAST(n_chars AS VARCHAR))) AS row_hash
    FROM documents
    """,
)
def checksum_sha2(spark, sf_dir):
    """F1/F2: the reference row checksum — sha2 over NULL-skipping
    concat_ws (comparison_job.py:40-43)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.sha2(
            F.concat_ws(
                "", "text", "lang", "source", F.col("n_chars").cast("string")
            ),
            256,
        ).alias("row_hash"),
    )


@query(
    "numeric_tolerance_abs",
    """
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN abs(o_totalprice - round(o_totalprice, -2)) <= 25
                    THEN 1 ELSE 0 END) AS BIGINT) AS within_tol,
           COUNT(*) AS total
    FROM orders GROUP BY 1
    """,
)
def numeric_tolerance_abs(spark, sf_dir):
    """F3: |a-b| <= tolerance — the numeric comparison rule."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.sum(
                F.when(
                    F.abs(
                        F.col("o_totalprice") - F.round(F.col("o_totalprice"), -2)
                    )
                    <= 25,
                    1,
                ).otherwise(0)
            ).alias("within_tol"),
            F.count("*").alias("total"),
        )
    )


@query(
    "eq_null_safe",
    """
    SELECT o_orderkey,
           NULLIF(o_orderpriority, '1-URGENT') IS NOT DISTINCT FROM
           NULLIF(o_orderpriority, '2-HIGH') AS matched
    FROM orders
    """,
)
def eq_null_safe(spark, sf_dir):
    """F4: NULL-safe equality (<=>), NULL == NULL is a match."""
    o = t(spark, sf_dir, "orders")
    a = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    b = F.nullif(F.col("o_orderpriority"), F.lit("2-HIGH"))
    return o.select("o_orderkey", a.eqNullSafe(b).alias("matched"))


@query(
    "json_extract_props",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS cnt
    FROM events GROUP BY 1
    """,
)
def json_extract_props(spark, sf_dir):
    """Extension: JSON field extraction from the events.props payload."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_mod")
        )
        .groupBy("k_mod")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Joins (J1/J2) and comparison-shaped join queries
# ---------------------------------------------------------------------------


@query(
    "full_outer_join_missing",
    """
    SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           CASE WHEN s.o_orderkey IS NULL THEN 'missing_at_source'
                WHEN t.o_orderkey IS NULL THEN 'missing_at_target'
                ELSE 'present_in_both' END AS row_status
    FROM (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0) s
    FULL JOIN (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 <> 0) t
      ON s.o_orderkey = t.o_orderkey
    """,
)
def full_outer_join_missing(spark, sf_dir):
    """J1: full outer alignment; NULL side => missing-row detection."""
    o = t(spark, sf_dir, "orders")
    s = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", F.lit(1).alias("s_flag")
    )
    tg = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", F.lit(1).alias("t_flag")
    )
    return s.join(tg, ["o_orderkey"], "full_outer").select(
        "o_orderkey",
        F.when(F.col("s_flag").isNull(), "missing_at_source")
        .when(F.col("t_flag").isNull(), "missing_at_target")
        .otherwise("present_in_both")
        .alias("row_status"),
    )


@query(
    "conditional_sum_missing",
    """
    SELECT CAST(SUM(CASE WHEN s.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS missing_at_source,
           CAST(SUM(CASE WHEN t.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS missing_at_target,
           CAST(SUM(CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS present_in_both
    FROM (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0) s
    FULL JOIN (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 <> 0) t
      ON s.o_orderkey = t.o_orderkey
    """,
)
def conditional_sum_missing(spark, sf_dir):
    """A2: global conditional sums (missing-row counts) in one pass."""
    o = t(spark, sf_dir, "orders")
    s = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", F.lit(1).alias("s_flag")
    )
    tg = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", F.lit(1).alias("t_flag")
    )
    j = s.join(tg, ["o_orderkey"], "full_outer")
    return j.agg(
        F.sum(F.when(F.col("s_flag").isNull(), 1).otherwise(0)).alias(
            "missing_at_source"
        ),
        F.sum(F.when(F.col("t_flag").isNull(), 1).otherwise(0)).alias(
            "missing_at_target"
        ),
        F.sum(
            F.when(
                F.col("s_flag").isNotNull() & F.col("t_flag").isNotNull(), 1
            ).otherwise(0)
        ).alias("present_in_both"),
    )


@query(
    "left_join_enrich",
    """
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def left_join_enrich(spark, sf_dir):
    """J2: left equi-join enrichment; customer is a dimension ->
    explicit broadcast (no shuffle of the fact side)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey, "left"
    ).select("o_orderkey", "c_name", "c_mktsegment")


@query(
    "groupby_dup_count",
    """
    SELECT COUNT(*) AS dup_keys
    FROM (SELECT l_orderkey, l_linenumber FROM lineitem
          GROUP BY 1, 2 HAVING COUNT(*) > 1)
    """,
)
def groupby_dup_count(spark, sf_dir):
    """A1: duplicate-key detection via groupBy-count-filter-count."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey", "l_linenumber")
        .count()
        .where(F.col("count") > 1)
        .agg(F.count("*").alias("dup_keys"))
    )


@query(
    "create_map_getitem",
    """
    SELECT CAST(SUM(CASE WHEN o_orderkey % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS source_count,
           CAST(SUM(CASE WHEN o_orderkey % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS target_count
    FROM orders
    """,
)
def create_map_getitem(spark, sf_dir):
    """F7/A5: build a {'source': n, 'target': m} MapType column in an
    aggregate, probe it back out with getItem (reference
    comparison_job.py:74-79, 93-94). Output flattened for the oracle."""
    o = t(spark, sf_dir, "orders")
    mapped = o.agg(
        F.create_map(
            F.lit("source"),
            F.sum(F.when(F.col("o_orderkey") % 7 != 0, 1).otherwise(0)),
            F.lit("target"),
            F.sum(F.when(F.col("o_orderkey") % 5 != 0, 1).otherwise(0)),
        ).alias("side_counts")
    )
    return mapped.select(
        F.col("side_counts").getItem("source").alias("source_count"),
        F.col("side_counts").getItem("target").alias("target_count"),
    )


# ---------------------------------------------------------------------------
# Windows (W1 + ranking/lead-lag/running extensions)
# ---------------------------------------------------------------------------


@query(
    "window_dup_count",
    """
    SELECT DISTINCT l_orderkey, l_linenumber,
           COUNT(*) OVER (PARTITION BY l_orderkey, l_linenumber) - 1 AS duplicate_count
    FROM lineitem
    """,
)
def window_dup_count(spark, sf_dir):
    """W1: the reference's only window — per-key duplicate count over an
    unbounded frame (comparison_job.py:142-145)."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey", "l_linenumber").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.count("*").over(w) - 1).alias("duplicate_count"),
    ).distinct()


@query(
    "window_rank_topk",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice, rn
    FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
                 ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_extendedprice DESC, l_linenumber,
                                             l_partkey, l_suppkey) AS rn
          FROM lineitem)
    WHERE rn <= 2
    """,
)
def window_rank_topk(spark, sf_dir):
    """Ranking window: top-2 line items per order, fully tie-broken by
    the unique 4-column key."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(),
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 2)
    )


@query(
    "window_lead_lag",
    """
    SELECT event_id,
           LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_event_id,
           epoch_us(ts) -
           LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS gap_us
    FROM events
    """,
)
def window_lead_lag(spark, sf_dir):
    """lead/lag window over the event stream: previous event + gap."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        (micros - F.lag(micros).over(w)).alias("gap_us"),
    )


@query(
    "window_running_sum",
    """
    SELECT event_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS run_cents
    FROM events
    """,
)
def window_running_sum(spark, sf_dir):
    """Running total per user (ordered frame), in exact integer cents."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", F.sum(cents(F.col("value"))).over(w).alias("run_cents")
    )


# ---------------------------------------------------------------------------
# Sorts / limits / dedup / set ops (O1-O5)
# ---------------------------------------------------------------------------


@query(
    "distinct_rows",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows(spark, sf_dir):
    """O2: distinct (partial-agg-friendly — dedup happens map-side
    before the shuffle)."""
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "drop_duplicates_by_key",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
    FROM (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                 ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_linenumber
                                    ORDER BY l_partkey, l_suppkey) AS rn
          FROM lineitem)
    WHERE rn = 1
    """,
)
def drop_duplicates_by_key(spark, sf_dir):
    """O3 made deterministic: dropDuplicates(keys) keeps an arbitrary
    row; for a verifiable contract we keep the (l_partkey, l_suppkey)
    minimum via row_number — same single shuffle as dropDuplicates."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        "l_partkey", "l_suppkey"
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "union_consolidate",
    """
    SELECT 'low_qty' AS segment, l_returnflag, COUNT(*) AS cnt
    FROM lineitem WHERE l_quantity <= 10 GROUP BY 2
    UNION ALL
    SELECT 'high_qty' AS segment, l_returnflag, COUNT(*) AS cnt
    FROM lineitem WHERE l_quantity > 40 GROUP BY 2
    """,
)
def union_consolidate(spark, sf_dir):
    """O4: union of per-dataset report frames (multi-dataset
    consolidation, reference comparison_job.py:277-289)."""
    li = t(spark, sf_dir, "lineitem")
    low = (
        li.where(F.col("l_quantity") <= 10)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("cnt"))
        .select(F.lit("low_qty").alias("segment"), "l_returnflag", "cnt")
    )
    high = (
        li.where(F.col("l_quantity") > 40)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("cnt"))
        .select(F.lit("high_qty").alias("segment"), "l_returnflag", "cnt")
    )
    return low.unionByName(high)


@query(
    "orderby_limit_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def orderby_limit_topk(spark, sf_dir):
    """O1 + limit: global top-k — Spark plans TakeOrderedAndProject
    (no full sort materialization), tie-broken by the unique key."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "colwise_mismatch_unpivot",
    """
    WITH tb AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 13 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 0.5 ELSE o_totalprice END AS o_totalprice
      FROM orders),
    p AS (
      SELECT s.o_orderstatus IS NOT DISTINCT FROM t.o_orderstatus AS f_status,
             abs(s.o_totalprice - t.o_totalprice) <= 0.25 AS f_price
      FROM orders s JOIN tb t ON s.o_orderkey = t.o_orderkey)
    SELECT 'o_orderstatus' AS column_name,
           CAST(COALESCE(SUM(CASE WHEN NOT f_status THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS unmatched_rows_count
    FROM p
    UNION ALL
    SELECT 'o_totalprice' AS column_name,
           CAST(COALESCE(SUM(CASE WHEN NOT f_price THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS unmatched_rows_count
    FROM p
    """,
)
def colwise_mismatch_unpivot(spark, sf_dir):
    """A3+O5: ALL per-column mismatch counts in ONE aggregate pass, then
    unpivot wide->long (the reference column-report pattern,
    comparison_job.py:102-110)."""
    o = t(spark, sf_dir, "orders")
    tb = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 13 == 0, "X")
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") + 0.5)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    s = o.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status_src"),
        F.col("o_totalprice").alias("price_src"),
    )
    j = s.join(tb, ["o_orderkey"])
    wide = j.agg(
        F.sum(
            F.when(
                ~F.col("status_src").eqNullSafe(F.col("o_orderstatus")), 1
            ).otherwise(0)
        ).alias("o_orderstatus"),
        F.sum(
            F.when(
                ~(F.abs(F.col("price_src") - F.col("o_totalprice")) <= 0.25), 1
            ).otherwise(0)
        ).alias("o_totalprice"),
    )
    return wide.unpivot(
        [],
        ["o_orderstatus", "o_totalprice"],
        variableColumnName="column_name",
        valueColumnName="unmatched_rows_count",
    ).withColumn(
        "unmatched_rows_count", F.coalesce("unmatched_rows_count", F.lit(0))
    )


# ---------------------------------------------------------------------------
# Analytics (TPC-H-style) and time windows over the events table
# ---------------------------------------------------------------------------


@query(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS sum_qty_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_base_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
             AS BIGINT) AS sum_disc_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
                    AS BIGINT)) AS BIGINT) AS sum_charge_cents,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy single-shuffle aggregate; all metrics
    in exact integer cents (order-independent across engines)."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents(F.col("l_quantity"))).alias("sum_qty_cents"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(cents(disc_price)).alias("sum_disc_cents"),
            F.sum(cents(charge)).alias("sum_charge_cents"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           epoch_us(o.o_orderdate) AS o_orderdate_us
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue_cents DESC, l_orderkey LIMIT 20
    """,
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dimension filter broadcast into the
    fact join, aggregate, top-k."""
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
        .select(
            "l_orderkey",
            "revenue_cents",
            F.unix_micros(F.col("o_orderdate")).alias("o_orderdate_us"),
        )
        .orderBy(F.col("revenue_cents").desc(), "l_orderkey")
        .limit(20)
    )


@query(
    "tpch_q5_local_supplier",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: star join — every dimension broadcast, the only
    shuffles are fact-fact (orders x lineitem) and the final agg."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
    )


@query(
    "events_tumbling_window",
    """
    SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour aggregation over the event stream (batch form).

    The BATCH ``date_trunc`` twin of ``streaming_tumbling_counts``
    (same oracle text — the streaming run on a finite table must equal
    the batch group-by, and batch-equals-streaming is additionally
    asserted in tests/test_northstar.py). Registered in its own right
    so no query-shaped operator sits outside the oracle regime
    (VERDICT r8 item 8): the two registrations check DIFFERENT engine
    paths (Catalyst date_trunc aggregate here; the availableNow
    micro-batch pipeline there) against one ground truth."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
            "event_type",
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum(cents(F.col("value"))).alias("value_cents"),
        )
    )


@query(
    "events_sliding_window",
    """
    WITH offsets AS (SELECT * FROM (VALUES (0), (1800)) AS o(off)),
    slid AS (
      SELECT epoch_us(date_trunc('hour', ts - to_microseconds(off * 1000000)))
               + off * 1000000 AS win_start_us,
             value
      FROM events, offsets)
    SELECT win_start_us, COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM slid GROUP BY 1
    """,
)
def events_sliding_window(spark, sf_dir):
    """Sliding window (1h width, 30min slide) — each event lands in two
    windows; implemented via F.window, oracle via explicit offset math."""
    ev = t(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(win.alias("w"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(cents(F.col("value"))).alias("value_cents"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "cnt",
            "value_cents",
        )
    )


@query(
    "events_sessionization",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) -
                       LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM ordered)
    SELECT user_id, epoch_us(MIN(ts)) AS session_start_us, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark, sf_dir):
    """Session windows with a 30-minute gap via F.session_window; the
    oracle derives identical sessions with gaps-and-islands SQL."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )
