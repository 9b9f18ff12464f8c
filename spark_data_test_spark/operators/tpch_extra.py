"""TPC-H Q2/Q8/Q9/Q11/Q16/Q20/Q21 shapes — completes the 22-query suite.

The testdata star schema has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate`` columns, so these queries keep the
canonical PLAN SHAPES (correlated per-group min, market-share ratio,
multi-dim profit rollup, scalar-subquery threshold, NOT-IN exclusion
over a distinct pair set, correlated-aggregate semi-join chain,
EXISTS/NOT-EXISTS anti-join pair) over adapted semantics:

  * the part-supplier relation is derived from lineitem
    (``SELECT DISTINCT l_partkey, l_suppkey`` + per-pair aggregates) —
    at 100 TB this is one map-side-combinable groupBy of the fact;
  * "supply cost" is the pair's minimum observed extended price;
  * Q21's "kept waiting" is l_shipdate > o_orderdate + 90 days.

All money flows through ``cents`` (exact BIGINT), thresholds are
integer-scaled (never float-fraction comparisons), and every ORDER BY
carries a unique tiebreak so LIMIT is deterministic cross-engine.

Scale notes: part/supplier/nation/region are broadcast everywhere
(dimension side), lineitem-lineitem self-joins (Q21) shuffle on
l_orderkey only, and the virtual-partsupp groupBy is the same shuffle
key the downstream per-part window needs, so AQE can reuse the
exchange.
"""

import pyspark.sql.functions as F
from pyspark.sql import Window

from spark_data_test_spark.operators.relational import cents, query, t

_PS_CTE = """
ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cost_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey
)"""


def _virtual_partsupp(li):
    """lineitem -> (partkey, suppkey, min-price) pair relation. One
    map-side-combinable shuffle; the 100 TB replacement for partsupp."""
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(cents(F.col("l_extendedprice"))).alias("cost_cents")
    )


@query(
    "tpch_q2_min_cost_supplier",
    "WITH "
    + _PS_CTE
    + """,
eligible AS (
  SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, ps.cost_cents
  FROM ps
  JOIN part p ON ps.l_partkey = p.p_partkey
  JOIN supplier s ON ps.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE p.p_size <= 5 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, cost_cents
FROM eligible e
WHERE cost_cents = (SELECT MIN(cost_cents) FROM eligible e2
                    WHERE e2.p_partkey = e.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
""",
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape: cheapest supplier per part within a region — the
    correlated per-group MIN becomes a window over the eligible set,
    whose partitioning (p_partkey) Catalyst satisfies with one
    exchange; part/supplier/nation/region are all broadcast."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(
        (F.col("p_size") <= 5) & (F.col("p_type") == "LARGE")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    sn = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = (
        _virtual_partsupp(li)
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("_min_cost", F.min("cost_cents").over(w))
        .where(F.col("cost_cents") == F.col("_min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "cost_cents")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q8_market_share",
    """
    SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                    THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                              AS BIGINT) ELSE 0 END) AS BIGINT) AS mkt_cents,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS total_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN region r ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """Q8 shape: one nation's share of a region's market by year —
    numerator/denominator as exact cents in a single grouped pass;
    the only non-broadcast join is lineitem-orders."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    p = t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    cust_in_region = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    rev = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_in_region), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(0)
            ).alias("mkt_cents"),
            F.sum(rev).alias("total_cents"),
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9_product_profit",
    """
    SELECT n.n_name AS nation, CAST(YEAR(l.l_shipdate) AS INT) AS o_year,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)
                  - CAST(ROUND(p.p_retailprice * l.l_quantity * 100) AS BIGINT))
                AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE 'red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    """Q9 shape: profit (revenue minus retail cost of goods) per
    supplier nation per year for one product family; per-row exact
    cents difference, then a two-dim grouped rollup."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_name").startswith("red"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    supp_nation = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    amount = cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))) - cents(
        F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(
            F.col("nation"), F.year("l_shipdate").cast("int").alias("o_year")
        )
        .agg(F.sum(amount).alias("profit_cents"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "tpch_q11_important_stock",
    "WITH "
    + _PS_CTE
    + """,
natval AS (
  SELECT ps.l_partkey, CAST(SUM(ps.cost_cents) AS BIGINT) AS value_cents
  FROM ps JOIN supplier s ON ps.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_1'
  GROUP BY ps.l_partkey
)
SELECT l_partkey AS p_partkey, value_cents FROM natval
WHERE value_cents * (SELECT COUNT(*) FROM natval)
      > 2 * (SELECT SUM(value_cents) FROM natval)
ORDER BY value_cents DESC, p_partkey
""",
)
def tpch_q11_important_stock(spark, sf_dir):
    """Q11 shape: parts whose one-nation supply value exceeds a
    fraction of the nation total — the scalar subquery is a broadcast
    1-row cross join (same pattern as Q15's scalar max), and the
    threshold compare is integer-scaled AND scale-invariant
    (value * n_parts > 2 * total, i.e. value above twice the average
    part value), never a float fraction or a constant that silently
    degenerates as the corpus grows."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    natval = (
        _virtual_partsupp(li)
        .join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("cost_cents").alias("value_cents"))
    )
    total = natval.agg(
        F.sum("value_cents").alias("_total"),
        F.count(F.lit(1)).alias("_nparts"),
    )
    return (
        natval.crossJoin(F.broadcast(total))
        .where(F.col("value_cents") * F.col("_nparts") > 2 * F.col("_total"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_cents")
        .orderBy(F.col("value_cents").desc(), "p_partkey")
    )


@query(
    "tpch_q16_parts_supplier",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON ps.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_parts_supplier(spark, sf_dir):
    """Q16 shape: supplier variety per (brand, type, size) excluding
    flagged suppliers — NOT IN compiles to a broadcast left-anti join
    (the flagged set is tiny), then countDistinct over the pair
    relation."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").startswith("MEDIUM")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    flagged = (
        t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(
            F.broadcast(flagged),
            pairs.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q20_potential_promotion",
    """
    WITH pairqty AS (
      SELECT l_partkey, l_suppkey,
             CAST(ROUND(SUM(l_quantity)) AS BIGINT) AS qty_total,
             CAST(ROUND(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                                  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                                 THEN l_quantity ELSE 0 END)) AS BIGINT) AS qty_1996
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM pairqty pq
    JOIN part p ON pq.l_partkey = p.p_partkey
    JOIN supplier s ON pq.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE 'red%' AND n.n_name = 'NATION_2'
      AND pq.qty_1996 * 2 > pq.qty_total
    ORDER BY s_suppkey
    """,
)
def tpch_q20_potential_promotion(spark, sf_dir):
    """Q20 shape: suppliers whose 1996 shipments of a product family
    dominate their all-time volume — the correlated availability
    aggregate becomes a conditional sum in the SAME pair groupBy (one
    pass over the fact), then broadcast part/nation filters and a
    distinct."""
    li = t(spark, sf_dir, "lineitem")
    in_96 = (
        F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    pairqty = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.sum("l_quantity")).cast("long").alias("qty_total"),
        F.round(F.sum(F.when(in_96, F.col("l_quantity")).otherwise(0.0)))
        .cast("long")
        .alias("qty_1996"),
    )
    p = t(spark, sf_dir, "part").where(F.col("p_name").startswith("red"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    return (
        pairqty.where(F.col("qty_1996") * 2 > F.col("qty_total"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q21_waiting_supplier",
    """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders o ON l1.l_orderkey = o.o_orderkey
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name LIMIT 100
    """,
)
def tpch_q21_waiting_supplier(spark, sf_dir):
    """Q21 shape: the sole late supplier on multi-supplier finished
    orders ("late" adapted to ship > order date + 90 days — the schema
    has no commit/receipt dates). EXISTS/NOT-EXISTS become left-semi /
    left-anti self-joins on l_orderkey with a suppkey inequality; all
    three legs shuffle on the same key, so the exchange is planned
    once and reused."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    with_other = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole_late = with_other.alias("l1").join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
