"""Bucketed co-located joins must be exchange-free (DESIGN.md §1)."""

import pyspark.sql.functions as F
import pytest

from spark_data_test_spark.operators.relational import t
from spark_data_test_spark.plans.audit import count_shuffles, simple_plan
from spark_data_test_spark.sources.bucketed import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse dir is a static conf; managed tables land in the default
    # ./spark-warehouse (gitignored) and are dropped on teardown
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        num_buckets=8,
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    ot, lt = bucketed_tables
    # at test scale Spark would auto-broadcast (also exchange-free, but
    # not the property under test); force the sort-merge path the plan
    # would take on 100 TB sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = read_bucketed(spark, ot)
        li = read_bucketed(spark, lt)
        joined = o.join(li, ["o_orderkey"]).groupBy("o_orderstatus").agg(
            F.count("*").alias("cnt")
        )
        # the join must not exchange either side (bucketed scans already
        # deliver hash distribution); the only shuffle allowed is the
        # final small aggregation on o_orderstatus
        assert count_shuffles(joined) <= 1
        assert "SortMergeJoin" in simple_plan(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    ot, lt = bucketed_tables
    bucketed = (
        read_bucketed(spark, ot)
        .join(read_bucketed(spark, lt), ["o_orderkey"])
        .count()
    )
    plain = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            ["o_orderkey"],
        )
        .count()
    )
    assert bucketed == plain
