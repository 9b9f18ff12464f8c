"""Salted operators must be exact rewrites of their plain forms."""

import pyspark.sql.functions as F

from spark_data_test_spark.operators.relational import t
from spark_data_test_spark.operators.skew import salted_groupby, salted_join


def test_salted_groupby_equals_plain(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    plain = {
        tuple(r[:1]): (r["cnt"], r["qty"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty"),
        )
        .collect()
    }
    salted = {
        tuple(r[:1]): (r["cnt"], r["qty"])
        for r in salted_groupby(
            li,
            ["l_returnflag"],
            {
                "cnt": ("count", F.lit(1)),
                "qty": ("sum", F.round(F.col("l_quantity") * 100).cast("long")),
            },
            n_salt=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = sorted(
        tuple(r) for r in li.join(o, ["l_orderkey"]).collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(li, o, ["l_orderkey"], n_salt=8).select(
            "l_orderkey", "l_quantity", "o_orderstatus"
        ).collect()
    )
    assert salted == plain


def test_salted_join_handles_duplicate_right_keys(spark):
    left = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k long, lv string")
    right = spark.createDataFrame([(1, "x"), (1, "y")], "k long, rv string")
    plain = sorted(tuple(r) for r in left.join(right, ["k"]).collect())
    salted = sorted(
        tuple(r)
        for r in salted_join(left, right, ["k"], n_salt=4)
        .select("k", "lv", "rv")
        .collect()
    )
    assert salted == plain


def test_salted_join_rejects_right_preserving_types(spark):
    import pytest

    left = spark.createDataFrame([(1, "a")], "k long, lv string")
    right = spark.createDataFrame([(2, "x")], "k long, rv string")
    with pytest.raises(ValueError, match="outer"):
        salted_join(left, right, ["k"], how="full_outer")
    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="right")
