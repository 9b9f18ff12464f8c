"""Small column helpers shared across operators."""

import pyspark.sql.functions as F


def set_value_ifnull(column_name, value):
    """NULL-default (SURVEY.md §2.2 P7); reference spark_utils.py:4-5."""
    return F.when(F.col(column_name).isNull(), value).otherwise(F.col(column_name))


def get_session(app_name="spark-data-test-spark", master=None, shuffle_partitions=None):
    """Build a SparkSession tuned for this engine.

    AQE is enabled (runtime partition coalescing + skew-join splitting)
    — the default posture for the 100 TB design target.
    """
    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    builder = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return builder.getOrCreate()
