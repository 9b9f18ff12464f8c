"""Sources and sinks (SURVEY.md §2.1, S1-S5).

Read side: catalog table (``file_format == "table"``) or any
DataFrameReader format with per-source options — same surface as the
reference (/root/reference/spark_data_test/utils/io_utils.py:22-38).

Write side: overwrite-mode format write with options, optional output
partition-count control (reference io_utils.py:5-20). The shrink path
uses ``coalesce`` (no shuffle) and the grow path ``repartition`` —
chosen against the plan's current partitioning.
"""

from spark_data_test_spark.constants import OVERWRITE_MODE, TABLE_FMT


def read_dataframe(spark, dataframe_config):
    """S1/S2: read a table or a path in any format with options."""
    if dataframe_config.file_format == TABLE_FMT:
        return spark.read.table(dataframe_config.path)
    return (
        spark.read.options(**dataframe_config.spark_options)
        .format(dataframe_config.file_format)
        .load(dataframe_config.path)
    )


def _current_num_partitions(df):
    try:
        return df.rdd.getNumPartitions()
    except Exception:  # Spark Connect has no .rdd; fall back to "unknown"
        return None


def write_result(df, path, output_config):
    """S4/S5: overwrite write with options and partition-count control."""
    n = output_config.no_of_partitions
    if n > 0:
        current = _current_num_partitions(df)
        if current is not None and n < current:
            df = df.coalesce(n)
        else:
            df = df.repartition(n)
    (
        df.write.options(**output_config.spark_options)
        .mode(OVERWRITE_MODE)
        .format(output_config.output_file_format)
        .save(path)
    )
