"""Job entry points: config-driven and direct-DataFrame comparison runs.

API parity with the reference's public surface
(/root/reference/spark_data_test/jobs/comparison_job.py:258-292 and
README.md:24-116): ``run_comparison_job(spark, config)`` and
``run_comparison_job_from_dfs(spark, job_name, source_df, target_df,
params, output_config)``, writing the four reports under
``<output_dir>/<job_name>/<report>``.
"""

import pyspark.sql.functions as F

from spark_data_test_spark.constants import (
    COL_LVL_TEST_REPORT_DIR,
    COL_LVL_TEST_REPORT_KEY,
    DATASET_NAME_COL,
    COL_NAME,
    OVERALL_TEST_REPORT_DIR,
    OVERALL_TEST_REPORT_KEY,
    PERSISTED_FRAMES_KEY,
    ROW_LVL_TEST_REPORT_DIR,
    ROW_LVL_TEST_REPORT_KEY,
    UNMATCHED_RECORDS_KEY,
    UNMATCHED_ROWS_DIR,
)
from spark_data_test_spark.entities.config import DatasetParams, OutputConfig
from spark_data_test_spark.operators.comparison import compare_dataframes
from spark_data_test_spark.utils.config_reader import (
    dict_to_dataclass,
    parse_comparison_job_config,
)
from spark_data_test_spark.utils.io_utils import read_dataframe, write_result


def _write_unmatched_partitioned(unmatched_map, base_path, output_config):
    """Scale path for the per-column dumps: ONE write of one long-format
    dataset partitioned by (dataset_name, column_name), replacing the
    reference's serial per-column write loop (comparison_job.py:174-179)
    — k driver-sequential jobs become one partitioned job.
    """
    union_df = None
    for tag, df in unmatched_map.items():
        dataset_name, column_name = tag.rsplit("/", 1)
        key_cols = df.columns[:-2]
        src_col, tgt_col = df.columns[-2], df.columns[-1]
        long_df = df.select(
            F.lit(dataset_name).alias(DATASET_NAME_COL),
            F.lit(column_name).alias(COL_NAME),
            F.to_json(F.struct(*key_cols)).alias("row_key"),
            F.col(src_col).cast("string").alias("source_value"),
            F.col(tgt_col).cast("string").alias("target_value"),
        )
        union_df = long_df if union_df is None else union_df.unionByName(long_df)
    if union_df is None:
        return
    (
        union_df.write.options(**output_config.spark_options)
        .mode("overwrite")
        .partitionBy(DATASET_NAME_COL, COL_NAME)
        .format(output_config.output_file_format)
        .save(f"{base_path}/unmatched_rows")
    )


def write_results(comparison_result, job_name, output_config):
    """Write the four reports (reference __write_results layout)."""
    base = f"{output_config.output_dir}/{job_name}"
    write_result(
        comparison_result[COL_LVL_TEST_REPORT_KEY].orderBy(DATASET_NAME_COL),
        f"{base}/{COL_LVL_TEST_REPORT_DIR}",
        output_config,
    )
    write_result(
        comparison_result[ROW_LVL_TEST_REPORT_KEY].orderBy(DATASET_NAME_COL),
        f"{base}/{ROW_LVL_TEST_REPORT_DIR}",
        output_config,
    )
    if getattr(output_config, "partitioned_unmatched", False):
        _write_unmatched_partitioned(
            comparison_result[UNMATCHED_RECORDS_KEY], base, output_config
        )
    else:
        for tag, df in comparison_result[UNMATCHED_RECORDS_KEY].items():
            write_result(
                df, f"{base}/{UNMATCHED_ROWS_DIR.format(col_name=tag)}", output_config
            )
    write_result(
        comparison_result[OVERALL_TEST_REPORT_KEY].orderBy(DATASET_NAME_COL),
        f"{base}/{OVERALL_TEST_REPORT_DIR}",
        output_config,
    )


def run_comparison_job_from_dfs(spark, job_name, source_df, target_df, params, output_config):
    """E2: compare two in-memory DataFrames and write all reports."""
    if isinstance(params, dict):
        params = dict_to_dataclass(DatasetParams, params)
    if isinstance(output_config, dict):
        output_config = dict_to_dataclass(OutputConfig, output_config)
    result = compare_dataframes(spark, source_df, target_df, params)
    write_results(result, job_name, output_config)
    return result


def run_comparison_job(spark, config):
    """E1: config-driven multi-dataset comparison with consolidation
    (reference comparison_job.py:266-292): reports are unioned across
    datasets, unmatched dumps merged by tag."""
    if isinstance(config, dict):
        config = parse_comparison_job_config(config)
    consolidated = {}
    for dataset_config in config.dataset_configs:
        result = compare_dataframes(
            spark,
            read_dataframe(spark, dataset_config.source_config),
            read_dataframe(spark, dataset_config.target_config),
            dataset_config.params,
        )
        if consolidated:
            for key in (
                OVERALL_TEST_REPORT_KEY,
                ROW_LVL_TEST_REPORT_KEY,
                COL_LVL_TEST_REPORT_KEY,
            ):
                consolidated[key] = consolidated[key].union(result[key])
            consolidated[UNMATCHED_RECORDS_KEY].update(result[UNMATCHED_RECORDS_KEY])
            consolidated.setdefault(PERSISTED_FRAMES_KEY, []).extend(
                result.get(PERSISTED_FRAMES_KEY, [])
            )
        else:
            consolidated = result
    write_results(consolidated, config.job_name, config.output_config)
    return consolidated
