"""Golden-fixture parity with the reference test suite.

Fixture data and every expected number replicate
/root/reference/tests/test_comparison_job.py:17-125 (documented in
FIXTURES.md §A): duplicates on both sides (id=3, 2x2 -> dup_count 3),
missing-at-target rows (id=1, id=4), NULL==NULL matches, string
mismatches surviving tolerance (id=7 value/value2), and a numeric delta
inside tolerance (id=7 value4: |7.1-7.0| <= 0.1 -> matched).
"""

import pytest
from pyspark.sql import Row
from pyspark.testing import assertDataFrameEqual

from spark_data_test_spark import (
    ComparisonJobConfig,
    DataframeConfig,
    DatasetConfig,
    DatasetParams,
    OutputConfig,
    TestParams,
    compare_dataframes,
    run_comparison_job,
    run_comparison_job_from_dfs,
)
from spark_data_test_spark.constants import (
    ALL_ROWS_MATCHED_COL,
    COL_LVL_TEST_REPORT_KEY,
    COL_NAME,
    COUNT_COL,
    DUPLICATE_COUNT_COL,
    FAILED_STATUS,
    MATCHED_COUNT_COL,
    MISSING_AT_TARGET_STATUS,
    MISSING_ROW_STATUS_COL,
    MISSING_ROWS_COL,
    OVERALL_TEST_REPORT_KEY,
    PRESENT_IN_BOTH_STATUS,
    ROW_LVL_TEST_REPORT_KEY,
    TEST_STATUS_COL,
    UNMATCHED_RECORDS_KEY,
    UNMATCHED_ROWS_COUNT_COL,
)

JOB_NAME = "unit-testing"


@pytest.fixture(scope="module")
def sample_data(spark):
    source = spark.createDataFrame(
        [
            Row(id=1, value="foo", value2="foo", value3=True, value4=1.0),
            Row(id=3, value=None, value2=None, value3=False, value4=3.0),
            Row(id=3, value=None, value2=None, value3=False, value4=3.0),
            Row(id=4, value=None, value2=None, value3=False, value4=4.0),
            Row(id=7, value="foo7", value2="foo2", value3=False, value4=7.1),
        ]
    )
    target = spark.createDataFrame(
        [
            Row(id=3, value=None, value2=None, value3=False, value4=3.0),
            Row(id=3, value=None, value2=None, value3=False, value4=3.0),
            Row(id=7, value="foo", value2="foo3", value3=False, value4=7.0),
        ]
    )
    return source, target


@pytest.fixture(scope="module")
def params():
    return DatasetParams(
        dataset_name="pytest_job",
        primary_keys=["id"],
        test_params=TestParams(difference_tolerance=0.1),
    )


@pytest.fixture(scope="module")
def result(spark, sample_data, params):
    source, target = sample_data
    return compare_dataframes(spark, source, target, params)


def test_overall_report(result):
    row = result[OVERALL_TEST_REPORT_KEY].first()
    assert row[COUNT_COL]["source"] == 5 and row[COUNT_COL]["target"] == 3
    assert row[MATCHED_COUNT_COL] == 1
    assert row[DUPLICATE_COUNT_COL]["source"] == 1
    assert row[DUPLICATE_COUNT_COL]["target"] == 1
    assert row[MISSING_ROWS_COL]["source"] == 0
    assert row[MISSING_ROWS_COL]["target"] == 2
    assert row[TEST_STATUS_COL] == FAILED_STATUS


def test_row_level_report(result):
    report = result[ROW_LVL_TEST_REPORT_KEY]
    rows = {r["id"]: r for r in report.collect()}
    assert report.count() == 4
    assert rows[1][MISSING_ROW_STATUS_COL] == MISSING_AT_TARGET_STATUS
    assert rows[3][MISSING_ROW_STATUS_COL] == PRESENT_IN_BOTH_STATUS
    assert rows[3][DUPLICATE_COUNT_COL] == 3
    assert rows[3][ALL_ROWS_MATCHED_COL]
    assert rows[4][MISSING_ROW_STATUS_COL] == MISSING_AT_TARGET_STATUS
    assert not rows[7][ALL_ROWS_MATCHED_COL]


def test_column_level_report(result):
    report = result[COL_LVL_TEST_REPORT_KEY]
    counts = {r[COL_NAME]: r[UNMATCHED_ROWS_COUNT_COL] for r in report.collect()}
    assert report.count() == 4
    # value/value2 mismatch on id=7; value3 equal; value4 saved by tolerance
    assert counts == {"value": 1, "value2": 1, "value3": 0, "value4": 0}


def test_unmatched_records_dumps(result):
    dumps = result[UNMATCHED_RECORDS_KEY]
    assert set(dumps) == {"pytest_job/value", "pytest_job/value2"}
    value_rows = dumps["pytest_job/value"].collect()
    assert len(value_rows) == 1
    assert value_rows[0]["id"] == 7
    assert value_rows[0]["value_src"] == "foo7"
    assert value_rows[0]["value_target"] == "foo"


def test_tolerance_zero_fails_value4(spark, sample_data):
    source, target = sample_data
    res = compare_dataframes(
        spark,
        source,
        target,
        DatasetParams(dataset_name="tol0", primary_keys=["id"]),
    )
    counts = {
        r[COL_NAME]: r[UNMATCHED_ROWS_COUNT_COL]
        for r in res[COL_LVL_TEST_REPORT_KEY].collect()
    }
    assert counts["value4"] == 1


def test_canonical_checksum_distinguishes_null_from_empty(spark):
    # The reference checksum collides NULL with "" (concat_ws skips
    # NULLs); the xxhash64 canonical mode must not.
    source = spark.createDataFrame([(1, None, "x")], "id long, a string, b string")
    target = spark.createDataFrame([(1, "", "x")], "id long, a string, b string")
    params = DatasetParams(
        dataset_name="canon",
        primary_keys=["id"],
        test_params=TestParams(checksum_mode="xxhash64"),
    )
    res = compare_dataframes(spark, source, target, params)
    assert res[OVERALL_TEST_REPORT_KEY].first()[TEST_STATUS_COL] == FAILED_STATUS
    # reference mode: collision -> PASSED (parity with reference semantics)
    res_ref = compare_dataframes(
        spark,
        source,
        target,
        DatasetParams(dataset_name="ref", primary_keys=["id"]),
    )
    assert res_ref[OVERALL_TEST_REPORT_KEY].first()[TEST_STATUS_COL] == "PASSED"


def test_canonical_checksum_sentinel_characters_in_strings(spark):
    # StringType values may themselves contain the field separator
    # (\x1f) and NUL — a column-shift across the boundary must still be
    # detected (length-prefixed framing, not separator trust).
    source = spark.createDataFrame(
        [(1, "a\x1fb", "c"), (2, "x\x00", "y")], "id long, a string, b string"
    )
    target = spark.createDataFrame(
        [(1, "a", "b\x1fc"), (2, "x", "\x00y")], "id long, a string, b string"
    )
    params = DatasetParams(
        dataset_name="sentinels",
        primary_keys=["id"],
        test_params=TestParams(checksum_mode="xxhash64"),
    )
    res = compare_dataframes(spark, source, target, params)
    overall = res[OVERALL_TEST_REPORT_KEY].first()
    assert overall[TEST_STATUS_COL] == FAILED_STATUS
    assert overall[MATCHED_COUNT_COL] == 0


def test_canonical_checksum_nested_types_not_lossy(spark):
    # cast-to-string renders ["a, b"] and ["a", "b"] identically, so a
    # string-cast encoding would checksum them equal and the fast path
    # would declare the rows matched; the JSON encoding must not.
    source = spark.createDataFrame(
        [(1, ["a, b"]), (2, ["x"])], "id long, v array<string>"
    )
    target = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["x"])], "id long, v array<string>"
    )
    params = DatasetParams(
        dataset_name="nested",
        primary_keys=["id"],
        test_params=TestParams(checksum_mode="xxhash64"),
    )
    res = compare_dataframes(spark, source, target, params)
    overall = res[OVERALL_TEST_REPORT_KEY].first()
    assert overall[TEST_STATUS_COL] == FAILED_STATUS
    assert overall[MATCHED_COUNT_COL] == 1  # only doc 2 matches


def test_overall_report_counts_null_key_rows_missing(spark):
    # NULL primary keys never join (plain equality), so a NULL-key row
    # on each side is missing from the other — the overall report must
    # agree with the row report's accounting, not silently report 0/0.
    source = spark.createDataFrame(
        [(None, "a"), (1, "b")], "id long, v string"
    )
    target = spark.createDataFrame(
        [(None, "zzz"), (1, "b")], "id long, v string"
    )
    params = DatasetParams(dataset_name="nullkeys", primary_keys=["id"])
    res = compare_dataframes(spark, source, target, params)
    overall = res[OVERALL_TEST_REPORT_KEY].first()
    assert overall["missing_rows"] == {"source": 1, "target": 1}
    assert overall[MATCHED_COUNT_COL] == 1
    assert overall[TEST_STATUS_COL] == FAILED_STATUS


def test_composite_primary_keys(spark):
    source = spark.createDataFrame(
        [Row(k1=1, k2="a", v=1.0), Row(k1=1, k2="b", v=2.0), Row(k1=2, k2="a", v=3.0)]
    )
    target = spark.createDataFrame(
        [Row(k1=1, k2="a", v=1.0), Row(k1=1, k2="b", v=9.0)]
    )
    res = compare_dataframes(
        spark,
        source,
        target,
        DatasetParams(dataset_name="composite", primary_keys=["k1", "k2"]),
    )
    overall = res[OVERALL_TEST_REPORT_KEY].first()
    assert overall[COUNT_COL]["source"] == 3 and overall[COUNT_COL]["target"] == 2
    assert overall[MATCHED_COUNT_COL] == 1
    assert overall[MISSING_ROWS_COL]["target"] == 1


def test_select_drop_cols(spark, sample_data):
    # Non-default select/drop: latent analysis bug in the reference
    # (comparison_job.py:187 reads pre-select columns); our engine
    # computes non-key columns post-select/drop so this must work.
    source, target = sample_data
    res = compare_dataframes(
        spark,
        source,
        target,
        DatasetParams(
            dataset_name="dropped",
            primary_keys=["id"],
            drop_cols=["value", "value2"],
            test_params=TestParams(difference_tolerance=0.1),
        ),
    )
    counts = {
        r[COL_NAME]: r[UNMATCHED_ROWS_COUNT_COL]
        for r in res[COL_LVL_TEST_REPORT_KEY].collect()
    }
    assert set(counts) == {"value3", "value4"}
    # id=7 row now matches entirely (value3 equal, value4 within tolerance)
    assert res[OVERALL_TEST_REPORT_KEY].first()[MATCHED_COUNT_COL] == 2


@pytest.fixture(scope="module")
def job_output(spark, tmp_path_factory, sample_data, params):
    source, target = sample_data
    out = str(tmp_path_factory.mktemp("from_dfs"))
    output_config = OutputConfig(output_dir=out, no_of_partitions=1)
    run_comparison_job_from_dfs(spark, JOB_NAME, source, target, params, output_config)
    return out


def test_e2e_write_read_back(spark, job_output):
    overall = spark.read.parquet(f"{job_output}/{JOB_NAME}/overall_test_report")
    assert overall.count() == 1
    row_lvl = spark.read.parquet(f"{job_output}/{JOB_NAME}/row_lvl_test_report")
    assert row_lvl.count() == 4
    col_lvl = spark.read.parquet(f"{job_output}/{JOB_NAME}/col_lvl_test_report")
    assert col_lvl.count() == 4
    dumps = spark.read.parquet(
        f"{job_output}/{JOB_NAME}/unmatched_rows/pytest_job/value"
    )
    assert dumps.count() == 1


def test_config_path_equivalence(spark, tmp_path, sample_data, params, job_output):
    """Config-driven path produces identical reports to the direct path
    (reference tests/test_comparison_job.py:80-83)."""
    source, target = sample_data
    source.write.mode("overwrite").parquet(f"{tmp_path}/in/src")
    target.write.mode("overwrite").parquet(f"{tmp_path}/in/tgt")
    config = ComparisonJobConfig(
        job_name=JOB_NAME,
        dataset_configs=[
            DatasetConfig(
                params=params,
                source_config=DataframeConfig(path=f"{tmp_path}/in/src"),
                target_config=DataframeConfig(path=f"{tmp_path}/in/tgt"),
            )
        ],
        output_config=OutputConfig(output_dir=f"{tmp_path}/out", no_of_partitions=1),
    )
    run_comparison_job(spark, config)
    for report in ("overall_test_report", "row_lvl_test_report", "col_lvl_test_report"):
        a = spark.read.parquet(f"{tmp_path}/out/{JOB_NAME}/{report}")
        b = spark.read.parquet(f"{job_output}/{JOB_NAME}/{report}")
        assertDataFrameEqual(a, b)


def test_multi_dataset_consolidation(spark, tmp_path, sample_data):
    source, target = sample_data
    source.write.mode("overwrite").parquet(f"{tmp_path}/in/src")
    target.write.mode("overwrite").parquet(f"{tmp_path}/in/tgt")
    ds = lambda name: DatasetConfig(
        params=DatasetParams(
            dataset_name=name,
            primary_keys=["id"],
            test_params=TestParams(difference_tolerance=0.1),
        ),
        source_config=DataframeConfig(path=f"{tmp_path}/in/src"),
        target_config=DataframeConfig(path=f"{tmp_path}/in/tgt"),
    )
    config = ComparisonJobConfig(
        job_name="multi",
        dataset_configs=[ds("ds_a"), ds("ds_b")],
        output_config=OutputConfig(output_dir=f"{tmp_path}/out"),
    )
    run_comparison_job(spark, config)
    overall = spark.read.parquet(f"{tmp_path}/out/multi/overall_test_report")
    assert overall.count() == 2
    assert {r["dataset_name"] for r in overall.collect()} == {"ds_a", "ds_b"}


def test_partitioned_unmatched_layout(spark, tmp_path, sample_data, params):
    source, target = sample_data
    run_comparison_job_from_dfs(
        spark,
        "pjob",
        source,
        target,
        params,
        OutputConfig(output_dir=str(tmp_path), partitioned_unmatched=True),
    )
    dumps = spark.read.parquet(f"{tmp_path}/pjob/unmatched_rows")
    assert dumps.count() == 2
    assert set(dumps.select("column_name").toPandas()["column_name"]) == {
        "value",
        "value2",
    }


def test_per_column_tolerance_overrides(spark, sample_data):
    """Engine extension: column_tolerances beats the global tolerance
    for listed columns only."""
    source, target = sample_data
    res = compare_dataframes(
        spark,
        source,
        target,
        DatasetParams(
            dataset_name="coltol",
            primary_keys=["id"],
            # global 0 would fail value4 (7.1 vs 7.0); per-column 0.2
            # saves it without loosening anything else
            test_params=TestParams(
                difference_tolerance=0.0, column_tolerances={"value4": 0.2}
            ),
        ),
    )
    counts = {
        r[COL_NAME]: r[UNMATCHED_ROWS_COUNT_COL]
        for r in res[COL_LVL_TEST_REPORT_KEY].collect()
    }
    assert counts["value4"] == 0
    assert counts["value"] == 1  # strings unaffected


def test_incremental_partition_pruned_compare(spark, sf_dir):
    """compare_dataframes_where: predicate reaches both parquet scans
    and results equal comparing the pre-filtered frames."""
    import pyspark.sql.functions as F

    from spark_data_test_spark.operators.comparison import compare_dataframes_where
    from spark_data_test_spark.plans.audit import has_pushed_filter

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    target = orders.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 13 == 0, "X").otherwise(
            F.col("o_orderstatus")
        ),
    )
    pred = F.col("o_orderkey") % 10 < 3  # the "changed slice"
    params = DatasetParams(dataset_name="inc", primary_keys=["o_orderkey"])
    res = compare_dataframes_where(
        spark, orders, target, params, pred, compute_unmatched_dumps=False
    )
    overall = res[OVERALL_TEST_REPORT_KEY].first()
    sliced = orders.filter(pred)
    assert overall[COUNT_COL]["source"] == sliced.count()
    expected_mismatch = sliced.filter(F.col("o_orderkey") % 13 == 0).count()
    assert overall[COUNT_COL]["source"] - overall[MATCHED_COUNT_COL] == expected_mismatch
    # a plain column predicate pushes into the scan
    assert has_pushed_filter(orders.filter(F.col("o_orderkey") < 100), "o_orderkey")


def test_numeric_null_one_side_is_false_not_null(spark):
    """Review regression: a numeric column NULL on one side makes the
    tolerance flag NULL; the verdict must coalesce to False (reference
    comparison_job.py:233 does `| coalesce(after_tol, false)`)."""
    src = spark.createDataFrame([(1, 5.0), (2, 1.0)], "id long, x double")
    tgt = spark.createDataFrame([(1, None), (2, 1.0)], "id long, x double")
    res = compare_dataframes(
        spark,
        src,
        tgt,
        DatasetParams(dataset_name="nullnum", primary_keys=["id"]),
        compute_unmatched_dumps=False,
    )
    rows = {r["id"]: r for r in res[ROW_LVL_TEST_REPORT_KEY].collect()}
    assert rows[1][ALL_ROWS_MATCHED_COL] is False  # not None
    assert rows[2][ALL_ROWS_MATCHED_COL] is True
    overall = res[OVERALL_TEST_REPORT_KEY].first()
    assert overall[MATCHED_COUNT_COL] == 1
    assert overall[TEST_STATUS_COL] == FAILED_STATUS


def test_compare_empty_inputs(spark):
    schema = "id long, v string"
    empty = spark.createDataFrame([], schema)
    full = spark.createDataFrame([(1, "a")], schema)
    params = DatasetParams(dataset_name="empty", primary_keys=["id"])

    # both empty: vacuously PASSED, all counters zero
    res = compare_dataframes(spark, empty, empty, params)
    o = res[OVERALL_TEST_REPORT_KEY].first()
    assert o[TEST_STATUS_COL] == "PASSED"
    assert o[MATCHED_COUNT_COL] == 0
    assert o["count"] == {"source": 0, "target": 0}
    assert res[ROW_LVL_TEST_REPORT_KEY].count() == 0

    # one side empty: everything missing at that side, FAILED
    res = compare_dataframes(spark, full, empty, params)
    o = res[OVERALL_TEST_REPORT_KEY].first()
    assert o[TEST_STATUS_COL] == FAILED_STATUS
    assert o["missing_rows"] == {"source": 0, "target": 1}
    assert o["count"] == {"source": 1, "target": 0}
