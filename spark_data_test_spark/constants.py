"""Vocabulary of the comparison engine.

Behavioral parity with the reference's constants
(/root/reference/spark_data_test/constants/common_constants.py:1-66).
Values are kept byte-identical — including the reference's
``MISSTING_AT_TARGET`` typo (common_constants.py:46) — so that report
outputs produced by this engine are drop-in comparable with outputs of
the reference library.
"""

PARQUET_FMT = "parquet"
EMPTY_STR = ""
OVERWRITE_MODE = "overwrite"
TABLE_FMT = "table"

# join types
INNER_JOIN = "inner"
LEFT_JOIN = "left"
OUTER_JOIN = "outer"
FULL_OUTER_JOIN = "full_outer"

# column-suffix templates
SRC_COL_SUFFIX = "{0}_src"
TGT_COL_SUFFIX = "{0}_target"
MATCHED_COL_SUFFIX = "{0}_matched"
MATCHED_SUFFIX = "_matched"

# common col names
CHK_SUM_COL = "_chk_sum"
COUNT_COL = "count"

# overall test report
DATASET_NAME_COL = "dataset_name"
MATCHED_COUNT_COL = "matched_count"
MISSING_ROWS_COL = "missing_rows"
DUPLICATE_COUNT_COL = "duplicate_count"
SOURCE_COL = "source"
TARGET_COL = "target"
TEST_STATUS_COL = "test_status"
PASSED_STATUS = "PASSED"
FAILED_STATUS = "FAILED"

# column level report
COL_NAME = "column_name"
UNMATCHED_ROWS_COUNT_COL = "unmatched_rows_count"

# row level report
ALL_ROWS_MATCHED_COL = "all_rows_matched"
ALL_ROWS_MATCHED_AFTR_TOL_COL = "all_rows_matched_after_tolerance"
MISSING_ROW_STATUS_COL = "missing_row_status"
MISSING_AT_SOURCE_STATUS = "MISSING_AT_SOURCE"
# NOTE: typo preserved on purpose for output byte-parity with the reference
# (common_constants.py:46).
MISSING_AT_TARGET_STATUS = "MISSTING_AT_TARGET"
PRESENT_IN_BOTH_STATUS = "PRESENT_IN_BOTH"

# output report directory layout (README.md:263-309 of the reference)
OVERALL_TEST_REPORT_DIR = "overall_test_report"
COL_LVL_TEST_REPORT_DIR = "col_lvl_test_report"
ROW_LVL_TEST_REPORT_DIR = "row_lvl_test_report"
UNMATCHED_ROWS_DIR = "unmatched_rows/{col_name}"

# result dict keys
OVERALL_TEST_REPORT_KEY = "overall_test_report"
COL_LVL_TEST_REPORT_KEY = "col_lvl_test_report"
ROW_LVL_TEST_REPORT_KEY = "row_lvl_test_report"
UNMATCHED_RECORDS_KEY = "unmatched_records"
# engine extension (not in the reference): private result key listing
# the frames a comparison run persisted, for explicit release
PERSISTED_FRAMES_KEY = "_persisted_frames"

# checksum modes (engine extension; "sha256" reproduces the reference
# checksum exactly, "xxhash64" is the collision-hardened 100TB fast path)
CHECKSUM_MODE_SHA256 = "sha256"
CHECKSUM_MODE_XXHASH64 = "xxhash64"
