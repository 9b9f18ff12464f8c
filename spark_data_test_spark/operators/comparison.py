"""Core DataFrame comparison engine.

Re-implements the comparison semantics of the reference
(/root/reference/spark_data_test/jobs/comparison_job.py:186-256) with a
Spark-first, 100 TB-oriented physical design. Same inputs, same four
reports with the same schemas/values; different (cheaper) execution:

Reference execution (per dataset):
  * ~7 actions over the *wide* cached full-outer join (three ``count()``,
    two groupBy-count-count dup jobs, a map-agg, a ``collect``),
  * the after-tolerance verdict merged back via a second join on the
    primary keys (comparison_job.py:229-233),
  * ``.cache()`` of the full wide join — at 100 TB that cache spills.

This engine:
  * computes the after-tolerance verdict *inline* on the joined frame
    (a CASE over the per-column match flags) — no second join, no extra
    shuffle;
  * persists only two *narrow/small* frames: the PER-KEY fold of the
    (keys, checksums, verdict) projection (one row per key regardless
    of table width or duplicate multiplicity) and the
    checksum-mismatched subset (usually tiny);
  * derives BOTH the row-level and the overall report from that single
    per-key aggregation (which rides the join's own hash partitioning —
    no extra exchange): the row report is an explode of the per-key
    distinct (status, verdict) combos, the overall report one global
    aggregate over the fold;
  * leaves join-strategy choice to Catalyst/AQE (sort-merge for
    like-sized sides, runtime skew-split for hot keys).

Semantic deviations from the reference (deliberate; see SURVEY.md §1/§3):
  * numeric-type dispatch matches on ``NumericType`` subclasses instead
    of ``dataType in [... DecimalType()]`` — the reference accidentally
    routes decimal(p,s≠(10,0)) through *string* comparison
    (comparison_job.py:14-17);
  * non-key columns are computed *after* select/drop, so non-default
    ``select_cols``/``drop_cols`` work (the reference reads pre-select
    columns at comparison_job.py:187 and fails analysis);
  * the after-tolerance verdict is per-row; the reference re-joins
    verdicts by primary key, which can duplicate rows when a duplicated
    key has several passing combinations (unobservable on its own test
    fixture, which this engine reproduces exactly).
"""

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Window
from pyspark.sql.types import LongType, MapType, NumericType, StringType, StructField, StructType

from spark_data_test_spark.constants import (
    ALL_ROWS_MATCHED_AFTR_TOL_COL,
    ALL_ROWS_MATCHED_COL,
    CHK_SUM_COL,
    COL_LVL_TEST_REPORT_KEY,
    COL_NAME,
    COUNT_COL,
    DATASET_NAME_COL,
    DUPLICATE_COUNT_COL,
    FAILED_STATUS,
    FULL_OUTER_JOIN,
    MATCHED_COL_SUFFIX,
    MATCHED_COUNT_COL,
    MISSING_AT_SOURCE_STATUS,
    MISSING_AT_TARGET_STATUS,
    MISSING_ROW_STATUS_COL,
    MISSING_ROWS_COL,
    OVERALL_TEST_REPORT_KEY,
    PASSED_STATUS,
    PERSISTED_FRAMES_KEY,
    PRESENT_IN_BOTH_STATUS,
    ROW_LVL_TEST_REPORT_KEY,
    SOURCE_COL,
    SRC_COL_SUFFIX,
    TARGET_COL,
    TEST_STATUS_COL,
    UNMATCHED_RECORDS_KEY,
    UNMATCHED_ROWS_COUNT_COL,
)
from spark_data_test_spark.entities.config import DatasetParams
from spark_data_test_spark.functions.checksum import row_checksum
from spark_data_test_spark.utils.config_reader import dict_to_dataclass
from spark_data_test_spark.utils.spark_utils import local_df, set_value_ifnull

TGT_COL_SUFFIX = "{0}_target"

# pre-join per-side key multiplicities, carried on the narrow projection
_SRC_KEY_CNT = "_src_key_cnt"
_TGT_KEY_CNT = "_tgt_key_cnt"


def _coerce_params(params):
    if isinstance(params, dict):
        return dict_to_dataclass(DatasetParams, params)
    return params


def _matched_expr(struct_field, test_params, src_name, tgt_name):
    """Per-column match rule (SURVEY.md §1 type handling).

    Numeric (any NumericType subclass): |src - tgt| <= tolerance, with
    per-column overrides via ``TestParams.column_tolerances`` (engine
    extension; the reference has only the global tolerance).
    Everything else: NULL-safe equality (NULL == NULL matches).
    Mirrors reference comparison_job.py:19-34 modulo the DecimalType fix.
    """
    src, tgt = F.col(src_name), F.col(tgt_name)
    if isinstance(struct_field.dataType, NumericType):
        tol = getattr(test_params, "column_tolerances", {}).get(
            struct_field.name, test_params.difference_tolerance
        )
        return F.abs(src - tgt) <= F.lit(tol)
    return src.eqNullSafe(tgt)


def _normalize_side(df, suffix, non_key_cols, params):
    """Select/drop, add row checksum, suffix every non-key column.

    Mirrors reference __apply_source_target_transformations
    (comparison_job.py:36-47), with the checksum computed over the
    *post* select/drop column set in stable df.columns order.
    """
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    return df.withColumn(
        suffix.format(CHK_SUM_COL),
        row_checksum(non_key_cols, params.test_params.checksum_mode, dtypes),
    ).withColumnsRenamed({c: suffix.format(c) for c in non_key_cols})


def compare_dataframes(spark, source_df, target_df, params, compute_unmatched_dumps=True):
    """Compare two DataFrames keyed by primary keys → four reports.

    Returns ``{overall_test_report, row_lvl_test_report,
    col_lvl_test_report, unmatched_records}`` with the same schemas and
    values as the reference entry point (comparison_job.py:186-256).

    ``compute_unmatched_dumps=False`` skips the one data-dependent
    driver boundary (the collect over the column report that decides
    which per-column dump frames to build) — callers that only consume
    the three report frames save that job entirely.
    """
    params = _coerce_params(params)
    keys = list(params.primary_keys)

    src = source_df.select(*params.select_cols).drop(*params.drop_cols)
    tgt = target_df.select(*params.select_cols).drop(*params.drop_cols)
    non_key_cols = [c for c in src.columns if c not in set(keys)]
    tgt_fields = [f for f in tgt.schema.fields if f.name not in set(keys)]

    src_n = _normalize_side(src, SRC_COL_SUFFIX, non_key_cols, params)
    tgt_n = _normalize_side(tgt, TGT_COL_SUFFIX, non_key_cols, params)

    # Per-side key multiplicity, attached BEFORE the join: the window
    # needs hash-partition + sort on the keys, which is exactly what the
    # sort-merge join below needs, so EnsureRequirements reuses one
    # exchange+sort per side — the counts are free. They ride the narrow
    # projection so the overall report never re-scans the inputs.
    key_w = Window.partitionBy(*keys)
    src_n = src_n.withColumn(_SRC_KEY_CNT, F.count(F.lit(1)).over(key_w))
    tgt_n = tgt_n.withColumn(_TGT_KEY_CNT, F.count(F.lit(1)).over(key_w))

    chk_src = F.col(SRC_COL_SUFFIX.format(CHK_SUM_COL))
    chk_tgt = F.col(TGT_COL_SUFFIX.format(CHK_SUM_COL))

    # J1: align rows. Catalyst picks sort-merge (AQE may skew-split);
    # duplicate PKs intentionally multiply per the reference contract
    # (tests/test_comparison_job.py:104 asserts the 2x2 -> dup_count 3).
    joined = src_n.join(tgt_n, keys, FULL_OUTER_JOIN)

    # Fast path: one string (or 64-bit) equality per row decides "row
    # identical" instead of N column comparisons.
    fast_match = chk_src.eqNullSafe(chk_tgt)
    both_present = chk_src.isNotNull() & chk_tgt.isNotNull()

    flag_exprs = {
        MATCHED_COL_SUFFIX.format(f.name): _matched_expr(
            f,
            params.test_params,
            SRC_COL_SUFFIX.format(f.name),
            TGT_COL_SUFFIX.format(f.name),
        )
        for f in tgt_fields
    }
    after_tol = (
        reduce(lambda a, b: a & b, flag_exprs.values())
        if flag_exprs
        else F.lit(True)
    )

    # Inline two-phase verdict: checksum equality OR (present on both
    # sides AND every column matched under tolerance). Replaces the
    # reference's filter -> per-column flags -> left-join-back dance
    # (comparison_job.py:217-233) with a single projection. The coalesce
    # mirrors the reference's `| coalesce(after_tol, false)`: a numeric
    # column NULL on exactly one side makes its tolerance flag NULL, and
    # the verdict must land on False, not NULL.
    joined = joined.withColumn(
        ALL_ROWS_MATCHED_COL,
        F.coalesce(fast_match | (both_present & after_tol), F.lit(False)),
    )

    # Narrow projection: ~(keys + 2 checksums + 2 key counts + 1 bool)
    # per row — this, not the wide join, is what feeds the reports at
    # scale. It is consumed exactly once (by the per-key fold below), so
    # it is NOT persisted; the *per-key* fold result is.
    narrow = joined.select(
        *keys,
        chk_src,
        chk_tgt,
        F.col(_SRC_KEY_CNT),
        F.col(_TGT_KEY_CNT),
        F.col(ALL_ROWS_MATCHED_COL),
    )

    # ONE aggregation over the narrow projection feeds BOTH the row-level
    # and the overall report (previously: a window+distinct pass for the
    # row report plus a separate groupBy reduce for the overall — two
    # shuffles of the full narrow frame). The join output is already
    # hash-partitioned on the keys, so this groupBy adds no exchange;
    # what persists is one row per key (cnt, per-side multiplicities,
    # match/missing maxima, and the distinct (status, verdict) combos
    # that the row report used to obtain via distinct()).
    missing_status = (
        F.when(chk_src.isNull(), MISSING_AT_SOURCE_STATUS)
        .when(chk_tgt.isNull(), MISSING_AT_TARGET_STATUS)
        .otherwise(F.lit(PRESENT_IN_BOTH_STATUS).cast(StringType()))
    )
    per_key = (
        narrow.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.max(_SRC_KEY_CNT).alias("_s"),
            F.max(_TGT_KEY_CNT).alias("_t"),
            F.max(F.col(ALL_ROWS_MATCHED_COL).cast("int")).alias("_m"),
            F.max(chk_src.isNull().cast("int")).alias("_ms"),
            F.max(chk_tgt.isNull().cast("int")).alias("_mt"),
            # bounded: at most 2 distinct verdicts x 3 statuses per key
            # (statuses only mix in the merged NULL-key group)
            F.collect_set(
                F.struct(
                    missing_status.alias(MISSING_ROW_STATUS_COL),
                    F.col(ALL_ROWS_MATCHED_COL),
                )
            ).alias("_combos"),
        )
        .persist()
    )

    # Slow-path subset: present on both sides, checksum mismatch, still
    # unmatched after tolerance. Small in the common mostly-matching
    # case; persisted because the column report, the per-column dumps,
    # and their collect() all consume it.
    unmatched_records = (
        joined.filter(both_present & ~fast_match)
        .drop(_SRC_KEY_CNT, _TGT_KEY_CNT)
        .withColumns(flag_exprs)
        .withColumn(
            ALL_ROWS_MATCHED_AFTR_TOL_COL,
            reduce(lambda a, b: a & b, flag_exprs.values())
            if flag_exprs
            else F.lit(True),
        )
        .filter(~F.col(ALL_ROWS_MATCHED_AFTR_TOL_COL))
        .drop(ALL_ROWS_MATCHED_COL)
        .persist()
    )

    row_lvl_report = _row_level_report(params.dataset_name, per_key, keys).persist()
    col_lvl_report = _column_level_report(
        params.dataset_name, unmatched_records, non_key_cols
    ).persist()
    unmatched_map = (
        _unmatched_records_map(
            params.dataset_name, unmatched_records, col_lvl_report, keys
        )
        if compute_unmatched_dumps
        else {}
    )
    overall_report = _overall_report(spark, params.dataset_name, per_key)
    return {
        OVERALL_TEST_REPORT_KEY: overall_report,
        ROW_LVL_TEST_REPORT_KEY: row_lvl_report,
        COL_LVL_TEST_REPORT_KEY: col_lvl_report,
        UNMATCHED_RECORDS_KEY: unmatched_map,
        # private: every frame this run persisted, so long-lived sessions
        # can release the cached blocks (release_comparison_result)
        PERSISTED_FRAMES_KEY: [
            per_key,
            unmatched_records,
            row_lvl_report,
            col_lvl_report,
        ],
    }


def distribution_report(source_df, target_df, columns, quantiles=(0.5, 0.9)):
    """Per-column distribution drift (engine extension): exact
    interpolated quantiles of each side for every requested numeric
    column, long-form.

    Catches what row matching can't: a target rebuilt from a biased
    sample can pass row-level checks on the surviving keys while its
    value DISTRIBUTION shifted. Cost: ONE aggregation job per side
    (every column x quantile in a single agg — percentile aggregates
    share the pass), a 1x1 join of the two result rows, and an explode
    to long form; nothing scales with row count beyond the two scans.
    """
    q_pcts = [int(round(q * 100)) for q in quantiles]

    # aliases are keyed by (column index, quantile index), never by the
    # column name or derived percent: arbitrary caller column names
    # (dots, spaces) and quantiles colliding on the same integer percent
    # must not produce unparsable or ambiguous internal aliases
    def quoted(c):
        # backtick-quote so dots/spaces in caller names parse literally
        return F.col("`" + c.replace("`", "``") + "`")

    def side_row(df, tag):
        return df.agg(
            *[
                F.percentile(quoted(c), F.lit(q)).alias(f"_{tag}_{ci}_{qi}")
                for ci, c in enumerate(columns)
                for qi, q in enumerate(quantiles)
            ]
        ).coalesce(1)

    # 1x1 cross join: both sides' quantiles in one row
    both = side_row(source_df, "s").crossJoin(side_row(target_df, "t"))
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.lit(pct).alias("quantile_pct"),
                F.col(f"_s_{ci}_{qi}").alias("source_value"),
                F.col(f"_t_{ci}_{qi}").alias("target_value"),
            )
            for ci, c in enumerate(columns)
            for qi, pct in enumerate(q_pcts)
        ]
    )
    return both.select(F.explode(entries).alias("e")).select(
        "e.column_name", "e.quantile_pct", "e.source_value", "e.target_value"
    )


def release_comparison_result(result):
    """Unpersist every cached frame a ``compare_dataframes`` run left
    behind. Call when a long-lived session is done consuming the
    reports — the engine persists its narrow/unmatched projections for
    the multi-report fan-out, and Spark only drops those blocks on
    session shutdown otherwise."""
    for df in result.get(PERSISTED_FRAMES_KEY, []):
        try:
            df.unpersist()
        except Exception:
            pass


def _row_level_report(dataset_name, per_key, keys):
    """Row-level report (reference __get_row_level_test_report,
    comparison_job.py:134-161) derived from the persisted per-key fold:
    duplicate count = per-key row count - 1 (the W1 unbounded-frame
    window of the reference, already reduced), and the reference's
    ``distinct()`` over (keys, dup, status, verdict) is exactly the
    explode of the per-key distinct (status, verdict) combo set — dup
    count is constant within a key, so distinct-per-frame equals
    distinct-per-group. Zero additional shuffles."""
    return (
        per_key.select(
            F.lit(dataset_name).alias(DATASET_NAME_COL),
            *keys,
            (F.col("_cnt") - 1).alias(DUPLICATE_COUNT_COL),
            F.explode("_combos").alias("_combo"),
        )
        .select(
            DATASET_NAME_COL,
            *keys,
            DUPLICATE_COUNT_COL,
            F.col(f"_combo.{MISSING_ROW_STATUS_COL}").alias(
                MISSING_ROW_STATUS_COL
            ),
            F.col(f"_combo.{ALL_ROWS_MATCHED_COL}").alias(ALL_ROWS_MATCHED_COL),
        )
    )


def _column_level_report(dataset_name, unmatched_records, non_key_cols):
    """Column-level report (reference __get_column_level_test_report,
    comparison_job.py:101-118): ALL per-column mismatch counts in ONE
    aggregate (single pass over the slow-path subset), then unpivot to
    long form."""
    count_exprs = [
        F.sum(
            F.when(~F.col(MATCHED_COL_SUFFIX.format(c)), 1).otherwise(0)
        ).alias(c)
        for c in non_key_cols
    ]
    return (
        unmatched_records.agg(*count_exprs)
        .unpivot(
            [],
            non_key_cols,
            variableColumnName=COL_NAME,
            valueColumnName=UNMATCHED_ROWS_COUNT_COL,
        )
        .withColumn(
            UNMATCHED_ROWS_COUNT_COL,
            set_value_ifnull(UNMATCHED_ROWS_COUNT_COL, F.lit(0).cast("int")),
        )
        .withColumn(DATASET_NAME_COL, F.lit(dataset_name))
        .select(DATASET_NAME_COL, COL_NAME, UNMATCHED_ROWS_COUNT_COL)
    )


def _unmatched_records_map(dataset_name, unmatched_records, col_lvl_report, keys):
    """Per-column unmatched-value dumps (reference
    __get_unmatched_records, comparison_job.py:120-132). The collect()
    over the tiny persisted column report is the one data-dependent
    driver boundary; each dump stays a lazy DataFrame."""
    offending = [
        r[COL_NAME]
        for r in col_lvl_report.where(F.col(UNMATCHED_ROWS_COUNT_COL) > 0)
        .select(COL_NAME)
        .collect()
    ]
    dumps = {}
    for c in offending:
        dumps[f"{dataset_name}/{c}"] = (
            unmatched_records.where(~F.col(MATCHED_COL_SUFFIX.format(c)))
            .select(
                *keys, SRC_COL_SUFFIX.format(c), TGT_COL_SUFFIX.format(c)
            )
            .distinct()
        )
    return dumps


def _overall_report(spark, dataset_name, per_key):
    """Overall report (reference __get_overall_test_report,
    comparison_job.py:66-99) in ONE job instead of the reference's ~7.

    Every number is derivable from the persisted per-key fold: a key
    with s source rows and t target rows contributed s*t narrow rows
    all tagged (s, t), so the fold's (max(s), max(t), any-matched)
    plus one global aggregate yields row totals, duplicate-key counts,
    matched-key count, and both missing-key counts — with NO second
    scan of the inputs (the round-1 design re-scanned both sides' key
    projections in a parallel job; at 100 TB that second pass over
    storage dwarfs one extra shuffle of the narrow cache).

    Missing-ness comes from checksum NULLity (the fold's _ms/_mt), not
    from s/t NULLity: NULL primary keys never join (plain equality),
    yet groupBy(*keys) merges both sides' NULL-key rows into ONE group
    where s and t are both present — a checksum-NULL row in the group
    still means that side is missing the key, matching the row report's
    accounting.
    """
    stats = per_key.agg(
        F.sum("_s").alias("src_total"),
        F.sum("_t").alias("tgt_total"),
        F.sum(F.when(F.col("_s") > 1, 1).otherwise(0)).alias("src_dups"),
        F.sum(F.when(F.col("_t") > 1, 1).otherwise(0)).alias("tgt_dups"),
        F.sum("_m").alias("matched"),
        F.sum("_ms").alias("miss_src"),
        F.sum("_mt").alias("miss_tgt"),
    ).first()
    src_total = stats["src_total"] or 0
    tgt_total = stats["tgt_total"] or 0
    src_dups = stats["src_dups"] or 0
    tgt_dups = stats["tgt_dups"] or 0
    matched_count = stats["matched"] or 0
    miss_src = stats["miss_src"] or 0
    miss_tgt = stats["miss_tgt"] or 0

    status = (
        PASSED_STATUS
        if src_total == matched_count and tgt_total == matched_count
        else FAILED_STATUS
    )
    schema = StructType(
        [
            StructField(DATASET_NAME_COL, StringType(), False),
            StructField(COUNT_COL, MapType(StringType(), LongType()), False),
            StructField(MATCHED_COUNT_COL, LongType(), False),
            StructField(DUPLICATE_COUNT_COL, MapType(StringType(), LongType()), False),
            StructField(MISSING_ROWS_COL, MapType(StringType(), LongType()), False),
            StructField(TEST_STATUS_COL, StringType(), False),
        ]
    )
    return local_df(
        spark,
        [
            (
                dataset_name,
                {SOURCE_COL: src_total, TARGET_COL: tgt_total},
                matched_count,
                {SOURCE_COL: src_dups, TARGET_COL: tgt_dups},
                {SOURCE_COL: miss_src, TARGET_COL: miss_tgt},
                status,
            )
        ],
        schema,
    )


def compare_dataframes_where(
    spark, source_df, target_df, params, predicate, compute_unmatched_dumps=True
):
    """Incremental comparison: restrict both sides with the same
    predicate (e.g. a partition filter) before comparing.

    At 100 TB the common case is "yesterday's partition changed" — the
    predicate pushes into both scans (partition pruning + parquet
    row-group skipping), so cost tracks the changed slice, not the
    table. Reports carry the same schemas; consolidate slices across
    runs with ``jobs.run_comparison_job``-style unions.
    """
    return compare_dataframes(
        spark,
        source_df.filter(predicate),
        target_df.filter(predicate),
        params,
        compute_unmatched_dumps=compute_unmatched_dumps,
    )
