"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the comparison engine's
flattened overall report over a perturbed orders pair at sf0.001).
``queries()`` exposes every implemented operator from SURVEY.md §2 plus
the north-star extensions; ``oracle_sql()`` the matching DuckDB SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# The driver's correctness gate checks the FIRST 50 registered queries
# (registration order), so the registry is explicitly ordered: one
# driver-checked representative for every SURVEY.md §2 row and every
# north-star family first, redundant/overlapping variants (pytest- and
# bench-covered) after the window.
_DRIVER_PRIORITY = [
    # §2 core relational surface
    "scan_filter_project",
    "select_drop_rename",
    "case_when_bucket",
    "null_default_coalesce",
    "checksum_sha2",
    "numeric_tolerance_abs",
    "eq_null_safe",
    "full_outer_join_missing",
    "conditional_sum_missing",
    "left_join_enrich",
    "groupby_dup_count",
    "create_map_getitem",
    "window_dup_count",
    "window_running_sum",
    "distinct_rows",
    "drop_duplicates_by_key",
    "union_consolidate",
    "orderby_limit_topk",
    "colwise_mismatch_unpivot",
    # analytics / events / grouped-agg shapes
    "tpch_q1_pricing_summary",
    "tpch_q6_forecast_revenue",
    "events_sliding_window",
    "rollup_agg",
    "pivot_status_by_priority",
    "array_higher_order_stats",
    # comparison engine (reference entry points) + extensions
    "compare_overall_report",
    "compare_row_report",
    "compare_column_report",
    "compare_nulls_overall",
    "compare_unkeyed_multiset",
    # sources / sinks
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "source_bucketed_table_roundtrip",
    "sink_partitioned_parquet",
    # north-star: Arrow-batched Python, dedup, similarity, text,
    # multimodal, streaming
    "grouped_apply_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_near_jaccard",
    "dedup_embedding_cosine",
    "similarity_cosine_topk",
    "similarity_ivf_ann",
    "text_language_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "multimodal_binary_features",
    "streaming_tumbling_counts",
    "streaming_sessionization",
    "streaming_stream_stream_join",
]


def _registry():
    import spark_data_test_spark.operators.relational as relational
    import spark_data_test_spark.operators.comparison_queries  # noqa: F401 (registers)

    # Only genuinely optional third-party deps may be absent; an
    # ImportError from our own modules (typo, circular import) must
    # surface, not silently shrink the query registry.
    optional_deps = {"pandas", "pyarrow", "numpy", "PIL"}
    skipped_modules = []
    for mod_name in (
        "spark_data_test_spark.operators.relational_ext",
        "spark_data_test_spark.operators.schema_drift",
        "spark_data_test_spark.sources.readers",
        "spark_data_test_spark.operators.analytics",
        "spark_data_test_spark.operators.grouped",
        "spark_data_test_spark.operators.dedup",
        "spark_data_test_spark.operators.similarity",
        "spark_data_test_spark.operators.text",
        "spark_data_test_spark.operators.multimodal",
        "spark_data_test_spark.operators.temporal",
        "spark_data_test_spark.operators.sampling",
        "spark_data_test_spark.operators.skew",
        "spark_data_test_spark.operators.udtf_ops",
        "spark_data_test_spark.streaming.windows",
    ):
        try:
            __import__(mod_name)
        except ImportError as exc:
            root = (exc.name or "").split(".")[0]
            if root not in optional_deps:
                raise
            skipped_modules.append(mod_name)

    # A priority name may be forgiven ONLY if the module that registers
    # it was skipped for a missing optional dep; any other absence is a
    # registration bug (typo, dropped @query) and must fail loudly even
    # in degraded environments — otherwise the first-50 driver window
    # silently shifts to different queries.
    optional_module_queries = {
        "spark_data_test_spark.operators.grouped": {"grouped_apply_stats"},
        "spark_data_test_spark.operators.multimodal": {"multimodal_binary_features"},
        "spark_data_test_spark.streaming.windows": {
            "streaming_tumbling_counts",
            "streaming_sessionization",
            "streaming_stream_stream_join",
        },
    }
    forgivable = set()
    for mod_name in skipped_modules:
        forgivable |= optional_module_queries.get(mod_name, set())
    missing = [
        n
        for n in _DRIVER_PRIORITY
        if n not in relational.QUERIES and n not in forgivable
    ]
    if missing:
        raise RuntimeError(f"driver-priority queries not registered: {missing}")
    ordered = {
        n: relational.QUERIES[n] for n in _DRIVER_PRIORITY if n in relational.QUERIES
    }
    for name, fn in relational.QUERIES.items():
        ordered.setdefault(name, fn)
    return ordered, relational.ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    queries_map, _ = _registry()
    return queries_map["compare_overall_report"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    queries_map, _ = _registry()
    return dict(queries_map)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get
    the driver's weaker rows-only check)."""
    _, oracles_map = _registry()
    return dict(oracles_map)
