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
# (registration order). CANONICAL round-18 window accounting (this
# comment is the single source of truth; README.md mirrors it): 1
# flagship (compare_overall_report, re-earned every round) + 3
# re-earns whose code changed this round (similarity_ivf_index_probe
# / similarity_pq_index_probe / similarity_ivfpq_index_probe — their
# lifecycle ingest step now goes through the round-18 ingest-only
# entry points `*_index_ingest`, committing the identical delta
# without the probe work, VERDICT r17 item 2) + the 46 stalest
# backlog rows (the complete r13-era cohort of 30, head
# tpch_q7_nation_volume through tpch_q16_parts_supplier, then the
# r14-green head through orders_status_listagg). That is exactly 50;
# after this round no registry row's latest driver green is older
# than round 14. tests/test_registry_invariants.py enforces that
# greens / window / queue always covers the registry.
_DRIVER_WINDOW = [
    "compare_overall_report",
    "similarity_ivf_index_probe",
    "similarity_pq_index_probe",
    "similarity_ivfpq_index_probe",
    "tpch_q7_nation_volume",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q22_global_sales_opportunity",
    "pandas_udf_tokens",
    "text_regex_tokens",
    "streaming_foreachbatch_sink",
    "multimodal_decode_stub",
    "skew_salted_join_agg",
    "udtf_chunk_documents",
    "streaming_static_join",
    "streaming_dedup",
    "multimodal_phash_neardup",
    "multimodal_crossmodal_agreement",
    "dedup_embedding_cosine",
    "dedup_semantic_prune_curve",
    "similarity_ivf_ann",
    "approx_count_distinct_parts",
    "sketch_hll_rollup",
    "sketch_approx_quantiles",
    "source_text_roundtrip",
    "sink_partition_pruned_read",
    "events_ab_test_readout",
    "streaming_sliding_counts",
    "corpus_prepare_pipeline",
    "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q16_parts_supplier",
    "events_tumbling_window",
    "graph_degree_distribution",
    "ml_linear_regression_train",
    "lineitem_correlation_matrix",
    "multimodal_frame_sample",
    "multimodal_chunk_dedup",
    "similarity_ann_recall_report",
    "similarity_cell_report",
    "similarity_pq_train",
    "corpus_duplicate_ngrams",
    "dq_constraint_report",
    "part_fuzzy_match",
    "sql_api_query",
    "orders_incremental_agg_merge",
    "null_safe_join",
    "orders_status_listagg",
]

# New queries added mid-round go here first (the invariant test keeps
# them from silently falling out of rotation); the end-of-round window
# cut promotes them. Empty right now: round 9's one new registration
# (events_tumbling_window) was placed directly into the window at the
# round-opening cut above.
_NEXT_ROTATION = []

# Green-checked queries outside the window, STALEST FIRST (latest
# driver round ascending, registration order as tie-break) so the next
# window cut can just take the head of this list. The head is the
# r14-green remainder (after the 16 promoted into the round-18
# window), followed by the r15/r16-green rows in staleness order, and
# the list ends with the 46 r17-green rows the round-18 cut displaced
# (registration order).
_CHECKED_BACKLOG = [
    "part_bloom_prefilter_join",
    "orders_rfm_segments",
    "parts_abc_pareto",
    "orders_open_backlog_daily",
    "supplier_hierarchy_rollup",
    "corpus_shard_assignment",
    "sample_token_budget",
    "text_heavy_hitters",
    "source_xml_roundtrip",
    "source_binaryfile_roundtrip",
    "sink_clustered_layout",
    "sink_zorder_layout",
    "source_schema_evolution",
    "events_retention_cohorts",
    "events_scd2_history",
    "events_attribution_last_touch",
    "events_gap_fill",
    "events_anomaly_daily",
    "events_rolling_window_avg",
    "events_cumulative_distinct_users",
    "events_transition_matrix",
    "text_bigram_profile",
    "corpus_decontaminate",
    "text_vocabulary_topk",
    "text_pii_scrub",
    "text_repetition_profile",
    "text_tfidf_topk",
    "text_quality_model_score",
    "text_bigram_familiarity",
    "text_quality_deciles",
    "text_langid_confusion",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_supplier",
    "similarity_pq_ann",
    "similarity_ivfpq_ann",
    "similarity_pq_recall_report",
    "events_sliding_distinct_users",
    "similarity_cluster_purity",
    "streaming_heavy_hitters",
    "similarity_ivf_train",
    "dedup_incremental_simhash",
    "compare_incremental_slice",
    "text_ngram_novelty",
    "corpus_source_similarity",
    "dedup_bucketed_index_probe",
    "similarity_incremental_ingest",
    "ml_logistic_quality_train",
    "ml_logistic_calibration",
    "dedup_index_build",
    "dedup_incremental_minhash",
    "dedup_incremental_exact",
    "dedup_simhash_pairs",
    "dedup_simhash",
    "sink_inverted_index_roundtrip",
    "events_value_histogram",
    "streaming_incremental_minhash",
    "streaming_incremental_dedup",
    "streaming_late_data_audit",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_near_jaccard",
    "dedup_connected_components",
    "dedup_cluster_size_stats",
    "dedup_survivorship",
    "window_lead_lag",
    "left_anti_join",
    "grouping_sets_agg",
    "except_rows",
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
    "similarity_refined_ann",
    "create_map_getitem",
    "window_dup_count",
    "window_running_sum",
    "text_knn_graph",
    "multimodal_real_image_decode",
    "similarity_centroid_outliers",
    "events_sliding_window",
    "tpch_q1_pricing_summary",
    "colwise_mismatch_unpivot",
    "orderby_limit_topk",
    "union_consolidate",
    "drop_duplicates_by_key",
    "distinct_rows",
    "rollup_agg",
    "array_higher_order_stats",
    "pivot_status_by_priority",
    "compare_row_report",
    "compare_column_report",
    "compare_nulls_overall",
    "compare_unkeyed_multiset",
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "source_bucketed_table_roundtrip",
    "sink_partitioned_parquet",
    "dedup_containment",
    "dedup_lsh_recall_report",
    "tpch_q6_forecast_revenue",
    "grouped_apply_stats",
    "similarity_cosine_topk",
    "text_language_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "multimodal_binary_features",
    "streaming_tumbling_counts",
    "streaming_sessionization",
    "streaming_stream_stream_join",
    "json_extract_props",
    "window_rank_topk",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "events_sessionization",
    "sample_split_stratified",
    "mix_weighted_sources",
    "pack_sequences",
    "sample_topk_per_group",
    "events_asof_join",
    "events_range_join",
    "events_hypertable_rollup",
    "events_funnel_analysis",
    "events_session_window_native",
    "state_compaction_roundtrip",
    "multimodal_audio_features",
    "multimodal_audio_fingerprint",
    "multimodal_video_scene_cuts",
    "mix_temperature_rebalance",
    "corpus_dedup_waterfall",
    "streaming_media_arrivals",
    "multimodal_audio_silence_segments",
    "events_seasonal_naive_backtest",
    "events_cohort_ltv",
    "orders_duplicate_payment_scan",
    "multimodal_image_resize",
    "streaming_sessionization_store",
    "streaming_cdc_upsert",
    "streaming_sketch_rollup",
    "state_time_travel_diff",
    "graph_pagerank_fixed",
    "graph_triangle_count",
    "compare_lineitem_overall",
    "compare_distribution_report",
    "left_semi_join",
    "cube_agg",
    "orders_market_basket",
    "events_top_session_paths",
    "intersect_rows",
    "percentile_exact",
    "map_functions_props",
    "window_distribution_funcs",
    "profile_columns",
    "upsert_latest_wins",
    "variant_json_props",
    "schema_drift_report",
    "source_orc_roundtrip",
    "tpch_q10_returned_items",
    "tpch_q14_promo_share",
    "tpch_q18_large_orders",
    "tpch_q4_priority_check",
    "tpch_q12_priority_bands",
    "tpch_q13_order_distribution",
    "tpch_q19_disjunctive_revenue",
]


_DRIVER_PRIORITY = _DRIVER_WINDOW + _NEXT_ROTATION + _CHECKED_BACKLOG


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
        "spark_data_test_spark.operators.tpch_extra",
        "spark_data_test_spark.operators.grouped",
        "spark_data_test_spark.operators.dedup",
        "spark_data_test_spark.operators.graph",
        "spark_data_test_spark.operators.sketches",
        "spark_data_test_spark.operators.ml",
        "spark_data_test_spark.operators.similarity",
        "spark_data_test_spark.operators.text",
        "spark_data_test_spark.operators.multimodal",
        "spark_data_test_spark.operators.temporal",
        "spark_data_test_spark.operators.sampling",
        "spark_data_test_spark.operators.pipeline",
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
        "spark_data_test_spark.operators.grouped": {
            "grouped_apply_stats",
            "pandas_udf_tokens",
        },
        "spark_data_test_spark.operators.multimodal": {
            "multimodal_crossmodal_agreement",
            "multimodal_binary_features",
            "multimodal_decode_stub",
            "multimodal_frame_sample",
            "multimodal_chunk_dedup",
            "multimodal_real_image_decode",
        },
        "spark_data_test_spark.operators.udtf_ops": {"udtf_chunk_documents"},
        "spark_data_test_spark.streaming.windows": {
            "state_compaction_roundtrip",
            "streaming_incremental_minhash",
            "streaming_tumbling_counts",
            "streaming_sessionization",
            "streaming_sessionization_store",
            "streaming_stream_stream_join",
            "streaming_static_join",
            "streaming_dedup",
            "streaming_foreachbatch_sink",
            "streaming_cdc_upsert",
            "streaming_sliding_counts",
            "streaming_sketch_rollup",
            "streaming_late_data_audit",
            "streaming_heavy_hitters",
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
    """DuckDB-runnable ANSI SQL oracle per query.

    EVERY registered query has an oracle (enforced by
    tests/test_registry_invariants.py). Approximate operators
    (HLL distinct counts, GK quantiles) emit a checkable shape — the
    exact answer plus a boolean asserting the estimate met its accuracy
    contract — so their oracles check the exact columns and expect the
    flags TRUE; the raw estimates stay pytest-pinned
    (tests/test_graph_model_ext.py).
    """
    _, oracles_map = _registry()
    return dict(oracles_map)
