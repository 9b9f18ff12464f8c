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
# (registration order). Round 2 green-checked the 50 §2/north-star
# representatives (CORRECTNESS_r02.json: 50/50); this round ROTATES the
# window so the 55 queries that have only local-oracle rows earn driver
# rows too (VERDICT r2, next-round item 2). Window = the engine
# flagship + 49 never-driver-checked queries; the 6 never-checked
# queries left outside are each the near-twin of a shape that already
# has a green driver row (window_lead_lag~window_rank_topk,
# left_anti~left_semi, grouping_sets~cube, except~intersect,
# text_bigram_profile~text_regex_tokens, source_xml~source_orc) and
# rotate in next round together with queries new in round 3.
_DRIVER_PRIORITY = [
    # engine flagship (kept in every window)
    "compare_overall_report",
    # window / join / set-op variants
    "json_extract_props",
    "window_rank_topk",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "events_sessionization",
    # sampling / packing family
    "sample_split_stratified",
    "mix_weighted_sources",
    "pack_sequences",
    "sample_topk_per_group",
    # temporal family
    "events_asof_join",
    "events_range_join",
    "events_hypertable_rollup",
    "events_funnel_analysis",
    "events_session_window_native",
    # comparison extensions
    "compare_lineitem_overall",
    "compare_distribution_report",
    # relational variants
    "left_semi_join",
    "cube_agg",
    "intersect_rows",
    "approx_count_distinct_parts",
    "percentile_exact",
    "map_functions_props",
    "window_distribution_funcs",
    # warehouse ops
    "profile_columns",
    "upsert_latest_wins",
    "variant_json_props",
    "schema_drift_report",
    # sources
    "source_orc_roundtrip",
    # TPC-H shapes
    "tpch_q10_returned_items",
    "tpch_q14_promo_share",
    "tpch_q18_large_orders",
    "tpch_q4_priority_check",
    "tpch_q12_priority_bands",
    "tpch_q13_order_distribution",
    "tpch_q19_disjunctive_revenue",
    "tpch_q7_nation_volume",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q22_global_sales_opportunity",
    # north-star: Python/Arrow, dedup clustering, text, multimodal,
    # skew, UDTF, streaming
    "pandas_udf_tokens",
    "dedup_connected_components",
    "text_regex_tokens",
    "multimodal_decode_stub",
    "skew_salted_join_agg",
    "udtf_chunk_documents",
    "streaming_static_join",
    "streaming_dedup",
    "streaming_foreachbatch_sink",
    "streaming_cdc_upsert",
    # --- driver window ends after the 50th entry above ---
    # never-driver-checked twins + queries new in round 3 (the tail
    # below grew through the round: graph/sketch/ml/linkage/DQ/source
    # families), first in line for the round-4 window rotation
    "streaming_sessionization_store",
    "corpus_prepare_pipeline",
    "window_lead_lag",
    "left_anti_join",
    "grouping_sets_agg",
    "except_rows",
    "text_bigram_profile",
    "source_xml_roundtrip",
    "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q16_parts_supplier",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_supplier",
    "similarity_ann_recall_report",
    "dedup_simhash_pairs",
    "corpus_decontaminate",
    "text_vocabulary_topk",
    "text_pii_scrub",
    "text_repetition_profile",
    "events_retention_cohorts",
    "events_gap_fill",
    "orders_market_basket",
    "events_scd2_history",
    "events_attribution_last_touch",
    "orders_rfm_segments",
    "parts_abc_pareto",
    "corpus_shard_assignment",
    "sample_token_budget",
    "text_tfidf_topk",
    "events_anomaly_daily",
    "similarity_cell_report",
    "sink_partition_pruned_read",
    "multimodal_frame_sample",
    "dedup_cluster_size_stats",
    "streaming_sliding_counts",
    "events_rolling_window_avg",
    "graph_degree_distribution",
    "graph_triangle_count",
    "text_quality_model_score",
    "text_bigram_familiarity",
    "dedup_survivorship",
    "graph_pagerank_fixed",
    "source_text_roundtrip",
    "source_binaryfile_roundtrip",
    "sketch_hll_rollup",
    "sketch_approx_quantiles",
    "ml_linear_regression_train",
    "streaming_sketch_rollup",
    "sink_clustered_layout",
    "dedup_lsh_recall_report",
    "dedup_containment",
    "events_cumulative_distinct_users",
    "events_transition_matrix",
    "multimodal_chunk_dedup",
    "dq_constraint_report",
    "part_fuzzy_match",
    "text_quality_deciles",
    "sql_api_query",
    "sink_zorder_layout",
    "text_langid_confusion",
    "orders_open_backlog_daily",
    "orders_incremental_agg_merge",
    "source_schema_evolution",
    "null_safe_join",
    "events_ab_test_readout",
    "supplier_hierarchy_rollup",
    "orders_status_listagg",
    "events_top_session_paths",
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
            "multimodal_binary_features",
            "multimodal_decode_stub",
            "multimodal_frame_sample",
            "multimodal_chunk_dedup",
        },
        "spark_data_test_spark.operators.udtf_ops": {"udtf_chunk_documents"},
        "spark_data_test_spark.streaming.windows": {
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
    the driver's weaker rows-only check).

    Deliberately omitted: ``approx_count_distinct_parts`` — an
    approximate aggregate (HLL++) has no exact SQL oracle; the driver's
    rows-only check plus the pytest relative-error bound
    (tests/test_plans.py) are the correctness signal for it. Same for
    ``sketch_hll_rollup`` / ``sketch_approx_quantiles`` (Datasketches
    HLL and GK summaries — estimates are implementation functions, not
    data functions; accuracy bounds pinned in
    tests/test_graph_model_ext.py).
    """
    _, oracles_map = _registry()
    return dict(oracles_map)
