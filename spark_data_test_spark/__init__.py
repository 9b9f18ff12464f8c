"""spark_data_test_spark — a PySpark-native data comparison & analytics engine.

A clean-room, Spark-first implementation of the capabilities of the
``spark_data_test`` reference library (DataFrame comparison keyed by
primary keys → overall / row-level / column-level / unmatched-value
reports), extended with the operator surface a large-scale training-data
pipeline needs: deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard), embedding similarity search, text analysis, multimodal binary
columns, and Structured Streaming windowed aggregation — all designed
for 100 TB-class inputs (narrow persisted projections, broadcast-aware
joins, AQE, no row-at-a-time Python in hot paths).
"""

from spark_data_test_spark.entities.config import (
    ComparisonJobConfig,
    DataframeConfig,
    DatasetConfig,
    DatasetParams,
    OutputConfig,
    TestParams,
)
from spark_data_test_spark.jobs import (
    run_comparison_job,
    run_comparison_job_from_dfs,
    write_results,
)
from spark_data_test_spark.operators.comparison import (
    compare_dataframes,
    compare_dataframes_where,
    distribution_report,
    release_comparison_result,
)
from spark_data_test_spark.operators.graph import (
    connected_components,
    pagerank_fixed,
    triangle_count,
)
from spark_data_test_spark.operators.ml import corr_matrix, logit_fit, ols_fit
from spark_data_test_spark.operators.multimodal import (
    box_downsample,
    decode_image,
    decode_wav,
    decode_y4m,
    encode_png_gray,
    encode_wav_pcm16,
    encode_y4m,
    phash_near_dup_pairs,
)
from spark_data_test_spark.operators.dedup import (
    containment_pairs,
    dedup_corpus,
    duplicate_ngram_spans,
    exact_dup_groups,
    knn_text_graph,
    minhash_band_index,
    minhash_index_build,
    minhash_index_probe,
    near_dup_pairs,
    simhash_near_dup_pairs,
    source_overlap,
)
from spark_data_test_spark.operators.relational_ext import (
    blocked_fuzzy_pairs,
    bloom_prefilter,
    cdc_apply,
    dq_check,
    fuzzy_match,
    latest_wins,
    merge_agg_state,
    profile,
    schema_drift,
)
from spark_data_test_spark.operators.analytics import (
    ab_readout,
    duplicate_scan,
    market_basket,
    pareto_classes,
    rfm_segments,
    value_histogram,
)
from spark_data_test_spark.operators.sampling import (
    hash_sample,
    pack_bins,
    split_assign,
    temperature_shares,
    token_budget,
    topk_per_group,
)
from spark_data_test_spark.operators.similarity import (
    cosine_topk,
    ivf_index_build,
    ivf_index_compact,
    ivf_index_probe,
    ivf_topk,
    semantic_prune,
)
from spark_data_test_spark.operators.sketches import (
    distinct_sketch,
    heavy_hitters,
    sketch_union,
)
from spark_data_test_spark.operators.skew import salted_groupby, salted_join
from spark_data_test_spark.state import (
    RETAIN_ALL,
    compact_state_versions,
    fresh_run_root,
    read_state_table,
    read_state_union,
    write_state_version,
)
from spark_data_test_spark.sources.readers import zorder_key
from spark_data_test_spark.operators.temporal import (
    anomaly_zscore,
    cohort_ltv,
    hypertable_rollup,
    last_touch_attribution,
    asof_join,
    asof_join_split,
    cumulative_distinct,
    funnel,
    gap_fill,
    range_join_binned,
    retention_cohorts,
    rolling_agg,
    scd2_build,
    seasonal_backtest,
    sessionize,
    top_session_paths,
    transition_matrix,
)
from spark_data_test_spark.operators.text import (
    chunk_documents,
    decontaminate,
    fingerprint,
    language_id,
    pii_scrub,
    quality_score,
    repetition_profile,
    tfidf_topk,
    token_counts,
)

__all__ = [
    "ComparisonJobConfig",
    "RETAIN_ALL",
    "ab_readout",
    "DataframeConfig",
    "DatasetConfig",
    "DatasetParams",
    "OutputConfig",
    "TestParams",
    "anomaly_zscore",
    "asof_join",
    "asof_join_split",
    "cumulative_distinct",
    "blocked_fuzzy_pairs",
    "bloom_prefilter",
    "cdc_apply",
    "dq_check",
    "fuzzy_match",
    "box_downsample",
    "compare_dataframes",
    "compare_dataframes_where",
    "chunk_documents",
    "cohort_ltv",
    "connected_components",
    "containment_pairs",
    "corr_matrix",
    "cosine_topk",
    "decontaminate",
    "dedup_corpus",
    "distinct_sketch",
    "duplicate_ngram_spans",
    "duplicate_scan",
    "distribution_report",
    "exact_dup_groups",
    "funnel",
    "fingerprint",
    "market_basket",
    "merge_agg_state",
    "minhash_band_index",
    "minhash_index_build",
    "minhash_index_probe",
    "near_dup_pairs",
    "ols_fit",
    "pack_bins",
    "pagerank_fixed",
    "pareto_classes",
    "phash_near_dup_pairs",
    "pii_scrub",
    "profile",
    "repetition_profile",
    "range_join_binned",
    "retention_cohorts",
    "rfm_segments",
    "rolling_agg",
    "salted_groupby",
    "salted_join",
    "compact_state_versions",
    "decode_image",
    "decode_wav",
    "decode_y4m",
    "encode_png_gray",
    "encode_wav_pcm16",
    "encode_y4m",
    "fresh_run_root",
    "gap_fill",
    "hash_sample",
    "heavy_hitters",
    "hypertable_rollup",
    "ivf_index_build",
    "ivf_index_compact",
    "ivf_index_probe",
    "ivf_topk",
    "knn_text_graph",
    "language_id",
    "last_touch_attribution",
    "latest_wins",
    "logit_fit",
    "quality_score",
    "read_state_table",
    "read_state_union",
    "release_comparison_result",
    "run_comparison_job",
    "run_comparison_job_from_dfs",
    "scd2_build",
    "seasonal_backtest",
    "schema_drift",
    "semantic_prune",
    "sessionize",
    "simhash_near_dup_pairs",
    "source_overlap",
    "sketch_union",
    "split_assign",
    "temperature_shares",
    "tfidf_topk",
    "token_budget",
    "token_counts",
    "top_session_paths",
    "topk_per_group",
    "transition_matrix",
    "triangle_count",
    "value_histogram",
    "write_results",
    "write_state_version",
    "zorder_key",
]

__version__ = "0.1.0"
