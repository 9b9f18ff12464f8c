"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "headline_total", "value": N, "unit": "sec",
   "queries": {...}, "sf": 0.1}

Each query is materialized with a noop-format write (full execution, no
driver collect overhead). Session startup and a warmup action are
excluded from timings.
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "compare_overall_report",
    "compare_row_report",
    "compare_lineitem_overall",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q18_large_orders",
    "window_dup_count",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_near_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "similarity_cosine_topk",
    "similarity_ivf_ann",
    "text_language_id",
    "text_quality_score",
    "events_sliding_window",
    "events_sessionization",
    "events_asof_join",
    "events_range_join",
    "pack_sequences",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-data-test-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        # the sf0.1 tables are single ~10MB parquet files; the default
        # 128MB split size would serialize every scan onto one core. At
        # cluster scale inputs arrive as many files and this knob is
        # irrelevant; locally it restores scan parallelism.
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qmap = entry_mod.queries()

    def clear_memo_caches():
        """Release session memo caches (engine results, dedup
        shingles/pairs). A failed clear would silently turn later
        timings into cache hits, so failures are REPORTED, not
        swallowed — the timing harness depends on this running."""
        try:
            from spark_data_test_spark.operators import comparison_queries as cq

            cq.clear_engine_cache()
        except Exception as exc:
            print(f"bench cache clear failed (engine): {exc!r}", file=sys.stderr)
        try:
            from spark_data_test_spark.operators.dedup import clear_dedup_cache

            clear_dedup_cache()
        except Exception as exc:
            print(f"bench cache clear failed (dedup): {exc!r}", file=sys.stderr)
        try:
            from spark_data_test_spark.operators.similarity import (
                clear_similarity_cache,
            )

            clear_similarity_cache()
        except Exception as exc:
            print(f"bench cache clear failed (similarity): {exc!r}", file=sys.stderr)

    # Warmup, excluded from timings: touch the biggest input (fs cache)
    # and run the comparison pipeline once at the smallest sf so the
    # join/window/hash codegen paths are JIT-compiled before measuring.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    try:
        from spark_data_test_spark.operators import comparison_queries as _cq

        for _ in range(2):
            _cq.clear_engine_cache()
            qmap["compare_overall_report"](spark, "/root/testdata/sf0.001").collect()
            qmap["compare_lineitem_overall"](spark, "/root/testdata/sf0.001").collect()
        _cq.clear_engine_cache()
        # JIT-warm the remaining headline families at the smallest sf so
        # per-query timings measure steady-state work, not first-run
        # codegen compilation of each plan family.
        for warm_q in (
            "tpch_q1_pricing_summary",
            "dedup_simhash",
            "dedup_near_jaccard",
            "dedup_embedding_cosine",
            "similarity_cosine_topk",
            "text_language_id",
            "events_sessionization",
        ):
            qmap[warm_q](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
    except Exception as exc:
        # a broken warmup means every timed query pays first-run codegen
        # — keep going, but SAY so instead of silently inflating numbers
        print(f"bench warmup failed: {exc!r}", file=sys.stderr)
    finally:
        # drop warmup-scale cached frames so the timed run starts clean
        # even when warmup aborted partway
        clear_memo_caches()

    # Two timed passes, min per query: run-to-run variance on a shared
    # box swamps single-shot timings (measured 2-3x on identical code);
    # the min is the steady-state cost. Session-level memo caches are
    # cleared between passes so pass 2 measures real work, not cache
    # hits — within a pass the caches stay, which is the engine's
    # designed cross-query reuse.
    timings = {}
    for _pass in range(2):
        clear_memo_caches()
        for name in HEADLINE:
            fn = qmap[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
