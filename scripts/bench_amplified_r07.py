"""Round-7 amplified scale study (VERDICT r6 items 3 and 6):

* the COMPARISON CORE gets its first amplified points — the flagship
  engine run (`compare_overall_report`) and the bucketed-table
  comparison path (`source_bucketed_table_roundtrip`) at x1/x10/x30 —
  the one family whose 100 TB posture was previously asserted, not
  measured;
* re-measures the queries whose code changed this round
  (`text_knn_graph` rebuilt on banded candidates,
  `multimodal_phash_neardup` + `multimodal_real_image_decode` promoted
  to the 8x8 / 64-bit corpus, `streaming_incremental_dedup` moved to
  log-structured delta commits, `similarity_centroid_outliers` moved to
  a map-combinable argmax) so their slopes decompose against the
  recorded r6 numbers (BENCH_AMPLIFIED_r06.json, identical protocol).

Protocol: min of two passes per factor, memo caches cleared between
passes (stateful families pay cold-start in pass 1, probe committed
state in pass 2). Writes BENCH_AMPLIFIED_r07.json.

Usage: python scripts/bench_amplified_r07.py [factor ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = [
    "compare_overall_report",
    "source_bucketed_table_roundtrip",
    "text_knn_graph",
    "multimodal_real_image_decode",
    "multimodal_phash_neardup",
    "streaming_incremental_dedup",
    "similarity_centroid_outliers",
]


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    sf_base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    import bench

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-data-test-bench-amplified-r07")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qmap = entry_mod.queries()

    def clear_memo_caches():
        from spark_data_test_spark.operators import comparison_queries as cq
        from spark_data_test_spark.operators.dedup import clear_dedup_cache
        from spark_data_test_spark.operators.multimodal import (
            clear_multimodal_cache,
        )
        from spark_data_test_spark.operators.similarity import (
            clear_similarity_cache,
        )

        cq.clear_engine_cache()
        clear_dedup_cache()
        clear_similarity_cache()
        clear_multimodal_cache()

    per_factor = {}
    for factor in factors:
        sf_dir = (
            sf_base_dir
            if factor == 1
            else bench._stage_amplified(spark, sf_base_dir, factor)
        )
        # warm the fs cache on the biggest scan inputs, outside timings
        spark.read.parquet(f"{sf_dir}/orders.parquet").count()
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        timings = {}
        for _pass in range(2):
            clear_memo_caches()
            for name in QUERIES:
                t0 = time.time()
                qmap[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = round(time.time() - t0, 3)
                timings[name] = min(timings.get(name, dt), dt)
                print(
                    f"x{factor} pass{_pass + 1} {name}: {dt}s",
                    file=sys.stderr,
                )
        per_factor[f"x{factor}"] = timings

    slopes = {}
    base = per_factor.get("x1", {})
    for fx, timings in per_factor.items():
        if fx == "x1":
            continue
        slopes[fx] = {
            name: round(timings[name] / base[name], 2)
            for name in timings
            if base.get(name)
        }

    result = {
        "note": (
            "round-7 study: first amplified points for the comparison "
            "core (flagship + bucketed roundtrip) plus re-measurement "
            "of every query whose code changed this round. Compare "
            "against BENCH_AMPLIFIED_r06.json (identical protocol) for "
            "the before/after decompositions of "
            "streaming_incremental_dedup (full-snapshot rewrite -> "
            "delta commits) and similarity_centroid_outliers "
            "(row_number argmax -> map-combinable max-struct)."
        ),
        "sf_base": 0.1,
        "factors": factors,
        "totals_min_per_line": {
            fx: round(sum(t.values()), 1) for fx, t in per_factor.items()
        },
        "slopes_vs_x1": slopes,
        "queries_min_sec": per_factor,
    }
    with open("/root/repo/BENCH_AMPLIFIED_r07.json", "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result["totals_min_per_line"]))


if __name__ == "__main__":
    main()
