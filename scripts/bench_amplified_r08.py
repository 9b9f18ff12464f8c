"""Round-8 amplified scale study (VERDICT r7 items 2-6):

* re-measures every query whose code changed this round — the
  streaming incremental pair (persistent-index probe + one-pass
  staging + in-row batch fingerprints), the media arrivals ingest
  (binaryFile object source -> streamed landing-log manifest), the
  graph pair (persisted contribution edges / orientation+adjacency),
  and the state queries converted to lazy persistent-run-root returns;
* re-measures `orders_duplicate_payment_scan` on the v2 amplifier
  staging, whose per-copy o_custkey/c_custkey shifts remove the r7
  staging artifact (an unshifted custkey grew per-customer fan-out by
  the factor itself — BENCH_AMPLIFIED_r07.json note), so the line now
  measures the plan, not the staging.

Protocol: min of two passes per factor, memo caches cleared between
passes (stateful families pay cold-start in pass 1, probe committed
state in pass 2). Writes BENCH_AMPLIFIED_r08.json.

Usage: python scripts/bench_amplified_r08.py [factor ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = [
    "streaming_incremental_dedup",
    "streaming_incremental_minhash",
    "streaming_media_arrivals",
    "graph_pagerank_fixed",
    "graph_triangle_count",
    "orders_duplicate_payment_scan",
    "streaming_sessionization_store",
    "streaming_cdc_upsert",
    "streaming_sketch_rollup",
    "state_time_travel_diff",
    "state_compaction_roundtrip",
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
        .appName("spark-data-test-bench-amplified-r08")
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
        from spark_data_test_spark.operators.graph import clear_graph_cache
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
        clear_graph_cache()

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
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
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
            "round-8 study on the v2 amplifier staging (per-copy "
            "o_custkey/c_custkey shifts; customer amplifies with "
            "orders, so customer joins stay valid and customer-blocked "
            "self-joins measure organic growth — the r7 "
            "orders_duplicate_payment_scan 5.32x slope was the "
            "unshifted-custkey artifact). Re-measures every query "
            "whose code changed in round 8; compare "
            "BENCH_AMPLIFIED_r07.json (identical protocol, v1 "
            "staging). Dimension FKs that stay unshifted (l_partkey, "
            "l_suppkey, c_nationkey) model facts-grow-faster-than-"
            "dimensions; no blocked self-join keys ride them: the "
            "dedup/simhash/IVF families block on text-hash groups, "
            "band signatures, and trained cells, all derived from "
            "amplified columns."
        ),
        "sf_base": 0.1,
        "factors": factors,
        "totals_min_per_line": {
            fx: round(sum(t.values()), 1) for fx, t in per_factor.items()
        },
        "slopes_vs_x1": slopes,
        "queries_min_sec": per_factor,
    }
    with open("/root/repo/BENCH_AMPLIFIED_r08.json", "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
