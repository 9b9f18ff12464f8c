"""Round-5/6 amplified scale study (VERDICT r5 item 2).

Measures the families added or rewritten since the r4 x30 study over
the provided sf0.1 tables plus key-shifted x10/x30 amplified stagings
(reusing bench.py's `_stage_amplified`):

- the PQ family: `similarity_pq_train` / `_pq_ann` / `_ivfpq_ann` /
  `_pq_recall_report`
- the r5 edge-iterator `graph_triangle_count`
- the capped + hash-sampled `dedup_lsh_recall_report`
- the incremental dedup family: `dedup_index_build` (corpus-
  proportional by design) vs `dedup_incremental_{minhash,exact,
  simhash}` (claimed shard-proportional)

Protocol mirrors BENCH_AMPLIFIED_r04.json: per factor, two timed
passes with session memo caches cleared in between, min per line.
For the stateful queries (PQ codebooks, fingerprint indexes) pass 1
pays the cold-start train/build+commit and pass 2 probes the committed
state, so the min is the warm steady-state cost — the same path every
factor measures. Writes BENCH_AMPLIFIED_r05.json at the repo root.

Usage: python scripts/bench_amplified_r05.py [factor ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = [
    "similarity_pq_train",
    "similarity_pq_ann",
    "similarity_ivfpq_ann",
    "similarity_pq_recall_report",
    "graph_triangle_count",
    "dedup_lsh_recall_report",
    "dedup_index_build",
    "dedup_incremental_minhash",
    "dedup_incremental_exact",
    "dedup_incremental_simhash",
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
        .appName("spark-data-test-bench-amplified-r05")
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
        from spark_data_test_spark.operators.dedup import clear_dedup_cache
        from spark_data_test_spark.operators.graph import clear_graph_cache
        from spark_data_test_spark.operators.similarity import (
            clear_similarity_cache,
        )

        clear_dedup_cache()
        clear_similarity_cache()
        clear_graph_cache()

    per_factor = {}
    for factor in factors:
        sf_dir = (
            sf_base_dir
            if factor == 1
            else bench._stage_amplified(spark, sf_base_dir, factor)
        )
        # warm the fs cache on the biggest scan inputs, outside timings
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
            "round-5/6 amplified study over the families the r4 study "
            "did not cover (VERDICT r5 item 2). Same protocol as "
            "BENCH_AMPLIFIED_r04.json: min of two passes per factor, "
            "memo caches cleared between passes; stateful queries "
            "(PQ codebooks, fingerprint indexes) pay cold-start in "
            "pass 1 and probe committed state in pass 2, so min = warm "
            "steady-state. Amplified stagings shift doc_id by 1e4 per "
            "copy (bench.py) so the incremental family's planted-"
            "arrival offset guard (300k floor) holds through x30."
        ),
        "sf_base": 0.1,
        "factors": factors,
        "totals_min_per_line": {
            fx: round(sum(t.values()), 1) for fx, t in per_factor.items()
        },
        "slopes_vs_x1": slopes,
        "queries_min_sec": per_factor,
    }
    with open("/root/repo/BENCH_AMPLIFIED_r05.json", "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result["totals_min_per_line"]))


if __name__ == "__main__":
    main()
