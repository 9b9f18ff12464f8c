"""Round-7 amplified study, addendum D: the image-resize kernel.

Adds x1/x10/x30 points for ``multimodal_image_resize`` (landed after
addendum C was recorded). Results MERGE into BENCH_AMPLIFIED_r07.json
(same protocol as the main study and addenda A-C: min of two passes
per factor, memo caches cleared between passes; the staged image
corpus persists across passes so pass 1 pays cold-start and pass 2
measures the steady state).

Usage: python scripts/bench_amplified_r07c.py [factor ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = [
    "multimodal_image_resize",
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
        .appName("spark-data-test-bench-amplified-r07c")
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
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
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

    path = "/root/repo/BENCH_AMPLIFIED_r07.json"
    with open(path) as fh:
        result = json.load(fh)
    for fx, timings in per_factor.items():
        result["queries_min_sec"].setdefault(fx, {}).update(timings)
    base = result["queries_min_sec"].get("x1", {})
    for fx, timings in result["queries_min_sec"].items():
        if fx == "x1":
            continue
        result["slopes_vs_x1"][fx] = {
            name: round(timings[name] / base[name], 2)
            for name in timings
            if base.get(name)
        }
    result["totals_min_per_line"] = {
        fx: round(sum(t.values()), 1)
        for fx, t in result["queries_min_sec"].items()
    }
    addendum = (
        " Addendum D adds multimodal_image_resize (standalone, so each"
        " pass pays its own decode: the memo-primed marginal cost in"
        " BENCH_LOCAL_r07 is 0.75s; the resize itself is one"
        " map-side-combined block GROUP BY whose exchange carries one"
        " row per output pixel)."
    )
    if "Addendum D" not in result["note"]:
        result["note"] += addendum
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result["totals_min_per_line"]))


if __name__ == "__main__":
    main()
