"""Round-12 amplified scale study (VERDICT r11 items 1/7): the
containment family's discovery plan changed this round — the forced
corpus-cardinality broadcasts (rare-shingle list, per-text sizes,
per-text hot arrays) were replaced with a left_anti join against the
small hot-shingle list plus AQE-decided per-text joins. Results are
hash-identical (3-SF oracle runs); this study records what the change
does to the family's scaling slope, self-contained per query (caches
cleared between passes, so each line carries its own gid-co build —
an upper bound on the HEADLINE lines, where the recall report rides
the containment query's memo).

Protocol: min of two passes per factor. Writes BENCH_AMPLIFIED_r12.json.

Usage: python scripts/bench_amplified_r12.py [factor ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = [
    "dedup_containment",
    "dedup_lsh_recall_report",
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
        .appName("spark-data-test-bench-amplified-r12")
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
            bench._clear_all_memo_caches()
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
            "round-12 study: the containment family after the "
            "broadcast-discipline fix (left_anti vs broadcast(hot); "
            "per-text sizes/hot-array joins AQE-decided). Each line is "
            "self-contained (memo caches cleared between passes, so "
            "dedup_containment carries the full gid-co inverted-index "
            "build and dedup_lsh_recall_report the sampled build) - "
            "upper bounds on the HEADLINE lines where the family "
            "shares memos. min of two passes per factor; v2 amplifier "
            "staging. Pair volume grows with output (amplified copies "
            "share text), so super-linear pair counts are the "
            "documented isotropic-corpus artifact, same as the r11 "
            "incdedup study."
        ),
        "metric": "amplified_per_query",
        "unit": "sec",
        "per_factor": per_factor,
        "slopes_vs_x1": slopes,
    }
    with open("/root/repo/BENCH_AMPLIFIED_r12.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["slopes_vs_x1"]))


if __name__ == "__main__":
    main()
