"""Round-9 amplified scale study (VERDICT r8 items 2-3): re-measures
the four queries whose code changed this round — the phash family
(one-core repartition fix + shared `_phash_pairs` memo) and the
embedding family (shared `_embedding_pairs` memo) — plus the newly
registered `events_tumbling_window`.

Memo accounting: within a pass the pair memos persist (the engine's
designed cross-query reuse), so each family's FIRST query carries the
pipeline build and the second rides the memo — the bench.py HEADLINE
order does the same. Caches are cleared between passes.

Protocol: min of two passes per factor. Writes BENCH_AMPLIFIED_r09.json.

Usage: python scripts/bench_amplified_r09.py [factor ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = [
    "multimodal_real_image_decode",  # owns the decode memo (bench order)
    "multimodal_phash_neardup",
    "multimodal_crossmodal_agreement",
    "dedup_embedding_cosine",
    "dedup_semantic_prune_curve",
    "events_tumbling_window",
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
        .appName("spark-data-test-bench-amplified-r09")
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
        spark.read.parquet(f"{sf_dir}/events.parquet").count()
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
            "round-9 study of the changed queries: phash family "
            "(repartition-after-distinct fix + shared _phash_pairs "
            "memo; crossmodal rides the memo within a pass) and "
            "embedding family (shared _embedding_pairs memo; the prune "
            "curve adds only its broadcast threshold grid), plus the "
            "newly registered events_tumbling_window. min of two "
            "passes per factor, memo caches cleared between passes; "
            "v2 amplifier staging."
        ),
        "metric": "amplified_per_query",
        "unit": "sec",
        "per_factor": per_factor,
        "slopes_vs_x1": slopes,
    }
    with open("/root/repo/BENCH_AMPLIFIED_r09.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["slopes_vs_x1"]))


if __name__ == "__main__":
    main()
