"""Round-18 amplified scale study: the persisted-index lifecycle rows
at x1/x10/x30 of the sf0.1 embeddings corpus — re-recorded because
round 18 switched the lifecycle rows' shard-commit step to the new
ingest-only entry points (`pq_index_ingest` / `ivf_index_ingest` /
`ivfpq_index_ingest`, VERDICT r17 item 2): the probe(commit=True)
ingest ANSWERED a k=1 query per commit, and for the flat-PQ row that
answer ADC-scanned ALL n live codes — DECOMP_INDEX_LIFECYCLE (r17)
attributed the row's entire 4.15x x30 slope to that stage.

What the slopes should show vs BENCH_AMPLIFIED_r17.json:
- `similarity_pq_index_probe`: the x30 line should drop by roughly
  the r17 ingest stage (~18 s at x30) and its slope should flatten
  toward the build + final-probe linear terms (both O(n) by the flat
  index's contract — encode scan and 8-query ADC scan).
- `similarity_ivf_index_probe` / `similarity_ivfpq_index_probe`:
  smaller absolute drops (their r17 ingest probes were already
  cell-pruned); build stays the dominant linear stage.
- `similarity_pq_ann` / `similarity_refined_ann`: byte-untouched
  controls — any movement there is the box, not the code.

Protocol: min of THREE passes per factor (the first x30 pass after
staging runs 2-3x hot — page cache + JIT), memo caches cleared once
per pass; v2 amplifier staging. Writes BENCH_AMPLIFIED_r18.json.

Usage: python scripts/bench_amplified_r18.py [factor ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = [
    "similarity_pq_ann",
    "similarity_refined_ann",
    "similarity_pq_index_probe",
    "similarity_ivfpq_index_probe",
    "similarity_ivf_index_probe",
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
        .appName("spark-data-test-bench-amplified-r18")
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
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        timings = {}
        for _pass in range(3):
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
            "round-18 study (post ingest-only switch, VERDICT r17 "
            "item 2): the lifecycle rows' shard commit now goes "
            "through *_index_ingest (encode/assign + append, no "
            "probe work) instead of probe(commit=True), whose "
            "flat-PQ k=1 answer ADC-scanned ALL n codes and owned "
            "the pq row's entire r17 x30 slope. Each run stages "
            "build + fixed-84-row shard ingest + tombstone delete "
            "into a FRESH run root, then probes the resolved state. "
            "similarity_pq_ann / similarity_refined_ann are "
            "byte-untouched controls. min of three passes per "
            "factor; v2 amplifier staging; stage split in "
            "DECOMP_INDEX_LIFECYCLE.json."
        ),
        "metric": "amplified_per_query",
        "unit": "sec",
        "per_factor": per_factor,
        "slopes_vs_x1": slopes,
    }
    with open("/root/repo/BENCH_AMPLIFIED_r18.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["slopes_vs_x1"]))


if __name__ == "__main__":
    main()
