"""Round-17 amplified scale study: the persisted-index lifecycle rows
at x1/x10/x30 of the sf0.1 embeddings corpus — re-recorded because
the round-17 ADVICE fixes (persisted stamp-format versioning,
localCheckpoint pin release, no double-pin of self-trained codebooks)
touched every line in the family. Protocol change: min of THREE
passes per factor — the round-17 stage decomposition's interleaved
A/B showed the first x30 pass after staging runs 2-3x hot (page
cache + JIT), so min-of-two can freeze warmup-inflated lines; the
stage-level attribution of the slopes lives in
DECOMP_INDEX_LIFECYCLE.json.

What the slopes should show:
- `similarity_pq_index_probe` stages build (O(n) encode) + a
  FIXED-size shard ingest (84 rows x n codes ADC) + O(n/11)
  tombstones + an 8-query flat ADC probe (O(n)) — every stage linear
  in the corpus, so the line should scale ~linearly.
- `similarity_ivfpq_index_probe` adds the coarse model: the build's
  cell assignment is n x ncells scoring, but the PROBE only touches
  nprobe cells' code rows, so the end-to-end line is build-dominated
  (~linear) while staying strictly cheaper than the flat-PQ row at
  the probe stage (BENCH_INDEX_PROBE_r16.json isolates that).
- `similarity_refined_ann` is the lightweight composition: one code
  scan for the shortlist + a batch x 4k refine — ~linear in the scan.
- `similarity_ivf_index_probe` (NEW r16) carries RAW VECTORS in its
  postings log, so its build is assignment-only (injected pre-trained
  centroids) and its probe rescores only the probed cells' rows —
  build-dominated ~linear line, probe strictly sub-linear.
- `similarity_pq_ann` is recorded as the pre-existing flat-ADC
  baseline the new rows should track.

Protocol: min of three passes per factor, memo caches cleared
between passes. Writes BENCH_AMPLIFIED_r17.json.

Usage: python scripts/bench_amplified_r17.py [factor ...]
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
        .appName("spark-data-test-bench-amplified-r17")
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
            "round-17 study (post stamp-format versioning + pin release): the persisted-index lifecycle rows "
            "(each run stages build + fixed-84-row shard ingest + "
            "tombstone delete into a FRESH run root, then probes the "
            "resolved state - deliberately the full lifecycle, so "
            "the line is build-dominated and should scale ~linearly "
            "in the corpus; the probe-only cost decomposition lives "
            "in BENCH_INDEX_PROBE_r16.json and the stage split in DECOMP_INDEX_LIFECYCLE.json). similarity_pq_ann is "
            "the pre-existing flat-ADC baseline; "
            "similarity_refined_ann composes one code scan with a "
            "batch x 4k exact refine. min of three passes per factor (warmup finding, see DECOMP_INDEX_LIFECYCLE.json); "
            "v2 amplifier staging."
        ),
        "metric": "amplified_per_query",
        "unit": "sec",
        "per_factor": per_factor,
        "slopes_vs_x1": slopes,
    }
    with open("/root/repo/BENCH_AMPLIFIED_r17.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["slopes_vs_x1"]))


if __name__ == "__main__":
    main()
