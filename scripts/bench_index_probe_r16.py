"""Round-16 probe-cost + build-cost study across the persisted ANN
indexes.

Builds all three over the (x30-amplified) sf0.1 embeddings table,
then times a 64-query probe batch (min of two passes) against each
committed index. The claim under test is the architecture story: the
PQ index scans every live code row per query (linear in the corpus),
while the IVF-PQ index scores only the probed cells' rows — so its
probe cost should sit well under the flat-PQ scan and track
nprobe/ncells. IVF-Flat is the raw-vector baseline.

NEW in round 16 (VERDICT r15 item 5): the SAMPLE-TRAINED build line.
`ivf_index_build(centroids=...)` is the designed 100 TB build path —
train the coarse quantizer on a sample, then index the full corpus
under the injected model (FAISS trains on a slice, then ``add``s
everything). This script measures it: `ivf_flat_sample_train`
trains on the UNAMPLIFIED sf0.1 slice (1/30 of the corpus) and
`ivf_flat_assign_only` indexes the full amplified corpus under those
pre-trained centroids — the number that shows a sample-trained build
costs ~assignment only, vs the full-corpus Lloyd `ivf_flat` build.

Writes BENCH_INDEX_PROBE_r16.json.

Usage: python scripts/bench_index_probe_r16.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    from spark_data_test_spark import (
        ivf_index_build,
        ivf_index_probe,
        ivfpq_index_build,
        ivfpq_index_probe,
        pq_index_build,
        pq_index_probe,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-data-test-bench-index-probe-r16")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    factor = int(os.environ.get("IDX_BENCH_AMPLIFY", "30"))
    amp_dir = (
        sf_dir if factor == 1
        else bench._stage_amplified(spark, sf_dir, factor)
    )
    emb = spark.read.parquet(f"{amp_dir}/embeddings.parquet")
    n = emb.count()
    queries = emb.limit(64).localCheckpoint(eager=True)
    root = tempfile.mkdtemp(prefix="idxbench_")

    builds, probes = {}, {}

    def timed_build(name, fn):
        t0 = time.time()
        cnt = fn()
        builds[name] = {"sec": round(time.time() - t0, 3), "indexed": cnt}
        print(f"build {name}: {builds[name]}", file=sys.stderr)

    def timed_probe(name, fn):
        best = None
        for _ in range(2):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
        probes[name] = best
        print(f"probe {name}: {best}s", file=sys.stderr)

    timed_build("ivf_flat", lambda: ivf_index_build(
        emb, f"{root}/ivf", vec_col="embedding"))
    timed_build("pq", lambda: pq_index_build(
        emb, f"{root}/pq", m=4, ncodes=16, vec_col="embedding"))
    timed_build("ivfpq", lambda: ivfpq_index_build(
        emb, f"{root}/ivfpq", m=4, ncodes=16, vec_col="embedding"))

    # the 100 TB build path: train on the unamplified slice (1/factor
    # of the corpus), then index the FULL corpus under the injected
    # centroids — build cost should collapse to ~assignment only
    sample = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed_build("ivf_flat_sample_train", lambda: ivf_index_build(
        sample, f"{root}/ivf_sample", vec_col="embedding"))
    from spark_data_test_spark.state import read_state_table

    cents = read_state_table(spark, f"{root}/ivf_sample/centroids")
    timed_build("ivf_flat_assign_only", lambda: ivf_index_build(
        emb, f"{root}/ivf_pretrained", centroids=cents,
        vec_col="embedding"))

    timed_probe("ivf_flat_nprobe4", lambda: ivf_index_probe(
        queries, f"{root}/ivf", k=10, nprobe=4, vec_col="embedding"))
    timed_probe("pq_full_scan", lambda: pq_index_probe(
        queries, f"{root}/pq", k=10, vec_col="embedding"))
    timed_probe("ivfpq_nprobe4", lambda: ivfpq_index_probe(
        queries, f"{root}/ivfpq", k=10, nprobe=4, vec_col="embedding"))
    timed_probe("ivfpq_nprobe16", lambda: ivfpq_index_probe(
        queries, f"{root}/ivfpq", k=10, nprobe=16, vec_col="embedding"))

    shutil.rmtree(root, ignore_errors=True)
    result = {
        "note": (
            "round-16 probe+build-cost study over the x30-amplified "
            "sf0.1 embeddings corpus, 64-query batch, k=10, min of two "
            "passes per probe. pq_full_scan ranks every live code row "
            "per query (the honest flat-ADC contract); ivfpq restricts "
            "the ADC scan to the probed cells' rows, so its probe "
            "should sit under the flat scan and grow with nprobe; "
            "ivf_flat is the raw-vector cell-probe baseline. Builds "
            "are one-time costs (both Lloyd trainings for ivfpq). NEW: "
            "ivf_flat_sample_train is a full Lloyd train over the 1/30 "
            "unamplified slice; ivf_flat_assign_only indexes the FULL "
            "x30 corpus under those injected centroids — the "
            "sample-train 100 TB build path, to compare against the "
            "full-corpus-Lloyd ivf_flat build."
        ),
        "metric": "index_probe_sec",
        "unit": "sec",
        "corpus_rows": n,
        "builds": builds,
        "probes": probes,
    }
    with open("/root/repo/BENCH_INDEX_PROBE_r16.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["probes"]))


if __name__ == "__main__":
    main()
