"""Mechanical pins for round-8 plan properties that timing alone would
let regress silently: the audio envelope build must not collapse onto
one AQE-coalesced partition (the one-core trap: 4.1 s vs 0.7 s at
sf0.1), and the one-pass arrival stager must produce exactly one file
per batch with strictly increasing mtimes (the property the streaming
file source's (timestamp, path) ordering depends on)."""

import os

import pyspark.sql.functions as F


def test_audio_envelope_build_is_spread_across_partitions(spark, sf_dir):
    from spark_data_test_spark.operators.multimodal import (
        _audio_envelope_fp,
        audio_decoded,
    )
    from spark_data_test_spark.utils.spark_utils import release_frame

    dec = audio_decoded(spark, sf_dir).select("doc_id", "pcm_hex")
    members = dec.select(F.col("pcm_hex").alias("gid"), "doc_id")
    fp = _audio_envelope_fp(members)
    try:
        # the checkpoint materialized on the repartitioned layout: the
        # heavy interpreted projection ran on many cores, not one
        assert fp.rdd.getNumPartitions() > 1
        assert fp.count() > 0
    finally:
        release_frame(fp)


def test_stage_arrival_files_one_file_per_batch_in_order(spark, tmp_path):
    from spark_data_test_spark.streaming.windows import _stage_arrival_files

    df = spark.createDataFrame(
        [(i, f"text {i}", i % 3) for i in range(90)],
        "doc_id long, text string, b int",
    )
    run_root = str(tmp_path / "run")
    in_dir = f"{run_root}/in"
    os.makedirs(run_root)
    _stage_arrival_files(df, run_root, in_dir, n_batches=3)

    names = sorted(os.listdir(in_dir))
    assert names == ["batch0.parquet", "batch1.parquet", "batch2.parquet"]
    mtimes = [os.path.getmtime(f"{in_dir}/{n}") for n in names]
    assert mtimes[0] < mtimes[1] < mtimes[2]
    # the staged files carry the schema minus b, split exactly by residue
    for k, name in enumerate(names):
        part = spark.read.parquet(f"{in_dir}/{name}")
        assert part.columns == ["doc_id", "text"]
        ids = [r.doc_id for r in part.collect()]
        assert sorted(ids) == [i for i in range(90) if i % 3 == k]
    # the dynamic-partition scratch tree is cleaned up
    assert not os.path.exists(f"{run_root}/stage")
