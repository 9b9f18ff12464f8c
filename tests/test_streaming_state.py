"""Multi-batch stateful sessionization: state must carry across
micro-batches.

The driver-contract query runs one availableNow batch; this test splits
the events table into two files processed as two micro-batches
(maxFilesPerTrigger=1), so sessions spanning the split exercise real
state handoff in applyInPandasWithState. Per-batch emission semantics
mean downstream dedup keeps the max n_events per (user, session_start);
after that, results must equal the batch gaps-and-islands oracle.
"""

import os

import pyspark.sql.functions as F

from spark_data_test_spark.operators.relational import events_sessionization, t
from spark_data_test_spark.streaming.windows import sessionize_stateful


def test_state_carries_across_microbatches(spark, sf_dir, tmp_path):
    ev = t(spark, sf_dir, "events")
    median_us = ev.selectExpr("unix_micros(ts) AS us").approxQuantile(
        "us", [0.5], 0.0
    )[0]
    split = F.unix_micros(F.col("ts")) <= F.lit(int(median_us))

    stage = str(tmp_path / "events_stream")
    os.makedirs(stage, exist_ok=True)
    ev.where(split).coalesce(1).write.mode("overwrite").parquet(
        f"{stage}/batch_a"
    )
    ev.where(~split).coalesce(1).write.mode("overwrite").parquet(
        f"{stage}/batch_b"
    )
    # order micro-batches deterministically (source sorts by mtime/path)
    for i, d in enumerate(["batch_a", "batch_b"]):
        for f in os.listdir(f"{stage}/{d}"):
            os.utime(f"{stage}/{d}/{f}", (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{stage}/batch_*")
    )
    q = (
        sessionize_stateful(stream)
        .writeStream.format("memory")
        .queryName("multi_batch_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    raw = spark.table("multi_batch_sessions")
    assert q.lastProgress is not None
    deduped = (
        raw.groupBy("user_id", "session_start_us")
        .agg(F.max("n_events").alias("n_events"))
    )
    got = sorted(tuple(r) for r in deduped.collect())
    expected = sorted(
        tuple(r)
        for r in events_sessionization(spark, sf_dir)
        .select("user_id", "session_start_us", F.col("n_events").cast("long"))
        .collect()
    )
    assert got == expected


def test_foreachbatch_parquet_sink(spark, sf_dir, tmp_path):
    """foreachBatch: the production sink pattern — each micro-batch is a
    normal DataFrame written with full batch APIs (here: parquet
    partitioned by event_type)."""
    import pyspark.sql.functions as F

    from spark_data_test_spark.streaming.windows import read_events_stream

    out = str(tmp_path / "sink")

    def write_batch(batch_df, batch_id):
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("event_type")
            .parquet(out)
        )

    q = (
        read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    written = spark.read.parquet(out)
    source = t(spark, sf_dir, "events")
    assert written.count() == source.count()
    assert set(written.select("event_type").distinct().toPandas()["event_type"]) == set(
        source.select("event_type").distinct().toPandas()["event_type"]
    )
