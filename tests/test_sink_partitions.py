"""S5 output-partition control: coalesce when shrinking, repartition
when growing, and the sink actually lands that many data files
(reference io_utils.py:5-20 semantics)."""

import glob
import shutil

import pyspark.sql.functions as F

from spark_data_test_spark.entities.config import OutputConfig
from spark_data_test_spark.operators.relational import t
from spark_data_test_spark.utils.io_utils import write_result


def _data_files(path):
    return [p for p in glob.glob(f"{path}/part-*") if not p.endswith(".crc")]


def test_grow_path_repartitions(spark, sf_dir, tmp_path):
    out = str(tmp_path / "grow")
    df = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    assert df.rdd.getNumPartitions() < 6
    write_result(df, out, OutputConfig(output_dir=out, no_of_partitions=6))
    try:
        assert len(_data_files(out)) == 6
        assert spark.read.parquet(out).count() == df.count()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_shrink_path_coalesces(spark, sf_dir, tmp_path):
    out = str(tmp_path / "shrink")
    df = (
        t(spark, sf_dir, "orders")
        .repartition(8, "o_orderkey")
        .select("o_orderkey", "o_totalprice")
    )
    write_result(df, out, OutputConfig(output_dir=out, no_of_partitions=2))
    try:
        assert len(_data_files(out)) == 2
        got = (
            spark.read.parquet(out)
            .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")))
            .collect()[0][0]
        )
        want = df.agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        ).collect()[0][0]
        assert got == want
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_default_leaves_partitioning_alone(spark, sf_dir, tmp_path):
    out = str(tmp_path / "default")
    df = t(spark, sf_dir, "orders").repartition(3, "o_orderkey")
    write_result(df, out, OutputConfig(output_dir=out))
    try:
        assert len(_data_files(out)) == 3
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_pruned_read_has_partition_filters_and_prunes_files(spark, sf_dir):
    """The day filter must resolve against hive partition directories at
    planning time (PartitionFilters), not as a post-scan row filter."""
    from spark_data_test_spark.plans.audit import formatted_plan
    from spark_data_test_spark.sources import readers

    df = readers.sink_partition_pruned_read(spark, sf_dir)
    plan = formatted_plan(df)
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan_lines, "scan lost its PartitionFilters"
    assert any("day" in l for l in scan_lines)
    # and the answer over the pruned files equals the direct computation
    direct = (
        t(spark, sf_dir, "events")
        .select(
            F.expr(f"unix_micros(ts) div {readers._PRUNE_DAY_US}").alias("day"),
            "event_type",
            "value",
        )
        .where(F.col("day").isin(*readers._PRUNE_DAYS))
        .groupBy("day", "event_type")
        .count()
    )
    got = {(r.day, r.event_type): r.cnt for r in df.collect()}
    want = {(r.day, r.event_type): r["count"] for r in direct.collect()}
    assert got == want


def test_inverted_index_probe_prunes_prefix_partitions(spark, sf_dir):
    """The index probe's prefix filter must resolve against the hive
    partition directories at planning time. The staged index artifact
    is deleted before the caller sees the (localized) result frame, so
    the assertion reads the plan-capture hook the builder records
    inside the artifact's lifecycle."""
    from spark_data_test_spark.sources import readers

    df = readers.sink_inverted_index_roundtrip(spark, sf_dir)
    assert df.count() > 0
    plan = readers._last_invidx_probe_plan
    assert plan is not None, "probe plan hook was not captured"
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan_lines, "index probe lost its PartitionFilters"
    assert any("prefix" in l for l in scan_lines)
