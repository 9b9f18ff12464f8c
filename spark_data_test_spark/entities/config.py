"""Config dataclasses — the library's "catalog".

Field names/defaults mirror the reference so its documented configs work
unchanged (/root/reference/spark_data_test/entities/config.py:4-41).
Extensions beyond the reference are called out inline.
"""

from dataclasses import dataclass, field

from spark_data_test_spark.constants import CHECKSUM_MODE_SHA256, PARQUET_FMT


@dataclass
class TestParams:
    difference_tolerance: float = 0.0
    # Extension: "sha256" = reference-identical row checksum
    # (sha2(concat_ws("", cols), 256)); "xxhash64" = canonicalized
    # NULL-safe 64-bit checksum — the 100 TB fast path (see
    # functions/checksum.py).
    checksum_mode: str = CHECKSUM_MODE_SHA256
    # Extension: per-column tolerance overrides, e.g.
    # {"price": 0.01, "qty": 0}; columns not listed use
    # difference_tolerance. Only meaningful for numeric columns.
    column_tolerances: dict = field(default_factory=dict)


@dataclass
class DatasetParams:
    dataset_name: str
    primary_keys: list
    test_params: TestParams = field(default_factory=TestParams)
    select_cols: list = field(default_factory=lambda: ["*"])
    drop_cols: list = field(default_factory=list)


@dataclass
class OutputConfig:
    output_dir: str
    output_file_format: str = PARQUET_FMT
    spark_options: dict = field(default_factory=dict)
    no_of_partitions: int = -1  # -1 means keep Spark's partitioning
    # Extension: write all per-column unmatched dumps as ONE dataset
    # partitioned by (dataset_name, column_name) instead of the
    # reference's serial per-column write loop
    # (comparison_job.py:174-179) — the scalable layout at 100 TB.
    partitioned_unmatched: bool = False


@dataclass
class DataframeConfig:
    path: str
    file_format: str = PARQUET_FMT
    spark_options: dict = field(default_factory=dict)


@dataclass
class DatasetConfig:
    params: DatasetParams
    source_config: DataframeConfig
    target_config: DataframeConfig


@dataclass
class ComparisonJobConfig:
    job_name: str
    dataset_configs: list
    output_config: OutputConfig
