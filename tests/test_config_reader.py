"""Config parsing unit tests (reference tests/test_config_reader.py:3-34)."""

import pytest

from spark_data_test_spark.entities.config import (
    ComparisonJobConfig,
    DatasetParams,
    TestParams,
)
from spark_data_test_spark.utils.config_reader import (
    dict_to_dataclass,
    parse_comparison_job_config,
)


def test_empty_config_raises():
    with pytest.raises(ValueError):
        parse_comparison_job_config(None)
    with pytest.raises(ValueError):
        parse_comparison_job_config({})


def test_parse_full_config():
    config = parse_comparison_job_config(
        {
            "job_name": "test_job",
            "dataset_configs": [
                {
                    "source_config": {
                        "path": "./in/df",
                        "file_format": "csv",
                        "spark_options": {"header": "true"},
                    },
                    "target_config": {
                        "path": "./in/df2",
                        "file_format": "csv",
                        "spark_options": {"header": "true"},
                    },
                    "params": {"dataset_name": "test_job", "primary_keys": ["id"]},
                }
            ],
            "output_config": {
                "output_dir": "./out",
                "output_file_format": "parquet",
                "spark_options": {"compression": "snappy"},
                "no_of_partitions": -1,
            },
        }
    )
    assert isinstance(config, ComparisonJobConfig)
    assert config.job_name == "test_job"
    assert len(config.dataset_configs) == 1
    ds = config.dataset_configs[0]
    assert ds.source_config.file_format == "csv"
    assert ds.source_config.spark_options == {"header": "true"}
    assert ds.params.primary_keys == ["id"]
    assert ds.params.test_params.difference_tolerance == 0.0
    assert config.output_config.spark_options == {"compression": "snappy"}


def test_defaults_applied():
    params = dict_to_dataclass(
        DatasetParams, {"dataset_name": "d", "primary_keys": ["id"]}
    )
    assert params.select_cols == ["*"]
    assert params.drop_cols == []
    assert isinstance(params.test_params, TestParams)
    assert params.test_params.checksum_mode == "sha256"
