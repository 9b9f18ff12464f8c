"""dict → dataclass hydration.

The reference delegates this to the ``dacite`` package
(/root/reference/spark_data_test/utils/config_reader.py:4-12). That
dependency is not available here, so this is a small hand-rolled
recursive hydrator with the same observable behavior for the config
shapes the library uses: nested dataclasses, lists of dataclasses,
plain dict/list/scalar passthrough, defaults for missing fields, and
``ValueError`` on an empty config.
"""

import dataclasses
import typing

from spark_data_test_spark.entities.config import (
    ComparisonJobConfig,
    DatasetConfig,
    DataframeConfig,
)

# Field-name → element dataclass for list fields (the reference's config
# schema has exactly one: ComparisonJobConfig.dataset_configs).
_LIST_ELEMENT_TYPES = {"dataset_configs": DatasetConfig}


def dict_to_dataclass(data_class, data_dict):
    """Recursively hydrate ``data_class`` from a plain dict."""
    if dataclasses.is_dataclass(data_class) and isinstance(data_dict, data_class):
        return data_dict
    if not isinstance(data_dict, dict):
        raise ValueError(
            f"expected dict for {data_class.__name__}, got {type(data_dict).__name__}"
        )
    kwargs = {}
    hints = typing.get_type_hints(data_class)
    for f in dataclasses.fields(data_class):
        if f.name not in data_dict:
            continue
        value = data_dict[f.name]
        ftype = hints.get(f.name, f.type)
        if dataclasses.is_dataclass(ftype) and isinstance(value, dict):
            value = dict_to_dataclass(ftype, value)
        elif isinstance(value, list):
            elem_type = _LIST_ELEMENT_TYPES.get(f.name)
            if elem_type is None:
                args = typing.get_args(ftype)
                if args and dataclasses.is_dataclass(args[0]):
                    elem_type = args[0]
            if elem_type is not None:
                value = [
                    dict_to_dataclass(elem_type, v) if isinstance(v, dict) else v
                    for v in value
                ]
        kwargs[f.name] = value
    return data_class(**kwargs)


def parse_comparison_job_config(config):
    """Parse a raw job-config dict; mirrors reference config_reader.py:4-8."""
    if not config:
        raise ValueError("Configuration dictionary cannot be empty")
    return dict_to_dataclass(ComparisonJobConfig, config)
