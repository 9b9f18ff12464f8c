"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the comparison engine's
flattened overall report over a perturbed orders pair at sf0.001).
``queries()`` exposes every implemented operator from SURVEY.md §2 plus
the north-star extensions; ``oracle_sql()`` the matching DuckDB SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    import spark_data_test_spark.operators.relational as relational
    import spark_data_test_spark.operators.comparison_queries  # noqa: F401 (registers)

    # Only genuinely optional third-party deps may be absent; an
    # ImportError from our own modules (typo, circular import) must
    # surface, not silently shrink the query registry.
    optional_deps = {"pandas", "pyarrow", "numpy", "PIL"}
    for mod_name in (
        "spark_data_test_spark.operators.relational_ext",
        "spark_data_test_spark.operators.schema_drift",
        "spark_data_test_spark.sources.readers",
        "spark_data_test_spark.operators.analytics",
        "spark_data_test_spark.operators.grouped",
        "spark_data_test_spark.operators.dedup",
        "spark_data_test_spark.operators.similarity",
        "spark_data_test_spark.operators.text",
        "spark_data_test_spark.operators.multimodal",
        "spark_data_test_spark.streaming.windows",
    ):
        try:
            __import__(mod_name)
        except ImportError as exc:
            root = (exc.name or "").split(".")[0]
            if root not in optional_deps:
                raise
    return relational.QUERIES, relational.ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    queries_map, _ = _registry()
    return queries_map["compare_overall_report"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    queries_map, _ = _registry()
    return dict(queries_map)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get
    the driver's weaker rows-only check)."""
    _, oracles_map = _registry()
    return dict(oracles_map)
