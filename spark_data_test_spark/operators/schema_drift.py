"""Schema-drift detection — a validation-engine extension.

The reference compares values assuming aligned schemas; at pipeline
scale the *schema* drifts first (columns added/dropped, types widened).
``compare_schemas`` reports per-column status before any data is read —
a driver-side operation on catalog metadata, free at any data scale.
"""

import pyspark.sql.functions as F

from spark_data_test_spark.utils.spark_utils import local_df
from pyspark.sql.types import StringType, StructField, StructType

from spark_data_test_spark.operators.relational import query, t

MATCHED = "MATCHED"
TYPE_MISMATCH = "TYPE_MISMATCH"
MISSING_AT_SOURCE = "MISSING_AT_SOURCE"
MISSING_AT_TARGET = "MISSING_AT_TARGET"

_SCHEMA = StructType(
    [
        StructField("column_name", StringType(), False),
        StructField("source_type", StringType(), True),
        StructField("target_type", StringType(), True),
        StructField("status", StringType(), False),
    ]
)


def compare_schemas(spark, source_df, target_df):
    """Per-column drift report as a DataFrame.

    Pure metadata — no jobs launched; the result is a 1-partition local
    frame regardless of input size. Duplicate column names (legal in
    Spark after joins) would silently collapse in a name-keyed report,
    hiding exactly the conflicts this exists to catch — rejected.
    """

    def _fields(df, side):
        names = [f.name for f in df.schema.fields]
        if len(names) != len(set(names)):
            dupes = sorted({n for n in names if names.count(n) > 1})
            raise ValueError(
                f"{side} schema has duplicate column names {dupes}; "
                "disambiguate (alias) before drift comparison"
            )
        return {f.name: f.dataType.simpleString() for f in df.schema.fields}

    src = _fields(source_df, "source")
    tgt = _fields(target_df, "target")
    rows = []
    for name in sorted(set(src) | set(tgt)):
        s, g = src.get(name), tgt.get(name)
        if s is None:
            status = MISSING_AT_SOURCE
        elif g is None:
            status = MISSING_AT_TARGET
        elif s != g:
            status = TYPE_MISMATCH
        else:
            status = MATCHED
        rows.append((name, s, g, status))
    return local_df(spark, rows, _SCHEMA)


@query(
    "schema_drift_report",
    """
    SELECT * FROM (VALUES
      ('o_custkey',      'bigint', 'bigint', 'MATCHED'),
      ('o_orderdate',    'timestamp', 'timestamp', 'MATCHED'),
      ('o_orderkey',     'bigint', 'bigint', 'MATCHED'),
      ('o_orderpriority','string', NULL,     'MISSING_AT_TARGET'),
      ('o_orderstatus',  'string', 'string', 'MATCHED'),
      ('o_totalprice',   'double', 'string', 'TYPE_MISMATCH')
    ) AS v(column_name, source_type, target_type, status)
    """,
)
def schema_drift_report(spark, sf_dir):
    """Drift between orders and a drifted copy (priority dropped,
    totalprice stringified). The oracle is the literal expected report —
    schema facts, not data."""
    o = t(spark, sf_dir, "orders")
    drifted = o.drop("o_orderpriority").withColumn(
        "o_totalprice", F.col("o_totalprice").cast("string")
    )
    return compare_schemas(spark, o, drifted)
