"""Source/sink coverage beyond parquet (SURVEY.md §2.1).

The reference reads any DataFrameReader format via per-source options
(io_utils.py:36-38; README shows csv with header). These helpers add
explicit-schema readers (schema inference is a full extra pass over the
data — never acceptable at 100 TB) and driver-contract queries proving
CSV sink→source and JSON codec fidelity.
"""

import hashlib

import pyspark.sql.functions as F

from spark_data_test_spark.operators.relational import cents, query, t


def read_csv(spark, path, schema=None, **options):
    """CSV with explicit schema by default; inference only if asked."""
    reader = spark.read.options(**{"header": "true", **options})
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark, path, schema=None, **options):
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


@query(
    "source_csv_roundtrip",
    """
    SELECT p_brand, COUNT(*) AS cnt,
           CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS total_size
    FROM part GROUP BY p_brand
    """,
)
def source_csv_roundtrip(spark, sf_dir):
    """S2/S4 with the csv format: write part (int/string columns) to a
    scratch csv with options, read it back with an explicit schema, and
    aggregate — the oracle aggregates the original parquet, so any
    fidelity loss in the csv sink/source fails the hash."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = f"/tmp/spark_graft_csv/{digest}/part"
    (
        p.write.mode("overwrite")
        .options(header="true", delimiter="|")
        .csv(path)
    )
    back = read_csv(
        spark,
        path,
        schema="p_partkey bigint, p_brand string, p_size int",
        delimiter="|",
    )
    return back.groupBy("p_brand").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("p_size").cast("long")).alias("total_size"),
    )


@query(
    "source_json_roundtrip",
    """
    SELECT event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY event_type
    """,
)
def source_json_roundtrip(spark, sf_dir):
    """JSON codec both directions without touching disk: rows ->
    to_json(struct) -> from_json -> fields -> aggregate. Metric goes
    through integer cents *before* serialization so the round trip is
    exact."""
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        F.to_json(
            F.struct(
                F.col("event_type"), cents(F.col("value")).alias("value_cents")
            )
        ).alias("js"),
    )
    parsed = ev.select(
        F.from_json(
            F.col("js"), "event_type string, value_cents bigint"
        ).alias("r")
    )
    return parsed.groupBy(F.col("r.event_type").alias("event_type")).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("r.value_cents")).alias("value_cents"),
    )
