"""Arrow-batched Python APIs: grouped applyInPandas and scalar
pandas_udf (north-star plumbing).

These are the sanctioned Python escape hatches when Catalyst can't
express a computation: columnar Arrow transfer, vectorized pandas per
batch/group — never row-at-a-time Python. Both queries are
deterministic and oracle-checked, proving the Arrow path end-to-end.
"""

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from spark_data_test_spark.operators.relational import query, t

_STATS_SCHEMA = (
    "user_id long, n_events long, first_us long, last_us long, value_cents bigint"
)


def _user_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    ts = pdf["ts_us"]
    cents = (pdf["value"] * 100).round().astype("int64")
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [len(pdf)],
            "first_us": [int(ts.min())],
            "last_us": [int(ts.max())],
            "value_cents": [int(cents.sum())],
        }
    )


@query(
    "grouped_apply_stats",
    """
    SELECT user_id, COUNT(*) AS n_events,
           MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY user_id
    """,
)
def grouped_apply_stats(spark, sf_dir):
    """applyInPandas: each user's events arrive as one pandas frame
    (grouped-map Arrow transfer); emits one summary row per group.
    pandas round() is banker's rounding — ``.round()`` on the *scaled*
    value matches SQL ROUND here because the synthetic values have 2
    decimals (no .5 ties at the 3rd decimal); real pipelines should
    pre-scale in Spark as done for every cents column."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "value"
    )
    return ev.groupBy("user_id").applyInPandas(_user_stats, schema=_STATS_SCHEMA)


@pandas_udf(LongType())
def _vectorized_token_count(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized scalar UDF: whitespace token count per value."""
    return texts.str.strip().str.count(" ") + 1


@query(
    "pandas_udf_tokens",
    """
    SELECT doc_id,
           (length(trim(text)) - length(replace(trim(text), ' ', ''))) + 1
             AS py_tokens
    FROM documents
    """,
)
def pandas_udf_tokens(spark, sf_dir):
    """Scalar pandas_udf over documents — the vectorized Python scalar
    path (contrast with text_token_count, the pure-Catalyst version of
    the same computation; both must agree with the oracle)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", _vectorized_token_count(F.col("text")).alias("py_tokens")
    )
