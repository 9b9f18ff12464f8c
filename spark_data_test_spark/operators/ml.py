"""Distributed model TRAINING as aggregation (north-star extension).

`text_quality_model_score` is the inference half of the classifier
pattern; this module is the training half for the models that admit a
closed form: ordinary least squares needs only the moment sums
(n, Σx, Σy, Σxy, Σx²) — each an exact integer over integer features,
each map-side-combinable — so "training" is ONE aggregate pass over any
number of rows followed by O(1) driver-free arithmetic. That is the
maximally scalable learner: no iterations, no parameter broadcast, no
Python in the loop; 100 TB trains in exactly one scan.

Determinism: every sum is an exact int64; the emitted coefficients are
single IEEE divisions of identical integer operands in both engines,
so the model is bit-identical — the same property the scoring query
relies on (and why gradient-descent training, whose float accumulation
is order-dependent, is NOT expressible as an oracle-checked query).
"""

import pyspark.sql.functions as F

from spark_data_test_spark.operators.relational import query, t


@query(
    "ml_linear_regression_train",
    """
    WITH feat AS (
      SELECT (length(trim(text)) - length(replace(trim(text), ' ', ''))) + 1
               AS x,
             length(text) AS y
      FROM documents),
    moments AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM feat)
    SELECT n, sx, sy, sxy, sxx,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
           (CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept,
           -- squares leave int64 range (cov_n^2 ~ 1e24): cast each
           -- exact int64 factor to double FIRST (Spark would wrap,
           -- DuckDB would promote to HUGEINT — divergent), then
           -- multiply in IEEE space identically on both engines
           (CAST(n * sxy - sx * sy AS DOUBLE)
              * CAST(n * sxy - sx * sy AS DOUBLE))
             / (CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE))
             AS r_squared
    FROM moments
    """,
)
def ml_linear_regression_train(spark, sf_dir):
    """Train y = slope*x + intercept (document length on word count) by
    closed-form OLS over exact integer moment sums. slope and r² are
    ratios of integer cross-moments (the textbook n·Σxy − Σx·Σy form —
    means are never materialized, so no catastrophic float
    cancellation); the intercept reuses the same integer operands. The
    one aggregate is map-side combinable; the output is one row — the
    trained model, ready to broadcast into a scorer exactly like
    `text_quality_model_score` consumes its weights."""
    feat = t(spark, sf_dir, "documents").select(
        (
            F.length(F.trim(F.col("text")))
            - F.length(F.replace(F.trim(F.col("text")), F.lit(" "), F.lit("")))
            + 1
        ).alias("x"),
        F.length("text").alias("y"),
    )
    m = feat.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_n = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n.cast("double") / var_n.cast("double")
    return m.select(
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("intercept"),
        (
            (cov_n.cast("double") * cov_n.cast("double"))
            / (var_n.cast("double") * vary_n.cast("double"))
        ).alias("r_squared"),
    )
