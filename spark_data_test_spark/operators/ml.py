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
    -- every cross-product is formed in DOUBLE from the exact int64
    -- sums: int64 products overflow at moderate corpora (sy*sy passes
    -- 2^63 around 10M average documents) and the engines diverge there
    -- (Spark wraps or throws by ANSI mode, DuckDB promotes to
    -- HUGEINT). Converting each SUM first (exact while < 2^53) and
    -- multiplying in IEEE space is overflow-proof and runs the
    -- identical op tree on both engines — bit-deterministic always,
    -- exact at any corpus this data model reaches.
    SELECT n, sx, sy, sxy, sxx,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
           (CAST(sy AS DOUBLE)
              - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept,
           ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS r_squared
    FROM moments
    """,
)
def ml_linear_regression_train(spark, sf_dir):
    """Train y = slope*x + intercept (document length on word count) by
    closed-form OLS over exact integer moment sums. slope and r² are
    ratios of cross-moments in the textbook n·Σxy − Σx·Σy form (means
    are never materialized); the sums stay exact int64 while the
    cross-products are formed in double — exact while the sums are
    below 2^53 and overflow-proof beyond (int64 products would wrap or
    throw around 10M average documents; go decimal sums past 2^63 row
    mass). The intercept reuses the same operands. The
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
    return ols_fit(feat, "x", "y")


def ols_fit(df, x_col, y_col):
    """Library operator: closed-form simple OLS of ``y_col`` on
    ``x_col`` (both integer columns) — returns a one-row DataFrame
    (n, sx, sy, sxy, sxx, slope, intercept, r_squared). One map-side-
    combinable aggregate over any row count; cross-moments form in
    double from the exact int64 sums (overflow-proof, bit-deterministic
    — see the query docstring)."""
    feat = df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
    m = feat.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    # cross-moments in double from exact int64 sums — see the SQL
    # comment: int64 products overflow and diverge across engines; the
    # double op tree is overflow-proof and identical on both sides
    nd, sxd, syd = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxyd, sxxd, syyd = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    cov_n = nd * sxyd - sxd * syd
    var_n = nd * sxxd - sxd * sxd
    vary_n = nd * syyd - syd * syd
    slope = cov_n / var_n
    return m.select(
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        slope.alias("slope"),
        ((syd - slope * sxd) / nd).alias("intercept"),
        ((cov_n * cov_n) / (var_n * vary_n)).alias("r_squared"),
    )
