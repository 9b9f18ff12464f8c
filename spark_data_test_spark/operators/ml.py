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
relies on. Plain float gradient descent, whose float accumulation is
order-dependent, is NOT expressible as an oracle-checked query — but
`ml_logistic_quality_train` below shows the two substitutions that
make iterative training expressible anyway: a rational (exp-free)
sigmoid and per-row integer-rounded residuals summed exactly.
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


# ---------------------------------------------------------------------------
# Pairwise Pearson correlation matrix in ONE aggregate pass
# ---------------------------------------------------------------------------

_CORR_FEATURES = [
    # (name, exact-integer SQL feature over lineitem)
    ("qty", "CAST(ROUND(l_quantity) AS BIGINT)"),
    ("price", "CAST(ROUND(l_extendedprice) AS BIGINT)"),
    ("disc", "CAST(ROUND(l_discount * 100) AS BIGINT)"),
    ("tax", "CAST(ROUND(l_tax * 100) AS BIGINT)"),
]

_CORR_PAIRS = [
    (a, b)
    for i, (a, _) in enumerate(_CORR_FEATURES)
    for (b, _) in _CORR_FEATURES[i + 1 :]
]


def _corr_matrix_sql():
    """Oracle: the same moments CTE + per-pair corr rows (UNION ALL)."""
    feats = ",\n             ".join(f"{expr} AS {n}" for n, expr in _CORR_FEATURES)
    moment_cols = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for n, _ in _CORR_FEATURES:
        moment_cols.append(f"CAST(SUM({n}) AS BIGINT) AS s_{n}")
        moment_cols.append(f"CAST(SUM({n} * {n}) AS BIGINT) AS ss_{n}")
    for a, b in _CORR_PAIRS:
        moment_cols.append(f"CAST(SUM({a} * {b}) AS BIGINT) AS sp_{a}_{b}")
    rows = []
    for a, b in _CORR_PAIRS:
        cov = (
            f"(CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        )
        var_a = (
            f"(CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
        )
        var_b = (
            f"(CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)"
            f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        )
        rows.append(
            f"SELECT '{a}' AS var_a, '{b}' AS var_b, n,\n"
            f"       {cov} / sqrt({var_a} * {var_b}) AS corr\n"
            f"FROM moments"
        )
    union = "\n    UNION ALL\n    ".join(rows)
    return f"""
    WITH feat AS (
      SELECT {feats}
      FROM lineitem),
    moments AS (
      SELECT {', '.join(moment_cols)}
      FROM feat)
    SELECT var_a, var_b, n, corr FROM (
      {union}
    ) ORDER BY var_a, var_b
    """


@query("lineitem_correlation_matrix", _corr_matrix_sql())
def lineitem_correlation_matrix(spark, sf_dir):
    """Pairwise Pearson correlation over the four lineitem metrics in
    ONE map-side-combinable aggregate: 15 exact-int64 moment sums
    (n, 4 sums, 4 sums-of-squares, 6 cross sums), then each of the 6
    correlations is formed driver-free from the one-row moment frame in
    double space — the n·Σxy − Σx·Σy textbook shape of `ols_fit`, with
    IEEE sqrt (correctly rounded, so bit-identical across engines).
    The single scan + single 1-row shuffle is the minimal plan for a
    full correlation matrix at any scale; features are small exact ints
    (≤1e7), so the squared sums stay below 2^63 past 1e8 rows and the
    double cross-products are overflow-proof beyond (same boundary
    discussion as `ml_linear_regression_train`). The feature-pair
    expansion is column-wise (k²/2 extra AGGREGATE COLUMNS, zero extra
    rows or shuffles) — at 100 TB this is exactly one pass."""
    feat = t(spark, sf_dir, "lineitem").selectExpr(
        *[f"{expr} AS {n}" for n, expr in _CORR_FEATURES]
    )
    return corr_matrix(feat, [n for n, _ in _CORR_FEATURES]).orderBy(
        "var_a", "var_b"
    )


def corr_matrix(df, cols):
    """Library operator: pairwise Pearson correlations of the integer
    columns ``cols`` in ONE map-side-combinable aggregate — k(k+3)/2+1
    exact-int64 moment sums (n, per-column sums and sums of squares,
    per-pair cross sums), then every correlation is formed driver-free
    from the one-row moment frame in double space (the n·Σxy − Σx·Σy
    shape of `ols_fit`, IEEE sqrt). Returns (var_a, var_b, n, corr)
    rows, one per unordered column pair. The pair expansion is
    column-wise — zero extra rows or shuffles — so the full matrix of
    any row count is exactly one scan."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    for a, b in pairs:
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    m = df.agg(*aggs)
    nd = F.col("n").cast("double")
    # one exploded struct array, NOT a k²-way union of m: a union would
    # plant one copy of the scan+aggregate subtree per pair
    pair_structs = []
    for a, b in pairs:
        cov = nd * F.col(f"sp_{a}_{b}").cast("double") - F.col(
            f"s_{a}"
        ).cast("double") * F.col(f"s_{b}").cast("double")
        var_a = nd * F.col(f"ss_{a}").cast("double") - F.col(
            f"s_{a}"
        ).cast("double") * F.col(f"s_{a}").cast("double")
        var_b = nd * F.col(f"ss_{b}").cast("double") - F.col(
            f"s_{b}"
        ).cast("double") * F.col(f"s_{b}").cast("double")
        pair_structs.append(
            F.struct(
                F.lit(a).alias("var_a"),
                F.lit(b).alias("var_b"),
                F.col("n").alias("n"),
                (cov / F.sqrt(var_a * var_b)).alias("corr"),
            )
        )
    return m.select(F.explode(F.array(*pair_structs)).alias("r")).select(
        "r.var_a", "r.var_b", "r.n", "r.corr"
    )


_GD_ITERS = 2  # unrolled in the oracle CTE chain, like the kmeans rounds
_GD_LR_NUM = 4  # integer learning rate: w += (4 * g) div n, micro-units

_GD_FEAT_SQL = """feat AS (
  SELECT CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END AS y,
         CASE WHEN length(text) - length(replace(text, ' ', '')) + 1 >= 60
              THEN 1 ELSE 0 END AS x1,
         CASE WHEN ' ' || text || ' ' LIKE '% the %' THEN 1 ELSE 0 END AS x2,
         CASE WHEN ' ' || text || ' ' LIKE '% data %' THEN 1 ELSE 0 END AS x3
  FROM documents)"""


def _gd_ctes(iters=_GD_ITERS):
    """DuckDB CTE chain replaying the logistic trainer exactly:
    zero-init weights, ``iters`` unrolled gradient steps (per-row
    integer-rounded residuals, exact integer sums, truncating integer
    update) — the same unroll pattern `_kmeans_ctes` uses."""
    ctes = [
        "winit AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,"
        " CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM feat)",
    ]
    prev = "winit"
    for r in range(1, iters + 1):
        ctes.append(f"""res{r} AS (
  SELECT x1, x2, x3,
         CAST(ROUND((y - (0.5 + (z / 2) / (1 + abs(z)))) * 1000000)
              AS BIGINT) AS ri
  FROM (SELECT f.y, f.x1, f.x2, f.x3,
               CAST(w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3
                    AS DOUBLE) / 1000000 AS z
        FROM feat f CROSS JOIN {prev} w)),
g{r} AS (
  SELECT CAST(SUM(ri) AS BIGINT) AS g0,
         CAST(SUM(CASE WHEN x1 = 1 THEN ri ELSE 0 END) AS BIGINT) AS g1,
         CAST(SUM(CASE WHEN x2 = 1 THEN ri ELSE 0 END) AS BIGINT) AS g2,
         CAST(SUM(CASE WHEN x3 = 1 THEN ri ELSE 0 END) AS BIGINT) AS g3
  FROM res{r}),
w{r} AS (
  SELECT w.w0 + ({_GD_LR_NUM} * g.g0) // nn.n AS w0,
         w.w1 + ({_GD_LR_NUM} * g.g1) // nn.n AS w1,
         w.w2 + ({_GD_LR_NUM} * g.g2) // nn.n AS w2,
         w.w3 + ({_GD_LR_NUM} * g.g3) // nn.n AS w3
  FROM {prev} w CROSS JOIN g{r} g CROSS JOIN nn)""")
        prev = f"w{r}"
    return ",\n".join(ctes)




def _tdiv(a, b):
    """Truncating integer division (toward zero) — matches Spark's
    `div` and DuckDB's BIGINT `//`; Python's // floors instead."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _logistic_feat(spark, sf_dir):
    """The (y, x1, x2, x3) feature frame both logistic queries share."""
    return t(spark, sf_dir, "documents").select(
        F.when(F.col("n_chars") >= 400, 1).otherwise(0).alias("y"),
        F.when(
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
            >= 60,
            1,
        )
        .otherwise(0)
        .alias("x1"),
        F.when(
            F.concat(F.lit(" "), F.col("text"), F.lit(" ")).like("% the %"), 1
        )
        .otherwise(0)
        .alias("x2"),
        F.when(
            F.concat(F.lit(" "), F.col("text"), F.lit(" ")).like("% data %"),
            1,
        )
        .otherwise(0)
        .alias("x3"),
    )


# (applicationId, sf_dir) -> trained weights: both logistic queries
# derive byte-identical weights, so a session running them back to
# back (they are adjacent in the bench headline and driver window)
# pays the _GD_ITERS aggregate passes once — same pattern as the
# trained-centroid memo in similarity.py.
_LOGISTIC_MEMO = {}


def clear_ml_cache():
    """Release the trained-weight memo (bench harness hook — cleared
    between timing passes like every other session memo cache)."""
    _LOGISTIC_MEMO.clear()


def _fit_logistic(feat, sf_dir=None):
    """The integer-exact GD loop (see `ml_logistic_quality_train`):
    `_GD_ITERS` aggregate passes, each collecting the 4-scalar weight
    model card to the driver (bounded, like the simhash centering
    vector) and advancing by a truncating integer step."""
    key = None
    if sf_dir is not None:
        key = (feat.sparkSession.sparkContext.applicationId, sf_dir)
        if key in _LOGISTIC_MEMO:
            return list(_LOGISTIC_MEMO[key])
    w = [0, 0, 0, 0]
    for _ in range(_GD_ITERS):
        ri = (
            f"cast(round((y - (0.5 + (z / 2) / (1 + abs(z)))) * 1000000)"
            f" as bigint)"
        )
        z = (
            f"cast({w[0]} + {w[1]} * x1 + {w[2]} * x2 + {w[3]} * x3"
            f" as double) / 1000000"
        )
        row = (
            feat.selectExpr("y", "x1", "x2", "x3", f"{z} as z")
            .selectExpr("x1", "x2", "x3", f"{ri} as ri")
            .agg(
                F.sum("ri").alias("g0"),
                F.sum(F.expr("case when x1 = 1 then ri else 0 end")).alias(
                    "g1"
                ),
                F.sum(F.expr("case when x2 = 1 then ri else 0 end")).alias(
                    "g2"
                ),
                F.sum(F.expr("case when x3 = 1 then ri else 0 end")).alias(
                    "g3"
                ),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        n = int(row["n"])
        g = [int(row[f"g{j}"]) for j in range(4)]
        w = [w[j] + _tdiv(_GD_LR_NUM * g[j], n) for j in range(4)]
    if key is not None:
        _LOGISTIC_MEMO[key] = list(w)
    return w


@query(
    "ml_logistic_quality_train",
    f"""
    WITH {_GD_FEAT_SQL},
    {_gd_ctes()}
    SELECT nn.n,
           w.w0 AS w0_1e6, w.w1 AS w1_1e6,
           w.w2 AS w2_1e6, w.w3 AS w3_1e6,
           s.n_correct,
           (100 * s.n_correct) // nn.n AS accuracy_pct
    FROM w{_GD_ITERS} w
    CROSS JOIN nn
    CROSS JOIN (
      SELECT CAST(SUM(CASE WHEN (zi >= 0) = (y = 1) THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_correct
      FROM (SELECT f.y,
                   w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 AS zi
            FROM feat f CROSS JOIN w{_GD_ITERS} w)) s
    """,
)
def ml_logistic_quality_train(spark, sf_dir):
    """Train a LOGISTIC quality classifier in-engine with gradient
    descent that is bit-deterministic BY CONSTRUCTION — the iterative
    trainer this module's header says plain float GD cannot give you,
    made expressible by two substitutions: (1) the link is the
    RATIONAL sigmoid 0.5 + (z/2)/(1+|z|) — same shape, monotone, no
    exp(), so both engines run the identical IEEE op tree instead of
    trusting libm to agree; (2) each row's residual is rounded to
    integer micro-units BEFORE accumulation, so the gradient is an
    exact int64 sum — order-independent, map-side combinable, immune
    to float reduction order. Weights live in integer micro-units and
    advance by a truncating integer step (w += (4·g) div n), so the
    whole training trajectory is integer-exact; the oracle unrolls the
    two steps as CTEs exactly like the kmeans chain. The task is
    weak-supervision quality filtering (fastText-style): label =
    long-form document (n_chars >= 400), features = bias + word-count
    band + two token indicators; training reaches ~84% on the
    synthetic corpus. Per step: ONE aggregate scan (the 4-scalar
    weight 'model card' rides the driver like the simhash centering
    vector); the final row carries n, the trained weights, and an
    integer accuracy readout — at 100 TB each step is one map-side-
    combined pass, and nothing about the arithmetic changes."""
    feat = _logistic_feat(spark, sf_dir).persist()

    try:
        w = _fit_logistic(feat, sf_dir)
        zi = f"{w[0]} + {w[1]} * x1 + {w[2]} * x2 + {w[3]} * x3"
        return feat.selectExpr("y", f"({zi}) as zi").agg(
            F.count(F.lit(1)).alias("n"),
            F.lit(w[0]).cast("long").alias("w0_1e6"),
            F.lit(w[1]).cast("long").alias("w1_1e6"),
            F.lit(w[2]).cast("long").alias("w2_1e6"),
            F.lit(w[3]).cast("long").alias("w3_1e6"),
            F.sum(
                F.expr("case when (zi >= 0) = (y = 1) then 1 else 0 end")
            ).cast("long").alias("n_correct"),
        ).selectExpr(
            "n",
            "w0_1e6",
            "w1_1e6",
            "w2_1e6",
            "w3_1e6",
            "n_correct",
            "(100 * n_correct) div n as accuracy_pct",
        )
    finally:
        feat.unpersist()


@query(
    "ml_logistic_calibration",
    f"""
    WITH {_GD_FEAT_SQL},
    {_gd_ctes()}
    SELECT f.x1, f.x2, f.x3,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(f.y) AS BIGINT) AS n_pos,
           CAST(ROUND((0.5 + (z / 2) / (1 + abs(z))) * 1000000) AS BIGINT)
             AS p_pred_1e6,
           CAST(ROUND(1000000.0 * SUM(f.y) / COUNT(*)) AS BIGINT)
             AS p_obs_1e6
    FROM (SELECT f.*,
                 CAST(w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3
                      AS DOUBLE) / 1000000 AS z
          FROM feat f CROSS JOIN w{_GD_ITERS} w) f
    GROUP BY f.x1, f.x2, f.x3, z
    ORDER BY f.x1, f.x2, f.x3
    """,
)
def ml_logistic_calibration(spark, sf_dir):
    """CALIBRATION readout for the trained logistic quality classifier
    — the eval a weak-supervision pipeline runs before trusting model
    scores as sampling weights: per feature cell (all three indicators
    are binary, so the model's prediction is constant within a cell),
    the predicted probability under the trained weights next to the
    observed positive rate. A well-calibrated cell has the two within
    noise; a badly-lr'd or under-trained model shows systematic gaps.
    Reuses the exact integer-GD trajectory (`_fit_logistic`) so the
    weights here are bit-identical to `ml_logistic_quality_train`'s,
    and the DuckDB oracle re-derives them through the same unrolled
    CTE chain — one aggregate pass over the corpus after training,
    grouped on the (at most 2^3) feature cells, everything emitted in
    integer micro-units."""
    feat = _logistic_feat(spark, sf_dir).persist()
    try:
        w = _fit_logistic(feat, sf_dir)
        z = (
            f"cast({w[0]} + {w[1]} * x1 + {w[2]} * x2 + {w[3]} * x3"
            f" as double) / 1000000"
        )
        return (
            feat.selectExpr("y", "x1", "x2", "x3", f"{z} as z")
            .groupBy("x1", "x2", "x3", "z")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("y").cast("long").alias("n_pos"),
            )
            .selectExpr(
                "x1",
                "x2",
                "x3",
                "n",
                "n_pos",
                "cast(round((0.5 + (z / 2) / (1 + abs(z))) * 1000000)"
                " as bigint) as p_pred_1e6",
                "cast(round(1000000.0 * n_pos / n) as bigint) as p_obs_1e6",
            )
            .orderBy("x1", "x2", "x3")
        )
    finally:
        feat.unpersist()


def logit_fit(df, x_cols, y_col, iters=2, lr_num=4):
    """Library operator: distributed logistic regression with the
    bit-deterministic integer-GD trajectory of
    `ml_logistic_quality_train`, generalized to ANY integer feature
    columns. Same two substitutions that make iterative training
    order-independent: the link is the rational sigmoid
    0.5 + (z/2)/(1+|z|) (no libm), and each row's residual is rounded
    to integer micro-units BEFORE accumulation, so every gradient is
    an exact int64 sum — map-side combinable, immune to float
    reduction order. Weights live in integer micro-units and advance
    by a truncating integer step w += (lr_num·g) div n. The gradient
    here is sum(x_j · ri), which on 0/1 indicator features is exactly
    the registered trainer's CASE-WHEN form (parity pinned in
    tests/test_graph_model_ext.py). Per step: ONE aggregate scan
    collecting len(x_cols)+2 scalars to the driver (the bounded
    'model card') — at 100 TB each step is one map-side-combined
    pass, and nothing about the arithmetic changes.

    Rows with a NULL label or NULL in any feature are EXCLUDED before
    training (sum() would silently skip them while count() kept them,
    skewing the n in the update step). Features should be small
    integers (cast to long internally; x·ri products must stay inside
    int64). Returns a one-row DataFrame
    (n, w0_1e6 [bias], w1_1e6..wp_1e6 [one per feature, positional],
    n_correct, accuracy_pct) — weights in integer micro-units,
    accuracy by sign agreement, truncating integer percent."""
    cols = list(x_cols)
    if not cols:
        raise ValueError("logit_fit: x_cols must be non-empty")
    if len(set(cols)) != len(cols):
        raise ValueError("logit_fit: duplicate names in x_cols")
    iters = int(iters)
    lr_num = int(lr_num)
    if iters < 1 or lr_num < 1:
        raise ValueError("logit_fit: iters and lr_num must be >= 1")
    p = len(cols)

    def _q(c):
        return "`" + c.replace("`", "``") + "`"

    xnames = [f"x{j}" for j in range(1, p + 1)]
    feat = df.select(
        F.col(_q(y_col)).cast("long").alias("y"),
        *[
            F.col(_q(c)).cast("long").alias(x)
            for c, x in zip(cols, xnames)
        ],
    )
    keep = F.col("y").isNotNull()
    for x in xnames:
        keep = keep & F.col(x).isNotNull()
    feat = feat.where(keep).persist()
    try:
        w = [0] * (p + 1)
        for _ in range(iters):
            z = (
                "cast("
                + " + ".join([str(w[0])]
                             + [f"{w[j]} * x{j}" for j in range(1, p + 1)])
                + " as double) / 1000000"
            )
            ri = (
                "cast(round((y - (0.5 + (z / 2) / (1 + abs(z))))"
                " * 1000000) as bigint)"
            )
            row = (
                feat.selectExpr("y", *xnames, f"{z} as z")
                .selectExpr(*xnames, f"{ri} as ri")
                .agg(
                    F.sum("ri").alias("g0"),
                    *[
                        F.sum(F.col(x) * F.col("ri")).alias(f"g{j}")
                        for j, x in enumerate(xnames, start=1)
                    ],
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()[0]
            )
            n = int(row["n"])
            if n == 0:
                raise ValueError("logit_fit: no non-NULL training rows")
            g = [int(row[f"g{j}"]) for j in range(p + 1)]
            w = [w[j] + _tdiv(lr_num * g[j], n) for j in range(p + 1)]
        zi = " + ".join(
            [str(w[0])] + [f"{w[j]} * x{j}" for j in range(1, p + 1)]
        )
        return (
            feat.selectExpr("y", f"({zi}) as zi")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.lit(w[j]).cast("long").alias(f"w{j}_1e6")
                    for j in range(p + 1)
                ],
                F.sum(
                    F.expr("case when (zi >= 0) = (y = 1) then 1 else 0 end")
                ).cast("long").alias("n_correct"),
            )
            .selectExpr(
                "n",
                *[f"w{j}_1e6" for j in range(p + 1)],
                "n_correct",
                "(100 * n_correct) div n as accuracy_pct",
            )
        )
    finally:
        feat.unpersist()
