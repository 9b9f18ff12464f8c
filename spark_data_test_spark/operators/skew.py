"""Skew-mitigation utilities (100 TB posture, SURVEY.md §4 hazards).

AQE's runtime skew-join splitting (enabled by default in
``utils/spark_utils.get_session``) handles most skew transparently;
these utilities are the explicit fallbacks for cases AQE can't fix:

* ``salted_groupby``  — two-phase aggregation for hot grouping keys:
  partial-aggregate on (key, salt), then final-aggregate on key. The
  hot key's rows spread over ``n_salt`` reducers in phase one.
* ``salted_join``     — replicate the (small-but-not-broadcastable)
  right side ``n_salt`` times; each left row picks one replica via a
  deterministic hash. The hot join key fans out over ``n_salt``
  partitions instead of hammering one.

Both are exact rewrites: results equal the unsalted operator
(asserted in tests/test_skew.py).
"""

import pyspark.sql.functions as F

_SALT_COL = "_salt"


def _row_salt(df, n_salt):
    """Deterministic per-row salt from a 64-bit hash of all columns."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))


def salted_groupby(df, keys, aggs, n_salt=16):
    """Two-phase aggregation.

    ``aggs``: dict of output_name -> ("sum"|"count", column_expr).
    Phase 1 computes partials per (keys, salt); phase 2 combines per
    keys. Only algebraic aggregates (sum/count) are supported — exactly
    the ones whose partials compose.
    """
    partial_exprs = []
    final_exprs = []
    for name, (kind, col) in aggs.items():
        if kind == "count":
            partial_exprs.append(F.count(col).alias(f"_p_{name}"))
        elif kind == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{name}"))
        else:
            raise ValueError(f"unsupported aggregate kind: {kind}")
        final_exprs.append(F.sum(F.col(f"_p_{name}")).alias(name))
    phase1 = (
        df.withColumn(_SALT_COL, _row_salt(df, n_salt))
        .groupBy(*keys, _SALT_COL)
        .agg(*partial_exprs)
    )
    return phase1.groupBy(*keys).agg(*final_exprs)


_SALTED_JOIN_TYPES = {"inner", "left", "left_outer", "leftouter", "left_semi", "left_anti"}


def salted_join(left, right, keys, n_salt=16, how="inner"):
    """Skew-safe equi-join: right side replicated n_salt times, left
    rows routed to one replica by hash. Exact for any key multiplicity
    (every left row sees the full right-side content for its key).

    Only left-preserving join types are exact under replication — a
    right/full outer join would surface each unmatched right row once
    per replica, so those types are rejected.
    """
    if how not in _SALTED_JOIN_TYPES:
        raise ValueError(
            f"salted_join supports {sorted(_SALTED_JOIN_TYPES)}; got {how!r} "
            "(right/full outer would duplicate unmatched right rows per salt)"
        )
    salts = left.sparkSession.range(n_salt).select(
        F.col("id").cast("int").alias(_SALT_COL)
    )
    right_rep = right.crossJoin(F.broadcast(salts))
    left_salted = left.withColumn(
        _SALT_COL, _row_salt(left, n_salt).cast("int")
    )
    joined = left_salted.join(right_rep, keys + [_SALT_COL], how)
    return joined.drop(_SALT_COL)


from spark_data_test_spark.operators.relational import cents, query, t  # noqa: E402


@query(
    "skew_salted_join_agg",
    """
    SELECT o.o_orderstatus, COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def skew_salted_join_agg(spark, sf_dir):
    """Driver-checked proof that salting is an EXACT rewrite: the
    lineitem-orders join runs through salted_join (orders replicated
    n_salt ways, each lineitem row routed to one replica by hash) and
    must hash-match the plain-join oracle. On skew-free data salting
    only costs the replication; on a hot orderkey it is what keeps one
    reducer from receiving the whole key when AQE's runtime splitting
    can't apply (e.g. pre-AQE checkpoints, non-shuffle children)."""
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        cents(F.col("l_extendedprice")).alias("pc"),
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    joined = salted_join(li, o, keys=["o_orderkey"], n_salt=8)
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("pc").alias("price_cents"),
    )
