"""Frame-level `dq_check` and `profile` cross-checked against
brute-force Python replicas."""

from pyspark.sql import functions as F

from spark_data_test_spark import dq_check, profile

ROWS = [
    # (id, cust, status, price)
    (1, 10, "O", 50.0),
    (2, 10, "F", 0.0),     # price range violation
    (2, 11, "O", 20.0),    # duplicate id
    (3, None, "X", 30.0),  # NULL cust + bad status
    (4, 99, "O", None),    # orphan cust + NULL price (expr -> violation)
    (5, 12, "F", 10.0),
]
CUSTS = [(10,), (11,), (12,)]


def _df(spark):
    return spark.createDataFrame(
        ROWS, "id long, cust long, status string, price double"
    )


def _rules(spark):
    return [
        {"name": "id_unique", "type": "unique", "cols": ["id"]},
        {"name": "cust_not_null", "type": "not_null", "cols": ["cust"]},
        {
            "name": "status_valid",
            "type": "expr",
            "expr": "status IN ('O', 'F', 'P')",
        },
        {"name": "price_positive", "type": "expr", "expr": "price > 0"},
        {
            "name": "cust_fk",
            "type": "fk",
            "cols": ["cust"],
            "ref": spark.createDataFrame(CUSTS, "c long"),
            "ref_cols": ["c"],
        },
    ]


def test_dq_check_matches_bruteforce(spark):
    got = {
        r.constraint_name: (r.violations, r.passed)
        for r in dq_check(_df(spark), _rules(spark)).collect()
    }
    # brute force: 1 surplus dup row; 1 NULL cust; 1 bad status;
    # price > 0 violated by 0.0 AND the NULL price (unknown never
    # passes a gate); fk orphans = the NULL cust and cust 99 (a NULL
    # key never matches, per the documented LEFT ANTI contract)
    assert got == {
        "id_unique": (1, 0),
        "cust_not_null": (1, 0),
        "status_valid": (1, 0),
        "price_positive": (2, 0),
        "cust_fk": (2, 0),
    }


def test_dq_check_all_pass_and_empty_frame(spark):
    clean = spark.createDataFrame(
        [(1, 10, "O", 5.0), (2, 11, "F", 6.0)],
        "id long, cust long, status string, price double",
    )
    got = {
        r.constraint_name: (r.violations, r.passed)
        for r in dq_check(clean, _rules(spark)).collect()
    }
    assert all(v == (0, 1) for v in got.values()), got
    # empty frame: every rule vacuously passes (coalesce guards the
    # NULL SUM) — the registered gate's contract
    empty = clean.limit(0)
    got0 = {
        r.constraint_name: (r.violations, r.passed)
        for r in dq_check(empty, _rules(spark)).collect()
    }
    assert all(v == (0, 1) for v in got0.values()), got0


def test_dq_check_composite_unique_and_fk(spark):
    df = spark.createDataFrame(
        [(1, "a", 7), (1, "a", 8), (1, "b", 9), (2, "a", 7)],
        "k1 long, k2 string, ref long",
    )
    ref = spark.createDataFrame([(7, 0), (9, 0)], "r long, pad long")
    rules = [
        {"name": "pk", "type": "unique", "cols": ["k1", "k2"]},
        {
            "name": "fk",
            "type": "fk",
            "cols": ["ref"],
            "ref": ref,
            "ref_cols": ["r"],
        },
    ]
    got = {
        r.constraint_name: r.violations
        for r in dq_check(df, rules).collect()
    }
    assert got == {"pk": 1, "fk": 1}  # one surplus (1,a); ref 8 orphan


def test_dq_check_rejects_unknown_rule(spark):
    df = spark.createDataFrame([(1,)], "id long")
    try:
        dq_check(df, [{"name": "x", "type": "median"}])
        assert False, "expected ValueError"
    except ValueError:
        pass
    try:
        dq_check(df, [])
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_profile_matches_bruteforce(spark):
    rows = [
        (1, "a", None),
        (2, "a", 5.0),
        (None, "b", 5.0),
        (None, None, 7.0),
        (2, "a", None),
    ]
    df = spark.createDataFrame(rows, "x long, s string, v double")
    got = {
        r.column_name: (r.n_nulls, r.n_distinct)
        for r in profile(df).collect()
    }
    expected = {}
    for i, c in enumerate(["x", "s", "v"]):
        vals = [r[i] for r in rows]
        expected[c] = (
            sum(1 for v in vals if v is None),
            len({v for v in vals if v is not None}),
        )
    assert got == expected
    # column subset preserves selection
    sub = {r.column_name for r in profile(df, cols=["s"]).collect()}
    assert sub == {"s"}


def test_profile_rejects_empty_column_list(spark):
    df = spark.createDataFrame([(1,)], "id long")
    try:
        profile(df, cols=[])
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_dq_check_fk_survives_ref_alias_collision(spark):
    """The fk rule's internal ref aliases must be collision-proof: a
    frame that itself carries `_ref0`-style columns (or a ref frame
    derived from df) previously made the unqualified join condition
    ambiguous (r10 advisory)."""
    df = spark.createDataFrame(
        [(1, 10, "x"), (2, 20, "x"), (3, 99, "x")],
        "id long, fk long, _ref0 string",
    )
    ref = df.where("id < 3").select(F.col("fk").alias("k"))
    out = {
        r.constraint_name: (r.violations, r.passed)
        for r in dq_check(
            df,
            [
                {"name": "fk_ok", "type": "fk", "cols": ["fk"],
                 "ref": ref, "ref_cols": ["k"]},
                {"name": "fk_self", "type": "fk", "cols": ["fk"],
                 "ref": df, "ref_cols": ["fk"]},
            ],
        ).collect()
    }
    assert out == {"fk_ok": (1, 0), "fk_self": (0, 1)}


def test_profile_duplicate_and_dotted_columns(spark):
    """Duplicate entries in cols de-duplicate instead of erroring, and
    a column whose NAME contains a dot profiles correctly (positional
    aliases + df[c] lookups, r10 advisory)."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(**{"a.b": 1, "c": None}), Row(**{"a.b": 1, "c": 2})]
    )
    got = {
        r.column_name: (r.n_nulls, r.n_distinct)
        for r in profile(df, cols=["a.b", "c", "a.b"]).collect()
    }
    assert got == {"a.b": (0, 1), "c": (1, 1)}


def test_profile_approx_tracks_exact_and_drops_expand(spark):
    """approx=True must track the exact distincts within rsd (nulls
    stay exact either way) and must plan WITHOUT the Expand row
    replication the exact multi-COUNT(DISTINCT) form pays."""
    from spark_data_test_spark.plans.audit import simple_plan

    df = spark.range(0, 5000).selectExpr(
        "id", "id % 997 AS k", "CASE WHEN id % 10 = 0 THEN NULL "
        "ELSE CAST(id % 37 AS STRING) END AS s"
    )
    exact = {
        r.column_name: (r.n_nulls, r.n_distinct)
        for r in profile(df).collect()
    }
    approx = {
        r.column_name: (r.n_nulls, r.n_distinct)
        for r in profile(df, approx=True, rsd=0.05).collect()
    }
    assert set(approx) == set(exact)
    for c in exact:
        assert approx[c][0] == exact[c][0]  # nulls exact in both modes
        assert abs(approx[c][1] - exact[c][1]) <= max(
            3, 0.15 * exact[c][1]
        ), (c, exact[c], approx[c])
    assert "Expand" in simple_plan(profile(df))
    assert "Expand" not in simple_plan(profile(df, approx=True))


def test_merge_agg_state_equals_full_recompute(spark, sf_dir):
    from pyspark.sql import functions as F

    from spark_data_test_spark import merge_agg_state
    from spark_data_test_spark.operators.relational import t

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("c"),
    )

    def agg_state(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("c").alias("total_cents"),
            F.max("c").alias("max_cents"),
            F.min("c").alias("min_cents"),
        )

    state = agg_state(o.where("o_orderkey % 2 = 1"))
    delta = agg_state(o.where("o_orderkey % 2 = 0"))
    merged = merge_agg_state(
        state,
        delta,
        "o_orderstatus",
        {"n_orders": "sum", "total_cents": "sum",
         "max_cents": "max", "min_cents": "min"},
    )
    want = {tuple(r) for r in agg_state(o).collect()}
    got = {
        (r.o_orderstatus, r.n_orders, r.total_cents, r.max_cents, r.min_cents)
        for r in merged.collect()
    }
    assert got == want and got


def test_merge_agg_state_one_sided_groups_and_validation(spark):
    from spark_data_test_spark import merge_agg_state

    state = spark.createDataFrame(
        [("a", 2, 10), ("b", 1, 5)], "k string, n long, s long"
    )
    delta = spark.createDataFrame(
        [("b", 3, 7), ("c", 1, 2)], "k string, n long, s long"
    )
    got = {
        (r.k, r.n, r.s)
        for r in merge_agg_state(
            state, delta, "k", {"n": "sum", "s": "sum"}
        ).collect()
    }
    # a: state only; c: delta only; b: merged
    assert got == {("a", 2, 10), ("b", 4, 12), ("c", 1, 2)}

    for bad in (
        ([], {"n": "sum"}),               # no keys
        (["k"], {}),                      # no measures
        (["k"], {"n": "avg"}),            # non-distributive fn
        (["k"], {"k": "sum"}),            # key also a measure
        (["k"], {"missing": "sum"}),      # absent column
    ):
        try:
            merge_agg_state(state, delta, bad[0], bad[1])
            assert False, f"expected ValueError for {bad}"
        except ValueError:
            pass


def test_merge_agg_state_property_sweep(spark):
    from hypothesis import HealthCheck, given, settings, strategies as st

    from spark_data_test_spark import merge_agg_state

    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),
                st.integers(-100, 100),
            ),
            min_size=1,
            max_size=20,
        ),
        split=st.integers(0, 20),
    )
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def prop(rows, split):
        from pyspark.sql import functions as F

        split = min(split, len(rows))
        df = spark.createDataFrame(rows, "k string, v long")

        def agg(d):
            return d.groupBy("k").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("v").alias("s"),
                F.min("v").alias("lo"),
                F.max("v").alias("hi"),
            )

        halves = (
            spark.createDataFrame(rows[:split] or [("x", None)],
                                  "k string, v long").where("v is not null"),
            spark.createDataFrame(rows[split:] or [("x", None)],
                                  "k string, v long").where("v is not null"),
        )
        merged = merge_agg_state(
            agg(halves[0]), agg(halves[1]), "k",
            {"n": "sum", "s": "sum", "lo": "min", "hi": "max"},
        )
        assert {tuple(r) for r in merged.collect()} == {
            tuple(r) for r in agg(df).collect()
        }

    prop()
