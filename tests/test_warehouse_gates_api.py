"""Frame-level `fuzzy_match` and `schema_drift` cross-checked against
brute-force Python replicas (the warehouse-gate family's library
tier, round 11)."""

import random

from pyspark.sql import functions as F

from spark_data_test_spark import fuzzy_match, schema_drift


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


_WORDS = ["anvil", "amber", "azure", "brass", "blush", "coral", "cream"]


def _side(seed, n):
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        w = rng.choice(_WORDS)
        name = w
        if rng.random() < 0.5:  # typo variants within edit distance 2
            i = rng.randrange(len(w))
            name = w[:i] + rng.choice("xyz") + w[i + 1 :]
        rows.append((name, w[0]))  # block on the ORIGINAL first letter
    return rows


def _brute(a_rows, b_rows, max_dist):
    a = {(v, blk) for v, blk in a_rows}
    b = {(v, blk) for v, blk in b_rows}
    out = set()
    for va, ba in a:
        for vb, bb in b:
            if ba == bb and _lev(va, vb) <= max_dist:
                out.add((va, vb, _lev(va, vb)))
    return out


def test_fuzzy_match_all_matches_bruteforce(spark):
    a_rows, b_rows = _side(3, 40), _side(11, 40)
    dfa = spark.createDataFrame(a_rows, "name string, blk string")
    dfb = spark.createDataFrame(b_rows, "label string, grp string")
    got = {
        (r.value_a, r.value_b, r.edit_distance)
        for r in fuzzy_match(
            dfa, dfb, "name", "blk", max_dist=2,
            value_col_b="label", block_col_b="grp",
        ).collect()
    }
    assert got == _brute(a_rows, b_rows, 2)
    assert got, "fixture produced no pairs — not a real test"


def test_fuzzy_match_best_keeps_min_dist_then_min_value(spark):
    a_rows, b_rows = _side(5, 30), _side(17, 30)
    dfa = spark.createDataFrame(a_rows, "name string, blk string")
    dfb = spark.createDataFrame(b_rows, "name string, blk string")
    got = {
        (r.value_a, r.value_b, r.edit_distance)
        for r in fuzzy_match(dfa, dfb, "name", "blk", keep="best").collect()
    }
    best = {}
    for va, vb, d in _brute(a_rows, b_rows, 2):
        if va not in best or (d, vb) < (best[va][1], best[va][0]):
            best[va] = (vb, d)
    assert got == {(va, vb, d) for va, (vb, d) in best.items()}


def test_fuzzy_match_pair_emitted_once_across_blocks(spark):
    # the same value pair reachable through TWO blocks appears once
    dfa = spark.createDataFrame(
        [("abc", 1), ("abc", 2)], "v string, b int"
    )
    dfb = spark.createDataFrame(
        [("abd", 1), ("abd", 2)], "v string, b int"
    )
    rows = fuzzy_match(dfa, dfb, "v", "b", max_dist=1).collect()
    assert [(r.value_a, r.value_b, r.edit_distance) for r in rows] == [
        ("abc", "abd", 1)
    ]


def test_fuzzy_match_rejects_bad_keep(spark):
    df = spark.createDataFrame([("a", 1)], "v string, b int")
    try:
        fuzzy_match(df, df, "v", "b", keep="top")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_schema_drift_statuses(spark):
    src = spark.createDataFrame(
        [(1, "x", 2.0, "p")], "id long, s string, v double, only_src string"
    )
    tgt = (
        src.drop("only_src")
        .withColumn("v", F.col("v").cast("string"))
        .withColumn("only_tgt", F.lit(1))
    )
    got = {
        r.column_name: (r.source_type, r.target_type, r.status)
        for r in schema_drift(src, tgt).collect()
    }
    assert got == {
        "id": ("bigint", "bigint", "MATCHED"),
        "s": ("string", "string", "MATCHED"),
        "v": ("double", "string", "TYPE_MISMATCH"),
        "only_src": ("string", None, "MISSING_AT_TARGET"),
        "only_tgt": (None, "int", "MISSING_AT_SOURCE"),
    }
    # pure metadata: the report is a 1-partition local frame
    assert schema_drift(src, tgt).rdd.getNumPartitions() == 1


def test_schema_drift_rejects_duplicate_columns(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    dup = df.select("id", F.col("s").alias("id"))
    try:
        schema_drift(dup, df)
        assert False, "expected ValueError"
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# RANDOM linkage inputs (hypothesis) — short alphabets so blocks
# collide and distances straddle the threshold organically.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st

_names = st.text(alphabet="abcx", min_size=1, max_size=5)


@st.composite
def _sides(draw):
    def side():
        n = draw(st.integers(1, 8))
        return [(draw(_names),) for _ in range(n)]
    return side(), side()


@given(sides=_sides(), max_dist=st.integers(0, 2))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
def test_fuzzy_match_property(spark, sides, max_dist):
    """Property sweep: for any two small string sets blocked on the
    first character, fuzzy_match == the brute-force blocked levenshtein
    filter, and keep="best" is the (min dist, min value) argmin of the
    keep="all" result."""
    a_rows = [(v, v[0]) for (v,) in sides[0]]
    b_rows = [(v, v[0]) for (v,) in sides[1]]
    dfa = spark.createDataFrame(a_rows, "v string, b string")
    dfb = spark.createDataFrame(b_rows, "v string, b string")
    got = {
        (r.value_a, r.value_b, r.edit_distance)
        for r in fuzzy_match(dfa, dfb, "v", "b", max_dist=max_dist).collect()
    }
    expected = _brute(a_rows, b_rows, max_dist)
    assert got == expected
    best = {}
    for va, vb, d in expected:
        if va not in best or (d, vb) < (best[va][1], best[va][0]):
            best[va] = (vb, d)
    got_best = {
        (r.value_a, r.value_b, r.edit_distance)
        for r in fuzzy_match(
            dfa, dfb, "v", "b", max_dist=max_dist, keep="best"
        ).collect()
    }
    assert got_best == {(va, vb, d) for va, (vb, d) in best.items()}
