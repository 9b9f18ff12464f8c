"""Frame-level `heavy_hitters` cross-checked against exact Python
counting: the Misra-Gries candidate pass plus exact verify must return
EXACTLY the items above the share threshold, for any partitioning."""

from collections import Counter

import pytest

from spark_data_test_spark import heavy_hitters


def _fixture():
    # 2000 items: two heavy items (>1/10 share), a borderline item at
    # exactly the threshold (must be EXCLUDED: strict inequality), and
    # a long uniform tail
    items = (
        ["hot"] * 500
        + ["warm"] * 300
        + ["edge"] * 200  # 200 * 10 == 2000: NOT a hitter (strict >)
        + [f"tail{i}" for i in range(1000)]
    )
    return items


def test_heavy_hitters_exact_vs_python(spark):
    items = _fixture()
    df = spark.createDataFrame([(x,) for x in items], "g string")
    # spread across many partitions so per-partition MG compression
    # (k counters) actually triggers and merging matters
    df = df.repartition(16)
    got = [(r.item, r.cnt, r.n_total) for r in heavy_hitters(df, denom=10).collect()]
    counts = Counter(items)
    n = len(items)
    expected = sorted(
        ((g, c, n) for g, c in counts.items() if c * 10 > n),
        key=lambda t: (-t[1], t[0]),
    )
    assert got == expected
    assert [g for g, _, _ in got] == ["hot", "warm"]  # edge excluded


def test_heavy_hitters_custom_column_and_empty_result(spark):
    df = spark.createDataFrame(
        [(i, f"v{i % 50}") for i in range(500)], "id long, val string"
    )
    # uniform 50-way split: nothing exceeds 1/10
    assert heavy_hitters(df, item_col="val", denom=10).count() == 0
    # but everything exceeds 1/100 (each value holds 1/50)
    rows = heavy_hitters(df, item_col="val", denom=100).collect()
    assert len(rows) == 50 and all(r.cnt == 10 for r in rows)


def test_heavy_hitters_rejects_broken_guarantee(spark):
    df = spark.createDataFrame([("a",)], "g string")
    with pytest.raises(ValueError):
        heavy_hitters(df, denom=2000)


# ---------------------------------------------------------------------------
# distinct_sketch / sketch_union: mergeable HLL distinct counts
# ---------------------------------------------------------------------------

import random


def _sketch_fixture(n=4000, seed=211):
    rng = random.Random(seed)
    return [
        (
            rng.choice(["us", "eu", "ap"]),
            rng.randrange(10),
            f"user{rng.randrange(800)}",
        )
        for _ in range(n)
    ]


def test_distinct_sketch_estimates_within_error(spark):
    from spark_data_test_spark import distinct_sketch

    rows = _sketch_fixture()
    df = spark.createDataFrame(rows, "region string, day long, user string")
    got = {
        r.region: r.estimate
        for r in distinct_sketch(df, "region", "user").collect()
    }
    exact = {}
    for reg, _, u in rows:
        exact.setdefault(reg, set()).add(u)
    for reg, est in got.items():
        assert abs(est - len(exact[reg])) <= 0.05 * len(exact[reg]), (
            reg, est, len(exact[reg]))


def test_sketch_union_rollup_tracks_exact(spark):
    """Folding per-(region, day) sketches up to region (and further to
    global) must stay within the configured error of the EXACT distinct
    counts — the roll-up answers the same question the raw data would,
    without rescanning it. (Not asserted equal to a single-pass sketch:
    DataSketches keeps small sketches in exact sparse modes while the
    union gadget works in dense HLL, so the two estimates may differ
    slightly; both must track exact.)"""
    from spark_data_test_spark import distinct_sketch, sketch_union

    rows = _sketch_fixture(seed=223)
    df = spark.createDataFrame(rows, "region string, day long, user string")
    parts = distinct_sketch(df, ["region", "day"], "user")
    rolled = {
        r.region: r.estimate
        for r in sketch_union(parts, "region").collect()
    }
    exact = {}
    for reg, _, u in rows:
        exact.setdefault(reg, set()).add(u)
    for reg, est in rolled.items():
        assert abs(est - len(exact[reg])) <= 0.05 * len(exact[reg]), (
            reg, est, len(exact[reg]))
    # a second-level fold (region -> global) chains and tracks exact too
    top = sketch_union(sketch_union(parts, "region"), []).collect()
    n_all = len({u for _, _, u in rows})
    assert abs(top[0].estimate - n_all) <= 0.05 * n_all
