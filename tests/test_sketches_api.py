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
