"""Frame-level `temperature_shares` cross-checked against a
brute-force Python replica: natural/temperature shares and boosts to
double precision, weighted and unweighted, across alpha values."""

import random

import pytest

from spark_data_test_spark import temperature_shares

_SOURCES = ["en", "fr", "de", "sw", "yo"]
# deliberately skewed supply: en dominates, yo is the tail
_RATES = {"en": 0.55, "fr": 0.25, "de": 0.12, "sw": 0.06, "yo": 0.02}


def _fixture(n=400, seed=101):
    rng = random.Random(seed)
    rows = []
    srcs = list(_RATES)
    weights = [_RATES[s] for s in srcs]
    for i in range(n):
        (s,) = rng.choices(srcs, weights=weights)
        rows.append((i, s, rng.randint(1, 500)))
    return rows


def _brute(rows, alpha, weighted):
    agg = {}
    for _, s, w in rows:
        n, tot = agg.get(s, (0, 0))
        agg[s] = (n + 1, tot + (w if weighted else 1))
    wall = sum(t for _, t in agg.values())
    nat = {s: t / wall for s, (_, t) in agg.items()}
    pall = sum(v**alpha for v in nat.values())
    out = {}
    for s, (n, t) in agg.items():
        temp = nat[s] ** alpha / pall
        out[s] = (n, float(t), nat[s], temp, temp / nat[s])
    return out


@pytest.mark.parametrize("alpha", [0.3, 0.5, 1.0])
@pytest.mark.parametrize("weighted", [False, True])
def test_temperature_shares_matches_bruteforce(spark, alpha, weighted):
    rows = _fixture()
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")
    got = {
        r.source: (
            r.n_rows,
            r.weight_total,
            r.natural_share,
            r.temp_share,
            r.boost,
        )
        for r in temperature_shares(
            df,
            "lang",
            weight_col="n_tok" if weighted else None,
            alpha=alpha,
        ).collect()
    }
    expected = _brute(rows, alpha, weighted)
    assert set(got) == set(expected)
    for s in got:
        for g, e in zip(got[s], expected[s]):
            assert abs(g - e) < 1e-9, (s, got[s], expected[s])
    # flattening property: below alpha=1 the tail source's boost > 1
    # and the dominant source's boost < 1; at alpha=1 all boosts == 1
    if alpha == 1.0:
        assert all(abs(v[4] - 1.0) < 1e-9 for v in got.values())
    else:
        assert got["yo"][4] > 1.0 > got["en"][4]


def test_temperature_shares_rejects_bad_alpha(spark):
    df = spark.createDataFrame([(1, "en", 1)], "doc_id long, lang string, n_tok long")
    for bad in (0, -0.5, 1.5):
        try:
            temperature_shares(df, "lang", alpha=bad)
            assert False, f"expected ValueError for alpha={bad}"
        except ValueError:
            pass
