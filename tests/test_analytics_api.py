"""Frame-level `pareto_classes` and `value_histogram` cross-checked
against brute-force Python replicas."""

import math
import random
from collections import Counter

from spark_data_test_spark import pareto_classes, value_histogram

# ---------------------------------------------------------------------------
# pareto_classes
# ---------------------------------------------------------------------------


def _pareto_fixture(n=60, seed=113):
    rng = random.Random(seed)
    # heavy-tailed values (pareto-ish) plus exact ties to exercise the
    # (value desc, key asc) tie-break
    rows = [(i, float(int(rng.paretovariate(1.2) * 100))) for i in range(n)]
    rows += [(n, rows[0][1]), (n + 1, rows[1][1])]
    return rows


def _brute_pareto(rows, thresholds, labels):
    total = sum(v for _, v in rows)
    ranked = sorted(rows, key=lambda kv: (-kv[1], kv[0]))
    out = {}
    cum = 0.0
    for k, v in ranked:
        cum += v
        share = cum / total
        cls = labels[-1]
        for t, lab in zip(thresholds, labels):
            if share <= t:
                cls = lab
                break
        out[k] = (v, round(cum, 6), round(share, 9), cls)
    return out


def test_pareto_classes_matches_bruteforce(spark):
    rows = _pareto_fixture()
    df = spark.createDataFrame(rows, "pk long, rev double")
    got = {
        r.pk: (r.rev, round(r.cum_value, 6), round(r.cum_share, 9), r.cls)
        for r in pareto_classes(df, "pk", "rev").collect()
    }
    expected = _brute_pareto(rows, (0.8, 0.95), ("A", "B", "C"))
    assert got == expected
    # heavy tail: all three classes occur
    assert {c for _, _, _, c in got.values()} == {"A", "B", "C"}


def test_pareto_classes_custom_thresholds(spark):
    rows = _pareto_fixture(seed=127)
    df = spark.createDataFrame(rows, "pk long, rev double")
    got = {
        r.pk: r.cls
        for r in pareto_classes(
            df, "pk", "rev", thresholds=(0.5,), labels=("hot", "cold")
        ).collect()
    }
    expected = {
        k: v[3]
        for k, v in _brute_pareto(rows, (0.5,), ("hot", "cold")).items()
    }
    assert got == expected


def test_pareto_classes_rejects_mismatched_labels(spark):
    df = spark.createDataFrame([(1, 1.0)], "pk long, rev double")
    try:
        pareto_classes(df, "pk", "rev", thresholds=(0.8,), labels=("A",))
        assert False, "expected ValueError"
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# value_histogram
# ---------------------------------------------------------------------------


def _hist_fixture(n=300, seed=131):
    rng = random.Random(seed)
    return [
        (rng.choice(["a", "b"]), rng.uniform(-200, 1500)) for _ in range(n)
    ]


def _brute_hist(rows, width, max_bucket=None):
    c = Counter()
    for k, v in rows:
        b = math.floor(v / width)
        if max_bucket is not None:
            b = min(b, max_bucket)
        c[(k, b)] += 1
    return {(k, b, n) for (k, b), n in c.items()}


def test_value_histogram_matches_bruteforce(spark):
    rows = _hist_fixture()
    df = spark.createDataFrame(rows, "typ string, v double")
    got = {
        (r.typ, r.bucket, r.cnt)
        for r in value_histogram(df, "v", width=50, keys="typ").collect()
    }
    assert got == _brute_hist(rows, 50)
    # negatives land in negative buckets (true floor, never bucket 0)
    assert any(b < 0 for _, b, _ in got)


def test_value_histogram_clamped_tail_and_no_keys(spark):
    rows = _hist_fixture(seed=139)
    df = spark.createDataFrame(rows, "typ string, v double")
    got = {
        (r.bucket, r.cnt)
        for r in value_histogram(df, "v", width=50, max_bucket=19).collect()
    }
    expected = {
        (b, n)
        for (_, b, n) in _brute_hist([("x", v) for _, v in rows], 50, 19)
    }
    assert got == expected
    assert max(b for b, _ in got) == 19


def test_value_histogram_merges_by_addition(spark):
    """The histogram of a union equals the bucket-wise sum of the
    parts' histograms — the mergeability fixed bounds buy."""
    rows = _hist_fixture(seed=149)
    half = len(rows) // 2
    d1 = spark.createDataFrame(rows[:half], "typ string, v double")
    d2 = spark.createDataFrame(rows[half:], "typ string, v double")
    dall = spark.createDataFrame(rows, "typ string, v double")
    h1 = Counter(
        {(r.typ, r.bucket): r.cnt
         for r in value_histogram(d1, "v", 50, keys="typ").collect()}
    )
    h2 = Counter(
        {(r.typ, r.bucket): r.cnt
         for r in value_histogram(d2, "v", 50, keys="typ").collect()}
    )
    hall = {
        (r.typ, r.bucket): r.cnt
        for r in value_histogram(dall, "v", 50, keys="typ").collect()
    }
    assert dict(h1 + h2) == hall


# ---------------------------------------------------------------------------
# ab_readout
# ---------------------------------------------------------------------------


def _brute_ab(rows):
    """rows: (key, in_treat, value). Welch z with n-1 variances."""
    from collections import defaultdict

    arms = defaultdict(lambda: {True: [], False: []})
    for k, t, v in rows:
        arms[k][bool(t)].append(v)
    out = {}
    for k, d in arms.items():
        a, b = d[True], d[False]
        na, nb = len(a), len(b)
        mean_a = sum(a) / na if na else None
        mean_b = sum(b) / nb if nb else None
        z = None
        if na > 1 and nb > 1:
            va = sum((x - mean_a) ** 2 for x in a) / (na - 1)
            vb = sum((x - mean_b) ** 2 for x in b) / (nb - 1)
            z = (mean_a - mean_b) / math.sqrt(va / na + vb / nb)
        out[k] = (na, nb, mean_a, mean_b, z)
    return out


def test_ab_readout_matches_bruteforce(spark):
    from spark_data_test_spark import ab_readout

    rng = random.Random(163)
    rows = [
        (rng.choice(["click", "buy"]), rng.random() < 0.5,
         rng.uniform(0, 100) + 5 * (rng.random() < 0.5))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "event_type string, treat boolean, v double")
    got = {
        r.event_type: (r.n_treat, r.n_control, r.mean_treat,
                       r.mean_control, r.z_score)
        for r in ab_readout(df, "treat", "v", keys="event_type").collect()
    }
    expected = _brute_ab(rows)
    assert set(got) == set(expected)
    for k in got:
        for g, e in zip(got[k], expected[k]):
            if e is None:
                assert g is None
            else:
                assert abs(g - e) < 1e-9, (k, got[k], expected[k])


def test_ab_readout_singleton_arms_yield_null(spark):
    from spark_data_test_spark import ab_readout

    rows = [("x", True, 1.0), ("x", False, 2.0), ("y", True, 3.0)]
    df = spark.createDataFrame(rows, "k string, treat boolean, v double")
    got = {r.k: (r.n_treat, r.n_control, r.mean_treat, r.mean_control, r.z_score)
           for r in ab_readout(df, "treat", "v", keys="k").collect()}
    # singleton arms: means present, z NULL
    assert got["x"] == (1, 1, 1.0, 2.0, None)
    # empty control arm: its mean and z both NULL
    assert got["y"] == (1, 0, 3.0, None, None)


# ---------------------------------------------------------------------------
# rfm_segments
# ---------------------------------------------------------------------------

import datetime

_ANCHOR = "2024-12-31 00:00:00"
_ANCHOR_DT = datetime.datetime(2024, 12, 31)


def _rfm_fixture(n_cust=40, n_orders=300, seed=167):
    rng = random.Random(seed)
    return [
        (
            rng.randrange(n_cust),
            _ANCHOR_DT - datetime.timedelta(days=rng.randrange(1, 1200)),
            float(rng.randrange(10, 5000)),
        )
        for _ in range(n_orders)
    ]


def _brute_rfm(rows, recency=(180, 365, 730), frequency=(15, 10, 5),
               monetary=None):
    from collections import defaultdict

    per = defaultdict(lambda: [None, 0, 0.0])
    for c, t, v in rows:
        p = per[c]
        p[0] = t if p[0] is None else max(p[0], t)
        p[1] += 1
        p[2] += v
    if monetary is None:
        mean = sum(p[2] for p in per.values()) / len(per)
        monetary = (mean * 4.0, mean * 2.5, mean * 1.0)

    def band_ge(x, cuts):
        b4, b3, b2 = cuts
        return 4 if x >= b4 else 3 if x >= b3 else 2 if x >= b2 else 1

    grid = defaultdict(lambda: [0, 0.0])
    for last, freq, m in per.values():
        # integer truncating day division, like Spark's div
        r_days = int((_ANCHOR_DT - last).total_seconds() * 1e6) // 86400000000
        r4, r3, r2 = recency
        r = 4 if r_days <= r4 else 3 if r_days <= r3 else 2 if r_days <= r2 else 1
        f = band_ge(freq, frequency)
        ms = band_ge(m, monetary)
        g = grid[(r, f, ms)]
        g[0] += 1
        g[1] += m
    return {k: (n, round(v, 6)) for k, (n, v) in grid.items()}


def test_rfm_segments_matches_bruteforce(spark):
    from spark_data_test_spark import rfm_segments

    rows = _rfm_fixture()
    df = spark.createDataFrame(rows, "customer_id long, ts timestamp, value double")
    got = {
        (r.r_score, r.f_score, r.m_score): (r.n_customers, round(r.value_total, 6))
        for r in rfm_segments(df, _ANCHOR).collect()
    }
    assert got == _brute_rfm(rows)
    # grid totals reconcile to the corpus
    assert sum(n for n, _ in got.values()) == len({c for c, _, _ in rows})


def test_rfm_segments_explicit_monetary_cutoffs(spark):
    from spark_data_test_spark import rfm_segments

    rows = _rfm_fixture(seed=179)
    df = spark.createDataFrame(rows, "customer_id long, ts timestamp, value double")
    cuts = (40000.0, 20000.0, 5000.0)
    got = {
        (r.r_score, r.f_score, r.m_score): (r.n_customers, round(r.value_total, 6))
        for r in rfm_segments(df, _ANCHOR, monetary=cuts).collect()
    }
    assert got == _brute_rfm(rows, monetary=cuts)


# ---------------------------------------------------------------------------
# zorder_key
# ---------------------------------------------------------------------------


def _brute_z(vals, bits):
    n = len(vals)
    key = 0
    for i, v in enumerate(vals):
        v &= (1 << bits) - 1
        for b in range(bits):
            key |= ((v >> b) & 1) << (b * n + i)
    return key


def test_zorder_key_matches_bruteforce(spark):
    from spark_data_test_spark import zorder_key

    rng = random.Random(191)
    rows = [
        (i, rng.randrange(1 << 16), rng.randrange(1 << 16),
         rng.randrange(1 << 16))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "i long, x long, y long, z long")
    # 2-dim at 16 bits (the registered query's case) and 3-dim at 20
    got2 = {r.i: r.zkey for r in zorder_key(df, ["x", "y"]).collect()}
    assert got2 == {i: _brute_z([x, y], 16) for i, x, y, _ in rows}
    got3 = {r.i: r.zkey
            for r in zorder_key(df, ["x", "y", "z"], bits=20).collect()}
    assert got3 == {i: _brute_z([x, y, z], 20) for i, x, y, z in rows}


def test_zorder_key_matches_registered_morton(spark):
    """The generic interleave at n=2 must equal the registered query's
    magic-mask Morton spread bit-for-bit."""
    from spark_data_test_spark import zorder_key
    from spark_data_test_spark.sources.readers import _morton_sql

    rng = random.Random(193)
    rows = [(i, rng.randrange(1 << 16), rng.randrange(256))
            for i in range(80)]
    df = spark.createDataFrame(rows, "i long, day long, code long")
    import pyspark.sql.functions as F

    magic = df.withColumn(
        "m",
        F.expr(_morton_sql("day", "code", lambda e, n: f"shiftleft({e}, {n})")),
    )
    both = zorder_key(magic, ["day", "code"]).collect()
    assert all(r.zkey == r.m for r in both)


def test_zorder_key_rejects_overflow(spark):
    from spark_data_test_spark import zorder_key

    df = spark.createDataFrame([(1, 2, 3, 4)], "a long, b long, c long, d long")
    try:
        zorder_key(df, ["a", "b", "c", "d"], bits=16)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_pareto_classes_empty_input_schema_matches_nonempty(spark):
    """Advisory regression: the empty-input branch must emit the SAME
    dtypes as the non-empty path (which casts value_col to double) —
    a branch-dependent schema breaks downstream unions."""
    full = spark.createDataFrame([("p1", 5), ("p2", 3)], "pk string, rev long")
    out_full = pareto_classes(full, "pk", "rev")
    out_empty = pareto_classes(full.limit(0), "pk", "rev")
    assert out_empty.dtypes == out_full.dtypes
    assert out_empty.count() == 0


def test_pareto_classes_zero_total_raises(spark):
    """Advisory regression: an all-zero value column makes every
    cum_share NULL (every key would silently land in the last label);
    the classification is undefined and must raise, not mislabel."""
    df = spark.createDataFrame([("p1", 0), ("p2", 0)], "pk string, rev long")
    try:
        pareto_classes(df, "pk", "rev")
        assert False, "expected ValueError on zero value total"
    except ValueError:
        pass
