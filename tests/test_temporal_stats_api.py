"""Frame-level `anomaly_zscore` and `cumulative_distinct`
cross-checked against brute-force Python replicas."""

import math
import random
from collections import defaultdict

from spark_data_test_spark import anomaly_zscore, cumulative_distinct

# ---------------------------------------------------------------------------
# anomaly_zscore
# ---------------------------------------------------------------------------


def _series_fixture(n_keys=4, n_buckets=40, seed=61):
    rng = random.Random(seed)
    rows = []
    for k in range(n_keys):
        base = rng.randint(50, 200)
        for b in range(n_buckets):
            v = base + rng.randint(-5, 5)
            if rng.random() < 0.06:
                v += rng.choice([-1, 1]) * base  # planted spike/drop
            rows.append((f"k{k}", b, v))
    return rows


def _brute_anomaly(rows, n_sigmas):
    by_key = defaultdict(list)
    for k, b, v in rows:
        by_key[k].append(v)
    out = set()
    for k, b, v in rows:
        vs = by_key[k]
        n = len(vs)
        mean = sum(vs) / n
        var = sum((x - mean) ** 2 for x in vs) / n
        flag = 1 if abs(v - mean) > n_sigmas * math.sqrt(var) else 0
        out.add((k, b, v, flag))
    return out


def test_anomaly_zscore_matches_bruteforce(spark):
    rows = _series_fixture()
    df = spark.createDataFrame(rows, "key string, bucket long, n long")
    got = {
        (r.key, r.bucket, r.n, r.is_anomaly)
        for r in anomaly_zscore(
            df, keys="key", bucket_col="bucket", value_col="n"
        ).collect()
    }
    expected = _brute_anomaly(rows, 3)
    assert got == expected
    # planted spikes mean both classes must occur
    flags = {f for _, _, _, f in expected}
    assert flags == {0, 1}


def test_anomaly_zscore_sigma_parameter(spark):
    rows = _series_fixture(seed=71)
    df = spark.createDataFrame(rows, "key string, bucket long, n long")
    for k_sig in (1, 5):
        got = {
            (r.key, r.bucket, r.n, r.is_anomaly)
            for r in anomaly_zscore(
                df, keys="key", bucket_col="bucket", value_col="n",
                n_sigmas=k_sig,
            ).collect()
        }
        assert got == _brute_anomaly(rows, k_sig)


# ---------------------------------------------------------------------------
# cumulative_distinct
# ---------------------------------------------------------------------------


def _visits_fixture(n_entities=30, n_rows=150, n_buckets=12, seed=83):
    rng = random.Random(seed)
    return [
        (rng.randrange(n_entities), rng.randrange(n_buckets))
        for _ in range(n_rows)
    ]


def _brute_cumulative(rows):
    first = {}
    for e, b in rows:
        first[e] = min(first.get(e, b), b)
    new = defaultdict(int)
    for b in first.values():
        new[b] += 1
    out = set()
    cum = 0
    for b in sorted(new):
        cum += new[b]
        out.add((b, new[b], cum))
    return out


def test_cumulative_distinct_matches_bruteforce(spark):
    rows = _visits_fixture()
    df = spark.createDataFrame(rows, "user_id long, day long")
    got = {
        (r.day, r.new_entities, r.cumulative_entities)
        for r in cumulative_distinct(df, "user_id", "day").collect()
    }
    expected = _brute_cumulative(rows)
    assert got == expected
    # the final cumulative count is the total distinct entities
    assert max(c for _, _, c in got) == len({e for e, _ in rows})


def test_cumulative_distinct_repeat_visits_count_once(spark):
    rows = [(1, 0), (1, 5), (1, 9), (2, 5), (2, 9), (3, 9)]
    df = spark.createDataFrame(rows, "user_id long, day long")
    got = sorted(
        (r.day, r.new_entities, r.cumulative_entities)
        for r in cumulative_distinct(df, "user_id", "day").collect()
    )
    assert got == [(0, 1, 1), (5, 1, 2), (9, 1, 3)]


# ---------------------------------------------------------------------------
# rolling_agg
# ---------------------------------------------------------------------------

import datetime

from spark_data_test_spark import rolling_agg

_T0 = datetime.datetime(2024, 6, 1)


def _ts_fixture(n_keys=4, n_rows=120, seed=97):
    rng = random.Random(seed)
    return [
        (
            rng.randrange(n_keys),
            _T0 + datetime.timedelta(seconds=rng.randrange(20_000)),
            rng.randint(-50, 100),
        )
        for _ in range(n_rows)
    ]


def _brute_rolling(rows, span_s):
    out = []
    by_key = defaultdict(list)
    for k, t, v in rows:
        by_key[k].append((t, v))
    for k, t, v in rows:
        frame = [
            x
            for tt, x in by_key[k]
            if t - datetime.timedelta(seconds=span_s) <= tt <= t
        ]
        n, s = len(frame), sum(frame)
        out.append((k, t, v, n, s, round(s / n, 9)))
    return sorted(out)


def test_rolling_agg_matches_bruteforce(spark):
    rows = _ts_fixture()
    df = spark.createDataFrame(rows, "key long, ts timestamp, v long")
    for window in ("1 hour", datetime.timedelta(minutes=10), 600):
        got = sorted(
            (r.key, r.ts, r.v, r.roll_n, r.roll_sum, round(r.roll_avg, 9))
            for r in rolling_agg(
                df, keys="key", ts_col="ts", value_col="v", window=window
            ).collect()
        )
        span_s = (
            3600
            if window == "1 hour"
            else (600 if not isinstance(window, str) else 600)
        )
        assert got == _brute_rolling(rows, span_s), window


def test_rolling_agg_duplicate_timestamps_are_peers(spark):
    """RANGE frames include order-key peers: two events at the same
    second each see BOTH values in their frame."""
    rows = [
        (1, _T0, 10),
        (1, _T0, 20),
        (1, _T0 + datetime.timedelta(hours=2), 5),
    ]
    df = spark.createDataFrame(rows, "key long, ts timestamp, v long")
    got = sorted(
        (r.v, r.roll_n, r.roll_sum)
        for r in rolling_agg(
            df, keys="key", ts_col="ts", value_col="v", window="1 hour"
        ).collect()
    )
    assert got == [(5, 1, 5), (10, 2, 30), (20, 2, 30)]


def test_rolling_agg_rejects_bad_window(spark):
    df = spark.createDataFrame([(1, _T0, 1)], "key long, ts timestamp, v long")
    try:
        rolling_agg(df, "key", "ts", "v", window="fortnight")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_seasonal_backtest_matches_registered_query(spark, sf_dir):
    from pyspark.sql import functions as F

    from spark_data_test_spark import seasonal_backtest
    from spark_data_test_spark.operators.relational import t
    from spark_data_test_spark.operators.temporal import (
        _DAY_US,
        _SEASON_DAYS,
        events_seasonal_naive_backtest,
    )

    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"),
        F.expr("cast(round(value * 100) as bigint)").alias("c"),
    )
    lib = seasonal_backtest(ev, "event_type", "day", "c", _SEASON_DAYS)
    got = {
        (r.event_type, r.n_forecast, r.total_abs_err, r.bias, r.mae)
        for r in lib.collect()
    }
    want = {
        (r.event_type, r.n_forecast_days, r.total_abs_err_cents,
         r.bias_cents, r.mae_cents)
        for r in events_seasonal_naive_backtest(spark, sf_dir).collect()
    }
    assert got == want and got


def test_seasonal_backtest_bruteforce_and_gaps(spark):
    from spark_data_test_spark import seasonal_backtest

    # key "a": periods 1..6 (season=2 scores 3..6); key "b" has a GAP
    # at period 4 so periods 4 and 6 lose their pairings asymmetrically
    rows = [
        ("a", 1, 10), ("a", 2, 20), ("a", 3, 13), ("a", 4, 17),
        ("a", 5, 11), ("a", 6, 25),
        ("a", 3, 5),  # duplicate (key, period): must pre-aggregate to 18
        ("b", 2, 7), ("b", 3, 9), ("b", 5, 8), ("b", 6, 30),
    ]
    df = spark.createDataFrame(rows, "k string, p long, v long")

    series = {}
    for k, p, v in rows:
        series[(k, p)] = series.get((k, p), 0) + v
    per_key = {}
    for (k, p), c in series.items():
        prior = series.get((k, p - 2))
        if prior is None:
            continue
        n, tot, bias = per_key.get(k, (0, 0, 0))
        per_key[k] = (n + 1, tot + abs(c - prior), bias + (c - prior))
    want = {
        (k, n, tot, bias, tot // n) for k, (n, tot, bias) in per_key.items()
    }
    got = {
        (r.k, r.n_forecast, r.total_abs_err, r.bias, r.mae)
        for r in seasonal_backtest(df, "k", "p", "v", 2).collect()
    }
    assert got == want and len(got) == 2

    try:
        seasonal_backtest(df, "k", "p", "v", 0)
        assert False, "expected ValueError for season=0"
    except ValueError:
        pass


def test_seasonal_backtest_property_sweep(spark):
    from hypothesis import HealthCheck, given, settings, strategies as st

    from spark_data_test_spark import seasonal_backtest

    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["x", "y"]),
                st.integers(0, 12),        # period
                st.integers(0, 200),       # non-negative value (mae uses
            ),                             # trunc div == // when >= 0)
            min_size=1,
            max_size=25,
        ),
        season=st.integers(1, 5),
    )
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def prop(rows, season):
        df = spark.createDataFrame(rows, "k string, p long, v long")
        series = {}
        for k, p, v in rows:
            series[(k, p)] = series.get((k, p), 0) + v
        per_key = {}
        for (k, p), c in series.items():
            prior = series.get((k, p - season))
            if prior is None:
                continue
            n, tot, bias = per_key.get(k, (0, 0, 0))
            per_key[k] = (n + 1, tot + abs(c - prior), bias + (c - prior))
        want = {
            (k, n, tot, bias, tot // n)
            for k, (n, tot, bias) in per_key.items()
        }
        got = {
            (r.k, r.n_forecast, r.total_abs_err, r.bias, r.mae)
            for r in seasonal_backtest(df, "k", "p", "v", season).collect()
        }
        assert got == want

    prop()
