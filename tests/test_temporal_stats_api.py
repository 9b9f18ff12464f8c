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
