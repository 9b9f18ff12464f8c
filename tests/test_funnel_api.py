"""Frame-level `funnel` cross-checked against a brute-force Python
replica: per-key sequential earliest-qualifying-event resolution over
a seeded random event log, arbitrary step lists."""

import datetime
import random
from collections import defaultdict

from spark_data_test_spark import funnel

_T0 = datetime.datetime(2024, 5, 1)
_TYPES = ["signup", "click", "purchase", "view", "refund"]


def _fixture(n_users=25, n_events=400, seed=37):
    rng = random.Random(seed)
    return [
        (
            rng.randrange(n_users),
            _T0 + datetime.timedelta(seconds=rng.randrange(10_000)),
            rng.choice(_TYPES),
        )
        for _ in range(n_events)
    ]


def _brute(rows, steps):
    by_user = defaultdict(list)
    for u, t, s in rows:
        by_user[u].append((t, s))
    converted = [0] * len(steps)
    for seq in by_user.values():
        seq.sort(key=lambda x: x[0])
        prev_t = None
        for i, step in enumerate(steps):
            t_i = min(
                (t for t, s in seq
                 if s == step and (prev_t is None or t >= prev_t)),
                default=None,
            )
            if t_i is None:
                break
            converted[i] += 1
            prev_t = t_i
    return {(i + 1, s, converted[i]) for i, s in enumerate(steps)}


def test_funnel_matches_bruteforce(spark):
    rows = _fixture()
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    for steps in (
        ["signup", "click", "purchase"],
        ["view", "refund"],
        ["click"],
    ):
        got = {
            (r.step_idx, r.step, r.n_converted)
            for r in funnel(df, steps).collect()
        }
        assert got == _brute(rows, steps), steps


def test_funnel_ordering_is_enforced(spark):
    """A user whose purchase precedes their click must NOT convert
    through the purchase step."""
    rows = [
        (1, _T0 + datetime.timedelta(seconds=1), "signup"),
        (1, _T0 + datetime.timedelta(seconds=2), "purchase"),
        (1, _T0 + datetime.timedelta(seconds=3), "click"),
        (2, _T0 + datetime.timedelta(seconds=1), "signup"),
        (2, _T0 + datetime.timedelta(seconds=2), "click"),
        (2, _T0 + datetime.timedelta(seconds=3), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        (r.step_idx, r.step, r.n_converted)
        for r in funnel(df, ["signup", "click", "purchase"]).collect()
    }
    assert got == {(1, "signup", 2), (2, "click", 2), (3, "purchase", 1)}


def test_funnel_counts_are_monotone_nonincreasing(spark):
    rows = _fixture(seed=53)
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = sorted(
        (r.step_idx, r.n_converted)
        for r in funnel(df, ["view", "click", "purchase", "refund"]).collect()
    )
    counts = [n for _, n in out]
    assert counts == sorted(counts, reverse=True)


# ---------------------------------------------------------------------------
# RANDOM event logs (hypothesis): the chained conditional-min windows
# must match the brute-force sequential resolution for ANY event
# arrangement, including repeated states and absent steps.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st

_prop_settings = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@st.composite
def event_logs(draw, max_users=3, max_events=14):
    n = draw(st.integers(1, max_events))
    rows = []
    for _ in range(n):
        u = draw(st.integers(0, max_users - 1))
        secs = draw(st.integers(0, 500))
        s = draw(st.sampled_from(["a", "b", "c"]))
        rows.append((u, _T0 + datetime.timedelta(seconds=secs), s))
    return rows


@given(rows=event_logs())
@_prop_settings
def test_funnel_property(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        (r.step_idx, r.step, r.n_converted)
        for r in funnel(df, ["a", "b", "c"]).collect()
    }
    assert got == _brute(rows, ["a", "b", "c"])
