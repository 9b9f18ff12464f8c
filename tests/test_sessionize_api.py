"""Frame-level `sessionize` cross-checked against a brute-force Python
gaps-and-islands replica on a seeded random event log: session
boundaries (start/end timestamps) and per-session event counts must
match exactly, including single-event sessions and multi-key frames."""

import datetime
import random

from spark_data_test_spark import sessionize

_T0 = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _fixture(n_users=6, n_events=120, seed=19, max_step_min=75):
    """Random per-user event times with steps straddling the 30-minute
    gap on both sides, plus duplicate timestamps (same-second events
    must land in one session)."""
    rng = random.Random(seed)
    rows = []
    for u in range(n_users):
        t = _T0 + datetime.timedelta(minutes=rng.randint(0, 59))
        for _ in range(n_events // n_users):
            rows.append((u, t))
            if rng.random() < 0.15:
                rows.append((u, t))  # duplicate timestamp
            t = t + datetime.timedelta(
                minutes=rng.randint(0, max_step_min),
                seconds=rng.randint(0, 59),
            )
    return rows


def _brute(rows, gap_minutes=30):
    gap = datetime.timedelta(minutes=gap_minutes)
    by_user = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(t)
    out = set()
    for u, ts in by_user.items():
        ts.sort()
        start, end, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if t - end > gap:
                out.add((u, start, end, n))
                start, end, n = t, t, 1
            else:
                end, n = t, n + 1
        out.add((u, start, end, n))
    return out


def test_sessionize_matches_bruteforce(spark):
    rows = _fixture()
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(df, gap="30 minutes").collect()
    }
    expected = _brute(rows)
    assert got == expected
    # the fixture straddles the gap: both multi-event and single-event
    # sessions must exist or the test is vacuous
    assert any(n > 1 for _, _, _, n in expected)
    assert any(n == 1 for _, _, _, n in expected)


def test_sessionize_gap_parameter(spark):
    rows = _fixture(seed=31)
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    for gap_min in (5, 120):
        got = {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in sessionize(df, gap=f"{gap_min} minutes").collect()
        }
        assert got == _brute(rows, gap_minutes=gap_min)


def test_sessionize_multi_key(spark):
    """Composite keys: sessions never merge across (user, device)."""
    rows = [
        (u, d, t)
        for (u, t) in _fixture(n_users=3, n_events=45, seed=43)
        for d in ("a", "b")
    ]
    df = spark.createDataFrame(rows, "user_id long, device string, ts timestamp")
    got = {
        (r.user_id, r.device, r.session_start, r.session_end, r.n_events)
        for r in sessionize(df, keys=["user_id", "device"]).collect()
    }
    expected = {
        (u, d, s, e, n)
        for d in ("a", "b")
        for (u, s, e, n) in _brute(
            [(u, t) for (u, dd, t) in rows if dd == d]
        )
    }
    assert got == expected


# ---------------------------------------------------------------------------
# RANDOM event logs (hypothesis): session boundaries must match the
# brute-force replica for ANY step pattern, including all-in-one-gap
# and all-isolated extremes the seeded fixture may miss.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st

_prop_settings = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@st.composite
def event_logs(draw, max_users=3, max_events=12):
    n = draw(st.integers(1, max_events))
    rows = []
    for _ in range(n):
        u = draw(st.integers(0, max_users - 1))
        mins = draw(st.integers(0, 300))
        rows.append((u, _T0 + datetime.timedelta(minutes=mins)))
    return rows


def test_sessionize_exact_gap_boundary_merges(spark):
    """Events exactly `gap` apart MERGE (Spark's session_window extends
    each session to last-event + gap and merges on touch; the brute
    replica's `> gap` split matches). Pinned explicitly because a
    half-open reading of the window would split here."""
    rows = [(1, _T0), (1, _T0 + datetime.timedelta(minutes=30))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = [
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(df, gap="30 minutes").collect()
    ]
    assert got == [(1, rows[0][1], rows[1][1], 2)]
    assert _brute(rows) == set(got)


@given(rows=event_logs())
@_prop_settings
def test_sessionize_property(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(df, gap="30 minutes").collect()
    }
    assert got == _brute(rows)


# ---------------------------------------------------------------------------
# top_session_paths: session path mining over the same gap rule
# ---------------------------------------------------------------------------


def _brute_paths(rows, k, gap_minutes=30, sep=">"):
    """rows: (user, ts, state). Sessions by the gap rule; paths order
    by (ts, state); top-k by (count desc, path asc)."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, t, s in rows:
        by_user[u].append((t, s))
    gap = datetime.timedelta(minutes=gap_minutes)
    counts = defaultdict(int)
    for seq in by_user.values():
        seq.sort()
        cur, end = [], None
        for t, s in seq:
            if end is not None and t - end > gap:
                counts[sep.join(s2 for _, s2 in sorted(cur))] += 1
                cur = []
            cur.append((t, s))
            end = t
        counts[sep.join(s2 for _, s2 in sorted(cur))] += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return set(ranked[:k])


def test_top_session_paths_matches_bruteforce(spark):
    from spark_data_test_spark import top_session_paths

    rng = random.Random(173)
    rows = [
        (
            rng.randrange(5),
            _T0 + datetime.timedelta(minutes=rng.randrange(600)),
            rng.choice(["view", "cart", "buy"]),
        )
        for _ in range(150)
    ]
    # dedupe (user, ts) so intra-second ordering is total on both sides
    rows = list({(u, t): (u, t, s) for u, t, s in rows}.values())
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        (r.path, r.n_sessions)
        for r in top_session_paths(df, k=10).collect()
    }
    assert got == _brute_paths(rows, 10)


def test_top_session_paths_k_and_sep(spark):
    from spark_data_test_spark import top_session_paths

    rows = [
        (1, _T0, "a"),
        (1, _T0 + datetime.timedelta(minutes=1), "b"),
        (2, _T0, "a"),
        (2, _T0 + datetime.timedelta(minutes=1), "b"),
        (3, _T0, "c"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = [(r.path, r.n_sessions)
           for r in top_session_paths(df, k=1, sep="->").collect()]
    assert got == [("a->b", 2)]


def test_top_session_paths_topk_is_take_ordered(spark):
    """Round-13 pin (VERDICT r12 item 1b): the export's top-k plans as
    TakeOrderedAndProject — per-partition heaps merged on the driver —
    never an unpartitioned row_number window sorting the distinct-path
    counts (which grow with users x sessions) through one task."""
    from spark_data_test_spark import top_session_paths
    from spark_data_test_spark.plans.audit import simple_plan

    rows = [
        (1, _T0, "a"),
        (1, _T0 + datetime.timedelta(minutes=1), "b"),
        (2, _T0, "a"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    plan = simple_plan(top_session_paths(df, k=5))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort [n_sessions" not in plan, plan
