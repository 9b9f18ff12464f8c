"""Frame-level `cohort_ltv` and `duplicate_scan` cross-checked against
brute-force Python replicas (round 11)."""

import random

from spark_data_test_spark import cohort_ltv, duplicate_scan


def _ltv_rows(seed=29, users=15, n=150):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        # include pre-epoch (negative) buckets: cohort assignment must
        # FLOOR, not truncate toward zero
        rows.append(
            (i, rng.randrange(users), rng.randrange(-20, 60), rng.randrange(1, 100))
        )
    return rows


def _brute_ltv(rows, w):
    d0 = {}
    for _, u, d, _v in rows:
        d0[u] = min(d0.get(u, d), d)
    out = {}
    for _, u, d, v in rows:
        cohort = d0[u] // w  # python // floors
        off = (d - d0[u]) // w
        out[(cohort, off)] = out.get((cohort, off), 0) + v
    csize = {}
    for u, d in d0.items():
        csize[d // w] = csize.get(d // w, 0) + 1
    expected = {}
    for cohort in {c for c, _ in out}:
        cum = 0
        for off in sorted(o for c, o in out if c == cohort):
            cum += out[(cohort, off)]
            expected[(cohort, off)] = (
                out[(cohort, off)],
                cum,
                csize[cohort],
                cum / csize[cohort],
            )
    return expected


def test_cohort_ltv_matches_bruteforce(spark):
    rows = _ltv_rows()
    df = spark.createDataFrame(rows, "eid long, user long, day long, v long")
    got = {
        (r.cohort, r.period_offset): (
            r.period_value,
            r.cum_value,
            r.cohort_users,
            round(r.ltv_per_user, 9),
        )
        for r in cohort_ltv(df, "user", "day", "v", cohort_width=7).collect()
    }
    expected = {
        k: (pv, cv, cu, round(l, 9))
        for k, (pv, cv, cu, l) in _brute_ltv(rows, 7).items()
    }
    assert got == expected
    assert any(c < 0 for c, _ in got), "fixture must exercise negative cohorts"


def test_cohort_ltv_rejects_bad_width(spark):
    df = spark.createDataFrame([(1, 1, 1)], "u long, d long, v long")
    try:
        cohort_ltv(df, "u", "d", "v", cohort_width=0)
        assert False, "expected ValueError"
    except ValueError:
        pass


def _pay_rows(seed=37, entities=8, n=80):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        amt = rng.randrange(100, 5000)
        rows.append((i, rng.randrange(entities), amt, rng.randrange(0, 40)))
        if rng.random() < 0.25:  # plant a near-duplicate
            rows.append(
                (
                    1000 + i,
                    rows[-1][1],
                    amt + rng.randrange(-5, 6),
                    rows[-1][3] + rng.randrange(0, 4),
                )
            )
    return rows


def _brute_pay(rows, max_apart, tn, td):
    out = set()
    for ia, ea, aa, ta in rows:
        for ib, eb, ab, tb in rows:
            if (
                ea == eb
                and ia < ib
                and abs(ta - tb) <= max_apart
                and td * abs(aa - ab) <= tn * min(aa, ab)
            ):
                out.add((ea, ia, ib, aa, ab, abs(ta - tb)))
    return out


def test_duplicate_scan_matches_bruteforce(spark):
    rows = [(i, e, a, t) for i, e, a, t in _pay_rows()]
    df = spark.createDataFrame(rows, "pay_id long, vendor long, cents long, day long")
    got = {
        (r.entity, r.id_a, r.id_b, r.amount_a, r.amount_b, r.time_apart)
        for r in duplicate_scan(
            df, "vendor", "pay_id", "cents", "day", max_time_apart=3
        ).collect()
    }
    assert got == _brute_pay(rows, 3, 10, 1000)
    assert got, "fixture planted no duplicates — not a real test"


def test_duplicate_scan_tolerance_is_division_free_exact(spark):
    # 1% of 1000 = 10: delta 10 matches, delta 11 does not
    df = spark.createDataFrame(
        [(1, 5, 1000, 0), (2, 5, 1010, 1), (3, 5, 1011, 1)],
        "id long, e long, amt long, t long",
    )
    got = {
        (r.id_a, r.id_b)
        for r in duplicate_scan(df, "e", "id", "amt", "t", 5).collect()
    }
    assert (1, 2) in got and (1, 3) not in got
    # (2,3): delta 1 vs least 1010 — matches
    assert (2, 3) in got
