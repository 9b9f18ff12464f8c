"""Frame-level `retention_cohorts` cross-checked against a Python
replica: weekly cohorts over daily activity buckets, exact distinct
user counts per (cohort, offset) cell."""

from spark_data_test_spark import retention_cohorts


def _py_retention(rows, period=7):
    by_user = {}
    for u, d in rows:
        by_user.setdefault(u, set()).add(d)
    cells = {}
    for u, days in by_user.items():
        d0 = min(days)
        cohort = d0 // period
        for d in days:
            off = (d - d0) // period
            cells.setdefault((cohort, off), set()).add(u)
    return {(c, o, len(us)) for (c, o), us in cells.items()}


def test_retention_cohorts_matches_python_replica(spark):
    rows = [
        # cohort week 0 (first day 0-6): u1 returns weeks 0,1,3; u2 only week 0
        ("u1", 0), ("u1", 3), ("u1", 9), ("u1", 22),
        ("u2", 5), ("u2", 6),
        # cohort week 2: u3 returns in its week 0 and 1
        ("u3", 14), ("u3", 20), ("u3", 21),
        # duplicate (user, day) rows must not double-count
        ("u1", 3), ("u3", 14),
    ]
    df = spark.createDataFrame(rows, "user_id string, day long")
    got = {
        (r.cohort, r.period_offset, r.n_users)
        for r in retention_cohorts(df).collect()
    }
    assert got == _py_retention(rows)
    # the week-0 cell counts both cohort-0 users exactly once
    assert (0, 0, 2) in got


def test_retention_cohorts_custom_period_and_columns(spark):
    rows = [("a", 100), ("a", 101), ("b", 100), ("b", 130)]
    df = spark.createDataFrame(rows, "uid string, bucket long")
    got = {
        (r.cohort, r.period_offset, r.n_users)
        for r in retention_cohorts(
            df, user_col="uid", bucket_col="bucket", period=30
        ).collect()
    }
    assert got == _py_retention(rows, period=30)
