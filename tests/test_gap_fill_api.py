"""Frame-level `gap_fill` cross-checked against a Python replica:
per-key dense bucket spines, zero-filled values, gap flags."""

from spark_data_test_spark import gap_fill


def _py_gap_fill(rows, step=1):
    by_key = {}
    for k, b, v in rows:
        by_key.setdefault(k, {})[b] = v
    out = set()
    for k, buckets in by_key.items():
        lo, hi = min(buckets), max(buckets)
        for b in range(lo, hi + 1, step):
            if b in buckets:
                out.add((k, b, buckets[b], 0))
            else:
                out.add((k, b, 0, 1))
    return out


def test_gap_fill_matches_python_replica(spark):
    rows = [
        ("u1", 10, 3),
        ("u1", 13, 1),  # gap 11, 12
        ("u1", 14, 2),
        ("u2", 5, 7),  # single bucket: no gaps
        ("u3", 0, 1),
        ("u3", 4, 1),  # gaps 1..3
    ]
    df = spark.createDataFrame(rows, "user_id string, day long, n long")
    got = {
        (r.user_id, r.day, r.n, r.gap_filled)
        for r in gap_fill(df, ["user_id"], "day", value_cols=["n"]).collect()
    }
    assert got == _py_gap_fill(rows)


def test_gap_fill_step_and_no_value_cols(spark):
    rows = [("a", 0, 1), ("a", 6, 1)]
    df = spark.createDataFrame(rows, "k string, b long, n long")
    got = sorted(
        (r.b, r.gap_filled)
        for r in gap_fill(df, ["k"], "b", value_cols=["n"], step=2).collect()
    )
    assert got == [(0, 0), (2, 1), (4, 1), (6, 0)]
    # without value columns every row flags 0 (nothing to probe)
    plain = gap_fill(df.select("k", "b"), ["k"], "b")
    assert all(r.gap_filled == 0 for r in plain.collect())
