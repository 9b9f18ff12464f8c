"""Frame-level `fingerprint` and `hypertable_rollup` cross-checked
against brute-force Python replicas (round 11)."""

import datetime
import hashlib
import random

from pyspark.sql import functions as F

from spark_data_test_spark import fingerprint, hypertable_rollup


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def _brute_fp(rows, n_hashes, L, stride):
    out = {}
    for doc_id, text in rows:
        if len(text) < L:
            continue
        shingles = [text[i : i + L] for i in range(0, len(text) - L + 1, stride)]
        out[doc_id] = tuple(
            min(_md5(s + f"#{k}") for s in shingles) for k in range(n_hashes)
        )
    return out


def test_fingerprint_matches_bruteforce_and_has_no_shuffle(spark):
    rng = random.Random(19)
    rows = [
        (i, "".join(rng.choice("abcdef gh") for _ in range(rng.randrange(0, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = fingerprint(df, n_hashes=3, shingle_len=8, stride=4)
    got = {
        r.doc_id: (r.fp0, r.fp1, r.fp2) for r in res.collect()
    }
    assert got == _brute_fp(rows, 3, 8, 4)
    assert got, "fixture produced no fingerprints"
    # in-row plan: zero shuffles (the registered explode+groupBy
    # formulation pays one; the export must not)
    from spark_data_test_spark.plans.audit import count_shuffles

    assert count_shuffles(res) == 0
    # identical text => identical fingerprints (the dedup pre-key)
    twins = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghij")], "doc_id long, text string"
    )
    fps = fingerprint(twins).collect()
    assert len(fps) == 2
    assert fps[0][1:] == fps[1][1:]


def test_fingerprint_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    for kw in ({"n_hashes": 0}, {"shingle_len": 0}, {"stride": 0}):
        try:
            fingerprint(df, **kw)
            assert False, f"expected ValueError for {kw}"
        except ValueError:
            pass


def _events(spark, n=300, seed=7):
    rng = random.Random(seed)
    base = datetime.datetime(2024, 3, 1, tzinfo=datetime.timezone.utc)
    rows = [
        (
            i,
            rng.choice(["a", "b"]),
            base + datetime.timedelta(minutes=rng.randrange(0, 60 * 72)),
            rng.randrange(1, 500),
        )
        for i in range(n)
    ]
    return rows, spark.createDataFrame(
        rows, "event_id long, kind string, ts timestamp, v long"
    )


def test_hypertable_rollup_matches_bruteforce(spark):
    rows, df = _events(spark)
    res = hypertable_rollup(
        df,
        "ts",
        [F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")],
        {"day": 86400, "hour": 3600},
        keys=["kind"],
    ).collect()
    got = {
        (r.kind, r.day, r.hour): (r.n, r.sv) for r in res
    }
    assert len(got) == len(res), "duplicate grouping-set rows"
    expected = {}
    for _, kind, ts, v in rows:
        us = int(ts.timestamp() * 1_000_000)
        day, hour = us // (86400 * 10**6), us // (3600 * 10**6)
        for key in ((kind, day, hour), (kind, day, None), (kind, None, None)):
            n, sv = expected.get(key, (0, 0))
            expected[key] = (n + 1, sv + v)
    assert got == expected
    # the hierarchy is genuine: every hour row nests inside its day
    for kind, day, hour in got:
        if hour is not None:
            assert day == hour * 3600 // 86400


def test_hypertable_rollup_keyless_and_grand_total(spark):
    rows, df = _events(spark, n=100, seed=11)
    res = {
        (r.day, r.hour): r.n
        for r in hypertable_rollup(
            df, "ts", [F.count(F.lit(1)).alias("n")],
            {"day": 86400, "hour": 3600},
        ).collect()
    }
    assert res[(None, None)] == len(rows)
    day_total = sum(v for (d, h), v in res.items() if h is None and d is not None)
    hour_total = sum(v for (d, h), v in res.items() if h is not None)
    assert day_total == hour_total == len(rows)


def test_hypertable_rollup_rejects_non_nesting_buckets(spark):
    _, df = _events(spark, n=5)
    aggs = [F.count(F.lit(1)).alias("n")]
    for bad in (
        {"day": 86400, "odd": 7 * 3600},   # 86400 % 25200 != 0
        {"hour": 3600, "day": 86400},      # not decreasing
        {"zero": 0},
        {},
    ):
        try:
            hypertable_rollup(df, "ts", aggs, bad)
            assert False, f"expected ValueError for {bad}"
        except ValueError:
            pass


def test_chunk_documents_matches_bruteforce_no_shuffle(spark):
    from spark_data_test_spark import chunk_documents
    from spark_data_test_spark.plans.audit import count_shuffles

    rows = [
        (1, "abcdefghijklmnop"),   # 16 chars
        (2, "xyz"),                # shorter than a chunk
        (3, ""),                   # empty: no rows
        (4, None),                 # NULL: no rows
        (5, "a" * 23),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def brute(chunk, ov):
        stride = chunk - ov
        out = set()
        for did, text in rows:
            if not text:
                continue
            for cid, start in enumerate(range(0, len(text), stride)):
                piece = text[start : start + chunk]
                out.add((did, cid, piece, len(piece)))
        return out

    for chunk, ov in ((5, 0), (5, 2), (100, 10)):
        res = chunk_documents(df, chunk, overlap=ov)
        got = {
            (r.doc_id, r.chunk_id, r.chunk, r.n_chars) for r in res.collect()
        }
        assert got == brute(chunk, ov), (chunk, ov)
        assert count_shuffles(res) == 0
    # overlap reconstruction: stride-offset chunks cover every char
    covered = sorted(
        (r.chunk_id, r.chunk)
        for r in chunk_documents(df.where("doc_id = 1"), 5, 2).collect()
    )
    text = rows[0][1]
    rebuilt = covered[0][1] + "".join(c[2:] for _, c in covered[1:])
    assert rebuilt == text


def test_chunk_documents_rejects_bad_params(spark):
    from spark_data_test_spark import chunk_documents

    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    for kw in ({"chunk_chars": 0}, {"chunk_chars": 5, "overlap": 5},
               {"chunk_chars": 5, "overlap": -1}):
        try:
            chunk_documents(df, **kw)
            assert False, f"expected ValueError for {kw}"
        except ValueError:
            pass


def test_dotted_column_names_are_quoted_consistently(spark):
    """Round-12 (ADVICE r11): fingerprint, chunk_documents, and
    duplicate_ngram_spans must backtick-quote EVERY user-supplied
    column name — a dotted id or text column worked in some
    expressions and broke in others."""
    from spark_data_test_spark import (
        chunk_documents,
        duplicate_ngram_spans,
        fingerprint,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "completely different words in this third document"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).select(
        F.col("doc_id").alias("doc.id"), F.col("text").alias("body.txt")
    )
    fp = fingerprint(df, id_col="doc.id", text_col="body.txt").collect()
    assert len(fp) == 3
    ch = chunk_documents(
        df, 16, overlap=4, id_col="doc.id", text_col="body.txt"
    ).collect()
    assert len(ch) > 3 and ch[0].chunk
    spans = duplicate_ngram_spans(
        df, n=3, id_col="doc.id", text_col="body.txt"
    ).collect()
    assert {getattr(r, "doc.id") for r in spans} == {1, 2}
