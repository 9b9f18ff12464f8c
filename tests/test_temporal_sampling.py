"""Semantic + plan gates for the temporal joins and sampling operators.

The oracle harness checks cross-engine equality; these tests check the
SEMANTICS against brute-force Python on collected slices, and that the
physical plans avoid the nested-loop shapes the operators exist to
avoid.
"""

import pyspark.sql.functions as F

from spark_data_test_spark.operators import sampling, temporal
from spark_data_test_spark.operators.relational import t
from spark_data_test_spark.plans.audit import simple_plan


def _events(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )


def test_asof_join_matches_bruteforce(spark, sf_dir):
    rows = _events(spark, sf_dir)
    signups = {}
    for r in rows:
        if r.event_type == "signup":
            signups.setdefault(r.user_id, []).append((r.us, r.event_id))
    got = {
        r["event_id"]: r
        for r in temporal.events_asof_join(spark, sf_dir).collect()
    }
    purchases = [r for r in rows if r.event_type == "purchase"]
    assert len(got) == len(purchases)
    for p in purchases:
        # latest signup at-or-before; ties on ts -> max event_id
        cands = [s for s in signups.get(p.user_id, []) if s[0] <= p.us]
        r = got[p.event_id]
        if not cands:
            assert r["signup_event_id"] is None
            assert r["since_signup_us"] is None
        else:
            want = max(cands)
            assert r["signup_event_id"] == want[1]
            assert r["since_signup_us"] == p.us - want[0]


def test_asof_join_plan_single_pass_no_nested_loop(spark, sf_dir):
    plan = simple_plan(temporal.events_asof_join(spark, sf_dir))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # union-merge: the only join machinery is the window sort
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_matches_bruteforce(spark, sf_dir):
    rows = _events(spark, sf_dir)
    purchases = [r for r in rows if r.event_type == "purchase"]
    got = {
        r["err_id"]: r for r in temporal.events_range_join(spark, sf_dir).collect()
    }
    errors = [r for r in rows if r.event_type == "error"]
    assert len(got) == len(errors)
    for e in errors:
        hits = [
            p
            for p in purchases
            if p.user_id == e.user_id and e.us <= p.us < e.us + temporal._RANGE_US
        ]
        assert got[e.event_id]["n_purchases"] == len(hits)
        if not hits:
            assert got[e.event_id]["purchase_cents"] is None


def test_range_join_plan_is_hash_join_not_nested_loop(spark, sf_dir):
    plan = simple_plan(temporal.events_range_join(spark, sf_dir))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan  # the binned equi-join is a real hash join


def test_split_is_stable_and_partitions_everything(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    total = d.count()
    res = sampling.sample_split_stratified(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in res) == total
    by_split = {}
    for r in res:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    # multiplicative-hash buckets are near-uniform: train ~80%
    assert 0.7 < by_split["train"] / total < 0.9
    # determinism: identical on a second run
    assert sorted(map(tuple, res)) == sorted(
        map(tuple, sampling.sample_split_stratified(spark, sf_dir).collect())
    )


def test_mix_rates_are_respected(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    totals = {r["source"]: r["n"] for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept = {r["source"]: r["n_kept"] for r in sampling.mix_weighted_sources(spark, sf_dir).collect()}
    for src, total in totals.items():
        rate = sampling._MIX_RATES.get(src, sampling._MIX_DEFAULT) / 1000
        frac = kept.get(src, 0) / total
        assert abs(frac - rate) < 0.25, (src, frac, rate)


def test_pack_sequences_bins_are_contiguous_and_conserve_tokens(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    n_tok = (
        F.length(F.trim(F.col("text")))
        - F.length(F.replace(F.trim(F.col("text")), F.lit(" "), F.lit("")))
        + 1
    )
    tok_totals = {
        r["lang"]: r["s"]
        for r in d.groupBy("lang").agg(F.sum(n_tok).alias("s")).collect()
    }
    res = sampling.pack_sequences(spark, sf_dir).collect()
    by_lang = {}
    for r in res:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        assert sum(r["tok_total"] for r in rows) == tok_totals[lang]
        bins = sorted(r["bin"] for r in rows)
        assert bins == list(range(len(bins)))  # 0..k contiguous
        # next-fit invariant: a doc lands in bin b+1 only once the
        # tokens before it reach (b+1)*budget, so the cumulative total
        # through each non-final bin is at least that boundary
        cum = 0
        for r in sorted(rows, key=lambda r: r["bin"])[:-1]:
            cum += r["tok_total"]
            assert cum >= (r["bin"] + 1) * sampling._PACK_BUDGET


# --- property tests over the generic library operators -------------------

from hypothesis import HealthCheck, given, settings, strategies as st

_prop_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@st.composite
def _event_rows(draw, max_rows=14):
    n = draw(st.integers(0, max_rows))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,  # unique id
                draw(st.integers(0, 2)),  # key
                draw(st.integers(0, 50)),  # ts
            )
        )
    return rows


@given(ref_rows=_event_rows(), pt_rows=_event_rows())
@_prop_settings
def test_asof_join_property(spark, ref_rows, pt_rows):
    from spark_data_test_spark.operators.temporal import asof_join

    # make ref unique per (key, ts): keep max id (the operator contract)
    best = {}
    for i, k, ts in ref_rows:
        cur = best.get((k, ts))
        if cur is None or i > cur[0]:
            best[(k, ts)] = (i, k, ts)
    ref_rows = sorted(best.values())

    ref = spark.createDataFrame(
        [(i, k, ts) for i, k, ts in ref_rows] or [(None, None, None)],
        "rid long, k long, ts long",
    )
    if not ref_rows:
        ref = ref.where(F.lit(False))
    pts = spark.createDataFrame(
        [(i, k, ts) for i, k, ts in pt_rows] or [(None, None, None)],
        "pid long, k long, ts long",
    )
    if not pt_rows:
        pts = pts.where(F.lit(False))

    got = {
        r["pid"]: (r["rid"], r["_asof_ts"])
        for r in asof_join(pts, ref, keys=["k"], ts="ts").collect()
    }
    assert len(got) == len(pt_rows)
    for pid, k, ts in pt_rows:
        cands = [(rts, rid) for rid, rk, rts in ref_rows if rk == k and rts <= ts]
        if not cands:
            assert got[pid] == (None, None)
        else:
            want_ts, want_rid = max(cands)
            assert got[pid] == (want_rid, want_ts)


@st.composite
def _signed_event_rows(draw, max_rows=14):
    # negative timestamps included: exercises the floor-division chunk
    # mapping where truncate-toward-zero would misbucket
    n = draw(st.integers(0, max_rows))
    return [
        (i, draw(st.integers(0, 2)), draw(st.integers(-25, 25)))
        for i in range(n)
    ]


@given(
    ref_rows=_signed_event_rows(),
    pt_rows=_signed_event_rows(),
    chunk_width=st.sampled_from([1, 7, 100]),
)
@_prop_settings
def test_asof_join_split_equals_plain(spark, ref_rows, pt_rows, chunk_width):
    """The hot-key split variant must be indistinguishable from the
    single-window asof_join for every chunk width — width 1 (every row
    its own chunk, all matches via carry-over), 7 (boundaries land
    mid-data), 100 (one chunk per sign, carry across the 0 boundary)."""
    from spark_data_test_spark.operators.temporal import asof_join, asof_join_split

    best = {}
    for i, k, ts in ref_rows:
        cur = best.get((k, ts))
        if cur is None or i > cur[0]:
            best[(k, ts)] = (i, k, ts)
    ref_rows = sorted(best.values())

    ref = spark.createDataFrame(
        [(i, k, ts) for i, k, ts in ref_rows] or [(None, None, None)],
        "rid long, k long, ts long",
    )
    if not ref_rows:
        ref = ref.where(F.lit(False))
    pts = spark.createDataFrame(
        [(i, k, ts) for i, k, ts in pt_rows] or [(None, None, None)],
        "pid long, k long, ts long",
    )
    if not pt_rows:
        pts = pts.where(F.lit(False))

    plain = asof_join(pts, ref, keys=["k"], ts="ts")
    split = asof_join_split(pts, ref, keys=["k"], ts="ts", chunk_width=chunk_width)
    assert split.columns == plain.columns
    assert sorted(map(tuple, split.collect())) == sorted(
        map(tuple, plain.collect())
    )


@given(iv_rows=_event_rows(), pt_rows=_event_rows(), width=st.integers(1, 20))
@_prop_settings
def test_range_join_binned_property(spark, iv_rows, pt_rows, width):
    from spark_data_test_spark.operators.temporal import range_join_binned

    # intervals: [ts, ts + id % 7) (some empty), any bucket width —
    # hits must equal the brute-force predicate for every width
    ivs = [(i, k, ts, ts + (i % 7)) for i, k, ts in iv_rows]
    iv = spark.createDataFrame(
        ivs or [(None, None, None, None)], "iid long, k long, s long, e long"
    )
    if not ivs:
        iv = iv.where(F.lit(False))
    pts = spark.createDataFrame(
        [(i, k, ts) for i, k, ts in pt_rows] or [(None, None, None)],
        "pid long, k long, ts long",
    )
    if not pt_rows:
        pts = pts.where(F.lit(False))

    got = {
        (r["iid"], r["pid"])
        for r in range_join_binned(
            iv, pts, keys=["k"], start="s", end="e", ts="ts", bucket_width=width
        ).collect()
    }
    want = {
        (iid, pid)
        for iid, ik, s, e in ivs
        for pid, pk, ts in pt_rows
        if pk == ik and s <= ts < e
    }
    assert got == want


@given(
    ids=st.lists(st.integers(0, 10**9), max_size=14, unique=True),
    salt=st.integers(0, 100),
)
@_prop_settings
def test_split_assign_stable_under_row_changes(spark, ids, salt):
    from spark_data_test_spark.operators.sampling import split_assign

    df = spark.createDataFrame([(i,) for i in ids] or [(None,)], "id long")
    if not ids:
        df = df.where(F.lit(False))
    full = {
        r["id"]: r["split"]
        for r in split_assign(df, "id", salt=salt).collect()
    }
    # dropping half the rows must not reassign the survivors
    half_ids = ids[::2]
    half = spark.createDataFrame(
        [(i,) for i in half_ids] or [(None,)], "id long"
    )
    if not half_ids:
        half = half.where(F.lit(False))
    for r in split_assign(half, "id", salt=salt).collect():
        assert full[r["id"]] == r["split"]


@given(rows=_event_rows(), budget=st.integers(1, 30))
@_prop_settings
def test_pack_bins_property(spark, rows, budget):
    from spark_data_test_spark.operators.sampling import pack_bins

    # (id, key, size) with size >= 1
    data = [(i, k, ts + 1) for i, k, ts in rows]
    df = spark.createDataFrame(
        data or [(None, None, None)], "id long, k long, sz long"
    )
    if not data:
        df = df.where(F.lit(False))
    got = {
        r["id"]: r["bin"]
        for r in pack_bins(df, ["k"], "id", "sz", budget).collect()
    }
    by_key = {}
    for i, k, sz in sorted(data):
        by_key.setdefault(k, []).append((i, sz))
    for k, items in by_key.items():
        cum = 0
        for i, sz in items:
            assert got[i] == cum // budget
            cum += sz


def test_asof_join_null_ref_attribute_stays_null(spark):
    # the matched (latest) ref row has a NULL attribute; the join must
    # return that NULL, not stitch in the attribute of an OLDER ref row
    from spark_data_test_spark.operators.temporal import asof_join

    ref = spark.createDataFrame(
        [(1, 3, "a"), (1, 5, None)], "k long, ts long, attr string"
    )
    pts = spark.createDataFrame([(10, 1, 6)], "pid long, k long, ts long")
    row = asof_join(pts, ref, keys=["k"], ts="ts").first()
    assert row["_asof_ts"] == 5
    assert row["attr"] is None


def test_split_assign_negative_and_huge_ids(spark):
    from spark_data_test_spark.operators.sampling import split_assign

    ids = [-5, -1, 0, 2**40, 2**62, 4_000_000_000]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    rows = split_assign(df, "id").collect()
    assert len(rows) == len(ids)
    # every row gets a valid split; buckets are non-negative by
    # construction so no id can unconditionally land in 'train'
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # and the arithmetic is overflow-free: rerun agrees exactly
    again = {r["id"]: r["split"] for r in split_assign(df, "id").collect()}
    for r in rows:
        assert again[r["id"]] == r["split"]


def test_gap_fill_spans_are_contiguous(spark, sf_dir):
    from spark_data_test_spark.operators.temporal import events_gap_fill

    rows = events_gap_fill(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user_rows in by_user.values():
        days = sorted(r["day"] for r in user_rows)
        # dense: exactly one row per day in [min, max]
        assert days == list(range(days[0], days[-1] + 1))
        for r in user_rows:
            # filled days have zero events; active days at least one
            assert (r["n_events"] == 0) == (r["gap_filled"] == 1)


def test_retention_cohort_invariants(spark, sf_dir):
    from spark_data_test_spark.operators.relational import t as _t
    from spark_data_test_spark.operators.temporal import events_retention_cohorts

    rows = events_retention_cohorts(spark, sf_dir).collect()
    n_users = _t(spark, sf_dir, "events").select("user_id").distinct().count()
    # week 0 contains every cohort member exactly once
    week0 = sum(r["n_users"] for r in rows if r["week_offset"] == 0)
    assert week0 == n_users
    assert all(r["week_offset"] >= 0 for r in rows)
    # retention never exceeds the cohort's week-0 size
    size0 = {
        r["cohort_week"]: r["n_users"] for r in rows if r["week_offset"] == 0
    }
    for r in rows:
        assert r["n_users"] <= size0[r["cohort_week"]]


@st.composite
def _attr_stream(draw, max_rows=16):
    n = draw(st.integers(0, max_rows))
    rows = []
    for i in range(n):
        rows.append(
            (
                draw(st.integers(0, 2)),  # key
                draw(st.sampled_from(["a", "b", None])),  # attr (incl NULL)
                draw(st.integers(0, 30)),  # ts (collisions likely)
                i,  # unique tie-break
            )
        )
    return rows


@given(rows=_attr_stream())
@_prop_settings
def test_scd2_build_property_nullsafe_runs(spark, rows):
    from spark_data_test_spark.operators.temporal import scd2_build

    df = spark.createDataFrame(
        rows or [(0, "a", 0, 0)][:0],
        "key int, attr string, ts long, tie long",
    )
    got = {}
    for r in scd2_build(df, key="key", attr="attr", ts="ts", tie="tie").collect():
        got.setdefault(r.key, []).append(r)

    # brute force: null-safe run-length encoding per key in (ts, tie) order
    want = {}
    for k in {r[0] for r in rows}:
        seq = sorted((r for r in rows if r[0] == k), key=lambda r: (r[2], r[3]))
        runs, prev, sentinel = [], object(), object()
        prev = sentinel
        for _, attr, ts, tie in seq:
            if prev is sentinel or attr != prev:
                runs.append((attr, ts, tie))
            prev = attr
        # leading NULL run: lag yields NULL == NULL null-safely -> no version
        if runs and runs[0][0] is None:
            runs = runs[1:]
        if runs:
            want[k] = runs

    assert set(got) == set(want)
    for k, vrows in got.items():
        vrows.sort(key=lambda r: r.version)
        assert [r.version for r in vrows] == list(range(1, len(vrows) + 1))
        assert [(r.attr, r.ts) for r in vrows] == [(a, ts) for a, ts, _ in want[k]]
        for a, b in zip(vrows, vrows[1:]):
            assert a.valid_to_us == b.ts
        assert vrows[-1].valid_to_us is None
