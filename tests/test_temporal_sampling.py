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
