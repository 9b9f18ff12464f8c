"""Frame-level `hash_sample` and `topk_per_group` cross-checked
against brute-force Python replicas."""

import random
from collections import defaultdict

from spark_data_test_spark import hash_sample, topk_per_group

# ---------------------------------------------------------------------------
# hash_sample
# ---------------------------------------------------------------------------


def test_hash_sample_deterministic_and_calibrated(spark):
    rows = [(i, i % 7) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, grp long")
    s1 = {r.id for r in hash_sample(df, 0.3, "id").collect()}
    s2 = {r.id for r in hash_sample(df, 0.3, "id").collect()}
    assert s1 == s2  # pure function of the id: re-runs identical
    assert abs(len(s1) / 5000 - 0.3) < 0.03  # calibrated
    # a larger fraction is a SUPERSET (the hash threshold only moves)
    s_half = {r.id for r in hash_sample(df, 0.5, "id").collect()}
    assert s1 <= s_half
    # a different salt draws an (essentially) independent sample
    s_salted = {r.id for r in hash_sample(df, 0.3, "id", salt=1).collect()}
    assert s_salted != s1


def test_hash_sample_entity_consistency(spark):
    """Sampling on an entity column keeps each entity all-or-none."""
    rows = [(u, e) for u in range(300) for e in range(u % 4 + 1)]
    df = spark.createDataFrame(rows, "user_id long, event long")
    kept = defaultdict(set)
    for r in hash_sample(df, 0.4, "user_id").collect():
        kept[r.user_id].add(r.event)
    full = defaultdict(set)
    for u, e in rows:
        full[u].add(e)
    for u, evs in kept.items():
        assert evs == full[u]  # never a partial entity


def test_hash_sample_growth_never_reassigns(spark):
    """Adding rows never changes earlier verdicts (the reproducible
    incremental-build property rand() sampling lacks)."""
    small = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    big = spark.createDataFrame([(i,) for i in range(3000)], "id long")
    ks = {r.id for r in hash_sample(small, 0.25, "id").collect()}
    kb = {r.id for r in hash_sample(big, 0.25, "id").collect()}
    assert ks == {i for i in kb if i < 1000}


def test_hash_sample_rejects_bad_fraction(spark):
    df = spark.createDataFrame([(1,)], "id long")
    try:
        hash_sample(df, 1.5, "id")
        assert False, "expected ValueError"
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# topk_per_group
# ---------------------------------------------------------------------------


def _fixture(n=200, seed=227):
    rng = random.Random(seed)
    return [
        (rng.randrange(8), i, rng.randrange(50), rng.randrange(1000))
        for i in range(n)
    ]


def _brute_topk(rows, k, descending):
    by_g = defaultdict(list)
    for g, i, v, extra in rows:
        by_g[g].append((v, i, extra))
    out = set()
    for g, items in by_g.items():
        items.sort(reverse=descending)
        for rank, (v, i, extra) in enumerate(items[:k], start=1):
            out.add((g, i, v, extra, rank))
    return out


def test_topk_per_group_k1_aggregate_path(spark):
    rows = _fixture()
    df = spark.createDataFrame(rows, "g long, i long, v long, extra long")
    for descending in (True, False):
        got = {
            (r.g, r.i, r.v, r.extra, r.rank)
            for r in topk_per_group(
                df, "g", "v", k=1, descending=descending, tie_cols=["i"]
            ).collect()
        }
        # tie contract: largest (v, i) wins descending; smallest ascending
        expected = set()
        by_g = defaultdict(list)
        for g, i, v, extra in rows:
            by_g[g].append((v, i, extra))
        for g, items in by_g.items():
            items.sort(reverse=descending)
            v, i, extra = items[0]
            expected.add((g, i, v, extra, 1))
        assert got == expected, descending


def test_topk_per_group_window_path_matches_bruteforce(spark):
    rows = _fixture(seed=229)
    df = spark.createDataFrame(rows, "g long, i long, v long, extra long")
    got = {
        (r.g, r.i, r.v, r.extra, r.rank)
        for r in topk_per_group(df, "g", "v", k=3, tie_cols=["i"]).collect()
    }
    assert got == _brute_topk(rows, 3, True)


def test_topk_paths_agree_at_k1(spark):
    """The k=1 aggregate path and a k=1-sliced window path must pick
    identical rows (the tie contract is shared)."""
    rows = _fixture(seed=233)
    df = spark.createDataFrame(rows, "g long, i long, v long, extra long")
    agg = {
        (r.g, r.i, r.v)
        for r in topk_per_group(df, "g", "v", k=1, tie_cols=["i"]).collect()
    }
    win = {
        (r.g, r.i, r.v)
        for r in topk_per_group(df, "g", "v", k=2, tie_cols=["i"]).collect()
        if r.rank == 1
    }
    assert agg == win


def test_topk_per_group_null_order_consistent_across_paths(spark):
    """Advisory regression: both plans share one NULL contract — rows
    with a NULL order value never qualify, so an all-NULL group emits
    no rows at ANY k. Before the explicit filter the paths diverged:
    max_by (k=1) skipped null-ordered rows while row_number (k>1)
    sorted them NULLS LAST and returned one."""
    rows = [
        ("g1", 1, None),
        ("g1", 2, 5.0),
        ("g1", 3, 7.0),
        ("g2", 4, None),
        ("g2", 5, None),  # all-NULL group
    ]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    k1 = {
        (r.g, r.i)
        for r in topk_per_group(df, "g", "v", k=1, tie_cols=["i"]).collect()
    }
    k3 = {
        (r.g, r.i)
        for r in topk_per_group(df, "g", "v", k=3, tie_cols=["i"]).collect()
    }
    assert k1 == {("g1", 3)}
    assert k3 == {("g1", 3), ("g1", 2)}


def _bucket_py(v, salt=0):
    from spark_data_test_spark.operators.sampling import _HASH_PRIME, _KNUTH

    return ((v + salt) % _HASH_PRIME) * _KNUTH % 1000


def test_token_budget_matches_bruteforce(spark):
    from spark_data_test_spark import token_budget

    rows = [
        (i, "web" if i % 3 else "books", 50 + (i * 37) % 400)
        for i in range(1, 41)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")

    def brute(budget):
        kept = set()
        by_src = {}
        for did, src, nt in rows:
            by_src.setdefault(src, []).append((did, nt))
        for src, docs in by_src.items():
            docs.sort(key=lambda d: (_bucket_py(d[0]), d[0]))
            c = 0
            for did, nt in docs:
                if c < budget:  # c - n_tok < budget with straddler kept
                    kept.add(did)
                c += nt
        return kept

    for budget in (1, 300, 1500, 10**9):
        got = {
            r.doc_id
            for r in token_budget(df, "source", "doc_id", "n_tok", budget).collect()
        }
        assert got == brute(budget), budget
    # bigger budget EXTENDS the sample (prefix property)
    assert brute(300) <= brute(1500)
    got_small = {
        r.doc_id for r in token_budget(df, "source", "doc_id", "n_tok", 300).collect()
    }
    got_big = {
        r.doc_id for r in token_budget(df, "source", "doc_id", "n_tok", 1500).collect()
    }
    assert got_small <= got_big


def test_token_budget_matches_registered_query(spark, sf_dir):
    from pyspark.sql import functions as F

    from spark_data_test_spark import token_budget
    from spark_data_test_spark.operators.relational import t
    from spark_data_test_spark.operators.sampling import (
        _TOK_BUDGET,
        _n_tok_col,
        sample_token_budget,
    )

    toks = t(spark, sf_dir, "documents").select(
        "doc_id", "source", _n_tok_col().alias("n_tok")
    )
    lib = (
        token_budget(toks, "source", "doc_id", "n_tok", _TOK_BUDGET, salt=53)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tok").alias("tok_kept"),
        )
    )
    want = {
        (r.source, r.n_kept, r.tok_kept)
        for r in sample_token_budget(spark, sf_dir).collect()
    }
    got = {(r.source, r.n_kept, r.tok_kept) for r in lib.collect()}
    assert got == want and got


def test_token_budget_null_sizes_dropped_and_bad_budget(spark):
    from spark_data_test_spark import token_budget

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", None), (3, "a", 10)],
        "doc_id long, source string, n_tok long",
    )
    got = {
        r.doc_id
        for r in token_budget(df, "source", "doc_id", "n_tok", 10**6).collect()
    }
    assert got == {1, 3}
    try:
        token_budget(df, "source", "doc_id", "n_tok", 0)
        assert False, "expected ValueError for budget=0"
    except ValueError:
        pass


def test_token_budget_property_sweep(spark):
    from hypothesis import HealthCheck, given, settings, strategies as st

    from spark_data_test_spark import token_budget

    @st.composite
    def corpora(draw):
        n = draw(st.integers(1, 12))
        return [
            (
                draw(st.integers(-50, 10**7)),  # ids incl. negatives
                draw(st.sampled_from(["a", "b"])),
                draw(st.integers(1, 500)),
            )
            for _ in range(n)
        ]

    @given(
        rows=corpora(),
        budget=st.integers(1, 2000),
        salt=st.integers(0, 3),
    )
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def prop(rows, budget, salt):
        rows = list({r[0]: r for r in rows}.values())  # unique ids
        df = spark.createDataFrame(
            rows, "doc_id long, source string, n_tok long"
        )
        by_src = {}
        for did, src, nt in rows:
            by_src.setdefault(src, []).append((did, nt))
        kept = set()
        for src, docs in by_src.items():
            docs.sort(key=lambda d: (_bucket_py(d[0], salt), d[0]))
            c = 0
            for did, nt in docs:
                if c < budget:
                    kept.add(did)
                c += nt
        got = {
            r.doc_id
            for r in token_budget(
                df, "source", "doc_id", "n_tok", budget, salt=salt
            ).collect()
        }
        assert got == kept
        # extension property: doubling the budget only ADDS rows
        bigger = {
            r.doc_id
            for r in token_budget(
                df, "source", "doc_id", "n_tok", budget * 2, salt=salt
            ).collect()
        }
        assert got <= bigger

    prop()


def test_stratified_sample_contract(spark):
    """Round-12: per-stratum keep rates ride hash_sample's verdict —
    uniform rates equal hash_sample row-for-row, raising a rate only
    ADDS rows (nested samples), unlisted strata use default_rate, the
    verdict is repartition-stable, and the plan is a zero-shuffle
    scan-side filter."""
    import random

    from spark_data_test_spark import hash_sample, stratified_sample
    from spark_data_test_spark.plans.audit import count_shuffles

    rng = random.Random(163)
    rows = [
        (i, rng.choice(["wiki", "crawl", "spam"]), rng.randrange(1000))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, source string, uid long")

    uniform = stratified_sample(
        df, "source", {"wiki": 0.3, "crawl": 0.3, "spam": 0.3}, cols="uid"
    )
    assert {r.id for r in uniform.collect()} == {
        r.id for r in hash_sample(df, 0.3, "uid").collect()
    }

    lo = stratified_sample(
        df, "source", {"wiki": 1.0, "crawl": 0.1}, cols="uid"
    )
    hi = stratified_sample(
        df, "source", {"wiki": 1.0, "crawl": 0.4}, cols="uid"
    )
    lo_ids = {r.id for r in lo.collect()}
    hi_ids = {r.id for r in hi.collect()}
    assert lo_ids <= hi_ids                      # nested samples
    by_src = {r.id: r.source for r in df.collect()}
    assert all(by_src[i] != "spam" for i in lo_ids)  # default_rate=0
    assert {i for i in lo_ids if by_src[i] == "wiki"} == {
        i for i, s in by_src.items() if s == "wiki"
    }                                            # rate 1.0 keeps all
    # unlisted strata honor default_rate
    some_spam = stratified_sample(
        df, "source", {"wiki": 0.0}, cols="uid", default_rate=1.0
    )
    assert {i for i in (r.id for r in some_spam.collect())
            if by_src[i] == "wiki"} == set()
    # repartition-stable verdict, zero shuffles in the filter plan
    assert {r.id for r in stratified_sample(
        df.repartition(7), "source", {"wiki": 1.0, "crawl": 0.1},
        cols="uid",
    ).collect()} == lo_ids
    assert count_shuffles(
        stratified_sample(df, "source", {"wiki": 0.5}, cols="uid")
    ) == 0

    import pytest
    with pytest.raises(ValueError, match="rate"):
        stratified_sample(df, "source", {"wiki": 1.5}, cols="uid")
    with pytest.raises(ValueError, match="default_rate"):
        stratified_sample(df, "source", {}, cols="uid", default_rate=-1)


def test_stratified_sample_dotted_columns(spark):
    """Round-13 fix (ADVICE r12): strata/hash column names with dots
    are backtick-quoted like the text operators' — a dotted name is a
    top-level column, not a struct path."""
    from spark_data_test_spark import stratified_sample

    df = spark.createDataFrame(
        [(i, i) for i in range(60)],
        "id long, x long",
    ).selectExpr("id AS `my.id`", "x", "IF(x % 2 = 0, 'wiki', 'crawl') AS `src.name`").drop("x")
    kept = stratified_sample(
        df, "src.name", {"wiki": 1.0}, cols=["my.id", "src.name"]
    ).collect()
    assert kept and all(r["src.name"] == "wiki" for r in kept)
