"""Frame-level `transition_matrix` and `tfidf_topk` cross-checked
against brute-force Python replicas on seeded random frames."""

import random
from collections import Counter, defaultdict

from spark_data_test_spark import tfidf_topk, transition_matrix

# ---------------------------------------------------------------------------
# transition_matrix
# ---------------------------------------------------------------------------

_STATES = ["view", "cart", "buy", "error"]


def _event_fixture(n_users=8, n_events=200, seed=17):
    rng = random.Random(seed)
    rows = []
    for i in range(n_events):
        rows.append(
            (rng.randrange(n_users), i, rng.choice(_STATES))
        )
    return rows


def _brute_transitions(rows):
    by_user = defaultdict(list)
    for u, i, s in rows:
        by_user[u].append((i, s))
    counts = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, a), (_, b) in zip(seq, seq[1:]):
            counts[(a, b)] += 1
    row_tot = Counter()
    for (a, _), n in counts.items():
        row_tot[a] += n
    return {
        (a, b, n, round(n / row_tot[a], 12))
        for (a, b), n in counts.items()
    }


def test_transition_matrix_matches_bruteforce(spark):
    rows = _event_fixture()
    df = spark.createDataFrame(rows, "user_id long, seq long, event_type string")
    got = {
        (r.prev_state, r.next_state, r.n, round(r.p, 12))
        for r in transition_matrix(
            df, state_col="event_type", keys="user_id", order_cols=["seq"]
        ).collect()
    }
    assert got == _brute_transitions(rows)
    # probabilities per prev_state row sum to 1
    by_prev = defaultdict(float)
    for a, _, _, p in got:
        by_prev[a] += p
    assert all(abs(s - 1.0) < 1e-9 for s in by_prev.values())


def test_transition_matrix_single_event_users_contribute_nothing(spark):
    rows = [(1, 0, "view"), (2, 0, "buy"), (3, 0, "view"), (3, 1, "buy")]
    df = spark.createDataFrame(rows, "user_id long, seq long, event_type string")
    got = transition_matrix(
        df, keys="user_id", order_cols=["seq"]
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.prev_state, r.next_state, r.n, r.p) == ("view", "buy", 1, 1.0)


# ---------------------------------------------------------------------------
# tfidf_topk
# ---------------------------------------------------------------------------

_VOCAB = ["the", "cat", "dog", "ran", "fast", "slow", "jumps", "zebra"]


def _doc_fixture(n_docs=20, seed=29):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(_VOCAB) for _ in range(rng.randint(3, 15))))
        for i in range(n_docs)
    ]


def _brute_tfidf(docs, k):
    tf = Counter()
    for did, text in docs:
        for tok in text.split(" "):
            if tok:
                tf[(did, tok)] += 1
    df = Counter()
    for (_, tok) in tf:
        df[tok] += 1
    out = set()
    by_doc = defaultdict(list)
    for (did, tok), n in tf.items():
        by_doc[did].append((-(n / df[tok]), tok, n, df[tok]))
    for did, terms in by_doc.items():
        terms.sort()
        for rank, (_, tok, n, d) in enumerate(terms[:k], start=1):
            out.add((did, tok, n, d, rank))
    return out


def test_tfidf_topk_matches_bruteforce(spark):
    docs = _doc_fixture()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.tok, r.tf, r.df, r.rank)
        for r in tfidf_topk(df, k=3).collect()
    }
    assert got == _brute_tfidf(docs, 3)


def test_tfidf_topk_custom_columns_and_empty_tokens(spark):
    docs = [(10, "a  a b"), (20, "b c")]  # double space: empty token dropped
    df = spark.createDataFrame(docs, "id long, body string")
    got = {
        (r.id, r.tok, r.tf, r.df, r.rank)
        for r in tfidf_topk(df, k=2, id_col="id", text_col="body").collect()
    }
    # doc 10: a tf=2 df=1 (ratio 2), b tf=1 df=2 (0.5) -> a rank1, b rank2
    # doc 20: c tf=1 df=1 (1), b tf=1 df=2 (0.5) -> c rank1, b rank2
    assert got == {
        (10, "a", 2, 1, 1),
        (10, "b", 1, 2, 2),
        (20, "c", 1, 1, 1),
        (20, "b", 1, 2, 2),
    }
