"""Frame-level `pii_scrub`, `repetition_profile`, and `latest_wins`
cross-checked against brute-force Python replicas."""

import random
import re
from collections import Counter

from spark_data_test_spark import latest_wins, pii_scrub, repetition_profile

# ---------------------------------------------------------------------------
# pii_scrub
# ---------------------------------------------------------------------------

_DOCS = [
    (1, "reach me at bob123@mail.com or 555-0001 thanks"),
    (2, "two mails a@b.c and x9@y.z plus 555-1234 555-9999"),
    (3, "perfectly clean prose with no contact info"),
    (4, "call 555-0000"),
]


def test_pii_scrub_default_patterns(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {r.doc_id: (r.n_email, r.n_phone, r.scrubbed)
           for r in pii_scrub(df).collect()}
    email, phone = r"[a-z0-9]+@[a-z]+\.[a-z]+", r"555-[0-9]{4}"
    for doc_id, text in _DOCS:
        ne = len(re.findall(email, text))
        np_ = len(re.findall(phone, text))
        scr = re.sub(phone, "<PHONE>", re.sub(email, "<EMAIL>", text))
        assert got[doc_id] == (ne, np_, scr), doc_id
    # all rows returned, clean rows included with zero counts
    assert got[3][0] == 0 and got[3][1] == 0 and got[3][2] == _DOCS[2][1]


def test_pii_scrub_custom_patterns(spark):
    df = spark.createDataFrame([(1, "ssn 123-45-6789 ok")], "doc_id long, text string")
    r = pii_scrub(df, patterns={"ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}"}).collect()[0]
    assert r.n_ssn == 1 and r.scrubbed == "ssn <SSN> ok"


# ---------------------------------------------------------------------------
# repetition_profile
# ---------------------------------------------------------------------------


def _brute_rep(docs):
    out = {}
    for did, text in docs:
        ws = [w for w in text.split(" ") if w]
        if len(ws) < 2:
            continue
        tc = Counter(ws)
        bc = Counter(f"{a} {b}" for a, b in zip(ws, ws[1:]))
        out[did] = (
            round(1e6 * max(tc.values()) / sum(tc.values())),
            round(1e6 * max(bc.values()) / sum(bc.values())),
        )
    return out


def test_repetition_profile_matches_bruteforce(spark):
    rng = random.Random(151)
    vocab = ["spam", "ham", "eggs", "the", "loop"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20))))
        for i in range(25)
    ]
    docs.append((100, "loop loop loop loop"))  # degenerate repeater
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.top_token_1e6, r.top_bigram_1e6)
        for r in repetition_profile(df).collect()
    }
    assert got == _brute_rep(docs)
    assert got[100] == (1000000, 1000000)


# ---------------------------------------------------------------------------
# latest_wins
# ---------------------------------------------------------------------------


def test_latest_wins_updates_beat_base(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )
    updates = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)], "k long, s string, v long"
    )
    got = {r.k: (r.s, r.v) for r in latest_wins(base, updates, "k").collect()}
    assert got == {1: ("a", 10), 2: ("B", 200), 3: ("c", 30), 4: ("d", 40)}


def test_latest_wins_order_col_across_sides(spark):
    """With order_col the largest version wins regardless of side; the
    update side only breaks version ties."""
    base = spark.createDataFrame([(1, 5, "base-v5")], "k long, ver long, s string")
    updates = spark.createDataFrame(
        [(1, 3, "upd-v3"), (1, 4, "upd-v4"), (2, 1, "new")],
        "k long, ver long, s string",
    )
    got = {r.k: (r.ver, r.s)
           for r in latest_wins(base, updates, "k", order_col="ver").collect()}
    # base's v5 beats the updates' v3/v4 - stale CDC batches never regress
    assert got == {1: (5, "base-v5"), 2: (1, "new")}
    # same version on both sides: the update wins the tie
    base2 = spark.createDataFrame([(1, 5, "base-v5")], "k long, ver long, s string")
    upd2 = spark.createDataFrame([(1, 5, "upd-v5")], "k long, ver long, s string")
    got2 = {r.k: r.s
            for r in latest_wins(base2, upd2, "k", order_col="ver").collect()}
    assert got2 == {1: "upd-v5"}


def test_cdc_apply_matches_bruteforce(spark):
    from spark_data_test_spark import cdc_apply

    base_rows = [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    # ver 5 delete of k1; ver 3 STALE delete of k2 (base is ver 4 via
    # side tie-break? no: base has no version — order_col decides, tie
    # -> change wins); upsert k3; insert k4; k5 delete of absent key;
    # k6 insert then delete (delete newer)
    change_rows = [
        (1, "a2", 11, 5, "U"),
        (1, None, 0, 6, "D"),       # newest for k1: tombstone
        (2, "b2", 22, 7, "U"),
        (3, None, 0, 2, "delete"),  # stale vs the ver-9 upsert below
        (3, "c9", 99, 9, "U"),
        (4, "d", 40, 1, "I"),
        (5, None, 0, 8, "D"),       # delete of absent key: no-op
        (6, "f", 60, 1, None),      # NULL op: upsert
    ]
    base = spark.createDataFrame(
        [(k, v, c, 0) for k, v, c in base_rows],
        "k long, name string, cents long, ver long",
    )
    changes = spark.createDataFrame(
        change_rows, "k long, name string, cents long, ver long, op string"
    )
    got = {
        (r.k, r.name, r.cents, r.ver)
        for r in cdc_apply(base, changes, "k", "ver").collect()
    }
    want = {
        (2, "b2", 22, 7),   # upsert beats base
        (3, "c9", 99, 9),   # upsert beats stale delete
        (4, "d", 40, 1),    # fresh insert
        (6, "f", 60, 1),    # NULL op = upsert
        # k1 tombstoned, k5 never existed
    }
    assert got == want

    # upsert-only changes == latest_wins
    from pyspark.sql import functions as F

    from spark_data_test_spark import latest_wins

    ups = changes.where(~F.coalesce(F.col("op").isin("D", "delete"),
                                    F.lit(False)))
    lw = {
        tuple(r)
        for r in latest_wins(base, ups.drop("op"), "k", "ver").collect()
    }
    ca = {
        tuple(r) for r in cdc_apply(base, ups, "k", "ver").collect()
    }
    assert ca == lw

    for bad_base, bad_changes in (
        (base.withColumn("op", F.lit("x")), changes),   # base carries op
        (base, changes.drop("op")),                      # changes missing op
        (base, changes.withColumnRenamed("cents", "c")), # column mismatch
    ):
        try:
            cdc_apply(bad_base, bad_changes, "k", "ver")
            assert False, "expected ValueError"
        except ValueError:
            pass


def test_cdc_apply_property_sweep(spark):
    from hypothesis import HealthCheck, given, settings, strategies as st

    from spark_data_test_spark import cdc_apply

    @st.composite
    def scenarios(draw):
        keys = draw(st.lists(st.integers(1, 6), min_size=1, max_size=6,
                             unique=True))
        base = [(k, f"b{k}", draw(st.integers(0, 5))) for k in keys
                if draw(st.booleans())]
        n_ch = draw(st.integers(1, 10))
        seen = set()
        changes = []
        for i in range(n_ch):
            k = draw(st.integers(1, 6))
            v = draw(st.integers(0, 9))
            if (k, v) in seen:  # keep (key, ver) unique: tie order among
                continue        # changes is contractually unspecified
            seen.add((k, v))
            changes.append(
                (k, f"c{k}_{i}", v, draw(st.sampled_from(["U", "D", None])))
            )
        return base, changes

    @given(s=scenarios())
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def prop(s):
        base_rows, change_rows = s
        base = spark.createDataFrame(
            base_rows or [(None, None, None)],
            "k long, name string, ver long",
        ).where("k is not null")
        changes = spark.createDataFrame(
            change_rows or [(None, None, None, None)],
            "k long, name string, ver long, op string",
        ).where("k is not null")

        state = {}
        for k, name, ver in base_rows:
            state[k] = (ver, 0, False, (k, name, ver))
        for k, name, ver, op in change_rows:
            cur = state.get(k)
            cand = (ver, 1, op == "D", (k, name, ver))
            if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]):
                state[k] = cand
        want = {row for (_, _, dele, row) in state.values() if not dele}

        got = {tuple(r) for r in cdc_apply(base, changes, "k", "ver").collect()}
        assert got == want

    prop()

def test_cdc_apply_tie_rules_are_deterministic(spark):
    """Round-12 (ADVICE r11): two CHANGE rows for one key tying on
    order_col resolve deterministically — caller tiebreak_cols first,
    then tombstone-wins — never a row_number coin flip that could
    flip a key between keep and delete across runs."""
    from spark_data_test_spark import cdc_apply

    base = spark.createDataFrame(
        [(1, "b", 0), (2, "b", 0)], "k long, s string, ver long"
    )
    # k1: tied upsert + SAME-s tombstone -> tombstone wins (the final
    # rule fires only on an exact tie after tiebreak_cols);
    # k2: two tied upserts -> tiebreak_cols picks the greater s
    changes = spark.createDataFrame(
        [
            (1, "u", 5, "U"),
            (1, "u", 5, "D"),
            (2, "x", 5, "U"),
            (2, "z", 5, "U"),
        ],
        "k long, s string, ver long, op string",
    )
    for _ in range(3):
        got = {
            tuple(r)
            for r in cdc_apply(
                base, changes, "k", "ver", tiebreak_cols=["s"]
            ).collect()
        }
        assert got == {(2, "z", 5)}
    # without a caller tiebreak, a tied upsert+tombstone pair still
    # resolves deterministically: tombstone wins
    changes2 = spark.createDataFrame(
        [(1, "u", 5, "U"), (1, None, 5, "D")],
        "k long, s string, ver long, op string",
    )
    base1 = base.where("k = 1")
    for _ in range(3):
        assert cdc_apply(base1, changes2, "k", "ver").count() == 0
