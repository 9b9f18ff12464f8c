"""Frame-level text-analysis APIs (`language_id`, `quality_score`,
`token_counts`) cross-checked against plain-Python replicas of the
registered queries' arithmetic (which hash-match DuckDB registry-wide;
these tests pin the frame-level plumbing and the exact math on frames
the registry does not know about)."""

from spark_data_test_spark import language_id, quality_score, token_counts
from spark_data_test_spark.operators.text import LANG_MARKERS

TEXTS = [
    (1, "the cat and the dog walked with the others to the end"),
    (2, "der hund und die katze mit der zeit und das ist"),
    (3, "le chat et les chiens dans la maison des amis est"),
    (4, "el gato y los perros en la casa de los amigos"),
    (5, "word " * 150),  # long: n_words caps the first quality term
    (6, "x"),  # single char, one word
]


def _py_lang(text):
    padded = f" {text} "
    scores = {
        lang: sum(padded.count(p) for p in pats)
        for lang, pats in LANG_MARKERS.items()
    }
    for lang in ["en", "de", "fr", "es"]:  # fixed-priority argmax
        if all(scores[lang] >= scores[o] for o in scores):
            return lang
    return "es"


def _py_quality(text):
    n_chars = len(text)
    trimmed = text.strip()
    n_words = trimmed.count(" ") + 1
    avg_wl = (n_chars - n_words + 1) / n_words
    quality = min(1.0, n_words / 100.0) * 0.5 + min(1.0, avg_wl / 8.0) * 0.5
    return n_chars, n_words, avg_wl, quality


def test_language_id_matches_python_replica(spark):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = {r.doc_id: r.pred_lang for r in language_id(df).collect()}
    assert got == {d: _py_lang(t) for d, t in TEXTS}
    # the marker fixtures actually vote for all four languages
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr"
    assert got[4] == "es"
    # input columns survive (the API adds, never drops)
    assert set(language_id(df).columns) == {"doc_id", "text", "pred_lang"}


def test_quality_score_matches_python_replica(spark):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    rows = {r.doc_id: r for r in quality_score(df).collect()}
    for d, t in TEXTS:
        n_chars, n_words, avg_wl, q = _py_quality(t)
        r = rows[d]
        assert (r.n_chars, r.n_words) == (n_chars, n_words)
        assert abs(r.avg_word_len - avg_wl) < 1e-12
        assert abs(r.quality - q) < 1e-12
    assert rows[5].n_words == 150  # trailing-space trim pins the count


def test_token_counts_matches_python_replica(spark):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    rows = {r.doc_id: r for r in token_counts(df).collect()}
    for d, t in TEXTS:
        assert rows[d].ws_tokens == t.strip().count(" ") + 1
        assert rows[d].est_bpe_tokens == (len(t) + 3) // 4


def _py_decon(corpus, eval_docs, n=16, stride=4):
    out = {}
    eval_grams = {}
    for eid, t in eval_docs:
        if len(t) < n:
            continue
        for i in range(len(t) - n + 1):
            eval_grams.setdefault(t[i : i + n], set()).add(eid)
    for d, t in corpus:
        if len(t) < n:
            continue
        shared, evals = set(), set()
        for i in range(0, len(t) - n + 1, stride):
            g = t[i : i + n]
            if g in eval_grams:
                shared.add(g)
                evals |= eval_grams[g]
        if shared:
            out[d] = (len(shared), len(evals))
    return out


def test_decontaminate_matches_python_replica(spark):
    import pytest

    from spark_data_test_spark import decontaminate

    eval_docs = [
        (100, "the secret eval passage nobody should train on"),
        (101, "another held out benchmark answer string here"),
    ]
    corpus = [
        # leak with an alignment-breaking prefix (odd length) — the
        # every-offset eval shingling must still catch it
        (1, "xy " + eval_docs[0][1]),
        (2, "clean document with plenty of ordinary text inside"),
        (3, eval_docs[1][1]),  # verbatim leak
        (4, "short"),  # below n: never flagged
        (5, "the secret eval pass"),  # shares a prefix gram run
    ]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    edf = spark.createDataFrame(eval_docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_shared_ngrams, r.n_eval_docs)
        for r in decontaminate(cdf, edf).collect()
    }
    assert got == _py_decon(corpus, eval_docs)
    assert 1 in got and 3 in got and 2 not in got and 4 not in got

    with pytest.raises(ValueError):
        decontaminate(cdf, edf, n=16, stride=16)


def test_ngram_novelty_matches_bruteforce(spark):
    from spark_data_test_spark import ngram_novelty

    texts = {
        1: "the quick brown fox jumps over the lazy dog",   # all novel
        2: "the quick brown fox jumps over the lazy dog",   # zero novel
        3: "the quick brown fox sprints under a sleepy cat",  # partial
        4: "tiny",                                           # no shingles
    }
    df = spark.createDataFrame(sorted(texts.items()), "doc_id long, text string")

    def sh(t):
        return {t[i:i + 8] for i in range(0, len(t) - 7, 4)}

    first = {}
    for d in sorted(texts):
        for s in sh(texts[d]):
            first.setdefault(s, d)
    want = set()
    for d, t in texts.items():
        s = sh(t)
        if not s:
            continue
        novel = sum(1 for x in s if first[x] == d)
        want.add((d, len(s), novel, round(1000000.0 * novel / len(s))))
    got = {tuple(r) for r in ngram_novelty(df).collect()}
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[1][3] == 1000000 and by_id[2][3] == 0  # dup scores zero
    assert 0 < by_id[3][3] < 1000000
    assert 4 not in by_id


def test_ngram_novelty_parity_with_registered_query(spark, sf_dir):
    from spark_data_test_spark import ngram_novelty
    from spark_data_test_spark.operators.relational import t
    from spark_data_test_spark.operators.text import text_ngram_novelty

    got = {
        tuple(r)
        for r in ngram_novelty(t(spark, sf_dir, "documents")).collect()
    }
    want = {tuple(r) for r in text_ngram_novelty(spark, sf_dir).collect()}
    assert got == want and got
