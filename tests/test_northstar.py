"""Semantic tests for the north-star operator modules.

Oracle parity is checked by scripts/check_oracle.py; these assert the
*properties* that make the operators useful: dedup recall, ANN accuracy
vs numpy ground truth, fingerprint locality, Arrow-path correctness,
and streaming/batch equivalence.
"""

import hashlib

import numpy as np
import pyspark.sql.functions as F
import pytest

from spark_data_test_spark.operators import dedup, multimodal, similarity, text
from spark_data_test_spark.operators.relational import (
    QUERIES,
    events_sessionization,
    events_tumbling_window,
    t,
)
from spark_data_test_spark.streaming import windows as streaming_windows


def test_dedup_exact_removes_planted_copies(spark, sf_dir):
    out = dedup.dedup_exact(spark, sf_dir).collect()
    n_docs = t(spark, sf_dir, "documents").count()
    assert len(out) == n_docs  # one survivor per distinct text
    planted = [r for r in out if r["n_copies"] > 1]
    assert all(r["n_copies"] == 2 for r in planted)
    assert all(
        r["doc_id"] < dedup._EXACT_PLANT_OFFSET for r in out
    )  # survivor = min doc_id


def test_minhash_lsh_recalls_all_planted_near_dups(spark, sf_dir):
    pairs = dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    planted = {
        r["doc_id"]
        for r in t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 13 == 0)
        .select("doc_id")
        .collect()
    }
    recovered = {
        r["doc_a"]
        for r in pairs
        if r["doc_b"] == r["doc_a"] + dedup._NEAR_PLANT_OFFSET
    }
    assert recovered == planted  # 100% recall on the near-dup plants


def test_near_jaccard_verifies_candidates(spark, sf_dir):
    verified = dedup.dedup_near_jaccard(spark, sf_dir).collect()
    assert verified, "expected verified near-dup pairs"
    # all planted near-dups must survive verification...
    planted = {
        r["doc_id"]
        for r in t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 13 == 0)
        .select("doc_id")
        .collect()
    }
    kept = {
        r["doc_a"]
        for r in verified
        if r["doc_b"] == r["doc_a"] + dedup._NEAR_PLANT_OFFSET
    }
    assert kept == planted
    # ...and everything that survives clears the threshold. (The corpus
    # also contains *naturally occurring* near-dup pairs planted by the
    # data generator — jaccard > 0.9 — which the operator correctly
    # surfaces; they are legitimate finds, not false positives.)
    assert all(r["jaccard_1e6"] >= 500000 for r in verified)


def test_simhash_locality(spark, sf_dir):
    fp = {
        r["doc_id"]: r["simhash"]
        for r in dedup.dedup_simhash(spark, sf_dir).collect()
    }
    assert all(len(s) == 32 and set(s) <= {"0", "1"} for s in fp.values())
    ids = sorted(fp)[:40]
    hamming = lambda a, b: sum(x != y for x, y in zip(fp[a], fp[b]))
    rand = np.mean([hamming(a, b) for a in ids for b in ids if a < b])
    # shared small vocabulary keeps this corpus's fingerprints close,
    # but distinct docs must still differ on average
    assert 1 <= rand <= 24


def test_embedding_cosine_ivf_recall_and_precision(spark, sf_dir):
    got = {
        (r["vec_a"], r["vec_b"]): r["cos_1e6"]
        for r in dedup.dedup_embedding_cosine(spark, sf_dir).collect()
    }
    emb = {
        r["vec_id"]: np.round(np.array(r["embedding"], dtype=np.float64) * 1e6)
        for r in t(spark, sf_dir, "embeddings").collect()
    }
    ids = sorted(emb)
    norm = {i: np.linalg.norm(emb[i]) for i in ids}
    brute = {
        (a, b): float(np.dot(emb[a], emb[b])) / (norm[a] * norm[b])
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
    }
    brute_pairs = {p for p, c in brute.items() if c >= 0.3}
    # precision is exact: every emitted pair is a true >=0.3 pair with
    # the right score
    assert set(got) <= brute_pairs
    for p, c1e6 in got.items():
        assert abs(c1e6 - round(brute[p] * 1e6)) <= 1
    # recall floor: the isotropic synthetic corpus is the IVF worst
    # case (planted pairs sit at cos 0.3-0.5, barely above noise) —
    # trained sqrt(n) centroids with nprobe=3 keep well over half the
    # pairs (measured 0.74-0.78 at n=500, 0.54 at sf0.1 n=2000) while
    # scoring only ~nprobe^2/sqrt(n) of all pairs
    assert len(got) / max(len(brute_pairs), 1) >= 0.6


def test_cosine_topk_matches_numpy(spark, sf_dir):
    emb = {
        r["vec_id"]: np.round(np.array(r["embedding"], dtype=np.float64) * 1e6)
        for r in t(spark, sf_dir, "embeddings").collect()
    }
    got = similarity.similarity_cosine_topk(spark, sf_dir).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qid, ranked in by_query.items():
        q = emb[qid]
        scores = {
            cid: float(np.dot(q, v)) / (np.linalg.norm(q) * np.linalg.norm(v))
            for cid, v in emb.items()
            if cid != qid
        }
        expected = [
            cid
            for cid, _ in sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        ]
        assert [cid for _, cid in sorted(ranked)] == expected


def test_ivf_ann_recall_vs_bruteforce(spark, sf_dir):
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.similarity_cosine_topk(spark, sf_dir).collect()
    }
    # IVF queries are vec_id < 8, the same set as the brute-force
    # baseline, so ANN accuracy is directly measurable: every query
    # returns 3 ranked candidates, and a meaningful fraction of the
    # IVF top-3 must appear in the exact top-5 despite scanning only
    # ~nprobe/sqrt(n) of the corpus.
    ivf = similarity.similarity_ivf_ann(spark, sf_dir).collect()
    per_query = {}
    for r in ivf:
        per_query.setdefault(r["query_id"], set()).add(r["rank"])
    assert all(ranks == {1, 2, 3} for ranks in per_query.values())
    hits = sum(
        1 for r in ivf if (r["query_id"], r["neighbor_id"]) in brute
    )
    assert hits / len(ivf) >= 0.4  # measured 0.625 at sf0.001


def test_language_id_and_quality_bounds(spark, sf_dir):
    lang_rows = text.text_language_id(spark, sf_dir).collect()
    assert all(r["pred_lang"] in {"en", "de", "fr", "es"} for r in lang_rows)
    q_rows = text.text_quality_score(spark, sf_dir).collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in q_rows)
    assert all(r["n_words"] >= 1 for r in q_rows)


def test_decode_features_on_non_utf8_binary(spark):
    # the mapInPandas contract must hold for REAL binary payloads, not
    # just UTF-8 re-encodings of text: PNG-style magic bytes, NULs,
    # invalid UTF-8 continuation bytes, every byte value 0-255
    blobs = [
        (1, bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, 0x00, 0xFF, 0xFE])),
        (2, bytes(range(256))),
        (3, b"\x00" * 37),
    ]
    df = spark.createDataFrame(blobs, "doc_id long, content binary").coalesce(1)
    feats = {r["doc_id"]: r for r in multimodal.decode_features(df).collect()}
    for doc_id, content in blobs:
        n, w, h = multimodal.fake_features(content)
        r = feats[doc_id]
        assert (r["n_bytes"], r["fake_width"], r["fake_height"]) == (n, w, h)


def test_frame_sample_on_non_utf8_binary(spark):
    payload = bytes(range(256)) * 2  # 512 bytes, every value twice
    df = spark.createDataFrame(
        [(7, payload)], "doc_id long, content binary"
    ).coalesce(1)
    frames = multimodal.frame_sample(df, frame_bytes=64, stride=2).collect()
    assert frames, "expected sampled frames"
    for r in frames:
        start = r["offset"] - 1  # SQL substring offsets are 1-based
        assert bytes(r["frame"]) == payload[start : start + 64]


def test_multimodal_decode_stub_matches_python(spark, sf_dir):
    feats = {r["doc_id"]: r for r in QUERIES["multimodal_decode_stub"](spark, sf_dir).collect()}
    docs = t(spark, sf_dir, "documents").limit(20).collect()
    for d in docs:
        content = d["text"].encode("utf-8")
        digest = hashlib.md5(content).hexdigest()
        f_row = feats[d["doc_id"]]
        assert f_row["n_bytes"] == len(content)
        assert f_row["fake_width"] == ord(digest[0])
        assert f_row["fake_height"] == ord(digest[1])


def test_multimodal_decode_image_is_real():
    """decode_image is a REAL decoder now (PIL or stdlib PNG):
    round-trips an encoded PNG and rejects malformed input."""
    px = bytes(range(16))
    assert multimodal.decode_image(multimodal.encode_png_gray(4, 4, px)) == (
        4,
        4,
        1,
        px,
    )
    with pytest.raises(Exception):
        multimodal.decode_image(b"\x89PNG truncated")


def test_multimodal_frame_sample(spark, sf_dir):
    frames = multimodal.frame_sample(
        multimodal.to_binary_table(spark, sf_dir), frame_bytes=64, stride=4
    )
    row = frames.first()
    assert len(row["frame"]) <= 64
    assert row["offset"] >= 1
    # frame payloads must be real slices of the source text
    doc = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") == row["doc_id"])
        .first()
    )
    assert bytes(row["frame"]) in doc["text"].encode("utf-8")


def test_streaming_equals_batch(spark, sf_dir):
    stream_rows = sorted(
        tuple(r)
        for r in streaming_windows.streaming_tumbling_counts(spark, sf_dir).collect()
    )
    batch_rows = sorted(
        tuple(r)
        for r in events_tumbling_window(spark, sf_dir)
        .select("hour_us", "event_type", "cnt", "value_cents")
        .collect()
    )
    assert stream_rows == batch_rows


def test_stateful_sessionization_equals_batch(spark, sf_dir):
    stream_rows = sorted(
        tuple(r)
        for r in streaming_windows.streaming_sessionization(spark, sf_dir).collect()
    )
    batch_rows = sorted(
        tuple(r)
        for r in events_sessionization(spark, sf_dir)
        .select("user_id", "session_start_us", F.col("n_events").cast("long"))
        .collect()
    )
    assert stream_rows == batch_rows


def test_connected_components_cluster_invariants(spark, sf_dir):
    from spark_data_test_spark.operators import dedup

    comp = {
        r["doc_id"]: r["component_id"]
        for r in dedup.dedup_connected_components(spark, sf_dir).collect()
    }
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dedup._cached_band_pairs(spark, sf_dir).collect()
    ]
    assert pairs, "expected LSH candidate pairs"
    # every edge endpoint got a label, and both ends share a component
    for a, b in pairs:
        assert comp[a] == comp[b]
        assert comp[a] <= min(a, b)
    # each canonical representative is a member of its own component
    for label in set(comp.values()):
        assert comp[label] == label


def test_group_pair_expansion_semantics(spark):
    """The exact-dedup-before-near-dup decomposition: expansion emits
    every intra-group pair and every cross pair of candidate groups,
    ordered (doc_a < doc_b), with no duplicates and nothing else."""
    members = spark.createDataFrame(
        [("g1", 1), ("g1", 2), ("g1", 7), ("g2", 4), ("g3", 9)],
        "gid string, doc_id long",
    )
    gid_pairs = spark.createDataFrame(
        [("g1", "g2")], "gid_a string, gid_b string"
    )
    got = sorted(
        (r["doc_a"], r["doc_b"])
        for r in dedup._expand_group_pairs(members, gid_pairs).collect()
    )
    # intra g1: (1,2) (1,7) (2,7); cross g1xg2: (1,4) (2,4) (4,7);
    # g3 is a singleton with no candidate pair -> contributes nothing
    assert got == [(1, 2), (1, 4), (1, 7), (2, 4), (2, 7), (4, 7)]
    assert all(a < b for a, b in got)


def test_decontaminate_catches_planted_leaks(spark, sf_dir):
    """Every planted eval leak (full eval text behind an
    alignment-breaking prefix) must be flagged, and flagged harder
    than the organic boilerplate overlap."""
    rows = {
        r["doc_id"]: (r["n_shared_ngrams"], r["n_eval_docs"])
        for r in text.corpus_decontaminate(spark, sf_dir).collect()
    }
    planted = {k: v for k, v in rows.items() if k >= 300000}
    assert len(planted) == 20
    assert all(shared >= 5 and ev >= 1 for shared, ev in planted.values())
    organic = [shared for k, (shared, _) in rows.items() if k < 300000]
    if organic:
        organic.sort()
        assert min(s for s, _ in planted.values()) > organic[len(organic) // 2]


def test_vocabulary_topk_matches_python(spark, sf_dir):
    got = [
        (r["tok"], r["tf"], r["df"])
        for r in text.text_vocabulary_topk(spark, sf_dir).collect()
    ]
    import collections

    tf = collections.Counter()
    df = collections.Counter()
    for r in t(spark, sf_dir, "documents").select("doc_id", "text").collect():
        toks = [tk for tk in r["text"].split(" ") if tk]
        tf.update(toks)
        df.update(set(toks))
    want = sorted(
        ((tok, tf[tok], df[tok]) for tok in tf),
        key=lambda x: (-x[2], -x[1], x[0]),
    )[:50]
    assert sorted(got, key=lambda x: (-x[2], -x[1], x[0])) == want


def test_pii_scrub_masks_planted_pii(spark, sf_dir):
    rows = {r["doc_id"]: r for r in text.text_pii_scrub(spark, sf_dir).collect()}
    n_docs = t(spark, sf_dir, "documents").count()
    planted = [i for i in range(0, n_docs) if i % 11 == 0]
    # the word-soup corpus has no organic PII: flagged == planted
    assert sorted(rows) == planted
    for r in rows.values():
        assert r["n_emails"] == 1 and r["n_phones"] == 1
        assert "<EMAIL>" in r["scrubbed"] and "<PHONE>" in r["scrubbed"]
        assert "@" not in r["scrubbed"]
        assert "555-" not in r["scrubbed"]


def test_repetition_profile_matches_python(spark, sf_dir):
    import collections

    got = {
        r["doc_id"]: (r["top_token_1e6"], r["top_bigram_1e6"])
        for r in text.text_repetition_profile(spark, sf_dir).collect()
    }
    want = {}
    for r in t(spark, sf_dir, "documents").select("doc_id", "text").collect():
        toks = [tk for tk in r["text"].split(" ") if tk]
        if len(toks) < 2:
            continue
        tc = collections.Counter(toks)
        bc = collections.Counter(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
        want[r["doc_id"]] = (
            round(1e6 * max(tc.values()) / sum(tc.values())),
            round(1e6 * max(bc.values()) / sum(bc.values())),
        )
    assert got == want


def test_simhash_pairs_equal_bruteforce(spark, sf_dir):
    """dedup_simhash_pairs claims EXACT recall at hamming <= 7 over the
    64-bit fingerprint (8x8 banding + pigeonhole); verify against an
    independent Python brute force over the same vote fingerprints."""
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.dedup_simhash_pairs(spark, sf_dir).collect()
    }
    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    corpus = [(r["doc_id"], r["text"]) for r in docs] + [
        (r["doc_id"] + dedup._NEAR_PLANT_OFFSET, r["text"] + " extra tail token")
        for r in docs
        if r["doc_id"] % 13 == 0
    ]
    def votes_of(text_val):
        toks = [tk for tk in text_val.split(" ") if tk]
        if not toks:
            return None
        votes = [0] * 64
        for tk in toks:
            h = (
                hashlib.md5(tk.encode()).hexdigest()
                + hashlib.md5((tk + "#").encode()).hexdigest()
            )
            for p in range(64):
                votes[p] += 1 if h[p] >= "8" else -1
        return votes

    # votes per DISTINCT text; mean-centering is defined over them
    gvotes = {}
    for _, text_val in corpus:
        if text_val not in gvotes:
            v = votes_of(text_val)
            if v is not None:
                gvotes[text_val] = v
    d = len(gvotes)
    tot = [sum(v[p] for v in gvotes.values()) for p in range(64)]
    fps = {}
    for doc_id, text_val in corpus:
        v = gvotes.get(text_val)
        if v is None:
            continue
        fps[doc_id] = sum(
            (1 << p) for p in range(64) if v[p] * d >= tot[p]
        )
    ids = sorted(fps)
    want = {}
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            ham = bin(fps[a] ^ fps[b]).count("1")
            if ham <= 7:
                want[(a, b)] = ham
    assert got == want


def test_embedding_group_expansion_on_duplicate_vectors(spark, sf_dir, tmp_path):
    """Exact-dup vector groups: on a corpus with exact vector copies
    the grouped IVF pipeline must emit (a) every intra-group pair at
    cos exactly 1, (b) cross pairs consistently for every member of a
    group (a duplicate pairs with y iff its representative does, same
    score), and (c) only true >=0.3 pairs with exact scores — i.e. the
    expansion reconstructs the ungrouped result."""
    import os

    src = t(spark, sf_dir, "embeddings").select("vec_id", "embedding").limit(60)
    dups = src.where(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    out_dir = os.path.join(str(tmp_path), "emb_dups")
    src.unionByName(dups).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    dedup.clear_dedup_cache()
    try:
        got = {
            (r["vec_a"], r["vec_b"]): r["cos_1e6"]
            for r in dedup.dedup_embedding_cosine(spark, out_dir).collect()
        }
    finally:
        dedup.clear_dedup_cache()
        similarity.clear_similarity_cache()
    emb = {
        r["vec_id"]: np.round(np.array(r["embedding"], dtype=np.float64) * 1e6)
        for r in spark.read.parquet(f"{out_dir}/embeddings.parquet").collect()
    }
    dup_of = {x + 10000: x for x in emb if x < 10000 and x % 5 == 0}
    # (a) every exact-copy pair present, cos exactly 1
    for d, x in dup_of.items():
        assert got.get((x, d)) == 1000000
    # (b) duplicate-consistency of cross pairs
    groups = {x: {x} for x in emb if x not in dup_of}
    for d, x in dup_of.items():
        groups[x].add(d)
    for d, x in dup_of.items():
        for y in emb:
            if y in groups[x]:
                continue
            px = (min(x, y), max(x, y))
            pd = (min(d, y), max(d, y))
            assert (px in got) == (pd in got)
            if px in got:
                assert got[px] == got[pd]
    # (c) precision: every emitted pair is a true >=0.3 pair, exact score
    norm = {i: np.linalg.norm(v) for i, v in emb.items()}
    for (a, b), c1e6 in got.items():
        cos = float(np.dot(emb[a], emb[b])) / (norm[a] * norm[b])
        assert cos >= 0.3 - 1e-9
        assert abs(c1e6 - round(cos * 1e6)) <= 1


def test_short_text_duplicates_never_pair(spark, sf_dir, tmp_path):
    """Docs below shingle length (< 8 chars) produce no signature in
    the per-doc formulation, so the group formulation must exclude
    them from membership — identical short texts must NOT pair."""
    import os

    src = t(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    extra = spark.createDataFrame(
        [(900001, "tiny"), (900002, "tiny"), (900003, "tiny")],
        "doc_id long, text string",
    )
    out_dir = os.path.join(str(tmp_path), "docs_short")
    src.unionByName(extra).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    dedup.clear_dedup_cache()
    try:
        pairs = dedup.dedup_minhash_lsh(spark, out_dir).collect()
        short_ids = {900001, 900002, 900003}
        assert not any(
            r["doc_a"] in short_ids or r["doc_b"] in short_ids for r in pairs
        )
    finally:
        dedup.clear_dedup_cache()


def test_semantic_prune_curve_invariants(spark, sf_dir):
    """The SemDeDup curve must be internally consistent with its own
    pair frame: kept + pruned = total at every threshold, pruned is
    monotone non-increasing in tau, and the count at each tau equals
    the distinct higher-id endpoints of the >=tau pairs."""
    curve = {
        r.tau_1e6: r
        for r in dedup.dedup_semantic_prune_curve(spark, sf_dir).collect()
    }
    pairs = dedup.dedup_embedding_cosine(spark, sf_dir).collect()
    taus = sorted(curve)
    prev = None
    for tau in taus:
        r = curve[tau]
        assert r.n_kept + r.n_pruned == r.n_total
        expected = len({p.vec_b for p in pairs if p.cos_1e6 >= tau})
        assert r.n_pruned == expected
        if prev is not None:
            assert r.n_pruned <= prev
        prev = r.n_pruned
