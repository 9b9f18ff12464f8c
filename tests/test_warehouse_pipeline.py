"""Semantic + plan gates for the round-3 warehouse/pipeline operators:
SCD2 history, last-touch attribution, RFM segmentation, ABC/Pareto,
shard assignment, and token-budget sampling.

The oracle harness checks cross-engine equality; these tests check the
SEMANTICS against brute-force Python on collected slices, and that the
physical plans keep the promised shapes (single user-keyed shuffle for
the window ops, no global-sort window for the Pareto cumsum).
"""

import pyspark.sql.functions as F

from spark_data_test_spark.operators import analytics, sampling, temporal
from spark_data_test_spark.operators.relational import t
from spark_data_test_spark.plans.audit import simple_plan

CENTS = lambda x: int(round(x * 100))


def _events(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )


def _runs_by_user(rows):
    """Brute-force SCD2: per user, the run-length encoding of the
    event_type stream in (us, event_id) order."""
    by_user = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.us, r.event_id)):
        runs = by_user.setdefault(r.user_id, [])
        if not runs or runs[-1][0] != r.event_type:
            runs.append([r.event_type, r.us])
    return by_user


def test_scd2_matches_bruteforce_runs(spark, sf_dir):
    want = _runs_by_user(_events(spark, sf_dir))
    got = {}
    for r in temporal.events_scd2_history(spark, sf_dir).collect():
        got.setdefault(r.user_id, []).append(r)
    assert set(got) == set(want)
    for uid, rows in got.items():
        rows.sort(key=lambda r: r.version)
        assert [r.version for r in rows] == list(range(1, len(rows) + 1))
        assert [[r.event_type, r.valid_from_us] for r in rows] == want[uid]
        # validity chain: each version closes exactly where the next opens
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to_us == b.valid_from_us
        assert rows[-1].valid_to_us is None  # current version open-ended


def test_scd2_plan_is_one_userkeyed_window_no_join(spark, sf_dir):
    plan = simple_plan(temporal.events_scd2_history(spark, sf_dir))
    assert "Join" not in plan and "NestedLoop" not in plan
    assert "Window" in plan


def test_attribution_matches_bruteforce(spark, sf_dir):
    rows = _events(spark, sf_dir)
    vals = {
        r.event_id: r.value
        for r in t(spark, sf_dir, "events").select("event_id", "value").collect()
    }
    last_touch = {}
    want = {}
    for r in sorted(rows, key=lambda r: (r.us, r.event_id)):
        if r.event_type != "purchase":
            last_touch[r.user_id] = r.event_type
        else:
            ch = last_touch.get(r.user_id, "(none)")
            n, v = want.get(ch, (0, 0))
            want[ch] = (n + 1, v + CENTS(vals[r.event_id]))
    got = {
        r.channel: (r.n_conversions, r.value_cents)
        for r in temporal.events_attribution_last_touch(spark, sf_dir).collect()
    }
    assert got == want


def test_rfm_segments_partition_all_customers(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").collect()
    total_cents = sum(CENTS(r.o_totalprice) for r in orders)
    n_cust = len({r.o_custkey for r in orders})
    segs = analytics.orders_rfm_segments(spark, sf_dir).collect()
    assert sum(r.n_customers for r in segs) == n_cust
    assert sum(r.m_cents_total for r in segs) == total_cents
    for r in segs:
        assert 1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 and 1 <= r.m_score <= 4


def test_abc_pareto_matches_bruteforce_global_cumsum(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice").collect()
    rev = {}
    for r in li:
        rev[r.l_partkey] = rev.get(r.l_partkey, 0) + CENTS(r.l_extendedprice)
    total = sum(rev.values())
    want = {}
    cum = 0
    for pk, r in sorted(rev.items(), key=lambda kv: (-kv[1], kv[0])):
        cum += r
        cls = "A" if cum * 5 <= total * 4 else ("B" if cum * 20 <= total * 19 else "C")
        n, s = want.get(cls, (0, 0))
        want[cls] = (n + 1, s + r)
    got = {
        r.abc_class: (r.n_parts, r.revenue_cents)
        for r in analytics.parts_abc_pareto(spark, sf_dir).collect()
    }
    assert got == want


def test_abc_pareto_plan_has_no_global_sort_window(spark, sf_dir):
    # the whole point of the two-phase cumsum: every window partitions
    # by bucket (or runs on the tiny bucket frame) — no SinglePartition
    # exchange feeding a corpus-sized window
    plan = simple_plan(analytics.parts_abc_pareto(spark, sf_dir))
    assert "Window" in plan
    # the only SinglePartition exchange allowed is the one under the
    # bounded per-bucket prefix frame; the part-level window must be
    # hash-partitioned
    assert "hashpartitioning(bkt" in plan


def _py_bucket(i, salt=0):
    r = (i + salt) % sampling._HASH_PRIME
    return (r * sampling._KNUTH) % 1000


def test_shard_assignment_membership_and_order_pins(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    shards = {}
    for r in docs:
        sid = _py_bucket(r.doc_id, 31) // (1000 // sampling._N_SHARDS)
        shards.setdefault(sid, []).append(r)
    got = {r.shard_id: r for r in sampling.corpus_shard_assignment(spark, sf_dir).collect()}
    assert set(got) == set(shards)
    assert sum(r.n_docs for r in got.values()) == len(docs)
    for sid, members in shards.items():
        ordered = sorted(members, key=lambda r: (_py_bucket(r.doc_id, 47), r.doc_id))
        assert got[sid].n_docs == len(members)
        assert got[sid].chars_total == sum(r.n_chars for r in members)
        assert got[sid].head_doc == ordered[0].doc_id
        assert got[sid].tail_doc == ordered[-1].doc_id


def test_token_budget_kept_set_is_hash_order_prefix(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "text").collect()
    # replay the query's exact formula — (spaces after trim) + 1 — not
    # split(), which disagrees on empty text or runs of whitespace
    n_tok = lambda text: text.strip().count(" ") + 1
    want = {}
    by_src = {}
    for r in docs:
        by_src.setdefault(r.source, []).append(r)
    for src, members in by_src.items():
        members.sort(key=lambda r: (_py_bucket(r.doc_id, 53), r.doc_id))
        kept = toks = 0
        for r in members:
            if toks < sampling._TOK_BUDGET:  # cum-before < budget: keep
                kept += 1
                toks += n_tok(r.text)
            else:
                break
        want[src] = (kept, toks)
    got = {
        r.source: (r.n_kept, r.tok_kept)
        for r in sampling.sample_token_budget(spark, sf_dir).collect()
    }
    assert got == want


def test_anomaly_daily_matches_bruteforce(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("event_type", F.unix_micros("ts").alias("us")).collect()
    DAY = 86_400_000_000
    daily = {}
    for r in ev:
        k = (r.event_type, r.us // DAY)
        daily[k] = daily.get(k, 0) + 1
    stats = {}
    for (et, _), x in daily.items():
        n, s, ss = stats.get(et, (0, 0, 0))
        stats[et] = (n + 1, s + x, ss + x * x)
    got = {
        (r.event_type, r.day): (r.n_events, r.is_anomaly)
        for r in temporal.events_anomaly_daily(spark, sf_dir).collect()
    }
    assert set(got) == set(daily)
    for (et, day), (n_ev, flag) in got.items():
        assert n_ev == daily[(et, day)]
        n, s, ss = stats[et]
        want = 1 if float(n * n_ev - s) ** 2 > 9.0 * float(n * ss - s * s) else 0
        assert flag == want


def test_tfidf_topk_ranks_by_tf_over_df(spark, sf_dir):
    from spark_data_test_spark.operators import text as text_ops

    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    tf, df = {}, {}
    for r in docs:
        seen = {}
        for tok in r.text.split(" "):
            if tok:
                seen[tok] = seen.get(tok, 0) + 1
        for tok, c in seen.items():
            tf[(r.doc_id, tok)] = c
            df[tok] = df.get(tok, 0) + 1
    got = {}
    for r in text_ops.text_tfidf_topk(spark, sf_dir).collect():
        got.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in got.items():
        rows.sort(key=lambda r: r.rank)
        mine = sorted(
            ((t_, c) for (d, t_), c in tf.items() if d == doc_id),
            key=lambda kv: (-(kv[1] / df[kv[0]]), kv[0]),
        )[: len(rows)]
        assert [(r.tok, r.tf, r.df) for r in rows] == [
            (t_, c, df[t_]) for t_, c in mine
        ]


def test_similarity_cell_report_covers_all_vectors(spark, sf_dir):
    from spark_data_test_spark.operators import similarity

    n = t(spark, sf_dir, "embeddings").count()
    cents = {r.cent_id for r in similarity.train_ivf_centroids(spark, sf_dir).collect()}
    rows = similarity.similarity_cell_report(spark, sf_dir).collect()
    assert sum(r.n_vectors for r in rows) == n  # every vector in exactly one cell
    assert {r.cell for r in rows} <= cents  # cells are trained centroids
    for r in rows:
        assert r.min_vec <= r.max_vec and r.n_vectors >= 1


def test_frame_sample_matches_python_slicing(spark, sf_dir):
    from spark_data_test_spark.operators import multimodal as mm

    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    want = {}
    fb, stride = mm._FRAME_BYTES, mm._FRAME_STRIDE
    for r in docs:
        raw = r.text.encode("utf-8")
        if len(raw) < fb:
            continue
        offsets = list(range(1, max(len(raw) - fb + 1, 1) + 1, fb))
        for frame_no, off in enumerate(offsets[::stride]):
            want[(r.doc_id, frame_no)] = (off, raw[off - 1 : off - 1 + fb])
    got = {
        (r.doc_id, r.frame_no): (r.offset, bytes(r.frame))
        for r in mm.frame_sample(
            mm.to_binary_table(spark, sf_dir), frame_bytes=fb, stride=stride
        ).collect()
    }
    assert got == want


def test_cluster_size_stats_conserve_documents(spark, sf_dir):
    from spark_data_test_spark.operators import dedup

    comp = dedup.dedup_connected_components(spark, sf_dir)
    n_docs = comp.count()
    n_comps = comp.select("component_id").distinct().count()
    stats = dedup.dedup_cluster_size_stats(spark, sf_dir).collect()
    assert sum(r.n_docs for r in stats) == n_docs
    assert sum(r.n_clusters for r in stats) == n_comps
    # LSH-vertex clusters are >= 2 docs by construction (only banded
    # candidates or exact-dup groups enter the graph)
    assert all(r.cluster_size >= 2 for r in stats)


def test_dedup_waterfall_chain(spark, sf_dir):
    """Stage accounting must chain (n_out -> next n_in, in - removed =
    out) and both dedup stages must bite on the planted corpus."""
    from spark_data_test_spark.operators.pipeline import corpus_dedup_waterfall

    rows = sorted(
        corpus_dedup_waterfall(spark, sf_dir).collect(),
        key=lambda r: r.stage_id,
    )
    assert [r.stage for r in rows] == [
        "short_filter",
        "exact_dedup",
        "near_dedup",
    ]
    for r in rows:
        assert r.n_in - r.n_removed == r.n_out
        assert r.n_removed >= 0
    for prev, nxt in zip(rows, rows[1:]):
        assert prev.n_out == nxt.n_in
    assert rows[1].n_removed > 0  # exact twins planted at +1e7
    assert rows[2].n_removed > 0  # near twins planted at +2e7
