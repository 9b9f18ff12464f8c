"""Property tests for the round-4 operators.

The DuckDB oracle harness already pins cross-engine value equality;
these tests pin the properties the oracles cannot see — partitioning
independence, prefilter soundness + selectivity, and the internal
consistency of the reported numbers.
"""

import pyspark.sql.functions as F

from spark_data_test_spark.operators.relational import QUERIES, t
from spark_data_test_spark.operators.relational_ext import bloom_prefilter
import spark_data_test_spark.operators.dedup  # noqa: F401 (registers)
import spark_data_test_spark.operators.ml  # noqa: F401 (registers)
import spark_data_test_spark.operators.sketches as sketches
import spark_data_test_spark.streaming.windows  # noqa: F401 (registers)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- bloom


def test_bloom_prefilter_is_sound_and_selective(spark):
    """No false negatives (prefiltered join == plain join) and the
    bitmap actually prunes (most non-matching fact rows drop before
    the join)."""
    li = t(spark, SF, "lineitem")
    p = t(spark, SF, "part").where(F.col("p_brand") == "Brand#19")
    keys = p.select("p_partkey")

    pref = bloom_prefilter(li, "l_partkey", keys)
    exact = li.join(keys, li.l_partkey == keys.p_partkey).count()
    pref_exact = pref.join(keys, pref.l_partkey == keys.p_partkey).count()
    assert pref_exact == exact  # soundness: every true match survives

    n_fact = li.count()
    n_pref = pref.count()
    n_match = exact
    # selectivity: the bitmap keeps the matches plus a small
    # false-positive tail, far below the full fact table
    assert n_match <= n_pref < n_fact * 0.5


def test_bloom_prefilter_empty_dim_drops_everything(spark):
    li = t(spark, SF, "lineitem")
    empty = t(spark, SF, "part").where(F.lit(False)).select("p_partkey")
    assert bloom_prefilter(li, "l_partkey", empty).count() == 0


# ------------------------------------------------------- heavy hitters


def test_heavy_hitters_partitioning_independent(spark):
    """The exact-verified output must not depend on physical
    partitioning — run the MG pipeline on a 1-partition and a
    32-partition layout of the same stream and require identical
    results (the mergeable-MG guarantee made observable)."""
    out = {}
    for n_parts in (1, 32):
        grams = sketches._bigram_stream(spark, SF).repartition(n_parts)
        summaries = grams.mapInPandas(
            sketches._mg_summaries, "g string, mg_cnt long"
        )
        cands = (
            summaries.where(F.col("g").isNotNull()).select("g").distinct()
        )
        exact = (
            grams.join(F.broadcast(cands), "g")
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        total = summaries.where(F.col("g").isNull()).agg(
            F.sum("mg_cnt").alias("n_tok")
        )
        rows = (
            exact.crossJoin(F.broadcast(total))
            .where(F.col("cnt") * sketches._HH_DENOM > F.col("n_tok"))
            .select("g", "cnt")
            .collect()
        )
        out[n_parts] = sorted((r["g"], r["cnt"]) for r in rows)
    assert out[1] == out[32]
    assert out[1], "corpus should contain at least one heavy hitter"


def test_mg_summary_bounded_state():
    """A single summary never exceeds the counter budget."""
    import pandas as pd

    batches = [
        pd.DataFrame({"g": [f"tok{i}" for i in range(3000)]}),
        pd.DataFrame({"g": ["hot"] * 500}),
    ]
    outs = list(sketches._mg_summaries(iter(batches)))
    assert len(outs) == 1
    counters = outs[0][outs[0]["g"].notna()]
    total_rows = outs[0][outs[0]["g"].isna()]
    assert len(counters) <= sketches._MG_COUNTERS
    # one NULL row carries the exact partition item count
    assert list(total_rows["mg_cnt"]) == [3500]
    # the genuinely frequent item must survive compression
    assert "hot" in set(counters["g"])


# ---------------------------------------------------------- corr matrix


def test_correlation_matrix_shape_and_bounds(spark):
    rows = QUERIES["lineitem_correlation_matrix"](spark, SF).collect()
    assert len(rows) == 6  # C(4,2) pairs
    n = {r["n"] for r in rows}
    assert len(n) == 1  # one shared row count
    for r in rows:
        assert -1.0 <= r["corr"] <= 1.0
        assert r["corr"] == r["corr"]  # not NaN
    # the synthetic lineitem draws its metrics independently, so every
    # pairwise correlation should be near zero — a loose sanity band
    for r in rows:
        assert abs(r["corr"]) < 0.1


# ------------------------------------------------- duplicated n-grams


def test_duplicate_ngrams_internally_consistent(spark):
    rows = QUERIES["corpus_duplicate_ngrams"](spark, SF).collect()
    assert rows, "planted near-dups should produce duplicated 8-grams"
    for r in rows:
        assert 0 < r["n_dup_grams"] <= r["n_grams"]
        assert r["n_partner_docs"] >= 1
        assert r["dup_permille"] == 1000 * r["n_dup_grams"] // r["n_grams"]


# ------------------------------------------------------ late-data audit


def test_late_data_audit_drops_are_real_and_accounted(spark):
    """The audit's kept-row total must equal the oracle kept-set size,
    and some rows must actually have been dropped (the watermark did
    its job)."""
    out = QUERIES["streaming_late_data_audit"](spark, SF)
    kept = out.agg(F.sum("cnt")).first()[0]
    total = t(spark, SF, "events").count()
    assert kept < total  # late rows were genuinely dropped
    assert kept > total * 0.7  # but the newer tranche survived intact


# ------------------------------------------------------------ PQ ANN


def test_pq_codebook_and_codes_shape(spark):
    import spark_data_test_spark.operators.similarity as sim

    cb = sim._pq_codebook(spark, SF)
    rows = cb.collect()
    # at most M subspaces x K entries; every csub is a full subvector
    assert len(rows) <= sim._PQ_M * sim._PQ_K
    assert {r["s"] for r in rows} == set(range(sim._PQ_M))
    assert all(len(r["csub"]) == sim._PQ_SUBDIM for r in rows)

    codes = sim._pq_codes(spark, SF)
    n_vecs = t(spark, SF, "embeddings").count()
    # exactly one code per (vector, subspace): the 64-float vector is
    # represented by _PQ_M small ints
    assert codes.count() == n_vecs * sim._PQ_M
    bad = codes.join(
        cb.select("s", "cent_id"), ["s", "cent_id"], "left_anti"
    ).count()
    assert bad == 0, "every code must reference a trained codebook entry"


def test_pq_ann_output_is_valid_topk(spark):
    import spark_data_test_spark.operators.similarity as sim

    out = QUERIES["similarity_pq_ann"](spark, SF).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_vec_id"], []).append(r)
    assert set(by_q) == set(range(sim._NQ))
    for q, rows in by_q.items():
        ranks = [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert ranks == list(range(1, sim._PQ_TOPK + 1))
        dists = [r["adc_dist"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert dists == sorted(dists)  # rank order == distance order
        assert all(r["neighbor_id"] != q for r in rows)  # self excluded


def test_pq_recall_report_bounds(spark):
    import spark_data_test_spark.operators.similarity as sim

    rows = QUERIES["similarity_pq_recall_report"](spark, SF).collect()
    assert len(rows) == sim._NQ
    for r in rows:
        assert 0 <= r["hits"] <= sim._PQ_TOPK
        assert r["recall_pct"] == r["hits"] * 100 // sim._PQ_TOPK


def test_ivfpq_subset_of_probed_cells(spark):
    """Every IVF-PQ result must come from a cell the query probed —
    the coarse quantizer actually prunes."""
    import spark_data_test_spark.operators.similarity as sim

    out = QUERIES["similarity_ivfpq_ann"](spark, SF)
    emb = sim._int_embeddings(spark, SF)
    cents = sim.train_ivf_centroids(spark, SF)
    assign = sim._assign_cells(emb, cents, 1).withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    probes = sim._assign_cells(
        emb.where(F.col("vec_id") < sim._NQ), cents, sim._NPROBE
    ).withColumnRenamed("vec_id", "query_id")
    outside = (
        out.join(assign.withColumnRenamed("cell", "ncell"), "neighbor_id")
        .join(probes.withColumnRenamed("cell", "qcell"), "query_id")
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.max(
                (F.col("ncell") == F.col("qcell")).cast("int")
            ).alias("in_probe")
        )
        .where(F.col("in_probe") == 0)
        .count()
    )
    assert outside == 0


# --------------------------------------------------- state time travel


def test_state_version_retention_and_pinned_reads(spark, tmp_path):
    from spark_data_test_spark.streaming.windows import (
        read_state_table,
        write_state_version,
    )
    import pytest

    root = str(tmp_path / "state")
    import os

    os.makedirs(root)
    for i in range(3):
        df = spark.range(1).select(F.lit(i).alias("v"))
        write_state_version(df, root, retain=2)
    # retain=2 after three commits: v0 pruned, v1 and v2 readable
    assert read_state_table(spark, root).first()["v"] == 2
    assert read_state_table(spark, root, version=1).first()["v"] == 1
    with pytest.raises(FileNotFoundError):
        read_state_table(spark, root, version=0)


def test_time_travel_diff_is_consistent(spark):
    rows = QUERIES["state_time_travel_diff"](spark, SF).collect()
    assert rows
    for r in rows:
        if r["change_type"] == "insert":
            assert r["n_orders_v0"] is None
        else:
            assert r["n_orders_v1"] >= r["n_orders_v0"]  # superset input
            assert (
                r["n_orders_v1"] != r["n_orders_v0"]
                or r["spend_cents_v1"] != r["spend_cents_v0"]
            )


# ---------------------------------------- sliding distinct / purity


def test_sliding_distinct_hll_error_pinned(spark):
    """Pin the numeric HLL error behind the within_bound flags."""
    rows = QUERIES["events_sliding_distinct_users"](spark, SF).collect()
    assert rows and all(r["within_bound"] for r in rows)
    ests = {
        r["window_start_us"]: r["est"]
        for r in sketches.sliding_distinct_estimates(spark, SF).collect()
    }
    worst = max(
        abs(ests[r["window_start_us"]] - r["distinct_users_exact"])
        / max(r["distinct_users_exact"], 1)
        for r in rows
    )
    assert worst <= sketches._HLL_BOUND


def test_cluster_purity_consistent(spark):
    rows = QUERIES["similarity_cluster_purity"](spark, SF).collect()
    assert rows
    n_emb = t(spark, SF, "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == n_emb  # partition of corpus
    for r in rows:
        assert 0 < r["top_label_n"] <= r["n_vectors"]
        assert r["purity_pct"] == 100 * r["top_label_n"] // r["n_vectors"]


# --------------------------------------------- streaming heavy hitters


def test_streaming_mg_state_stays_bounded(spark, tmp_path):
    """After folding batches with far more distinct grams than the
    counter budget, state holds at most k counters plus the total
    row, and the stream length is exact."""
    from spark_data_test_spark.streaming.windows import (
        mg_state_apply_batch,
        read_state_table,
    )

    k = 16
    root = str(tmp_path / "mg")
    b1 = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(5))) for i in range(40)],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(100 + i, "hot pair hot pair hot pair") for i in range(10)],
        "doc_id long, text string",
    )
    n_grams = 0
    for b in (b1, b2):
        mg_state_apply_batch(b, root, k)
        n_grams += 4 * b.count()  # 5 tokens -> 4 bigrams; 6 -> 5... b2 has 6 tokens
    state = read_state_table(spark, root).collect()
    counters = [r for r in state if r["g"] is not None]
    totals = [r for r in state if r["g"] is None]
    assert len(counters) <= k
    assert len(totals) == 1
    assert totals[0]["cnt"] == 4 * 40 + 5 * 10  # exact stream length
    # the genuinely hot bigram survives compression
    assert any(r["g"] in ("hot pair", "pair hot") for r in counters)


def test_streaming_equals_batch_heavy_hitters(spark):
    a = sorted(
        (r["gram"], r["cnt"])
        for r in QUERIES["text_heavy_hitters"](spark, SF).collect()
    )
    b = sorted(
        (r["gram"], r["cnt"])
        for r in QUERIES["streaming_heavy_hitters"](spark, SF).collect()
    )
    assert a == b
