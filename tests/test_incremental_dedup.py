"""Property tests for the incremental-dedup-against-persisted-index
family and the scratch-then-rename state commit protocol.

The DuckDB oracle harness pins cross-engine value equality; these pin
the properties the oracle cannot see — recall of planted arrivals,
idempotency across the merged-index commit, genuine state advancement,
and the concurrent-writer rename semantics of write_state_version.
"""

import os
import shutil
import tempfile

import pyspark.sql.functions as F

from spark_data_test_spark.operators.dedup import (
    _INC_EXACT_OFFSET,
    _INC_NEAR_OFFSET,
    _INC_SIM_MOD,
    _INC_SIM_OFFSET,
    _SP_BITS,
    _exact_index_path,
    _minhash_index_path,
    _sim_index_path,
)
from spark_data_test_spark.operators.relational import QUERIES
from spark_data_test_spark.state import (
    _committed_state_version,
    read_state_table,
    write_state_version,
)

SF = "/root/testdata/sf0.001"


def _fresh(path):
    shutil.rmtree(path, ignore_errors=True)


# ----------------------------------------------------- incremental dedup


def test_incremental_minhash_recalls_planted_and_is_idempotent(spark):
    """Every planted near-dup arrival (+_INC_NEAR_OFFSET) must match
    its historical source with is_dup, from a COLD state root; a rerun
    against the MERGED index must emit identical rows while the state
    version genuinely advanced."""
    _fresh(_minhash_index_path(SF))
    q = QUERIES["dedup_incremental_minhash"]

    first = q(spark, SF).collect()
    v_after_first = _committed_state_version(_minhash_index_path(SF))

    planted_hits = {
        (r.new_doc_id, r.dup_of)
        for r in first
        if r.new_doc_id >= _INC_NEAR_OFFSET and r.is_dup
    }
    # each planted arrival is source_doc + offset; its true partner is
    # the source itself
    expected = {
        (doc + _INC_NEAR_OFFSET, doc)
        for (doc,) in spark.read.parquet(f"{SF}/documents.parquet")
        .where((F.col("doc_id") % 11 == 0) & (F.col("doc_id") % 4 != 3))
        .where(F.length("text") >= 8)
        .select("doc_id")
        .collect()
    }
    missing = expected - planted_hits
    # strided 8-gram MinHash at 4x3 banding recalls essentially all
    # planted pairs; allow a tiny tail for very short docs
    assert len(missing) <= max(1, len(expected) // 20), missing

    second = q(spark, SF).collect()
    v_after_second = _committed_state_version(_minhash_index_path(SF))
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))
    assert v_after_second > v_after_first  # merge re-committed


def test_incremental_minhash_merged_index_contains_shard(spark):
    """After a run, the committed index holds band rows for shard docs
    too — the durable advancement the next shard probes. Self-contained:
    resets the state root and runs the query itself, so it passes under
    -k selection, reordering, or parallel execution."""
    path = _minhash_index_path(SF)
    _fresh(path)
    QUERIES["dedup_incremental_minhash"](spark, SF).collect()
    state = read_state_table(spark, path)
    assert state is not None
    n_new = state.where(
        (F.col("doc_id") % 4 == 3) | (F.col("doc_id") >= _INC_NEAR_OFFSET)
    ).count()
    n_hist = state.where(
        (F.col("doc_id") % 4 != 3) & (F.col("doc_id") < _INC_NEAR_OFFSET)
    ).count()
    assert n_new > 0 and n_hist > 0


def test_incremental_exact_matches_exactly_the_planted_copies(spark):
    """From a cold root: every planted exact copy matches its source;
    no false matches beyond genuine cross-slice text duplicates."""
    _fresh(_exact_index_path(SF))
    q = QUERIES["dedup_incremental_exact"]
    rows = q(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    planted = {
        (doc + _INC_EXACT_OFFSET, doc)
        for (doc,) in docs.where(
            (F.col("doc_id") % 19 == 0) & (F.col("doc_id") % 4 != 3)
        )
        .select("doc_id")
        .collect()
    }
    got = {(r.new_doc_id, r.dup_of) for r in rows}
    assert planted <= got
    # non-planted matches can only be genuine text duplicates
    extras = got - planted
    for new_id, _ in extras:
        assert new_id < _INC_EXACT_OFFSET

    rerun = {(r.new_doc_id, r.dup_of) for r in q(spark, SF).collect()}
    assert rerun == got  # idempotent across the merged commit


def test_index_build_matches_probe_index(spark):
    """dedup_index_build emits exactly the historical slice the
    incremental query probes (band count = 4 per historical doc that
    can shingle)."""
    build = QUERIES["dedup_index_build"](spark, SF)
    per_doc = build.groupBy("doc_id").count().collect()
    assert per_doc and all(r["count"] == 4 for r in per_doc)
    assert all(
        r.doc_id % 4 != 3 and r.doc_id < _INC_NEAR_OFFSET for r in per_doc
    )


def test_incremental_simhash_recalls_planted_and_freezes_centering(spark):
    """From a cold root: most planted tail-perturbed arrivals
    (+_INC_SIM_OFFSET) match their historical source within hamming 7;
    a rerun against the merged index emits identical rows (the frozen
    centering rows rode the commit, so re-packing the shard cannot
    drift); the committed index carries exactly 65 model-card rows."""
    path = _sim_index_path(SF)
    _fresh(path)
    q = QUERIES["dedup_incremental_simhash"]
    first = q(spark, SF).collect()

    planted_hits = {
        (r.new_doc_id, r.dup_of)
        for r in first
        if r.new_doc_id >= _INC_SIM_OFFSET
    }
    expected = {
        (doc + _INC_SIM_OFFSET, doc)
        for (doc,) in spark.read.parquet(f"{SF}/documents.parquet")
        .where(
            (F.col("doc_id") % _INC_SIM_MOD == 0) & (F.col("doc_id") % 4 != 3)
        )
        .select("doc_id")
        .collect()
    }
    # a 3-token tail on a short doc can exceed hamming 7; the measured
    # planted recall at this radius is ~90%
    assert len(expected & planted_hits) >= (8 * len(expected)) // 10
    assert all(r.hamming <= 7 for r in first)

    second = q(spark, SF).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))

    state = read_state_table(spark, path)
    meta = state.where(F.col("band") == -1)
    assert meta.count() == _SP_BITS + 1
    # shard band rows landed in the merged commit
    assert (
        state.where(
            (F.col("band") >= 0)
            & (
                (F.col("doc_id") % 4 == 3)
                | (F.col("doc_id") >= _INC_SIM_OFFSET)
            )
        ).count()
        > 0
    )


# ------------------------------------------------- state commit protocol


def test_write_state_version_rename_commit_and_lost_race(spark):
    root = tempfile.mkdtemp(prefix="state_rename_test_")
    try:
        df = spark.range(3).withColumnRenamed("id", "v")
        assert write_state_version(df, root, retain=2) == 0
        assert write_state_version(df, root, retain=2) == 1
        # simulate losing the race for v2: another writer commits it
        # between our scratch write and rename
        os.makedirs(f"{root}/v2")
        open(f"{root}/v2/_SUCCESS", "w").close()
        assert write_state_version(df, root, retain=10) == 3
        assert _committed_state_version(root) == 3
        # no scratch leftovers
        assert not [n for n in os.listdir(root) if n.startswith(".staging-")]
        # readers see the winner
        assert read_state_table(spark, root).count() == 3
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_write_state_version_retains_window_and_prunes(spark):
    root = tempfile.mkdtemp(prefix="state_retain_test_")
    try:
        df = spark.range(2).withColumnRenamed("id", "v")
        for _ in range(4):
            write_state_version(df, root, retain=2)
        versions = sorted(
            n for n in os.listdir(root) if n.startswith("v")
        )
        assert versions == ["v2", "v3"]
        # pinned read of a pruned version must raise, not mis-serve
        try:
            read_state_table(spark, root, version=0)
            raise AssertionError("pinned read of pruned version succeeded")
        except FileNotFoundError:
            pass
    finally:
        shutil.rmtree(root, ignore_errors=True)
