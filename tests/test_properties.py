"""Property-based tests for the comparison engine (hypothesis).

The reference test suite is a single golden fixture (SURVEY.md §5);
these pin the engine's algebraic invariants over randomized inputs:
reflexivity, missing-row accounting, symmetry, and tolerance monotonicity.
Examples are kept small — each runs a real Spark comparison.
"""

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from spark_data_test_spark import DatasetParams, TestParams, compare_dataframes
from spark_data_test_spark.constants import (
    COL_LVL_TEST_REPORT_KEY,
    OVERALL_TEST_REPORT_KEY,
)

_SCHEMA = "id bigint, s string, x double"

_strings = st.one_of(st.none(), st.text(alphabet="abcXYZ ", max_size=6))
_doubles = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@st.composite
def tables(draw, min_rows=1, max_rows=12):
    n = draw(st.integers(min_rows, max_rows))
    keys = draw(
        st.lists(
            st.integers(0, 10**6), min_size=n, max_size=n, unique=True
        )
    )
    return [
        (k, draw(_strings), draw(_doubles)) for k in sorted(keys)
    ]


def _params(tol=0.0, mode="sha256"):
    return DatasetParams(
        dataset_name="prop",
        primary_keys=["id"],
        test_params=TestParams(difference_tolerance=tol, checksum_mode=mode),
    )


_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@given(rows=tables())
@_settings
def test_reflexivity(spark, rows):
    """compare(df, df) with unique keys: PASSED, zero mismatches."""
    df = spark.createDataFrame(rows, _SCHEMA)
    res = compare_dataframes(spark, df, df, _params(), compute_unmatched_dumps=False)
    overall = res[OVERALL_TEST_REPORT_KEY].first()
    assert overall["test_status"] == "PASSED"
    assert overall["matched_count"] == len(rows)
    assert overall["missing_rows"] == {"source": 0, "target": 0}
    col_counts = {
        r["column_name"]: r["unmatched_rows_count"]
        for r in res[COL_LVL_TEST_REPORT_KEY].collect()
    }
    assert set(col_counts.values()) == {0}


@given(rows=tables(min_rows=2), data=st.data())
@_settings
def test_missing_row_accounting(spark, rows, data):
    """Dropping k target rows => missing_at_target == k, FAILED."""
    k = data.draw(st.integers(1, len(rows) - 1))
    df = spark.createDataFrame(rows, _SCHEMA)
    tgt = spark.createDataFrame(rows[k:], _SCHEMA)
    res = compare_dataframes(spark, df, tgt, _params(), compute_unmatched_dumps=False)
    overall = res[OVERALL_TEST_REPORT_KEY].first()
    assert overall["missing_rows"]["target"] == k
    assert overall["matched_count"] == len(rows) - k
    assert overall["test_status"] == "FAILED"


@given(rows=tables(min_rows=2))
@_settings
def test_symmetry(spark, rows):
    """Swapping source/target swaps the missing-row sides."""
    half = len(rows) // 2
    a = spark.createDataFrame(rows, _SCHEMA)
    b = spark.createDataFrame(rows[half:], _SCHEMA)
    fwd = compare_dataframes(spark, a, b, _params(), compute_unmatched_dumps=False)[
        OVERALL_TEST_REPORT_KEY
    ].first()
    rev = compare_dataframes(spark, b, a, _params(), compute_unmatched_dumps=False)[
        OVERALL_TEST_REPORT_KEY
    ].first()
    assert fwd["missing_rows"]["target"] == rev["missing_rows"]["source"]
    assert fwd["missing_rows"]["source"] == rev["missing_rows"]["target"]
    assert fwd["matched_count"] == rev["matched_count"]


@given(rows=tables(), data=st.data())
@_settings
def test_tolerance_monotonicity(spark, rows, data):
    """A numeric delta within tolerance matches; beyond it, it doesn't
    (canonical checksum mode so NULL vs value never false-matches)."""
    idx = data.draw(st.integers(0, len(rows) - 1))
    delta = data.draw(st.floats(min_value=0.001, max_value=0.4))
    src = spark.createDataFrame(rows, _SCHEMA)
    perturbed = [
        (k, s, x + delta if i == idx else x)
        for i, (k, s, x) in enumerate(rows)
    ]
    tgt = spark.createDataFrame(perturbed, _SCHEMA)
    base = rows[idx][2]
    actual_delta = abs((base + delta) - base)

    loose = compare_dataframes(
        spark, src, tgt, _params(tol=0.5, mode="xxhash64"),
        compute_unmatched_dumps=False,
    )[OVERALL_TEST_REPORT_KEY].first()
    assert loose["matched_count"] == len(rows)

    if actual_delta > 1e-4 and not math.isclose(
        actual_delta, 1e-4, rel_tol=0.5
    ):
        tight = compare_dataframes(
            spark, src, tgt, _params(tol=1e-4, mode="xxhash64"),
            compute_unmatched_dumps=False,
        )[OVERALL_TEST_REPORT_KEY].first()
        assert tight["matched_count"] == len(rows) - 1


@given(
    rows=tables(min_rows=2, max_rows=8),
    tol_x=st.floats(min_value=0.0, max_value=10.0, allow_nan=False),
)
@_settings
def test_per_column_tolerance_override(spark, rows, tol_x):
    """column_tolerances: the override governs its column alone —
    a pair differing only in x matches iff |dx| <= tol_x, regardless of
    the global tolerance being zero."""
    src = spark.createDataFrame(rows, _SCHEMA)
    bumped = [(k, s, x + tol_x / 2) for k, s, x in rows]
    tgt = spark.createDataFrame(bumped, _SCHEMA)
    params = DatasetParams(
        dataset_name="coltol",
        primary_keys=["id"],
        test_params=TestParams(
            difference_tolerance=0.0, column_tolerances={"x": tol_x}
        ),
    )
    res = compare_dataframes(spark, src, tgt, params, compute_unmatched_dumps=False)
    overall = res[OVERALL_TEST_REPORT_KEY].first()
    # every pair differs by tol_x/2 <= tol_x in x only -> all matched
    # unless s is NULL-vs-NULL equality breaks (it can't: same s)
    assert overall["matched_count"] == len(rows)


def test_frame_cache_eviction_order_and_release():
    from spark_data_test_spark.utils.spark_utils import FrameCache

    released = []
    cache = FrameCache(max_entries=2, release=released.append)
    cache.get_or_create("a", lambda: "va")
    cache.get_or_create("b", lambda: "vb")
    cache.get_or_create("a", lambda: "REBUILT")  # hit: refreshes, no rebuild
    assert cache.get_or_create("a", lambda: "REBUILT") == "va"
    cache.get_or_create("c", lambda: "vc")  # evicts b (a was refreshed)
    assert released == ["vb"]
    assert cache.get_or_create("b", lambda: "vb2") == "vb2"  # b rebuilt
    assert released == ["vb", "va"]  # a evicted next (append-only log)
    cache.clear()
    assert set(released) == {"va", "vb", "vc", "vb2"}


# --- media codec roundtrips (no Spark session needed) ---------------------

_pcm_bytes = st.binary(min_size=0, max_size=256).map(
    lambda b: b[: len(b) - (len(b) % 2)]  # PCM16 needs whole samples
)


@given(pcm=_pcm_bytes, rate=st.sampled_from([8000, 16000, 44100]))
@settings(max_examples=200, deadline=None)
def test_wav_roundtrip_property(pcm, rate):
    from spark_data_test_spark import decode_wav, encode_wav_pcm16

    out_rate, channels, bits, data = decode_wav(encode_wav_pcm16(rate, pcm))
    assert (out_rate, channels, bits) == (rate, 1, 16)
    assert data == pcm


@given(
    w=st.integers(1, 8),
    h=st.integers(1, 8),
    n=st.integers(0, 6),
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_y4m_roundtrip_property(w, h, n, data):
    from spark_data_test_spark import decode_y4m, encode_y4m

    frames = [
        data.draw(st.binary(min_size=w * h, max_size=w * h))
        for _ in range(n)
    ]
    ow, oh, out = decode_y4m(encode_y4m(w, h, frames))
    assert (ow, oh) == (w, h)
    assert out == frames


@given(junk=st.binary(min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_wav_decoder_never_misparses_junk(junk):
    """Arbitrary bytes either fail loudly (ValueError) or are a real
    RIFF/WAVE container — the decoder never returns garbage silently."""
    import pytest as _pytest

    from spark_data_test_spark import decode_wav

    if junk[:4] == b"RIFF" and junk[8:12] == b"WAVE":
        try:
            decode_wav(junk)
        except ValueError:
            pass
    else:
        with _pytest.raises(ValueError):
            decode_wav(junk)
