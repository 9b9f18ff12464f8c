"""Real video round trip: the Y4M codec and the staged-corpus
scene-cut query's decode parity."""

import hashlib

import pytest

from spark_data_test_spark.operators import multimodal as mm


def _frames(n, plane, seed=9):
    out = []
    x = seed
    for _ in range(n):
        buf = bytearray()
        for _ in range(plane):
            x = (x * 1103515245 + 12345) % (1 << 31)
            buf.append(x & 0xFF)
        out.append(bytes(buf))
    return out


def test_y4m_roundtrip():
    frames = _frames(3, 16)
    y4m = mm.encode_y4m(4, 4, frames)
    w, h, out = mm.decode_y4m(y4m)
    assert (w, h) == (4, 4)
    assert out == frames


def test_y4m_parser_handles_tag_order_and_frame_params():
    # Tags in scrambled order, an unknown X tag, and a FRAME marker
    # carrying its own parameter up to the newline (spec-legal).
    frames = _frames(2, 6, seed=21)
    head = b"YUV4MPEG2 Cmono F30:1 XCLAIM W3 H2 Ip\n"
    body = b"FRAME\n" + frames[0] + b"FRAME Xseq=2\n" + frames[1]
    w, h, out = mm.decode_y4m(head + body)
    assert (w, h) == (3, 2)
    assert out == frames


def test_y4m_rejects_malformed():
    with pytest.raises(ValueError):
        mm.decode_y4m(b"RIFF not y4m")
    with pytest.raises(ValueError):  # missing W/H
        mm.decode_y4m(b"YUV4MPEG2 Cmono\nFRAME\n")
    with pytest.raises(ValueError):  # default C420 is unsupported
        mm.decode_y4m(b"YUV4MPEG2 W2 H2\nFRAME\n" + b"\x00" * 6)
    with pytest.raises(ValueError):  # truncated plane
        mm.decode_y4m(b"YUV4MPEG2 W4 H4 Cmono\nFRAME\n" + b"\x00" * 7)
    with pytest.raises(ValueError):  # garbage between frames
        mm.decode_y4m(
            b"YUV4MPEG2 W2 H2 Cmono\nFRAME\n" + b"\x00" * 4 + b"JUNK\n"
        )


def _expected_luma_hex(text):
    """The `_VID_SUM_SQL` frame truth: one chained md5 per frame."""
    return "".join(
        hashlib.md5(f"{text}~v{f}".encode()).hexdigest()
        for f in range(1, mm._VID_FRAMES + 1)
    )


def test_video_decode_query(spark, sf_dir):
    """The distributed path: staged real Y4M streams -> manifest scan
    -> mapInPandas decode; decoded luma must equal the planted
    chained-md5 truth, with header fields from the file."""
    rows = mm.video_decoded(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        assert (r.width, r.height, r.n_frames) == (
            mm._VID_W,
            mm._VID_H,
            mm._VID_FRAMES,
        )
        assert r.luma_hex == _expected_luma_hex(docs[r.doc_id])


def test_scene_cut_report_shape(spark, sf_dir):
    """Shot accounting invariants: n_shots = n_cuts + 1, the longest
    shot is bounded by the frame count, and cuts match a brute-force
    replay of the luma-delta rule on a sample doc."""
    rows = mm.multimodal_video_scene_cuts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_shots == r.n_cuts + 1
        assert 1 <= r.longest_shot_frames <= r.n_frames
    by_id = {r.doc_id: r for r in rows}
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for doc_id in sorted(docs)[:20]:
        luma = bytes.fromhex(_expected_luma_hex(docs[doc_id]))
        plane = mm._VID_W * mm._VID_H
        sums = [
            sum(luma[k * plane : (k + 1) * plane])
            for k in range(mm._VID_FRAMES)
        ]
        cuts = sum(
            1
            for a, b in zip(sums, sums[1:])
            if abs(b - a) > mm._VID_CUT_THRESHOLD
        )
        assert by_id[doc_id].n_cuts == cuts
        assert by_id[doc_id].total_luma == sum(sums)
