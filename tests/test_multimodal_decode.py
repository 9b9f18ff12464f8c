"""Real image decode: the stdlib PNG decoder, the PIL parity path, and
the distributed binaryFile -> mapInPandas decode query."""

import hashlib
import struct
import zlib

import pytest

from spark_data_test_spark.operators import multimodal as mm


def _pixels(n, seed=7):
    """Deterministic pseudo-random byte buffer."""
    out = bytearray()
    x = seed
    while len(out) < n:
        x = (x * 1103515245 + 12345) % (1 << 31)
        out.append(x & 0xFF)
    return bytes(out[:n])


def _png_with_filters(width, height, channels, color_type, pixels, filters):
    """Hand-build a PNG whose scanlines use the given per-row filter
    types (forward-filtering the raw pixels), to exercise the decoder's
    unfilter paths — the project encoder only emits filter 0."""
    stride = width * channels
    rows = [
        bytearray(pixels[y * stride : (y + 1) * stride]) for y in range(height)
    ]
    raw = bytearray()
    prev = bytearray(stride)
    for y, line in enumerate(rows):
        f = filters[y % len(filters)]
        enc = bytearray(line)
        if f == 1:  # Sub
            for i in range(stride - 1, channels - 1, -1):
                enc[i] = (line[i] - line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                enc[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (line[i] - pr) & 0xFF
        raw += bytes([f]) + enc
        prev = line

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        mm._PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_encode_decode_roundtrip_gray():
    px = _pixels(16)
    png = mm.encode_png_gray(4, 4, px)
    w, h, ch, out = mm.decode_image(png)
    assert (w, h, ch) == (4, 4, 1)
    assert out == px


def test_decode_all_filter_types_gray():
    # 5 rows, one per filter type 0..4
    px = _pixels(8 * 5, seed=11)
    png = _png_with_filters(8, 5, 1, 0, px, filters=[0, 1, 2, 3, 4])
    w, h, ch, out = mm._decode_png_stdlib(png)
    assert (w, h, ch) == (8, 5, 1)
    assert out == px


def test_decode_rgb_mixed_filters():
    px = _pixels(6 * 4 * 3, seed=13)
    png = _png_with_filters(6, 4, 3, 2, px, filters=[4, 3, 2, 1])
    w, h, ch, out = mm._decode_png_stdlib(png)
    assert (w, h, ch) == (6, 4, 3)
    assert out == px


def test_decode_rejects_non_png():
    with pytest.raises(ValueError):
        mm._decode_png_stdlib(b"GIF89a not a png")


@pytest.mark.skipif(not mm._PIL_AVAILABLE, reason="PIL not installed")
def test_pil_and_stdlib_paths_agree():
    px = _pixels(4 * 4 * 3, seed=17)
    png = _png_with_filters(4, 4, 3, 2, px, filters=[0, 2, 1, 4])
    assert mm.decode_image(png) == mm._decode_png_stdlib(png)


def _expected_pixel_hex(text):
    """The `_IMG_PH_SQL` pixel truth: four chained md5 digests."""
    return "".join(
        hashlib.md5((text + suffix).encode()).hexdigest()
        for suffix in ("", "#1", "#2", "#3")
    )


def test_real_image_decode_query(spark, sf_dir):
    """The distributed path: staged real PNGs -> binaryFile ->
    mapInPandas decode; decoded pixels must equal the planted
    chained-md5 truth, twins included (byte 1 overwritten with ff)."""
    rows = mm.multimodal_real_image_decode(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    planted = {d for d in docs if d % 13 == 0}
    assert len(rows) == len(docs) + len(planted)
    for r in sorted(rows, key=lambda r: r.doc_id)[:20] + [
        r for r in rows if r.doc_id >= mm._IMG_PLANT_OFFSET
    ][:5]:
        assert (r.width, r.height, r.channels) == (8, 8, 1)
        if r.doc_id >= mm._IMG_PLANT_OFFSET:
            base = _expected_pixel_hex(docs[r.doc_id - mm._IMG_PLANT_OFFSET])
            assert r.pixel_hex == "ff" + base[2:]
        else:
            assert r.pixel_hex == _expected_pixel_hex(docs[r.doc_id])
