"""Library-surface tests for ``box_downsample`` — the generic integer
box-average image downsample exported from the package root.

Cross-checks against a brute-force Python reference on deterministic
pixel grids at several (side, factor) shapes, including the non
power-of-two factor the registry query doesn't exercise, and pins the
validation error for a non-divisible factor.
"""

import pytest

from spark_data_test_spark import box_downsample


def _hex_image(pixels):
    return "".join(f"{p:02x}" for p in pixels)


def _brute_force(pixels, side, factor):
    out = {}
    for j, p in enumerate(pixels):
        y, x = (j // side) // factor, (j % side) // factor
        out[(y, x)] = out.get((y, x), 0) + p
    return {k: v // (factor * factor) for k, v in out.items()}


def _grid(side, seed):
    # deterministic, full byte range, asymmetric so x/y swaps fail
    return [(seed * 31 + j * 97 + (j * j) % 13) % 256
            for j in range(side * side)]


@pytest.mark.parametrize(
    "side,factor",
    [(8, 2), (8, 4), (8, 8), (6, 3), (12, 2)],
)
def test_box_downsample_matches_brute_force(spark, side, factor):
    images = {f"doc_{i}": _grid(side, seed=i + 1) for i in range(3)}
    df = spark.createDataFrame(
        [(doc, _hex_image(px)) for doc, px in images.items()],
        "doc_id string, pixel_hex string",
    )
    got = {
        (r.doc_id, r.y, r.x): r.v
        for r in box_downsample(df, side=side, factor=factor).collect()
    }
    want = {
        (doc, y, x): v
        for doc, px in images.items()
        for (y, x), v in _brute_force(px, side, factor).items()
    }
    assert got == want
    out_side = side // factor
    assert len(got) == 3 * out_side * out_side


def test_box_downsample_identity_factor_one(spark):
    px = _grid(4, seed=9)
    df = spark.createDataFrame(
        [("d", _hex_image(px))], "doc_id string, pixel_hex string"
    )
    got = {(r.y, r.x): r.v
           for r in box_downsample(df, side=4, factor=1).collect()}
    assert got == {(j // 4, j % 4): p for j, p in enumerate(px)}


def test_box_downsample_custom_columns(spark):
    px = _grid(4, seed=3)
    df = spark.createDataFrame(
        [(7, _hex_image(px))], "img_id int, gray_hex string"
    )
    rows = box_downsample(
        df, side=4, factor=2, id_col="img_id", pixel_col="gray_hex"
    ).collect()
    assert {r.img_id for r in rows} == {7}
    assert {(r.y, r.x, r.v) for r in rows} == {
        (y, x, v) for (y, x), v in _brute_force(px, 4, 2).items()
    }


def test_box_downsample_rejects_non_divisible_factor(spark):
    df = spark.createDataFrame(
        [("d", "00" * 64)], "doc_id string, pixel_hex string"
    )
    with pytest.raises(ValueError, match="not divisible"):
        box_downsample(df, side=8, factor=3)
