"""phash_near_dup_pairs: brute-force + registered-query parity pins."""


def _ahash(pixels):
    tot = sum(pixels)
    h = 0
    for j, p in enumerate(pixels):
        if 64 * p >= tot:
            h |= 1 << j
    return h


def _hex(pixels):
    return "".join(f"{p:02x}" for p in pixels)


def test_phash_near_dup_pairs_matches_bruteforce(spark):
    from spark_data_test_spark import phash_near_dup_pairs

    base = [(i * 37 + 11) % 256 for i in range(64)]
    near = list(base)
    near[5] ^= 0x80          # flips a bit or two of the hash at most
    far = [(i * 101 + 3) % 256 for i in range(64)]
    imgs = {1: base, 2: near, 3: far, 4: list(base), 5: far[::-1]}
    df = spark.createDataFrame(
        [(k, _hex(v)) for k, v in sorted(imgs.items())],
        "doc_id long, pixel_hex string",
    )

    for max_ham in (0, 3, 7):
        want = set()
        for a in imgs:
            for b in imgs:
                if a >= b:
                    continue
                ham = bin(_ahash(imgs[a]) ^ _ahash(imgs[b])).count("1")
                if ham <= max_ham:
                    want.add((a, b, ham))
        got = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in phash_near_dup_pairs(df, max_ham).collect()
        }
        assert got == want, max_ham
    # identical images always pair at hamming 0
    assert (1, 4, 0) in want

    try:
        phash_near_dup_pairs(df, 8)
        assert False, "expected ValueError beyond the pigeonhole bound"
    except ValueError:
        pass


def test_phash_near_dup_pairs_parity_with_registered_query(spark, sf_dir):
    from spark_data_test_spark import phash_near_dup_pairs
    from spark_data_test_spark.operators import multimodal as mm

    dec = mm.multimodal_real_image_decode(spark, sf_dir).select(
        "doc_id", "pixel_hex"
    )
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in phash_near_dup_pairs(dec).collect()
    }
    want = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in mm.multimodal_phash_neardup(spark, sf_dir).collect()
    }
    assert got == want and got
