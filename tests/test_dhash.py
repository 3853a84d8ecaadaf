"""Perceptual dHash: bit construction, banded pair recall, and the
real-PNG-codec bridge."""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocube_spark.functions.multimodal import (dhash_bits,
                                                dhash_near_pairs)


def _ref_dhash(px, w, h):
    out = 0
    for r in range(h):
        for c in range(w - 1):
            if px[r * w + c] < px[r * w + c + 1]:
                out |= 1 << (r * (w - 1) + c)
    return out


def _sig_df(spark, rows, w=8, h=8):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "doc_id long, pixels array<double>")
    return dhash_bits(df, width=w, height=h)


def test_matches_scalar_referee(spark):
    rng = np.random.default_rng(4)
    rows = [(i, rng.uniform(0, 255, 64)) for i in range(30)]
    got = {r["id"]: r["dhash"]
           for r in _sig_df(spark, rows).collect()}
    for i, v in rows:
        assert got[i] == _ref_dhash(v, 8, 8), i


def test_ties_are_zero_bits(spark):
    rows = [(0, np.full(64, 7.0))]
    got = _sig_df(spark, rows).collect()[0]["dhash"]
    assert got == 0


def test_banded_pairs_equal_bruteforce(spark):
    rng = np.random.default_rng(8)
    base = [rng.uniform(0, 255, 64) for _ in range(40)]
    rows = [(i, v) for i, v in enumerate(base)]
    # near-dups: bump one pixel enough to flip ~1 gradient
    for i in range(40, 60):
        v = base[i - 40].copy()
        v[0] += 300.0
        rows.append((i, v))
    sig = _sig_df(spark, rows)
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dhash_near_pairs(sig, max_hamming=6).collect()}
    hashes = {i: _ref_dhash(v, 8, 8) for i, v in rows}
    want = {}
    for (a, b) in itertools.combinations(sorted(hashes), 2):
        ham = bin(hashes[a] ^ hashes[b]).count("1")
        if ham <= 6:
            want[(a, b)] = ham
    assert got == want
    assert any(a + 40 == b for (a, b) in got), "planted dups found"


def test_real_png_codec_bridge(spark):
    """Encode two nearly-identical images with the real PNG codec,
    decode through decode_media(codec='real'), resize to 8x8, and
    dHash them: the near-identical pair is close, a random third
    image is far."""
    from geocube_spark.functions.multimodal import (decode_media,
                                                    resize_media)
    from geocube_spark.kernels.png import encode_png

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (32, 32), dtype=np.uint8)
    near = img.copy()
    near[0, 0] = 255 - near[0, 0]            # one-pixel change
    other = rng.integers(0, 255, (32, 32), dtype=np.uint8)
    rows = [(0, bytearray(encode_png(img))),
            (1, bytearray(encode_png(near))),
            (2, bytearray(encode_png(other)))]
    media = spark.createDataFrame(rows, "doc_id long, media binary")
    small = resize_media(media, out_w=8, out_h=8, codec="real")
    prows = [(r["doc_id"], [float(b) for b in bytes(r["pixels"])])
             for r in small.collect()]
    px = spark.createDataFrame(prows, "doc_id long, pixels array<double>")
    sig = {r["id"]: r["dhash"] for r in dhash_bits(px).collect()}
    ham_near = bin(sig[0] ^ sig[1]).count("1")
    ham_far = bin(sig[0] ^ sig[2]).count("1")
    assert ham_near <= 6
    assert ham_far > ham_near


def test_validation(spark):
    df = spark.createDataFrame([(0, [1.0, 2.0])],
                               "doc_id long, pixels array<double>")
    with pytest.raises(ValueError, match="width"):
        dhash_bits(df, width=1)
    with pytest.raises(ValueError, match="exceed"):
        dhash_bits(df, width=9, height=9)
    sig = dhash_bits(df, width=2, height=1)
    with pytest.raises(ValueError, match="bands"):
        dhash_near_pairs(sig, bands=5, bits=56)
