"""Pure-stdlib PNG codec (kernels/png.py) + the real multimodal
decode path it powers (functions/multimodal.py codec='real',
image_pixel_stats)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from geocube_spark.kernels import png as P

RNG = np.random.default_rng(77)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


@pytest.mark.parametrize(
    "shape", [(7, 5), (16, 16, 3), (9, 4, 4), (3, 3, 2), (1, 1), (64, 63, 3)]
)
def test_roundtrip_exact(shape):
    a = RNG.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(P.decode_png(P.encode_png(a)), a)


def test_decode_all_five_filter_types():
    """Hand-build a PNG whose rows cycle through filters 0-4 (forward
    filtering implemented independently here) — pins the unfiltering
    math against the spec, not against our own encoder."""
    h, w, ch = 6, 5, 3
    img = RNG.integers(0, 256, (h, w, ch), dtype=np.uint8).astype(np.int32)
    stride = w * ch
    rows = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = y % 5
        cur = img[y].reshape(-1)
        f = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = (
                    a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                )
            f[x] = (cur[x] - pred) & 0xFF
        rows.append(bytes([ftype]) + bytes(f.astype(np.uint8)))
        prev = cur
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(P.decode_png(blob), img.astype(np.uint8))


def test_palette_expands_to_rgb():
    pal = RNG.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = RNG.integers(0, 4, (5, 6), dtype=np.uint8)
    rows = b"".join(bytes([0]) + bytes(idx[y]) for y in range(5))
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(rows))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(P.decode_png(blob), pal[idx])
    info = P.png_info(blob)
    assert (info["width"], info["height"], info["color_type"]) == (6, 5, 3)


def test_validation_and_unsupported():
    a = RNG.integers(0, 256, (4, 4), dtype=np.uint8)
    blob = bytearray(P.encode_png(a))
    assert P.is_png(bytes(blob)) and not P.is_png(b"JFIF....")
    with pytest.raises(ValueError, match="signature"):
        P.decode_png(b"not a png at all....")
    # 16-bit depth and interlace raise cleanly
    deep = bytes(blob[:24]) + bytes([16]) + bytes(blob[25:])
    with pytest.raises(NotImplementedError, match="bit depth"):
        P.decode_png(deep)
    inter = bytes(blob[:28]) + bytes([1]) + bytes(blob[29:])
    with pytest.raises(NotImplementedError, match="interlace"):
        P.decode_png(inter)
    with pytest.raises(ValueError, match="uint8"):
        P.encode_png(a.astype(np.float64))


def test_decode_media_real_and_pixel_stats(spark):
    """codec='real' extracts true IHDR dimensions for PNG rows and
    NULLs for non-PNG; image_pixel_stats fully decodes and matches
    numpy's statistics exactly."""
    from geocube_spark.functions.multimodal import (
        decode_media,
        image_pixel_stats,
    )

    imgs = {
        1: RNG.integers(0, 256, (12, 9, 3), dtype=np.uint8),
        2: RNG.integers(0, 256, (5, 21), dtype=np.uint8),
        3: RNG.integers(0, 256, (33, 7, 4), dtype=np.uint8),
    }
    rows = [
        {"doc_id": k, "media": bytearray(P.encode_png(v))}
        for k, v in imgs.items()
    ]
    rows.append({"doc_id": 4, "media": bytearray(b"plain text bytes")})
    df = spark.createDataFrame(
        pd.DataFrame(rows), "doc_id long, media binary"
    )

    meta = {
        r["doc_id"]: r
        for r in decode_media(df, codec="real").collect()
    }
    for k, v in imgs.items():
        assert (meta[k]["width"], meta[k]["height"]) == (
            v.shape[1], v.shape[0],
        )
        assert meta[k]["n_frames"] == 1
        assert meta[k]["header_hex"].startswith("89504E47")
    assert meta[4]["width"] is None and meta[4]["n_frames"] is None
    assert meta[4]["n_bytes"] == 16

    from geocube_spark.functions.multimodal import resize_media

    rz = {
        r["doc_id"]: r
        for r in resize_media(df, out_w=4, out_h=3, codec="real").collect()
    }
    assert set(rz) == {1, 2, 3}
    for k, v in imgs.items():
        px = v.astype(np.float64)
        if px.ndim == 3:
            # luminance drops alpha (kernels/media.py to_luminance)
            px = px[..., :3].mean(axis=2)
        h, w = px.shape
        yi = np.minimum((np.arange(3) * h / 3).astype(int), h - 1)
        xi = np.minimum((np.arange(4) * w / 4).astype(int), w - 1)
        want = px[yi][:, xi].astype(np.uint8)
        got = np.frombuffer(bytes(rz[k]["pixels"]), dtype=np.uint8)
        assert np.array_equal(got.reshape(3, 4), want)

    stats = {
        r["doc_id"]: r for r in image_pixel_stats(df).collect()
    }
    assert set(stats) == {1, 2, 3}  # the text row drops out
    for k, v in imgs.items():
        s = stats[k]
        ch = 1 if v.ndim == 2 else v.shape[2]
        assert (s["width"], s["height"], s["channels"]) == (
            v.shape[1], v.shape[0], ch,
        )
        assert s["px_mean"] == pytest.approx(float(v.mean()), abs=1e-12)
        assert s["px_std"] == pytest.approx(float(v.std()), abs=1e-12)
        assert (s["px_min"], s["px_max"]) == (int(v.min()), int(v.max()))
