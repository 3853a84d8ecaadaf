"""Round-4 media codecs beyond PNG: baseline JPEG, GIF, BMP, AVI
(kernels/jpeg.py, gif.py, bmp.py, avi.py), the kernels/media.py sniff
+ dispatch front door, and the multimodal 'real' paths they power.

Every codec is pure stdlib + numpy from its public spec; each test
pins decode either against the sibling encoder (whose stream layout
is derived from the spec, not from the decoder) or against an
independently computed expectation.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from geocube_spark.kernels import avi as A
from geocube_spark.kernels import bmp as B
from geocube_spark.kernels import gif as G
from geocube_spark.kernels import jpeg as J
from geocube_spark.kernels import media as MK
from geocube_spark.kernels.png import encode_png
from geocube_spark.kernels.wav import wav_encode

RNG = np.random.default_rng(4004)


# -- BMP ----------------------------------------------------------------------

@pytest.mark.parametrize(
    "shape", [(5, 7), (16, 16, 3), (9, 3, 3), (4, 6, 4), (1, 1), (8, 5, 3)]
)
def test_bmp_roundtrip_exact(shape):
    a = RNG.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(B.decode_bmp(B.encode_bmp(a)), a)


def test_bmp_topdown_matches_bottomup():
    a = RNG.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    up = B.encode_bmp(a, top_down=False)
    dn = B.encode_bmp(a, top_down=True)
    assert up != dn
    assert np.array_equal(B.decode_bmp(up), B.decode_bmp(dn))


def test_bmp_info_no_pixel_touch():
    a = RNG.integers(0, 256, (12, 10, 3), dtype=np.uint8)
    blob = B.encode_bmp(a)
    info = B.bmp_info(blob[: info_len(blob)])
    assert info["width"] == 10 and info["height"] == 12
    assert info["bpp"] == 24 and not info["top_down"]


def info_len(blob: bytes) -> int:
    """Headers only — proves bmp_info never reads pixel rows."""
    return struct.unpack("<I", blob[10:14])[0]


def test_bmp_unsupported_and_corrupt():
    a = RNG.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    blob = bytearray(B.encode_bmp(a))
    blob[28] = 16  # bpp -> 16
    with pytest.raises(NotImplementedError, match="bit depth 16"):
        B.bmp_info(bytes(blob))
    blob = bytearray(B.encode_bmp(a))
    blob[30] = 1  # compression -> BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        B.bmp_info(bytes(blob))
    with pytest.raises(ValueError, match="truncated pixel"):
        B.decode_bmp(B.encode_bmp(a)[:-8])
    with pytest.raises(ValueError, match="signature"):
        B.decode_bmp(b"NOPE" * 20)


# -- GIF ----------------------------------------------------------------------

def _rand_palette(n: int) -> np.ndarray:
    return RNG.integers(0, 256, (n, 3), dtype=np.uint8)


def test_gif_roundtrip_single_frame():
    pal = _rand_palette(16)
    idx = RNG.integers(0, 16, (11, 7), dtype=np.uint8)
    g = G.encode_gif(idx, pal)
    assert G.gif_info(g) == {"width": 7, "height": 11, "n_frames": 1}
    assert np.array_equal(G.decode_gif(g), pal[idx])


def test_gif_multiframe_animation():
    pal = _rand_palette(8)
    frames = [RNG.integers(0, 8, (5, 6), dtype=np.uint8) for _ in range(4)]
    g = G.encode_gif(frames, pal)
    assert G.gif_info(g)["n_frames"] == 4
    for i, fr in enumerate(frames):
        assert np.array_equal(G.decode_gif(g, i), pal[fr])
    with pytest.raises(ValueError, match="4 frames"):
        G.decode_gif(g, 4)


def test_gif_lzw_table_overflow_roundtrip():
    """A large full-palette random image pushes the LZW dictionary past
    4096 codes, forcing mid-stream clear-code resets in both encoder
    and decoder."""
    pal = _rand_palette(256)
    idx = RNG.integers(0, 256, (80, 90), dtype=np.uint8)
    g = G.encode_gif(idx, pal)
    assert len(g) > 4096  # incompressible: the table really overflowed
    assert np.array_equal(G.decode_gif(g), pal[idx])


def test_gif_interlaced_decode():
    """Hand-assemble an interlaced image block (rows stored in the
    four-pass GIF87a order, interlace flag set) — the decoder must
    un-permute it back. The pass order here is written out from the
    spec, independent of the codec's table."""
    pal = _rand_palette(4)
    h, w = 13, 5
    idx = RNG.integers(0, 4, (h, w), dtype=np.uint8)
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    stored = idx[order]
    min_code = 2
    data = G._lzw_encode(stored, min_code)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, 0x81, 0, 0)
    pal_full = np.zeros((4, 3), dtype=np.uint8)
    pal_full[:] = pal
    out += pal_full.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    out.append(min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out += b"\x3B"
    assert np.array_equal(G.decode_gif(bytes(out)), pal[idx])


def test_gif_corrupt_rejected():
    with pytest.raises(ValueError, match="signature"):
        G.gif_info(b"JIF89a" + b"\x00" * 32)
    pal = _rand_palette(4)
    g = G.encode_gif(np.zeros((3, 3), dtype=np.uint8), pal)
    with pytest.raises(ValueError):
        G.decode_gif(g[:-6])  # trailer + data tail gone


# -- JPEG ---------------------------------------------------------------------

def _gradient(h, w, color=True):
    y = np.linspace(0, 255, h)[:, None]
    x = np.linspace(0, 255, w)[None, :]
    g = (y + x) / 2
    if not color:
        return g.astype(np.uint8)
    return np.stack(
        [g, 255 - g, np.minimum(y, x) * np.ones_like(g)], axis=2
    ).astype(np.uint8)


@pytest.mark.parametrize("shape", [(16, 16), (24, 24, 3), (17, 13, 3), (5, 9)])
def test_jpeg_q100_near_lossless(shape):
    """At quality=100 every Annex-K table scales to all-ones, so the
    only loss is rounding: DCT alone (gray, <=1/sample) plus the
    YCbCr<->RGB round-trip for color (<=2/sample)."""
    color = len(shape) == 3
    a = _gradient(*shape[:2], color=color)
    out = J.decode_jpeg(J.encode_jpeg(a, quality=100))
    assert out.shape == a.shape
    err = np.abs(out.astype(int) - a.astype(int)).max()
    assert err <= (2 if color else 1), err


def test_jpeg_info_and_quality_degrades():
    a = _gradient(32, 48)
    blob = J.encode_jpeg(a, quality=75)
    info = J.jpeg_info(blob)
    assert (info["width"], info["height"]) == (48, 32)
    out = J.decode_jpeg(blob)
    assert np.abs(out.astype(int) - a.astype(int)).max() <= 20
    assert len(J.encode_jpeg(a, quality=30)) < len(blob)


def test_jpeg_420_subsampling():
    a = _gradient(20, 22, color=True)
    out = J.decode_jpeg(J.encode_jpeg(a, quality=95, subsample="420"))
    assert out.shape == a.shape
    # smooth chroma: subsampled reconstruction stays close
    assert np.abs(out.astype(int) - a.astype(int)).max() <= 24


def test_jpeg_restart_markers_equivalent():
    a = _gradient(33, 41, color=True)
    plain = J.decode_jpeg(J.encode_jpeg(a, quality=92))
    rst = J.encode_jpeg(a, quality=92, restart_interval=2)
    assert b"\xFF\xDD" in rst  # DRI emitted
    assert np.array_equal(J.decode_jpeg(rst), plain)


def test_jpeg_progressive_rejected_but_sized():
    a = _gradient(10, 12)
    blob = bytearray(J.encode_jpeg(a))
    i = bytes(blob).find(b"\xFF\xC0")
    blob[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    info = J.jpeg_info(bytes(blob))
    assert (info["width"], info["height"]) == (12, 10)
    with pytest.raises(NotImplementedError, match="progressive"):
        J.decode_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"\x00\x00" + bytes(blob))


# -- AVI ----------------------------------------------------------------------

def _frames(n, h=9, w=7):
    return [
        RNG.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)
    ]


def test_avi_roundtrip_exact():
    frames = _frames(5)
    blob = A.encode_avi(frames, fps=12.0)
    info = A.avi_info(blob)
    assert (info["width"], info["height"], info["n_frames"]) == (7, 9, 5)
    assert info["fps"] == pytest.approx(12.0)
    out = A.decode_avi_frames(blob)
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_avi_selective_indices():
    frames = _frames(8)
    blob = A.encode_avi(frames)
    picked = A.decode_avi_frames(blob, indices=[0, 3, 7])
    assert len(picked) == 3
    for want, got in zip([0, 3, 7], picked):
        assert np.array_equal(picked[[0, 3, 7].index(want)], frames[want])
        assert np.array_equal(got, frames[want])


def test_avi_compressed_rejected():
    blob = bytearray(A.encode_avi(_frames(2)))
    i = bytes(blob).find(b"strf")
    # strf body: biSize(4) width(4) height(4) planes(2) bpp(2) comp(4)
    struct.pack_into("<I", blob, i + 8 + 16, 0x47504A4D)  # 'MJPG'
    with pytest.raises(NotImplementedError, match="not supported"):
        A.decode_avi_frames(bytes(blob))
    with pytest.raises(ValueError, match="RIFF"):
        A.avi_info(b"RIFX" + bytes(blob)[4:])


# -- kernels/media dispatch -----------------------------------------------------

def _one_of_each() -> dict[str, bytes]:
    gray = RNG.integers(0, 256, (6, 8), dtype=np.uint8)
    pal = _rand_palette(8)
    gidx = RNG.integers(0, 8, (4, 5), dtype=np.uint8)
    return {
        "png": encode_png(gray),
        "jpeg": J.encode_jpeg(gray, quality=100),
        "gif": G.encode_gif([gidx, gidx], pal),
        "bmp": B.encode_bmp(gray),
        "avi": A.encode_avi(_frames(3, h=6, w=8)),
        "wav": wav_encode(np.zeros(100, dtype=np.int16), 8000),
    }


def test_sniff_media_all_formats():
    blobs = _one_of_each()
    for kind, blob in blobs.items():
        assert MK.sniff_media(blob) == kind, kind
    assert MK.sniff_media(None) is None
    assert MK.sniff_media(b"plain text payload") is None
    assert MK.sniff_media(b"RIFF\x00\x00\x00\x00JUNK") is None


def test_image_info_dispatch():
    blobs = _one_of_each()
    assert MK.image_info(blobs["png"]) == {
        "width": 8, "height": 6, "n_frames": 1
    }
    assert MK.image_info(blobs["jpeg"]) == {
        "width": 8, "height": 6, "n_frames": 1
    }
    assert MK.image_info(blobs["gif"]) == {
        "width": 5, "height": 4, "n_frames": 2
    }
    assert MK.image_info(blobs["bmp"]) == {
        "width": 8, "height": 6, "n_frames": 1
    }
    assert MK.image_info(blobs["avi"]) == {
        "width": 8, "height": 6, "n_frames": 3
    }
    assert MK.image_info(blobs["wav"]) is None
    assert MK.image_info(b"not media") is None


def test_decode_image_dispatch_and_frames():
    gray = RNG.integers(0, 256, (6, 8), dtype=np.uint8)
    assert np.array_equal(MK.decode_image(encode_png(gray)), gray)
    assert np.array_equal(MK.decode_image(B.encode_bmp(gray)), gray)
    jout = MK.decode_image(J.encode_jpeg(gray, quality=100))
    assert np.abs(jout.astype(int) - gray.astype(int)).max() <= 1
    pal = _rand_palette(4)
    f0 = RNG.integers(0, 4, (3, 3), dtype=np.uint8)
    f1 = RNG.integers(0, 4, (3, 3), dtype=np.uint8)
    g = G.encode_gif([f0, f1], pal)
    assert np.array_equal(MK.decode_image(g, frame=1), pal[f1])
    frames = _frames(4, h=5, w=5)
    avi = A.encode_avi(frames)
    assert np.array_equal(MK.decode_image(avi, frame=2), frames[2])
    with pytest.raises(ValueError, match="undecodable"):
        MK.decode_image(b"opaque non-media bytes")


def test_to_luminance():
    g = RNG.integers(0, 256, (4, 4), dtype=np.uint8)
    assert np.array_equal(MK.to_luminance(g), g.astype(float))
    rgb = RNG.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    assert np.allclose(
        MK.to_luminance(rgb), rgb.astype(float).mean(axis=2)
    )
    rgba = np.dstack([rgb, np.full((4, 4), 7, dtype=np.uint8)])
    assert np.allclose(MK.to_luminance(rgba), MK.to_luminance(rgb))


# -- Spark multimodal 'real' paths over mixed payloads --------------------------

@pytest.fixture(scope="module")
def mixed_media_df(spark):
    from geocube_spark.functions.multimodal import with_media_bytes

    blobs = _one_of_each()
    rows = [
        (0, blobs["png"]), (1, blobs["jpeg"]), (2, blobs["gif"]),
        (3, blobs["bmp"]), (4, blobs["avi"]), (5, blobs["wav"]),
        (6, b"plain utf-8 text payload"), (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    return df, blobs


def test_decode_media_real_mixed_formats(mixed_media_df):
    from geocube_spark.functions.multimodal import decode_media

    df, _ = mixed_media_df
    out = (
        decode_media(df, codec="real").toPandas()
        .set_index("doc_id").sort_index()
    )
    assert list(out.loc[[0, 1, 3], "width"]) == [8, 8, 8]
    assert list(out.loc[[0, 1, 3], "n_frames"]) == [1, 1, 1]
    assert (out.loc[2, "width"], out.loc[2, "n_frames"]) == (5, 2)
    assert (out.loc[4, "width"], out.loc[4, "n_frames"]) == (8, 3)
    # audio / text / NULL payloads flow through with NULL dims
    assert out.loc[[5, 6, 7], "width"].isna().all()
    assert out.loc[5, "n_bytes"] > 0 and out.loc[7, "n_bytes"] == 0


def test_frame_sample_real_avi(spark):
    from geocube_spark.functions.multimodal import frame_sample

    frames = _frames(7, h=6, w=4)
    avi = A.encode_avi(frames)
    df = spark.createDataFrame(
        [(0, avi), (1, b"not a video"), (2, None)],
        "doc_id long, media binary",
    )
    out = frame_sample(df, stride=3, codec="real").toPandas()
    # only the AVI row survives; frames 0, 3, 6 sampled
    assert set(out["doc_id"]) == {0}
    assert sorted(out["frame_no"]) == [0, 3, 6]
    for _, r in out.iterrows():
        want = int(round(
            frames[r["frame_no"]][..., :3].astype(float).mean()
        ))
        assert r["frame_byte"] == want
    with pytest.raises(ValueError, match="unknown codec"):
        frame_sample(df, codec="h264")


def test_image_pixel_stats_all_image_formats(spark, mixed_media_df):
    from geocube_spark.functions.multimodal import image_pixel_stats

    df, blobs = mixed_media_df
    out = (
        image_pixel_stats(df).toPandas().set_index("doc_id").sort_index()
    )
    # png/jpeg/gif/bmp/avi decode; wav/text/NULL drop out
    assert set(out.index) == {0, 1, 2, 3, 4}
    px = MK.decode_image(blobs["bmp"])
    assert out.loc[3, "px_mean"] == pytest.approx(float(px.mean()))
    assert out.loc[3, "px_min"] == int(px.min())
    assert (out.loc[2, "width"], out.loc[2, "channels"]) == (5, 3)


def test_resize_media_real_bmp_exact(spark):
    from geocube_spark.functions.multimodal import resize_media

    a = RNG.integers(0, 256, (10, 14, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(0, B.encode_bmp(a))], "doc_id long, media binary"
    )
    out = resize_media(df, out_w=4, out_h=5, codec="real").toPandas()
    assert len(out) == 1
    lum = a[..., :3].astype(float).mean(axis=2)
    yi = np.minimum((np.arange(5) * 10 // 5), 9)
    xi = np.minimum((np.arange(4) * 14 // 4), 13)
    want = lum[np.ix_(yi, xi)].astype(np.uint8).reshape(-1)
    got = np.frombuffer(bytes(out["pixels"].iloc[0]), dtype=np.uint8)
    assert np.array_equal(got, want)


# ------------------------------------------------- review regressions (r4)

def test_corrupt_blobs_null_rows_not_job_failures(spark):
    """A corrupt IDAT (zlib.error), a truncated container
    (struct.error / IndexError) and other malformed blobs must yield
    NULL rows through every codec='real' Spark path — never a task
    failure (review regression: only ValueError/NotImplementedError
    were caught)."""
    import numpy as np
    import pandas as pd

    from geocube_spark.functions import multimodal as M
    from geocube_spark.kernels.png import encode_png

    good = encode_png(
        (np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    )
    # corrupt the IDAT payload: flip bytes after the chunk header so
    # zlib.decompress raises inside the decoder
    idat = good.find(b"IDAT")
    corrupt_png = (good[: idat + 4]
                   + bytes(255 - b for b in good[idat + 4: idat + 12])
                   + good[idat + 12:])
    truncated_gif = b"GIF89a" + b"\x01"       # header then nothing
    short_riff = b"RIFF\x10\x00\x00\x00AVI "  # RIFF with no lists
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "media": [corrupt_png, truncated_gif, short_riff, good],
    })
    df = spark.createDataFrame(pdf)

    meta = M.decode_media(df, codec="real").toPandas() \
        .set_index("doc_id").sort_index()
    assert meta.loc[4, "width"] == 4          # the intact PNG decodes
    # corrupt rows are NULL, and critically: no exception was raised

    stats = M.image_pixel_stats(df).toPandas().set_index("doc_id")
    assert stats.loc[4].notna().any()       # intact PNG has stats
    # corrupt rows are dropped or NULL — either way the job survived

    rez = M.resize_media(df, out_w=2, out_h=2, codec="real").toPandas()
    assert len(rez) > 0
