"""GeoTIFF source/sink: codec units, write->read roundtrip, like= grid,
and parity of a cube that goes out through the TIFF sink and back in
through the distributed reader."""

import math
import os
import struct
import zlib

import numpy as np
import pytest

from geocube_spark.sources.geotiff import (
    geobox_from_geotiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    read_geotiff,
    read_tiff_info,
    write_geotiff,
)

# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------

def test_lzw_roundtrip_random():
    rng = np.random.default_rng(7)
    for n in (0, 1, 5, 300, 5000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert lzw_decode(lzw_encode(data)) == data


def test_lzw_roundtrip_repetitive():
    # repetitive data exercises table growth + the 12-bit clear/reset
    data = (b"abcabcabd" * 3000) + bytes(range(256)) * 20
    assert lzw_decode(lzw_encode(data)) == data


def test_packbits():
    # worked example from the TIFF 6.0 spec
    enc = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03,
                 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
    dec = packbits_decode(enc)
    assert dec == (b"\xaa\xaa\xaa\x80\x00\x2a\xaa\xaa\xaa\xaa"
                   b"\x80\x00\x2a\x22\xaa\xaa\xaa\xaa\xaa\xaa\xaa\xaa"
                   b"\xaa\xaa")


# ---------------------------------------------------------------------------
# write -> info/geobox -> read roundtrip
# ---------------------------------------------------------------------------

def _small_cube(spark, *, fill=-9999.0, n=500, ts=32, meas=("m0",)):
    """Deterministic mixed point/quad burn on a ~33x33 grid with 32px
    tiles (clipped edge tiles exercised)."""
    from geocube_spark import datagen
    from geocube_spark.cube import make_geocube

    docs = datagen.to_spark(spark, datagen.scale_docs(n, seed=11))
    return make_geocube(
        docs,
        measurements=list(meas),
        resolution=(-0.03, 0.03),
        fill=fill,
        merge_alg="replace",
        tile_size=ts,
    )


def test_write_read_roundtrip_deflate(spark, tmp_path):
    cube = _small_cube(spark)
    arrs = cube.assemble()
    path = str(tmp_path / "cube.tif")
    write_geotiff(cube, path)

    info = read_tiff_info(path)
    assert info.tiled and info.tile_w == cube.tile_size
    assert info.compression == 8
    assert info.nodata == -9999.0
    assert info.epsg == 4326

    gb2 = geobox_from_geotiff(path)
    assert gb2.width == cube.geobox.width
    assert gb2.height == cube.geobox.height
    assert gb2.crs.epsg == cube.geobox.crs.epsg
    np.testing.assert_allclose(
        gb2.affine.tolist(), cube.geobox.affine.tolist(), rtol=0, atol=0
    )

    back = read_geotiff(spark, path)
    assert list(back.bands) == ["band_1"]
    assert back.bands["band_1"].fill == -9999.0
    arrs2 = back.assemble()
    np.testing.assert_array_equal(
        arrs2["band_1"].astype(np.float64), arrs["m0"].astype(np.float64)
    )


@pytest.mark.parametrize("compression", ["none", "lzw"])
def test_write_read_other_codecs(spark, tmp_path, compression):
    cube = _small_cube(spark, n=200)
    arrs = cube.assemble()
    path = str(tmp_path / f"cube_{compression}.tif")
    write_geotiff(cube, path, compression=compression)
    back = read_geotiff(spark, path)
    np.testing.assert_array_equal(
        back.assemble()["band_1"].astype(np.float64),
        arrs["m0"].astype(np.float64),
    )


def test_read_retile_to_other_tile_size(spark, tmp_path):
    """Reader re-tiles: source tiled at 32, cube chunked at 48 — values
    identical, chunk grid at the requested size."""
    cube = _small_cube(spark)
    arrs = cube.assemble()
    path = str(tmp_path / "cube.tif")
    write_geotiff(cube, path)
    back = read_geotiff(spark, path, tile_size=48)
    assert back.tile_size == 48
    rows = back.chunks.select("row0", "col0", "h", "w").collect()
    assert all(r["row0"] % 48 == 0 and r["col0"] % 48 == 0 for r in rows)
    np.testing.assert_array_equal(
        back.assemble()["band_1"].astype(np.float64),
        arrs["m0"].astype(np.float64),
    )


def test_like_geotiff_grid(spark, tmp_path):
    """make_geocube(like=<path.tif>) reuses an existing raster's grid
    (reference geobox.py:169-186 'like' semantics, raster flavor)."""
    from geocube_spark import datagen
    from geocube_spark.cube import make_geocube

    cube = _small_cube(spark)
    path = str(tmp_path / "like.tif")
    write_geotiff(cube, path)

    docs = datagen.to_spark(spark, datagen.scale_docs(100, seed=3))
    cube2 = make_geocube(docs, measurements=["m0"], like=path, fill=0.0)
    assert cube2.geobox.width == cube.geobox.width
    assert cube2.geobox.height == cube.geobox.height
    assert cube2.geobox.affine.tolist() == cube.geobox.affine.tolist()


# ---------------------------------------------------------------------------
# foreign-layout readers (files we synthesize at the byte level)
# ---------------------------------------------------------------------------

def _write_stripped_tiff(path, arr, *, rows_per_strip=4, big_endian=False,
                         predictor=1, compression=1):
    """Minimal stripped single-band writer used ONLY to test the
    reader against layouts our sink never produces (strips, predictor,
    big-endian)."""
    bo = ">" if big_endian else "<"
    h, w = arr.shape
    sf = {"u": 1, "i": 2, "f": 3}[arr.dtype.kind]
    bits = arr.dtype.itemsize * 8
    strips = []
    for r0 in range(0, h, rows_per_strip):
        sub = arr[r0:r0 + rows_per_strip].copy()
        if predictor == 2:
            sub[:, 1:] = np.diff(sub, axis=1)
        data = sub.astype(bo + arr.dtype.str[1:]).tobytes()
        if compression == 8:
            data = zlib.compress(data)
        strips.append(data)

    entries = []

    def ent(tag, typ, vals):
        entries.append((tag, typ, vals))

    n_strips = len(strips)
    ent(256, 4, [w])
    ent(257, 4, [h])
    ent(258, 3, [bits])
    ent(259, 3, [compression])
    ent(262, 3, [1])
    ent(273, 4, [0] * n_strips)     # patched
    ent(277, 3, [1])
    ent(278, 4, [rows_per_strip])
    ent(279, 4, [len(s) for s in strips])
    ent(284, 3, [1])
    if predictor == 2:
        ent(317, 3, [2])
    ent(339, 3, [sf])
    ent(33550, 12, [0.25, 0.5, 0.0])
    ent(33922, 12, [0.0, 0.0, 0.0, 10.0, 20.0, 0.0])
    ent(34735, 3, [1, 1, 0, 3, 1024, 0, 1, 2, 1025, 0, 1, 1,
                   2048, 0, 1, 4326])
    entries.sort(key=lambda t: t[0])

    fmt = {3: "H", 4: "I", 12: "d"}
    ifd_size = 2 + len(entries) * 12 + 4
    data_off = 8 + ifd_size
    payload = b""
    strip_off_pos = None
    body_entries = b""
    for tag, typ, vals in entries:
        size = {3: 2, 4: 4, 12: 8}[typ] * len(vals)
        pl = struct.pack(bo + fmt[typ] * len(vals), *vals)
        if size <= 4 and tag != 273:
            val = pl.ljust(4, b"\0")
        else:
            if tag == 273:
                strip_off_pos = data_off + len(payload)
            val = struct.pack(bo + "I", data_off + len(payload))
            payload += pl
        body_entries += struct.pack(bo + "HHI", tag, typ, len(vals)) + val

    strip_data_off = data_off + len(payload)
    offs = []
    body = b""
    for s in strips:
        offs.append(strip_data_off + len(body))
        body += s
    payload = bytearray(payload)
    payload[strip_off_pos - data_off:strip_off_pos - data_off
            + 4 * n_strips] = struct.pack(bo + "I" * n_strips, *offs)

    with open(path, "wb") as fp:
        fp.write((b"MM" if big_endian else b"II")
                 + struct.pack(bo + "H", 42) + struct.pack(bo + "I", 8))
        fp.write(struct.pack(bo + "H", len(entries)) + body_entries
                 + struct.pack(bo + "I", 0))
        fp.write(bytes(payload))
        fp.write(body)


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("compression", [1, 8])
def test_read_stripped_foreign_layouts(spark, tmp_path, big_endian,
                                       compression):
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 4000, (10, 7)).astype(np.int32)
    path = str(tmp_path / "s.tif")
    _write_stripped_tiff(path, arr, big_endian=big_endian,
                         compression=compression)
    info = read_tiff_info(path)
    assert not info.tiled and info.tile_h == 4
    assert info.epsg == 4326
    assert info.transform == (0.25, 0.0, 10.0, 0.0, -0.5, 20.0)
    back = read_geotiff(spark, path, tile_size=48)
    np.testing.assert_array_equal(
        back.assemble()["band_1"].astype(np.int64), arr.astype(np.int64)
    )


def test_read_horizontal_predictor(spark, tmp_path):
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 255, (9, 13)).astype(np.uint8)
    path = str(tmp_path / "p.tif")
    _write_stripped_tiff(path, arr, predictor=2, compression=8)
    back = read_geotiff(spark, path)
    np.testing.assert_array_equal(
        back.assemble()["band_1"].astype(np.int64), arr.astype(np.int64)
    )


def test_multiband_planar2_roundtrip(spark, tmp_path):
    """Two measurements -> one planar-2 multiband file -> two bands
    back, each matching its source array."""
    from geocube_spark import datagen
    from geocube_spark.cube import make_geocube

    docs = datagen.to_spark(spark, datagen.scale_docs(400, seed=21))
    cube = make_geocube(
        docs, measurements=["m0", "m1"], resolution=(-0.05, 0.05),
        fill=-1.0, merge_alg="replace", tile_size=32,
    )
    arrs = cube.assemble()
    path = str(tmp_path / "mb.tif")
    write_geotiff(cube, path)
    info = read_tiff_info(path)
    assert info.samples == 2 and info.planar == 2
    back = read_geotiff(spark, path,
                        measurements=["m0", "m1"])
    arrs2 = back.assemble()
    for m in ("m0", "m1"):
        np.testing.assert_array_equal(
            arrs2[m].astype(np.float64), arrs[m].astype(np.float64)
        )


def test_nan_nodata_ascii(spark, tmp_path):
    cube = _small_cube(spark, fill=float("nan"), n=150)
    path = str(tmp_path / "nan.tif")
    write_geotiff(cube, path)
    info = read_tiff_info(path)
    assert info.nodata is not None and math.isnan(info.nodata)
    back = read_geotiff(spark, path)
    assert math.isnan(back.bands["band_1"].fill)


def test_grouped_cube_rejected(spark, tmp_path):
    from geocube_spark import datagen
    from geocube_spark.cube import make_geocube

    docs = datagen.to_spark(spark, datagen.grouped_polygon_docs(3, 4))
    cube = make_geocube(
        docs, measurements=["claytotal_r"], group_by="hzdept_r",
        resolution=(-0.1, 0.1), fill=0.0, tile_size=32,
    )
    with pytest.raises(ValueError, match="ungrouped"):
        write_geotiff(cube, str(tmp_path / "g.tif"))


def test_cog_overviews_roundtrip(spark, tmp_path):
    """overviews='auto' appends chained reduced-resolution IFDs; the
    full-res read is unchanged, each overview halves, and overview
    cells equal fill-aware 2x2 decimation of the level above."""
    from geocube_spark import datagen
    from geocube_spark.cube import make_geocube
    from geocube_spark.sources.geotiff import (
        read_geotiff, read_tiff_info, tiff_ifd_count, write_geotiff,
    )

    docs = datagen.to_spark(spark, datagen.scale_docs(500, seed=9))
    cube = make_geocube(
        docs, measurements=["m0"],
        geom=('{"type": "Polygon", "coordinates": [[[-91, 41], '
              '[-90, 41], [-90, 42], [-91, 42], [-91, 41]]]}'),
        resolution=(-1.0 / 64, 1.0 / 64), fill=0.0, merge_alg="add",
        tile_size=16,
    )
    path = str(tmp_path / "cog.tif")
    write_geotiff(cube, path, overviews="auto")
    n = tiff_ifd_count(path)
    assert n >= 3  # 64x64 grid with 16px tiles -> 2 overviews + full
    # full-res read ignores the chain
    base = cube.assemble()["m0"]
    back = read_geotiff(spark, path, measurements=["m0"], tile_size=16)
    np.testing.assert_allclose(back.assemble()["m0"], base, atol=1e-9)
    # overview dims halve and values match fill-aware decimation
    prev = base
    for k in range(1, n):
        info = read_tiff_info(path, ifd_index=k)
        assert info.width == (prev.shape[1] + 1) // 2
        assert info.height == (prev.shape[0] + 1) // 2
        ov = read_geotiff(
            spark, path, measurements=["m0"], tile_size=16, overview=k
        )
        got = ov.assemble()["m0"]
        H, W = prev.shape
        H2, W2 = (H + 1) // 2, (W + 1) // 2
        pa = np.zeros((H2 * 2, W2 * 2))
        va = np.zeros((H2 * 2, W2 * 2), dtype=bool)
        valid = prev != 0.0
        pa[:H, :W] = np.where(valid, prev, 0.0)
        va[:H, :W] = valid
        s = pa.reshape(H2, 2, W2, 2).sum(axis=(1, 3))
        c = va.reshape(H2, 2, W2, 2).sum(axis=(1, 3))
        want = np.where(c > 0, s / np.maximum(c, 1), 0.0)
        np.testing.assert_allclose(got, want, atol=1e-9)
        # the overview geobox scales the affine, same CRS/origin
        assert ov.geobox.crs.epsg == cube.geobox.crs.epsg
        assert ov.geobox.affine.c == cube.geobox.affine.c
        prev = want
    # explicit count + reading past the chain raises
    with pytest.raises(IndexError):
        read_tiff_info(path, ifd_index=n)


def test_parts_mode_matches_single_file(spark, tmp_path):
    """Distributed export (mode='parts'): executors write compressed
    tile part files + a manifest, the driver streams them into one
    TIFF — no dense driver materialization. The result must decode
    identically to the single-file writer's output."""
    cube = _small_cube(spark, meas=("m0", "m1"))
    p1 = str(tmp_path / "single.tif")
    p2 = str(tmp_path / "parts.tif")
    write_geotiff(cube, p1)
    out = write_geotiff(cube, p2, mode="parts")
    assert out == p2
    assert not os.path.exists(p2 + ".parts")  # cleaned up

    i1, i2 = read_tiff_info(p1), read_tiff_info(p2)
    assert (i2.width, i2.height, i2.tile_w, i2.compression, i2.epsg) == (
        i1.width, i1.height, i1.tile_w, i1.compression, i1.epsg
    )
    a1 = read_geotiff(spark, p1).assemble()
    a2 = read_geotiff(spark, p2).assemble()
    assert sorted(a1) == sorted(a2)
    for k in a1:
        np.testing.assert_array_equal(a2[k], a1[k])


def test_parts_mode_sparse_fill_tiles(spark, tmp_path):
    """Grid positions with no chunk read back as fill (they all share
    one fill tile in the file body)."""
    from pyspark.sql import functions as F

    import dataclasses

    cube = _small_cube(spark)
    # drop half the tiles to force shared-fill-tile references
    sparse = dataclasses.replace(
        cube, chunks=cube.chunks.filter(F.col("tile_id") % 2 == 0)
    )
    path = str(tmp_path / "sparse.tif")
    write_geotiff(sparse, path, mode="parts")
    back = read_geotiff(spark, path).assemble()["band_1"]
    full = sparse.assemble()["m0"]
    np.testing.assert_array_equal(back.astype(np.float64),
                                  full.astype(np.float64))


def test_parts_mode_overviews_match_file_mode(spark, tmp_path):
    """mode='parts' builds overviews DISTRIBUTED (per-chunk fill-aware
    2x decimation, narrow map) with per-level tile sizes ts/2^k; each
    level must decode identically to the single-file writer's
    overview pyramid."""
    from geocube_spark import datagen
    from geocube_spark.cube import make_geocube
    from geocube_spark.sources.geotiff import tiff_ifd_count

    docs = datagen.to_spark(spark, datagen.scale_docs(800, seed=9))
    cube = make_geocube(
        docs, measurements=["m0"],
        geom=('{"type": "Polygon", "coordinates": [[[-91, 41], '
              '[-90, 41], [-90, 42], [-91, 42], [-91, 41]]]}'),
        resolution=(-1.0 / 128, 1.0 / 128), fill=0.0, merge_alg="add",
        tile_size=64,
    )
    p1 = str(tmp_path / "file.tif")
    p2 = str(tmp_path / "parts.tif")
    write_geotiff(cube, p1, overviews=2)
    write_geotiff(cube, p2, mode="parts", overviews=2)
    assert tiff_ifd_count(p1) == tiff_ifd_count(p2) == 3
    for k in range(3):
        i2 = read_tiff_info(p2, ifd_index=k)
        assert i2.tile_w == 64 >> k  # per-level tile size
        a1 = read_geotiff(spark, p1, overview=k).assemble()["band_1"]
        a2 = read_geotiff(spark, p2, overview=k).assemble()["band_1"]
        np.testing.assert_array_equal(a2, a1)


def test_parts_mode_overview_depth_cap(spark, tmp_path):
    cube = _small_cube(spark)  # ts=32 -> max depth 1 (32 -> 16)
    with pytest.raises(ValueError, match="depth"):
        write_geotiff(cube, str(tmp_path / "x.tif"), mode="parts",
                      overviews=3)
