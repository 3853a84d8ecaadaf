"""Distributed warp: identity / integer rescale / CRS reprojection
parity against straight numpy gathers on the assembled cube."""

import numpy as np
import pytest

from geocube_spark import datagen
from geocube_spark.cube import make_geocube
from geocube_spark.geometry.affine import Affine
from geocube_spark.geometry.crs import CRS, transform as crs_transform
from geocube_spark.grid.geobox import GeoBox
from geocube_spark.warp import warp

GEOM = (
    '{"type": "Polygon", "coordinates": [[[-91, 41], [-90, 41], '
    '[-90, 42], [-91, 42], [-91, 41]]]}'
)


@pytest.fixture(scope="module")
def src_cube(spark):
    docs = datagen.to_spark(spark, datagen.scale_docs(500, seed=17))
    return make_geocube(
        docs, measurements=["m0"], geom=GEOM,
        resolution=(-1.0 / 32, 1.0 / 32),
        fill=-1.0, merge_alg="add", tile_size=16,
    )


def _nearest_expect(src_arr, src_gb, dst_gb, fill):
    """Straight numpy nearest gather (the warp's semantics)."""
    h, w = dst_gb.height, dst_gb.width
    cols = 0.5 + np.arange(w)
    rows = 0.5 + np.arange(h)
    cc, rr = np.meshgrid(cols, rows)
    a = dst_gb.affine
    wx = a.c + a.a * cc + a.b * rr
    wy = a.f + a.d * cc + a.e * rr
    if dst_gb.crs.epsg != src_gb.crs.epsg:
        wx, wy = crs_transform(dst_gb.crs, src_gb.crs,
                               wx.ravel(), wy.ravel())
        wx = wx.reshape(h, w)
        wy = wy.reshape(h, w)
    inv = src_gb.affine.invert()
    px = np.floor(inv.c + inv.a * wx + inv.b * wy).astype(np.int64)
    py = np.floor(inv.f + inv.d * wx + inv.e * wy).astype(np.int64)
    out = np.full((h, w), fill, dtype=np.float64)
    k = (px >= 0) & (px < src_gb.width) & (py >= 0) & (py < src_gb.height)
    out[k] = src_arr[py[k], px[k]]
    return out


def test_warp_identity(spark, src_cube):
    out = warp(src_cube, src_cube.geobox)
    np.testing.assert_array_equal(
        out.assemble()["m0"], src_cube.assemble()["m0"]
    )


def test_warp_upscale_2x(spark, src_cube):
    gb = src_cube.geobox
    a = gb.affine
    dst = GeoBox(gb.width * 2, gb.height * 2,
                 Affine(a.a / 2, 0.0, a.c, 0.0, a.e / 2, a.f), gb.crs)
    out = warp(src_cube, dst)
    got = out.assemble()["m0"]
    base = src_cube.assemble()["m0"]
    np.testing.assert_array_equal(got, np.repeat(np.repeat(base, 2, 0), 2, 1))


def test_warp_downscale_and_shift(spark, src_cube):
    gb = src_cube.geobox
    a = gb.affine
    # coarser, shifted grid that also hangs off the source edge
    dst = GeoBox(20, 14, Affine(a.a * 3, 0.0, a.c - 5 * a.a,
                                0.0, a.e * 3, a.f - 2 * a.e), gb.crs)
    out = warp(src_cube, dst, tile_size=16)
    got = out.assemble()["m0"]
    want = _nearest_expect(
        src_cube.assemble()["m0"].astype(np.float64), gb, dst, -1.0
    )
    np.testing.assert_array_equal(got, want)


def test_warp_reproject_crs(spark, src_cube):
    gb = src_cube.geobox
    # UTM 15N covers lon -96..-90; build a metric grid over the area
    dst_crs = CRS.from_user_input("epsg:32615")
    xs, ys = crs_transform(
        gb.crs, dst_crs,
        np.array([-91.0, -90.0]), np.array([41.0, 42.0]),
    )
    dst = GeoBox(
        40, 40,
        Affine((xs[1] - xs[0]) / 40, 0.0, xs[0],
               0.0, -(ys[1] - ys[0]) / 40, ys[1]),
        dst_crs,
    )
    out = warp(src_cube, dst, tile_size=16)
    got = out.assemble()["m0"]
    want = _nearest_expect(
        src_cube.assemble()["m0"].astype(np.float64), gb, dst, -1.0
    )
    np.testing.assert_array_equal(got, want)
    assert out.geobox.crs.epsg == 32615


def test_warp_grouped(spark):
    docs = datagen.to_spark(spark, datagen.grouped_polygon_docs(3, 5))
    cube = make_geocube(
        docs, measurements=["claytotal_r"], group_by="hzdept_r",
        output_crs="epsg:32615", resolution=(-60, 60), fill=0.0,
        tile_size=32,
    )
    gb = cube.geobox
    a = gb.affine
    dst = GeoBox(gb.width * 2, gb.height * 2,
                 Affine(a.a / 2, 0.0, a.c, 0.0, a.e / 2, a.f), gb.crs)
    out = warp(cube, dst)
    got = out.assemble()["claytotal_r"]
    base = cube.assemble()["claytotal_r"]
    assert got.shape[0] == base.shape[0]  # groups preserved
    np.testing.assert_array_equal(
        got, np.repeat(np.repeat(base, 2, 1), 2, 2)
    )


def test_warp_rejects_other_methods(src_cube):
    with pytest.raises(NotImplementedError):
        warp(src_cube, src_cube.geobox, method="lanczos")


def _bilinear_expect(src_arr, src_gb, dst_gb, fill):
    """Straight numpy bilinear: out-of-raster AND nodata (fill/NaN)
    neighbors drop out, remaining weights renormalize."""
    h, w = dst_gb.height, dst_gb.width
    cols = 0.5 + np.arange(w)
    rows = 0.5 + np.arange(h)
    cc, rr = np.meshgrid(cols, rows)
    a = dst_gb.affine
    wx = (a.c + a.a * cc + a.b * rr).ravel()
    wy = (a.f + a.d * cc + a.e * rr).ravel()
    if dst_gb.crs.epsg != src_gb.crs.epsg:
        wx, wy = crs_transform(dst_gb.crs, src_gb.crs, wx, wy)
    inv = src_gb.affine.invert()
    gx = inv.c + inv.a * wx + inv.b * wy - 0.5
    gy = inv.f + inv.d * wx + inv.e * wy - 0.5
    x0 = np.floor(gx).astype(np.int64)
    y0 = np.floor(gy).astype(np.int64)
    tx, ty = gx - x0, gy - y0
    wsum = np.zeros(h * w)
    wacc = np.zeros(h * w)
    for nr, ncl, wt in [
        (y0, x0, (1 - tx) * (1 - ty)), (y0, x0 + 1, tx * (1 - ty)),
        (y0 + 1, x0, (1 - tx) * ty), (y0 + 1, x0 + 1, tx * ty),
    ]:
        k = (nr >= 0) & (nr < src_gb.height) & (ncl >= 0) \
            & (ncl < src_gb.width) & (wt > 0)
        vv = np.full(k.shape, np.nan)
        vv[k] = src_arr[nr[k], ncl[k]]
        k &= ~np.isnan(vv) & (vv != fill)
        wsum[k] += wt[k] * vv[k]
        wacc[k] += wt[k]
    out = np.full(h * w, fill)
    out[wacc > 0] = wsum[wacc > 0] / wacc[wacc > 0]
    return out.reshape(h, w)


def test_warp_bilinear_identity(spark, src_cube):
    """Aligned same-grid bilinear degenerates to the identity (all
    weight on the containing cell)."""
    out = warp(src_cube, src_cube.geobox, method="bilinear")
    np.testing.assert_allclose(
        out.assemble()["m0"], src_cube.assemble()["m0"], rtol=0, atol=0
    )


def test_warp_bilinear_matches_numpy(spark, src_cube):
    gb = src_cube.geobox
    a = gb.affine
    dst = GeoBox(50, 45, Affine(a.a * 0.7, 0.0, a.c + 3.3 * a.a,
                                0.0, a.e * 0.7, a.f + 1.7 * a.e), gb.crs)
    out = warp(src_cube, dst, method="bilinear", tile_size=16)
    want = _bilinear_expect(
        src_cube.assemble()["m0"].astype(np.float64), gb, dst, -1.0
    )
    np.testing.assert_allclose(
        out.assemble()["m0"], want, rtol=0, atol=1e-10
    )


# ---------------------------------------------------------------------------
# cubic (Keys a=-1/2) resampling
# ---------------------------------------------------------------------------

def _poly_cube(spark, ts=16, H=48, Wd=48):
    from geocube_spark.cube import CHUNK_SCHEMA, BandMeta, GeoCube

    gb = GeoBox(Wd, H, Affine(10.0, 0.0, 0.0, 0.0, -10.0, 0.0),
                CRS(32615))

    def q(x, y):
        return (2.0 + 0.01 * x + 0.02 * y + 3e-4 * x * x
                + 2e-4 * x * y + 1e-4 * y * y)

    rows = []
    for tid, row0, col0, h, w in gb.tile_grid(ts):
        yy, xx = np.mgrid[row0:row0 + h, col0:col0 + w]
        x = 10.0 * (xx + 0.5)
        y = -10.0 * (yy + 0.5)
        rows.append((
            "z", None, 0, int(tid), int(row0), int(col0), int(h),
            int(w), [float(v) for v in q(x, y).ravel()], 1, h * w,
            0, 0,
        ))
    chunks = spark.createDataFrame(rows, CHUNK_SCHEMA)
    cube = GeoCube(
        chunks=chunks, geobox=gb,
        bands={"z": BandMeta("z", "float64", float("nan"))},
        tile_size=ts, fill=float("nan"),
    )
    return cube, q


def test_warp_cubic_identity(spark, src_cube):
    """Aligned same-grid cubic is the exact identity: interior cells
    hit tx=ty=0 (all weight on the center tap), border cells fall
    back to bilinear which is also exact at zero offset."""
    out = warp(src_cube, src_cube.geobox, method="cubic")
    np.testing.assert_allclose(
        out.assemble()["m0"], src_cube.assemble()["m0"], rtol=0, atol=0
    )


def test_warp_cubic_reproduces_quadratic(spark):
    """The Keys a=-1/2 kernel reproduces quadratic polynomials
    exactly — warp a quadratic field onto a half-cell-shifted grid
    (multi-tile, so the 4x4 support crosses chunk borders) and
    compare with the analytic values."""
    cube, q = _poly_cube(spark)
    gb = cube.geobox
    a = gb.affine
    dst = GeoBox(40, 40, Affine(a.a, 0.0, a.c + 0.5 * a.a,
                                0.0, a.e, a.f + 0.5 * a.e), gb.crs)
    out = warp(cube, dst, method="cubic", tile_size=16)
    got = out.assemble()["z"]
    cols = 0.5 + np.arange(40)
    rows = 0.5 + np.arange(40)
    cc, rr = np.meshgrid(cols, rows)
    x = dst.affine.c + dst.affine.a * cc
    y = dst.affine.f + dst.affine.e * rr
    want = q(x, y)
    # interior: full 16-point support -> exact cubic
    np.testing.assert_allclose(
        got[2:-2, 2:-2], want[2:-2, 2:-2], rtol=1e-12
    )
    # border ring: bilinear fallback (never NaN inside the source)
    assert np.isfinite(got).all()


def test_warp_cubic_nodata_falls_back(spark):
    """Cells whose 4x4 support touches nodata fall back to the
    bilinear value computed from data neighbors only — identical to
    method='bilinear' there, with no NaN bleed-through."""
    cube, q = _poly_cube(spark)
    # poke a nodata hole: drop one whole tile from the chunk table
    holey = cube.chunks.filter("tile_id != 4")
    from geocube_spark.cube import GeoCube

    cube2 = GeoCube(
        chunks=holey, geobox=cube.geobox, bands=cube.bands,
        tile_size=cube.tile_size, fill=cube.fill,
    )
    gb = cube.geobox
    a = gb.affine
    dst = GeoBox(46, 46, Affine(a.a, 0.0, a.c + 0.4 * a.a,
                                0.0, a.e, a.f + 0.6 * a.e), gb.crs)
    got = warp(cube2, dst, method="cubic", tile_size=16).assemble()["z"]
    bil = warp(cube2, dst, method="bilinear",
               tile_size=16).assemble()["z"]
    # near the hole the two agree (fallback); far inside they differ
    # from bilinear but match the analytic quadratic
    hole_adjacent = np.isnan(got)
    np.testing.assert_array_equal(np.isnan(bil), hole_adjacent)
    both = ~hole_adjacent
    # everywhere the cubic support is full, got == analytic
    cols = 0.5 + np.arange(46)
    rows = 0.5 + np.arange(46)
    cc, rr = np.meshgrid(cols, rows)
    want = q(dst.affine.c + dst.affine.a * cc,
             dst.affine.f + dst.affine.e * rr)
    interior = np.zeros_like(got, dtype=bool)
    interior[3:-3, 3:-3] = True
    # mask out the hole's influence zone (hole tile + 2-cell apron)
    influence = np.zeros_like(got, dtype=bool)
    ys, xs = np.nonzero(hole_adjacent)
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            yy2 = np.clip(ys + dy, 0, 45)
            xx2 = np.clip(xs + dx, 0, 45)
            influence[yy2, xx2] = True
    ok = interior & ~influence & both
    assert ok.sum() > 200
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-12)


def test_warp_cubic_unknown_method_still_raises(spark, src_cube):
    with pytest.raises(NotImplementedError, match="lanczos"):
        warp(src_cube, src_cube.geobox, method="lanczos")
