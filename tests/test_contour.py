"""Contour extraction: marching-squares kernel invariants and the
distributed operator (tile-split parity is the load-bearing check —
segments are owned by exactly one tile and shared crossings are
bit-identical across borders, so tiling must not change the output
at all)."""

import numpy as np
import pytest

from geocube_spark.cube import CHUNK_SCHEMA, BandMeta, GeoCube
from geocube_spark.geometry import wkb as W
from geocube_spark.geometry.affine import Affine
from geocube_spark.geometry.crs import CRS
from geocube_spark.grid.geobox import GeoBox
from geocube_spark.kernels.contour import contour_segments, stitch_segments


def _pad(arr):
    P = np.full((arr.shape[0] + 2, arr.shape[1] + 2), np.nan)
    P[1:-1, 1:-1] = arr
    return P


def test_kernel_plane_and_circle():
    th, tw = 6, 8
    plane = np.tile(np.arange(tw, dtype=float), (th, 1))
    segs = contour_segments(_pad(plane), 2.5)
    assert (segs[:, [1, 3]] == 2.5).all()
    chains = stitch_segments(segs)
    assert len(chains) == 1 and len(chains[0]) == th

    n = 41
    yy, xx = np.mgrid[0:n, 0:n] - 20.0
    segs = contour_segments(_pad(xx * xx + yy * yy), 100.0)
    (ring,) = stitch_segments(segs)
    assert (ring[0] == ring[-1]).all()
    rad = np.hypot(ring[:, 0] - 20.0, ring[:, 1] - 20.0)
    assert abs(rad - 10.0).max() < 0.15


def test_kernel_nodata_hole_opens_chain():
    n = 21
    yy, xx = np.mgrid[0:n, 0:n] - 10.0
    arr = (xx * xx + yy * yy).astype(float)
    arr[8:13, 0:11] = np.nan  # hole cutting the ring
    segs = contour_segments(_pad(arr), 36.0)
    chains = stitch_segments(segs)
    assert len(chains) >= 1
    assert all(not (c[0] == c[-1]).all() for c in chains)  # all open


def test_kernel_saddle_consistent():
    # checkerboard 2x2: high TL/BR, low TR/BL -> saddle case 9
    arr = np.array([[2.0, 0.0], [0.0, 2.0]])
    segs = contour_segments(_pad(arr), 1.0)
    assert len(segs) == 2  # two segments, never crossing lines
    arr2 = np.array([[0.0, 2.0], [2.0, 0.0]])
    segs2 = contour_segments(_pad(arr2), 1.0)
    assert len(segs2) == 2


def _field_cube(spark, field, ts, H=48, Wd=48, fill=float("nan")):
    gb = GeoBox(Wd, H, Affine(10.0, 0.0, 0.0, 0.0, -10.0, 0.0),
                CRS(32615))
    rows = []
    for tid, row0, col0, h, w in gb.tile_grid(ts):
        yy, xx = np.mgrid[row0:row0 + h, col0:col0 + w]
        vals = field(yy.astype(float), xx.astype(float))
        rows.append((
            "z", None, 0, int(tid), int(row0), int(col0), int(h),
            int(w), [float(v) for v in vals.ravel()], 1, h * w, 0, 0,
        ))
    chunks = spark.createDataFrame(rows, CHUNK_SCHEMA)
    return GeoCube(
        chunks=chunks, geobox=gb,
        bands={"z": BandMeta("z", "float64", fill)},
        tile_size=ts, fill=fill,
    )


def _canon(lines):
    """Direction/rotation-insensitive canonical form of a line set."""
    out = set()
    for blob in lines:
        pts = [tuple(p) for p in W.loads(bytes(blob)).parts]
        closed = pts[0] == pts[-1]
        if closed:
            ring = pts[:-1]
            best = None
            for seq in (ring, ring[::-1]):
                for s in range(len(seq)):
                    cand = tuple(seq[s:] + seq[:s])
                    if best is None or cand < best:
                        best = cand
            out.add(("ring", best))
        else:
            fwd, rev = tuple(pts), tuple(pts[::-1])
            out.add(("open", min(fwd, rev)))
    return out


def test_contour_tile_split_parity(spark):
    """Contours of a multi-tile cube equal the single-tile cube's —
    geometry-exact, not just approximately."""
    from geocube_spark.bandops import contour

    def field(yy, xx):
        return np.sin(xx / 5.0) * 8.0 + yy * 0.4

    levels = [2.0, 5.5]
    a = contour(_field_cube(spark, field, ts=16), levels).collect()
    b = contour(_field_cube(spark, field, ts=64), levels).collect()
    for lv in levels:
        la = _canon([r["geometry_wkb"] for r in a if r["level"] == lv])
        lb = _canon([r["geometry_wkb"] for r in b if r["level"] == lv])
        assert la == lb and len(la) > 0


def test_contour_world_coordinates_plane(spark):
    """Field = world x -> the contour at level L is the vertical line
    x = L, exactly (linear interpolation is exact on a plane)."""
    from geocube_spark.bandops import contour

    def field(yy, xx):
        return 10.0 * (xx + 0.5)  # world x of the cell center

    out = contour(_field_cube(spark, field, ts=16), [200.0]).collect()
    assert len(out) == 1
    g = W.loads(bytes(out[0]["geometry_wkb"]))
    xs = g.parts[:, 0]
    np.testing.assert_allclose(xs, 200.0, rtol=0, atol=1e-9)
    assert not out[0]["closed"]
    assert out[0]["n_points"] >= 48 - 1


def test_contour_closed_ring_and_fill(spark):
    from geocube_spark.bandops import contour

    def field(yy, xx):
        return (xx - 24.0) ** 2 + (yy - 24.0) ** 2

    cube = _field_cube(spark, field, ts=16)
    out = contour(cube, [144.0]).collect()
    assert len(out) == 1 and out[0]["closed"]
    g = W.loads(bytes(out[0]["geometry_wkb"]))
    # ring around world point of cell center (24,24) with radius 12
    # cells = 120 m; y axis negative
    cx, cy = 10.0 * (24.0 + 0.5), -10.0 * (24.0 + 0.5)
    rad = np.hypot(g.parts[:, 0] - cx, g.parts[:, 1] - cy)
    assert abs(rad - 120.0).max() < 2.0

    # fill-valued cells are nodata: masking the center leaves the
    # ring intact but an inner level disappears
    def field2(yy, xx):
        v = (xx - 24.0) ** 2 + (yy - 24.0) ** 2
        return np.where(v < 25.0, -9999.0, v)

    cube2 = _field_cube(spark, field2, ts=16, fill=-9999.0)
    out2 = contour(cube2, [16.0, 144.0]).collect()
    assert {r["level"] for r in out2} == {144.0}


def test_contour_segment_cap(spark):
    from geocube_spark.bandops import contour

    def field(yy, xx):
        return np.sin(xx) * np.cos(yy)

    with pytest.raises(ValueError, match="segment_cap"):
        contour(_field_cube(spark, field, ts=16), [0.1],
                segment_cap=3)
