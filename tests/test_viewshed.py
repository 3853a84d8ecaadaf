"""viewshed: R3 line-of-sight with rational sampling + bilinear
terrain interpolation, vs a scalar Python referee."""

import math

import numpy as np
import pytest

from geocube_spark.bandops import viewshed
from geocube_spark.cube import CHUNK_SCHEMA, BandMeta, GeoCube
from geocube_spark.geometry.affine import Affine
from geocube_spark.geometry.crs import CRS
from geocube_spark.grid.geobox import GeoBox


def _cube(spark, arr, ts=8):
    H, W = arr.shape
    gb = GeoBox(W, H, Affine(1.0, 0.0, 0.0, 0.0, -1.0, 0.0), CRS(4326))
    rows = []
    for tid, r0, c0, h, w in gb.tile_grid(ts):
        block = arr[r0:r0 + h, c0:c0 + w].astype(float)
        rows.append(("z", None, 0, int(tid), int(r0), int(c0),
                     int(h), int(w), [float(x) for x in block.ravel()],
                     1, h * w, 0, 0))
    return GeoCube(
        chunks=spark.createDataFrame(rows, CHUNK_SCHEMA), geobox=gb,
        bands={"z": BandMeta("z", "float64", float("nan"))},
        tile_size=ts, fill=float("nan"),
    )


def _ref(arr, r0, c0, R, h, nodata_z=0.0):
    H, W = arr.shape

    def z(r, c):
        if 0 <= r < H and 0 <= c < W and not math.isnan(arr[r, c]):
            return float(arr[r, c])
        return nodata_z

    zo = z(r0, c0) + h
    out = {}
    for r in range(max(0, r0 - R), min(H, r0 + R + 1)):
        for c in range(max(0, c0 - R), min(W, c0 + R + 1)):
            if math.isnan(arr[r, c]):
                continue
            dr, dc = r - r0, c - c0
            n = max(abs(dr), abs(dc))
            if n <= 1:
                out[(r, c)] = (n, None, 1)
                continue
            mm = math.inf
            for t in range(1, n):
                f = t / n
                rr, cc = r0 + f * dr, c0 + f * dc
                rf, cf = math.floor(rr), math.floor(cc)
                fr, fc = rr - rf, cc - cf
                zs = ((1 - fr) * ((1 - fc) * z(rf, cf)
                                  + fc * z(rf, cf + 1))
                      + fr * ((1 - fc) * z(rf + 1, cf)
                              + fc * z(rf + 1, cf + 1)))
                mm = min(mm, round(f * (arr[r, c] - zo) - (zs - zo), 6))
            out[(r, c)] = (n, mm, int(mm > 0))
    return out


def _run(spark, arr, obs, R, h):
    cube = _cube(spark, arr)
    odf = spark.createDataFrame(obs, "obs_id long, row int, col int")
    rows = viewshed(cube, odf, band="z", radius=R,
                    obs_height=h).collect()
    return {(r["obs_id"], r["row"], r["col"]):
            (r["n_steps"], r["min_margin"], r["visible"]) for r in rows}


def test_flat_dem_all_visible(spark):
    arr = np.zeros((12, 12))
    got = _run(spark, arr, [(1, 6, 6)], 5, 1.0)
    assert len(got) == 11 * 11
    assert all(v == 1 for (_, _, v) in got.values())


def test_wall_blocks(spark):
    arr = np.zeros((5, 12))
    arr[:, 5] = 10.0  # full-height wall
    got = _run(spark, arr, [(1, 2, 2)], 9, 1.0)
    # wall top is visible, everything beyond the wall in the same row
    # is blocked, everything before it is visible
    assert got[(1, 2, 5)][2] == 1
    for c in range(6, 12):
        assert got[(1, 2, c)][2] == 0, c
    for c in range(2, 5):
        assert got[(1, 2, c)][2] == 1


def test_exact_graze_is_blocked(spark):
    # ramp 0,5,10: the sample at col 1 lies exactly on the sight line
    # to col 2 -> margin 0 -> blocked (strict rule)
    arr = np.array([[0.0, 5.0, 10.0]])
    got = _run(spark, arr, [(1, 0, 0)], 2, 0.0)
    n, mm, vis = got[(1, 0, 2)]
    assert n == 2 and mm == 0.0 and vis == 0


def test_mast_restores_visibility(spark):
    arr = np.array([[0.0, 5.0, 10.0]])
    got = _run(spark, arr, [(1, 0, 0)], 2, 1.0)
    # zo=1: margin = 0.5*(10-1) - (5-1) = 0.5 > 0
    assert got[(1, 0, 2)][2] == 1


def test_matches_referee_random_dem(spark):
    rng = np.random.default_rng(11)
    arr = rng.uniform(0, 20, (20, 20))
    arr[rng.uniform(size=arr.shape) < 0.1] = np.nan  # nodata holes
    for (oid, r0, c0) in [(1, 10, 10), (2, 3, 17)]:
        want = _ref(arr, r0, c0, 6, 2.0)
        got = _run(spark, arr, [(oid, r0, c0)], 6, 2.0)
        got = {(r, c): v for (o, r, c), v in got.items() if o == oid}
        assert set(got) == set(want)
        for k, (n, mm, vis) in want.items():
            gn, gmm, gvis = got[k]
            assert gn == n and gvis == vis, (k, want[k], got[k])
            if mm is None:
                assert gmm is None or math.isnan(gmm)
            else:
                assert gmm == pytest.approx(mm, abs=2e-6)


def test_validation(spark):
    arr = np.zeros((4, 4))
    cube = _cube(spark, arr)
    odf = spark.createDataFrame([(1, 1, 1)],
                                "obs_id long, row int, col int")
    with pytest.raises(ValueError, match="unknown band"):
        viewshed(cube, odf, band="nope", radius=3)
    with pytest.raises(ValueError, match="radius"):
        viewshed(cube, odf, band="z", radius=0)
    with pytest.raises(ValueError, match="missing column"):
        viewshed(cube, odf.drop("row"), band="z", radius=3)
