"""watershed: nearest-downstream-pour labeling over the D8 forest."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocube_spark.bandops import watershed
from geocube_spark.cube import CHUNK_SCHEMA, BandMeta, GeoCube
from geocube_spark.geometry.affine import Affine
from geocube_spark.geometry.crs import CRS
from geocube_spark.grid.geobox import GeoBox

STEP = {1: (0, 1), 2: (1, 1), 4: (1, 0), 8: (1, -1), 16: (0, -1),
        32: (-1, -1), 64: (-1, 0), 128: (-1, 1)}


def _fd_cube(spark, codes, ts=8):
    """Cube whose 'flowdir' band holds the given D8 codes (NaN =
    nodata)."""
    H, W = codes.shape
    gb = GeoBox(W, H, Affine(1.0, 0.0, 0.0, 0.0, -1.0, 0.0), CRS(4326))
    rows = [("flowdir", None, 0, int(tid), int(r0), int(c0), int(h),
             int(w),
             [float(x) for x in codes[r0:r0 + h, c0:c0 + w].ravel()],
             1, h * w, 0, 0)
            for tid, r0, c0, h, w in gb.tile_grid(ts)]
    return GeoCube(
        chunks=spark.createDataFrame(rows, CHUNK_SCHEMA), geobox=gb,
        bands={"flowdir": BandMeta("flowdir", "float64", float("nan"))},
        tile_size=ts, fill=float("nan"),
    )


def _ref(codes, pours):
    """Scalar walk: first pour encountered downstream (self counts)."""
    H, W = codes.shape
    at = {(r, c): p for p, r, c in pours}
    out = {}
    for r in range(H):
        for c in range(W):
            if np.isnan(codes[r, c]):
                continue
            cur = (r, c)
            for _ in range(H * W + 1):
                if cur in at:
                    out[(r, c)] = at[cur]
                    break
                code = int(codes[cur])
                if code == 0:
                    break
                dy, dx = STEP[code]
                nxt = (cur[0] + dy, cur[1] + dx)
                if not (0 <= nxt[0] < H and 0 <= nxt[1] < W) \
                        or np.isnan(codes[nxt]):
                    break
                cur = nxt
    return out


def _run(spark, codes, pours):
    cube = _fd_cube(spark, codes)
    rows = watershed(cube, pours).collect()
    return {(r["row"], r["col"]): r["pour_id"] for r in rows}


def test_capture_rule_on_chain(spark):
    codes = np.full((3, 12), np.nan)
    codes[1, :10] = 1.0     # drain east
    codes[1, 10] = 0.0      # pit
    pours = [(1, 1, 5), (2, 1, 8)]
    got = _run(spark, codes, pours)
    want = _ref(codes, pours)
    assert got == want
    # upstream pour captures its sub-catchment
    assert all(got[(1, c)] == 1 for c in range(0, 6))
    assert all(got[(1, c)] == 2 for c in range(6, 9))
    assert (1, 9) not in got and (1, 10) not in got


def test_matches_referee_on_terrain_flowdir(spark):
    rng = np.random.default_rng(6)
    # smooth-ish DEM => acyclic D8 forest from the terrain kernel
    base = rng.uniform(0, 10, (6, 6))
    dem = np.kron(base, np.ones((3, 3))) + rng.uniform(0, 0.3, (18, 18))
    from geocube_spark.cube import CHUNK_SCHEMA as CS

    H, W = dem.shape
    gb = GeoBox(W, H, Affine(1.0, 0.0, 0.0, 0.0, -1.0, 0.0), CRS(4326))
    rows = [("z", None, 0, int(tid), int(r0), int(c0), int(h), int(w),
             [float(x) for x in dem[r0:r0 + h, c0:c0 + w].ravel()],
             1, h * w, 0, 0)
            for tid, r0, c0, h, w in gb.tile_grid(8)]
    zc = GeoCube(chunks=spark.createDataFrame(rows, CS), geobox=gb,
                 bands={"z": BandMeta("z", "float64", float("nan"))},
                 tile_size=8, fill=float("nan"))
    fd = zc.terrain("z", "flowdir")
    arr = fd.assemble()["flowdir"]
    pours = [(1, 7, 7), (2, 10, 12), (3, 4, 13)]
    got = {(r["row"], r["col"]): r["pour_id"]
           for r in watershed(fd, pours).collect()}
    assert got == _ref(arr, pours)


def test_pour_points_dataframe_and_validation(spark):
    codes = np.zeros((4, 4))
    cube = _fd_cube(spark, codes, ts=4)
    pp = spark.createDataFrame([(5, 1, 1)],
                               "pour_id int, row int, col int")
    got = {(r["row"], r["col"]): r["pour_id"]
           for r in watershed(cube, pp).collect()}
    assert got == {(1, 1): 5}   # all-pit grid: only the pour itself
    with pytest.raises(ValueError, match="no pour"):
        watershed(cube, [])


def test_flow_length_chain_and_referee(spark):
    from geocube_spark.bandops import flow_length

    codes = np.full((3, 12), np.nan)
    codes[1, :10] = 1.0
    codes[1, 10] = 0.0
    cube = _fd_cube(spark, codes)
    got = {(r["row"], r["col"]): r["flow_length"]
           for r in flow_length(cube).collect()}
    # cell size 1: straight chain => distance = hops to the pit
    for c in range(11):
        assert got[(1, c)] == pytest.approx(10 - c)
    # diagonal steps cost hypot: build a SE staircase
    codes2 = np.full((6, 6), np.nan)
    for i in range(5):
        codes2[i, i] = 2.0          # SE
    codes2[5, 5] = 0.0
    cube2 = _fd_cube(spark, codes2)
    got2 = {(r["row"], r["col"]): r["flow_length"]
            for r in flow_length(cube2).collect()}
    for i in range(6):
        assert got2[(i, i)] == pytest.approx((5 - i) * np.sqrt(2.0))
