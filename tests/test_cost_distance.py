"""cost_distance: blocked Bellman-Ford least-cost distance vs a
Dijkstra referee."""

import heapq
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocube_spark.bandops import cost_distance
from geocube_spark.cube import CHUNK_SCHEMA, BandMeta, GeoCube
from geocube_spark.geometry.affine import Affine
from geocube_spark.geometry.crs import CRS
from geocube_spark.grid.geobox import GeoBox


def _cube(spark, arr, ts=8):
    H, W = arr.shape
    gb = GeoBox(W, H, Affine(1.0, 0.0, 0.0, 0.0, -1.0, 0.0), CRS(4326))
    rows = [("cost", None, 0, int(tid), int(r0), int(c0), int(h),
             int(w), [float(x) for x in arr[r0:r0 + h, c0:c0 + w].ravel()],
             1, h * w, 0, 0)
            for tid, r0, c0, h, w in gb.tile_grid(ts)]
    return GeoCube(
        chunks=spark.createDataFrame(rows, CHUNK_SCHEMA), geobox=gb,
        bands={"cost": BandMeta("cost", "float64", float("nan"))},
        tile_size=ts, fill=float("nan"),
    )


def _dijkstra(arr, srcs):
    H, W = arr.shape
    valid = ~np.isnan(arr)
    dist, pq = {}, []
    for s in srcs:
        if 0 <= s[0] < H and 0 <= s[1] < W and valid[s]:
            dist[s] = 0.0
            heapq.heappush(pq, (0.0, s))
    while pq:
        d, (r, c) = heapq.heappop(pq)
        if d > dist.get((r, c), math.inf):
            continue
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if not (dy or dx):
                    continue
                nr, nc = r + dy, c + dx
                if 0 <= nr < H and 0 <= nc < W and valid[nr, nc]:
                    w = math.sqrt(2.0) if dy and dx else 1.0
                    nd = d + (arr[r, c] + arr[nr, nc]) / 2.0 * w
                    if nd < dist.get((nr, nc), math.inf):
                        dist[(nr, nc)] = nd
                        heapq.heappush(pq, (nd, (nr, nc)))
    return dist


def _collect(spark, out):
    from geocube_spark.operators.geocube_queries import _explode_cells

    rows = _explode_cells(out.chunks).where(
        F.col("val").isNotNull() & ~F.isnan("val")).collect()
    return {(r["row"], r["col"]): r["val"] for r in rows}


def test_matches_dijkstra_multi_tile(spark):
    rng = np.random.default_rng(3)
    arr = rng.uniform(0.5, 5.0, (20, 30))
    arr[rng.uniform(size=arr.shape) < 0.12] = np.nan
    srcs = [(3, 4), (17, 25)]
    got = _collect(spark, cost_distance(_cube(spark, arr), srcs,
                                        cost_band="cost"))
    want = _dijkstra(arr, srcs)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_wall_forces_detour_and_disconnect(spark):
    arr = np.ones((9, 9))
    arr[:, 4] = np.nan          # full vertical wall
    got = _collect(spark, cost_distance(_cube(spark, arr, ts=4),
                                        [(4, 0)], cost_band="cost"))
    # right half unreachable, wall cells nodata
    assert all(c < 4 for (_, c) in got)
    assert len(got) == 9 * 4
    # straight-line cost along the row
    assert got[(4, 3)] == pytest.approx(3.0)


def test_source_dataframe_and_invalid_source(spark):
    arr = np.ones((6, 6))
    arr[2, 2] = np.nan
    srcs = spark.createDataFrame([(0, 0), (2, 2)], "row int, col int")
    got = _collect(spark, cost_distance(_cube(spark, arr, ts=4), srcs,
                                        cost_band="cost"))
    want = _dijkstra(arr, [(0, 0), (2, 2)])  # (2,2) ignored (nodata)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_validation(spark):
    cube = _cube(spark, np.ones((4, 4)))
    with pytest.raises(ValueError, match="unknown band"):
        cost_distance(cube, [(0, 0)], cost_band="nope")
    with pytest.raises(ValueError, match="no source"):
        cost_distance(cube, [], cost_band="cost")
    with pytest.raises(ValueError, match="max_rounds"):
        cost_distance(cube, [(0, 0)], cost_band="cost", max_rounds=0)


def test_backlink_walk_reconstructs_distance(spark):
    from geocube_spark.bandops import cost_backlink, cost_distance

    rng = np.random.default_rng(9)
    arr = rng.uniform(0.5, 5.0, (16, 16))
    arr[rng.uniform(size=arr.shape) < 0.1] = np.nan
    srcs = [(2, 3)]
    cube = _cube(spark, arr, ts=8)
    dist = cost_distance(cube, srcs, cost_band="cost")
    dvals = _collect(spark, dist)
    bl = cost_backlink(cube, srcs, cost_band="cost", dist=dist)
    codes = _collect(spark, bl)
    assert set(codes) == set(dvals)
    step = {1: (0, 1), 2: (1, 1), 4: (1, 0), 8: (1, -1), 16: (0, -1),
            32: (-1, -1), 64: (-1, 0), 128: (-1, 1)}
    for cell, d in dvals.items():
        # follow backlinks to a source, accumulating edge costs
        cur, acc, hops = cell, 0.0, 0
        while codes[cur] != 0:
            dy, dx = step[int(codes[cur])]
            nxt = (cur[0] + dy, cur[1] + dx)
            w = math.sqrt(2.0) if dy and dx else 1.0
            acc += (arr[cur] + arr[nxt]) / 2.0 * w
            cur = nxt
            hops += 1
            assert hops < 1000
        assert cur in [tuple(s) for s in srcs]
        assert acc == pytest.approx(d, abs=1e-9)


def test_backlink_sources_zero_and_codes_valid(spark):
    from geocube_spark.bandops import cost_backlink

    arr = np.ones((8, 8))
    cube = _cube(spark, arr, ts=4)
    codes = _collect(spark, cost_backlink(cube, [(4, 4)],
                                          cost_band="cost"))
    assert codes[(4, 4)] == 0
    valid = {0, 1, 2, 4, 8, 16, 32, 64, 128}
    assert {int(v) for v in codes.values()} <= valid


def test_extract_cost_path(spark):
    from geocube_spark.bandops import (cost_backlink, cost_distance,
                                       extract_cost_path)

    arr = np.ones((10, 10))
    arr[4, 1:9] = np.nan       # wall forces a detour
    cube = _cube(spark, arr, ts=8)
    srcs = [(0, 5)]
    dist = cost_distance(cube, srcs, cost_band="cost")
    bl = cost_backlink(cube, srcs, cost_band="cost", dist=dist)
    path = extract_cost_path(bl, (9, 5))
    assert path[0] == (9, 5) and path[-1] == (0, 5)
    # consecutive cells are 8-adjacent and path cost equals dist
    acc = 0.0
    for a, b in zip(path, path[1:]):
        assert max(abs(a[0] - b[0]), abs(a[1] - b[1])) == 1
        w = math.sqrt(2.0) if (a[0] != b[0] and a[1] != b[1]) else 1.0
        acc += (arr[a] + arr[b]) / 2.0 * w
    dvals = _collect(spark, dist)
    assert acc == pytest.approx(dvals[(9, 5)], abs=1e-9)
    with pytest.raises(ValueError, match="not a reached cell"):
        extract_cost_path(bl, (4, 5))


def test_fill_sinks_bowl_and_referee(spark):
    """A bowl inside a rim fills flat to the rim's LOWEST spill
    point; a monotone slope is untouched; scalar Jacobi referee on a
    random DEM with nodata holes; epsilon leaves a drainable
    gradient."""
    from geocube_spark.bandops import fill_sinks

    rng = np.random.default_rng(31)
    H = W = 20
    dem = rng.uniform(50, 60, (H, W))
    dem[8:13, 8:13] = 10.0       # deep pit
    dem[10, 12] = 10.0
    dem[5, 5] = np.nan           # nodata hole -> local outlet ring
    cube = _cube(spark, dem, ts=8)
    got = fill_sinks(cube, "cost").assemble()["cost_filled"]

    # scalar Jacobi referee (same outlet rule)
    valid = ~np.isnan(dem)
    pad = np.pad(valid, 1, constant_values=False)
    nv = sum(pad[1 + dy:H + 1 + dy, 1 + dx:W + 1 + dx].astype(int)
             for dy in (-1, 0, 1) for dx in (-1, 0, 1)
             if (dy, dx) != (0, 0))
    outlet = valid & (nv < 8)
    Wk = np.where(valid, np.inf, np.nan)
    Wk[outlet] = dem[outlet]
    while True:
        wp = np.pad(np.where(np.isnan(Wk), np.inf, Wk), 1,
                    constant_values=np.inf)
        mn = np.minimum.reduce([
            wp[1 + dy:H + 1 + dy, 1 + dx:W + 1 + dx]
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if (dy, dx) != (0, 0)])
        new = np.where(outlet, dem, np.maximum(dem, mn))
        new = np.where(valid, new, np.nan)
        if np.array_equal(np.nan_to_num(new, nan=-1),
                          np.nan_to_num(Wk, nan=-1)):
            break
        Wk = new
    np.testing.assert_array_equal(np.nan_to_num(got, nan=-1),
                                  np.nan_to_num(Wk, nan=-1))
    # the pit genuinely filled, flat, to one spill level > 10
    pit = got[9:12, 9:12]
    assert np.unique(pit).size == 1 and pit[0, 0] > 10.0
    # cells outside pits keep their elevation
    assert got[0, 0] == dem[0, 0]

    # epsilon > 0: pit is no longer flat (drainable gradient)
    got_eps = fill_sinks(cube, "cost",
                         epsilon=0.01).assemble()["cost_filled"]
    assert np.unique(got_eps[9:12, 9:12]).size > 1
    assert (got_eps[valid] >= dem[valid] - 1e-12).all()

    import pytest as _pt
    with _pt.raises(ValueError, match="unknown band"):
        fill_sinks(cube, "nope")
    with _pt.raises(ValueError, match="epsilon"):
        fill_sinks(cube, "cost", epsilon=-1)
