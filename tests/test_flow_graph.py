"""D8 flow-graph analytics (flow_basins / flow_accumulation): parity
against an independent SEQUENTIAL path walker over the assembled
flowdir raster — the engine resolves paths in log-round pointer
doubling, the reference walks them one hop at a time, so agreement
validates the doubling algebra, not a replay.
"""

import numpy as np
import pytest

from geocube_spark.bandops import (
    flow_accumulation,
    flow_basins,
    flow_cells,
    flow_edges,
)
from geocube_spark.cube import CHUNK_SCHEMA, BandMeta, GeoCube
from geocube_spark.geometry.affine import Affine
from geocube_spark.geometry.crs import CRS
from geocube_spark.grid.geobox import GeoBox

# ESRI d8_pointer codes -> (dr, dc) on a north-up grid (row+1 = south)
CODE_OFF = {
    1: (0, 1), 2: (1, 1), 4: (1, 0), 8: (1, -1),
    16: (0, -1), 32: (-1, -1), 64: (-1, 0), 128: (-1, 1),
}


def _dem_cube(spark, vals, ts=16):
    h, w = vals.shape
    gb = GeoBox(w, h, Affine(10.0, 0.0, 0.0, 0.0, -10.0, 0.0),
                CRS(32615))
    rows = []
    for tid, row0, col0, th, tw in gb.tile_grid(ts):
        sub = vals[row0:row0 + th, col0:col0 + tw]
        rows.append((
            "dem", None, 0, int(tid), int(row0), int(col0), int(th),
            int(tw), [float(v) for v in sub.ravel()], 1, th * tw, 0, 0,
        ))
    chunks = spark.createDataFrame(rows, CHUNK_SCHEMA)
    return GeoCube(
        chunks=chunks, geobox=gb,
        bands={"dem": BandMeta("dem", "float64", float("nan"))},
        tile_size=ts, fill=float("nan"),
    )


def _walk_reference(flow):
    """Sequential walker: per-cell sink label + upstream counts."""
    h, w = flow.shape
    valid = ~np.isnan(flow)

    def parent(r, c):
        code = int(flow[r, c])
        if code == 0:
            return None
        dr, dc = CODE_OFF[code]
        rr, cc = r + dr, c + dc
        if 0 <= rr < h and 0 <= cc < w and valid[rr, cc]:
            return rr, cc
        return None

    basins = {}
    acc = {}
    for r in range(h):
        for c in range(w):
            if not valid[r, c]:
                continue
            acc.setdefault((r, c), 0)
            cur = (r, c)
            seen = 0
            while True:
                nxt = parent(*cur)
                if nxt is None:
                    break
                acc[nxt] = acc.get(nxt, 0) + 1
                cur = nxt
                seen += 1
                assert seen <= h * w, "cycle?!"
            basins[(r, c)] = cur
    return basins, acc


@pytest.fixture(scope="module")
def rough_dem(spark):
    rng = np.random.RandomState(77)
    yy, xx = np.mgrid[0:40, 0:48]
    vals = (
        0.03 * (xx - 24.0) ** 2 + 0.02 * (yy - 20.0) ** 2
        + 3.0 * np.sin(xx / 3.0) * np.cos(yy / 4.0)
        + rng.uniform(0, 0.5, (40, 48))
    )
    cube = _dem_cube(spark, vals)
    fd_cube = cube.terrain("dem", "flowdir")
    flow = fd_cube.assemble()["flowdir"]
    return fd_cube, flow


def test_edges_match_code_table(spark, rough_dem):
    fd_cube, flow = rough_dem
    edges = {
        (r["row"], r["col"]): (r["nrow"], r["ncol"])
        for r in flow_edges(fd_cube).collect()
    }
    h, w = flow.shape
    valid = ~np.isnan(flow)
    for (r, c), (nr, nc) in edges.items():
        code = int(flow[r, c])
        dr, dc = CODE_OFF[code]
        assert (nr, nc) == (r + dr, c + dc)
        assert valid[nr, nc]
    # every flowing cell with an in-grid valid target has an edge
    n_expected = 0
    for r in range(h):
        for c in range(w):
            if not valid[r, c] or int(flow[r, c]) == 0:
                continue
            dr, dc = CODE_OFF[int(flow[r, c])]
            rr, cc = r + dr, c + dc
            if 0 <= rr < h and 0 <= cc < w and valid[rr, cc]:
                n_expected += 1
    assert len(edges) == n_expected


def test_basins_match_sequential_walker(spark, rough_dem):
    fd_cube, flow = rough_dem
    want_basins, _ = _walk_reference(flow)
    got = {
        (r["row"], r["col"]): (r["basin_row"], r["basin_col"])
        for r in flow_basins(fd_cube).collect()
    }
    assert got == want_basins
    # every basin label is itself a sink: its own label is itself
    for label in set(got.values()):
        assert got[label] == label


def test_accumulation_matches_sequential_walker(spark, rough_dem):
    fd_cube, flow = rough_dem
    _, want_acc = _walk_reference(flow)
    got = {
        (r["row"], r["col"]): r["n_upstream"]
        for r in flow_accumulation(fd_cube).collect()
    }
    assert got == want_acc
    assert sum(got.values()) > 0  # the DEM actually drains


def test_bowl_drains_to_single_pit(spark):
    yy, xx = np.mgrid[0:24, 0:24]
    vals = (xx - 11.0) ** 2 + (yy - 11.0) ** 2
    cube = _dem_cube(spark, vals, ts=8)
    fd_cube = cube.terrain("dem", "flowdir")
    flow = fd_cube.assemble()["flowdir"]
    n_valid = int((~np.isnan(flow)).sum())
    basins = flow_basins(fd_cube).collect()
    labels = {(r["basin_row"], r["basin_col"]) for r in basins}
    assert labels == {(11, 11)}
    acc = {
        (r["row"], r["col"]): r["n_upstream"]
        for r in flow_accumulation(fd_cube).collect()
    }
    # the pit receives every other valid cell
    assert acc[(11, 11)] == n_valid - 1


def test_flow_cells_filters_nodata(spark, rough_dem):
    fd_cube, flow = rough_dem
    n_valid = int((~np.isnan(flow)).sum())
    assert flow_cells(fd_cube).count() == n_valid


def _magnitude_reference(flow):
    """Shreve magnitude by sequential walking: count source cells
    through every downstream node; sources (no inflow) count 1."""
    h, w = flow.shape
    valid = ~np.isnan(flow)

    def parent(r, c):
        code = int(flow[r, c])
        if code == 0:
            return None
        dr, dc = CODE_OFF[code]
        rr, cc = r + dr, c + dc
        if 0 <= rr < h and 0 <= cc < w and valid[rr, cc]:
            return rr, cc
        return None

    has_inflow = set()
    for r in range(h):
        for c in range(w):
            if valid[r, c]:
                p = parent(r, c)
                if p is not None:
                    has_inflow.add(p)
    mag = {}
    for r in range(h):
        for c in range(w):
            if not valid[r, c]:
                continue
            mag.setdefault((r, c), 0)
            if (r, c) in has_inflow:
                continue
            # source: counts itself, then every node on its path
            mag[(r, c)] += 1
            cur = (r, c)
            while True:
                nxt = parent(*cur)
                if nxt is None:
                    break
                mag[nxt] = mag.get(nxt, 0) + 1
                cur = nxt
    return mag


def test_stream_magnitude_matches_walker(spark, rough_dem):
    from geocube_spark.bandops import stream_magnitude

    fd_cube, flow = rough_dem
    want = _magnitude_reference(flow)
    got = {
        (r["row"], r["col"]): r["magnitude"]
        for r in stream_magnitude(fd_cube).collect()
    }
    assert got == want
    # additivity at the bowl pit: magnitude(pit) = total sources
    yy, xx = np.mgrid[0:24, 0:24]
    cube = _dem_cube(spark, (xx - 11.0) ** 2 + (yy - 11.0) ** 2, ts=8)
    fd2 = cube.terrain("dem", "flowdir")
    flow2 = fd2.assemble()["flowdir"]
    want2 = _magnitude_reference(flow2)
    got2 = {
        (r["row"], r["col"]): r["magnitude"]
        for r in stream_magnitude(fd2).collect()
    }
    assert got2 == want2
    # pit magnitude = TRUE source count (cells with no inflow): every
    # source drains to the single pit, magnitudes are additive
    h2, w2 = flow2.shape
    valid2 = ~np.isnan(flow2)
    inflow = set()
    for r in range(h2):
        for c in range(w2):
            if valid2[r, c] and int(flow2[r, c]) != 0:
                dr, dc = CODE_OFF[int(flow2[r, c])]
                rr, cc = r + dr, c + dc
                if 0 <= rr < h2 and 0 <= cc < w2 and valid2[rr, cc]:
                    inflow.add((rr, cc))
    n_sources = sum(
        1 for r in range(h2) for c in range(w2)
        if valid2[r, c] and (r, c) not in inflow
    )
    assert got2[(11, 11)] == n_sources


def test_stream_order_strahler_referee(spark):
    """Scalar topological Strahler on the real terrain forest: orders
    must match, sources are 1, and a junction of two equal orders
    increments."""
    import collections

    from geocube_spark.bandops import flow_edges, stream_order

    rng = np.random.default_rng(21)
    dem = rng.uniform(0, 100, (24, 24)).round(1)
    cube = _dem_cube(spark, dem)
    fd = cube.terrain("dem", "flowdir")
    got = {(r["row"], r["col"]): r["order"]
           for r in stream_order(fd).collect()}
    edges = [((r["row"], r["col"]), (r["nrow"], r["ncol"]))
             for r in flow_edges(fd).collect()]
    ups = collections.defaultdict(list)
    for u, v in edges:
        ups[v].append(u)
    # topological walk
    want = {}
    pending = set(got)
    while pending:
        prog = False
        for c in list(pending):
            if all(u in want for u in ups[c]):
                os = [want[u] for u in ups[c]]
                if not os:
                    want[c] = 1
                else:
                    m = max(os)
                    want[c] = m + 1 if os.count(m) >= 2 else m
                pending.discard(c)
                prog = True
        assert prog, "cycle in D8 forest?"
    assert got == want
    # every source is order 1; some junction increments on this DEM
    srcs = [c for c in got if not ups[c]]
    assert srcs and all(got[c] == 1 for c in srcs)

    # canonical junctions: two order-1s meet -> 2; 2 meets 1 -> 2
    assert max(got.values()) >= 2
