"""Batched scanline rasterization kernel, pure numpy.

Reproduces the GDAL semantics the reference relies on through
``rasterio.features.rasterize`` (reference geocube/rasterize.py:124-132):

* polygons: a cell is burned when its **center** is inside the polygon,
  even-odd rule, holes supported (GDAL llrasterize scanline algorithm:
  scanline at row+0.5, crossings paired after sort, cells with center x
  in [xa, xb] burned via ceil(xa-0.5)..floor(xb-0.5));
* points: the cell containing the point (floor of pixel coords);
* lines: cells traversed by the segment (supercover DDA);
* ``all_touched=True``: every cell touched by the boundary is burned in
  addition to the interior (reference rasterize.py:96-100,129);
* merge: ``replace`` = later geometry wins (MergeAlg.replace, input
  order — reference rasterize.py:73,124-132) or ``add`` = values sum
  (MergeAlg.add, rasterize.py:73; test_core_integration.py:814).

All functions operate in **pixel space**: callers transform world
coordinates with ~affine first (vectorized, once per batch). The
per-geometry cell cover is computed once and reused across all
measurements of a tile (SURVEY.md §2.3).

This module is executor-side code invoked from ``applyInPandas``
grouped-map UDFs — it never touches Spark APIs.
"""

from __future__ import annotations

import numpy as np

from ..geometry.wkb import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
)


def _multi_arange(starts: np.ndarray, counts: np.ndarray,
                  dtype=np.int64) -> np.ndarray:
    """Concatenate arange(s, s+c) for each (s, c) without a Python loop.

    ``dtype=np.int32`` halves memory traffic for tile-local values
    (anything < 2^31 — cell indexes within a tile always are); the
    cumsum stays exact because every prefix value is a valid index."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=dtype)
    ends = counts.cumsum()
    out = np.ones(total, dtype=dtype)
    out[0] = starts[0]
    idx = ends[:-1]
    out[idx] = (starts[1:] - (starts[:-1] + counts[:-1] - 1)).astype(dtype)
    return out.cumsum(dtype=dtype)


def _polygon_interior_cells(rings, height: int, width: int):
    """Scanline fill: (rows, cols) of cells whose center is inside.

    rings: list of (N,2) float arrays in pixel coords (x=col, y=row),
    exterior + holes together (even-odd rule handles holes for free).
    """
    x1s, y1s, x2s, y2s = [], [], [], []
    for r in rings:
        if len(r) < 3:
            continue
        x1s.append(r[:-1, 0])
        y1s.append(r[:-1, 1])
        x2s.append(r[1:, 0])
        y2s.append(r[1:, 1])
    if not x1s:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    x1 = np.concatenate(x1s)
    y1 = np.concatenate(y1s)
    x2 = np.concatenate(x2s)
    y2 = np.concatenate(y2s)

    ymin = np.minimum(y1, y2)
    ymax = np.maximum(y1, y2)
    # scanlines r+0.5 crossed by each edge: half-open [ymin, ymax)
    r_lo = np.ceil(ymin - 0.5).astype(np.int64)  # first row with center >= ymin
    r_hi = np.ceil(ymax - 0.5).astype(np.int64)  # first row with center >= ymax
    r_lo = np.clip(r_lo, 0, height)
    r_hi = np.clip(r_hi, 0, height)
    counts = r_hi - r_lo
    keep = counts > 0
    if not keep.any():
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    x1, y1, x2, y2 = x1[keep], y1[keep], x2[keep], y2[keep]
    r_lo, counts = r_lo[keep], counts[keep]

    edge_idx = np.repeat(np.arange(len(x1)), counts)
    rows = _multi_arange(r_lo, counts)
    yc = rows + 0.5
    dx = x2 - x1
    dy = y2 - y1
    xcross = x1[edge_idx] + (yc - y1[edge_idx]) * (dx[edge_idx] / dy[edge_idx])

    # sort by (row, x); crossings pair up even-odd within each row
    order = np.lexsort((xcross, rows))
    rows = rows[order]
    xcross = xcross[order]
    # rows come in even-count groups (closed rings) — pair consecutive
    xa = xcross[0::2]
    xb = xcross[1::2]
    prow = rows[0::2]
    c_lo = np.ceil(xa - 0.5).astype(np.int64)  # first col with center >= xa
    c_hi = np.floor(xb - 0.5).astype(np.int64)  # last col with center <= xb
    c_lo = np.clip(c_lo, 0, width)
    c_hi = np.clip(c_hi, -1, width - 1)
    ncols = c_hi - c_lo + 1
    keep = ncols > 0
    if not keep.any():
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    c_lo, ncols, prow = c_lo[keep], ncols[keep], prow[keep]
    cols = _multi_arange(c_lo, ncols)
    rows_out = np.repeat(prow, ncols)
    return rows_out, cols


def batch_polygon_cells(x1, y1, x2, y2, owner, height, width):
    """Batched scanline over edges of MANY polygons at once.

    Same center/even-odd semantics as ``_polygon_interior_cells``, but
    one vectorized pass covers every polygon in a tile, so per-geometry
    Python loops disappear from the burn hot path. Crossing pairing
    runs inside ``(owner, row)`` groups; the group key and a clipped
    x-crossing pack into ONE float64 sort key (exact while
    group_count * (width + 4) < 2^52 — owners per tile times tile
    height stays far below that), so the pairing costs a single
    argsort instead of a 3-key lexsort — the kernel's dominant op.

    x1/y1/x2/y2: float64 edge endpoints (pixel space), ``owner``:
    int64 id per edge (all rings of a polygon share one owner — holes
    get even-odd for free). Returns ``(flat_cells, cell_owner)``.
    """
    ymin = np.minimum(y1, y2)
    ymax = np.maximum(y1, y2)
    r_lo = np.ceil(ymin - 0.5).astype(np.int64)
    r_hi = np.ceil(ymax - 0.5).astype(np.int64)
    r_lo = np.clip(r_lo, 0, height)
    r_hi = np.clip(r_hi, 0, height)
    counts = r_hi - r_lo
    keep = counts > 0
    if not keep.any():
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    x1, y1 = x1[keep], y1[keep]
    x2, y2 = x2[keep], y2[keep]
    owner = owner[keep]
    r_lo, counts = r_lo[keep], counts[keep]

    # owners are arbitrary ids; compress to dense group indexes so the
    # composite key stays small and the final gather is cheap
    uown, own_dense = np.unique(owner, return_inverse=True)

    edge_idx = np.repeat(np.arange(len(x1)), counts)
    rows = _multi_arange(r_lo, counts)
    yc = rows + 0.5
    slope = (x2 - x1) / (y2 - y1)          # one divide per edge
    xcross = x1[edge_idx] + (yc - y1[edge_idx]) * slope[edge_idx]

    # composite sort key: (owner, row) group then x within the group.
    # clipping xcross to [-1, width+1] preserves both pair ordering and
    # the burned column range (ceil/floor hit the same clip bounds)
    xclip = np.clip(xcross, -1.0, width + 1.0)
    group = own_dense[edge_idx].astype(np.float64) * height + rows
    order = np.argsort(group * (width + 4.0) + (xclip + 2.0))
    rows = rows[order]
    xclip = xclip[order]
    og = own_dense[edge_idx][order]
    xa = xclip[0::2]
    xb = xclip[1::2]
    prow = rows[0::2]
    pown = og[0::2]
    c_lo = np.ceil(xa - 0.5).astype(np.int64)
    c_hi = np.floor(xb - 0.5).astype(np.int64)
    c_lo = np.clip(c_lo, 0, width)
    c_hi = np.clip(c_hi, -1, width - 1)
    ncols = c_hi - c_lo + 1
    keep = ncols > 0
    if not keep.any():
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    c_lo, ncols = c_lo[keep], ncols[keep]
    prow, pown = prow[keep], pown[keep]
    # int32 expansion: tile-local cell indexes and dense owner indexes
    # both fit; halves the bandwidth of the kernel's largest arrays
    flat = _multi_arange(prow * width + c_lo, ncols, dtype=np.int32)
    cell_owner = uown.astype(np.int32)[np.repeat(pown.astype(np.int32),
                                                 ncols)]
    return flat, cell_owner


def edges_from_rings(coords: np.ndarray, owners: np.ndarray):
    """(n, K, 2) closed rings + per-ring owner -> flat edge arrays
    (x1, y1, x2, y2, owner) for ``batch_polygon_cells``."""
    n, k, _ = coords.shape
    x1 = coords[:, :-1, 0].ravel()
    y1 = coords[:, :-1, 1].ravel()
    x2 = coords[:, 1:, 0].ravel()
    y2 = coords[:, 1:, 1].ravel()
    own = np.repeat(np.asarray(owners, dtype=np.int64), k - 1)
    return x1, y1, x2, y2, own


def edges_from_varying_rings(coords, ring_len, ring_owner):
    """Concatenated closed rings of varying length -> flat edge arrays.

    ``coords`` (P, 2), ``ring_len`` (R,) points per ring, ``ring_owner``
    (R,) owner id per ring (all rings of one geometry share an owner so
    ``batch_polygon_cells``' even-odd pairing handles holes and
    multi-part polygons for free). Returns (x1, y1, x2, y2, owner).
    """
    P = len(coords)
    ends = np.cumsum(ring_len)
    valid_start = np.ones(P, dtype=bool)
    valid_start[ends - 1] = False       # ring-final points start no edge
    idx = np.flatnonzero(valid_start)
    x1 = coords[idx, 0]
    y1 = coords[idx, 1]
    x2 = coords[idx + 1, 0]
    y2 = coords[idx + 1, 1]
    own = np.repeat(np.asarray(ring_owner, dtype=np.int64), ring_len - 1)
    return x1, y1, x2, y2, own


def batch_outline_cells(x1, y1, x2, y2, owner, height, width):
    """Batched supercover of many edges (the ``all_touched`` boundary
    pass). Samples each edge at the same density as ``_segment_cells``
    (2 samples per unit of max-axis travel + 1) so results match the
    per-geometry fallback exactly. Returns (flat_cells, cell_owner) —
    callers dedupe per owner together with the interior cells.
    """
    span = np.maximum(np.abs(x2 - x1), np.abs(y2 - y1))
    nsteps = np.maximum(2, (np.ceil(span) * 2 + 1).astype(np.int64))
    rep = np.repeat(np.arange(len(x1)), nsteps)
    j = _multi_arange(np.zeros(len(x1), dtype=np.int64), nsteps)
    t = j / (nsteps[rep] - 1)
    xs = x1[rep] + (x2 - x1)[rep] * t
    ys = y1[rep] + (y2 - y1)[rep] * t
    cols = np.floor(xs).astype(np.int64)
    rows = np.floor(ys).astype(np.int64)
    m = (rows >= 0) & (rows < height) & (cols >= 0) & (cols < width)
    return rows[m] * width + cols[m], owner[rep][m]


def _segment_cells(x1, y1, x2, y2, height, width):
    """Supercover: all cells a segment passes through (numpy DDA)."""
    n = max(
        2,
        int(np.ceil(max(abs(x2 - x1), abs(y2 - y1)))) * 2 + 1,
    )
    t = np.linspace(0.0, 1.0, n)
    xs = x1 + (x2 - x1) * t
    ys = y1 + (y2 - y1) * t
    cols = np.floor(xs).astype(np.int64)
    rows = np.floor(ys).astype(np.int64)
    m = (rows >= 0) & (rows < height) & (cols >= 0) & (cols < width)
    return rows[m], cols[m]


def _outline_cells(rings, height, width):
    rr, cc = [], []
    for r in rings:
        for i in range(len(r) - 1):
            a, b = _segment_cells(
                r[i, 0], r[i, 1], r[i + 1, 0], r[i + 1, 1], height, width
            )
            rr.append(a)
            cc.append(b)
    if not rr:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    return np.concatenate(rr), np.concatenate(cc)


def geometry_cells(geom: Geometry, height: int, width: int,
                   all_touched: bool = False):
    """All (rows, cols) covered by a geometry in pixel space.

    Duplicate cells are possible (multi parts); callers burning with
    'replace' don't care, and 'add' callers must dedupe — GDAL burns
    each *geometry* once, so we dedupe here.
    """
    rr, cc = [], []
    t = geom.geom_type
    if t in (POINT, MULTIPOINT) or t == GEOMETRYCOLLECTION:
        pts = list(geom.points())
        if pts:
            arr = np.asarray(pts, dtype=np.float64)
            cols = np.floor(arr[:, 0]).astype(np.int64)
            rows = np.floor(arr[:, 1]).astype(np.int64)
            m = (rows >= 0) & (rows < height) & (cols >= 0) & (cols < width)
            rr.append(rows[m])
            cc.append(cols[m])
    if t in (LINESTRING, MULTILINESTRING, GEOMETRYCOLLECTION):
        for ls in geom.lines():
            for i in range(len(ls) - 1):
                a, b = _segment_cells(
                    ls[i, 0], ls[i, 1], ls[i + 1, 0], ls[i + 1, 1],
                    height, width,
                )
                rr.append(a)
                cc.append(b)
    if t in (POLYGON, MULTIPOLYGON, GEOMETRYCOLLECTION):
        for rings in geom.polygons():
            a, b = _polygon_interior_cells(rings, height, width)
            rr.append(a)
            cc.append(b)
            if all_touched:
                a, b = _outline_cells(rings, height, width)
                rr.append(a)
                cc.append(b)
    if not rr:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    rows = np.concatenate(rr)
    cols = np.concatenate(cc)
    if len(rows):
        flat = rows * width + cols
        uniq = np.unique(flat)
        rows, cols = uniq // width, uniq % width
    return rows, cols


def rasterize(
    geoms,
    values,
    height: int,
    width: int,
    *,
    fill=np.nan,
    merge_alg: str = "replace",
    all_touched: bool = False,
    dtype=np.float64,
    cells_cache=None,
):
    """Burn (geometry, value) pairs into a (height, width) array.

    ``geoms`` iterable of Geometry in pixel coords; burn order = input
    order (last wins under 'replace' — callers must pre-sort by the
    deterministic ``seq``, SURVEY.md §2.4). ``cells_cache`` optionally
    maps index -> (rows, cols) so multi-measurement burns reuse covers.
    """
    out = np.full((height, width), fill, dtype=dtype)
    if merge_alg not in ("replace", "add"):
        raise ValueError(f"unsupported merge_alg {merge_alg!r}")
    for i, (g, v) in enumerate(zip(geoms, values)):
        if cells_cache is not None and i in cells_cache:
            rows, cols = cells_cache[i]
        else:
            rows, cols = geometry_cells(g, height, width, all_touched)
            if cells_cache is not None:
                cells_cache[i] = (rows, cols)
        if len(rows) == 0:
            continue
        if merge_alg == "replace":
            out[rows, cols] = v
        else:
            # GDAL MergeAlg.add is a straight += onto the fill-initialized
            # buffer (NaN fill therefore stays NaN) — reproduced verbatim.
            out[rows, cols] += v
    return out
