"""Marching-squares contour extraction (raster -> iso-lines).

The reference ecosystem gets contours from GDAL (``gdal_contour``) /
matplotlib; this kernel re-derives them from the public marching
squares algorithm, vectorized: squares are classified against the
level in one comparison pass, and each of the 16 cases emits its
segments with numpy gathers (saddles resolved by the center-average
decider, the standard asymptotic rule).

Coordinates are CELL-CENTER based: a square spans the centers of four
adjacent cells, and crossing points interpolate linearly along square
edges. Edges are parameterized canonically (left->right, top->bottom)
so the same crossing computed by two different owning squares — e.g.
across a tile border, where both tiles see the same two cell values
via the halo exchange — produces bit-identical endpoints, which is
what makes distributed stitching exact.
"""

from __future__ import annotations

import numpy as np

# case -> list of (edge_a, edge_b) segments; edges: 0=top 1=bottom
# 2=left 3=right; corner bits: 1=TL 2=TR 4=BL 8=BR, inside = v > level
_CASES = {
    1: [(2, 0)],
    2: [(0, 3)],
    3: [(2, 3)],
    4: [(1, 2)],
    5: [(0, 1)],
    7: [(3, 1)],
    8: [(3, 1)],
    10: [(0, 1)],
    11: [(1, 2)],
    12: [(2, 3)],
    13: [(0, 3)],
    14: [(2, 0)],
}
# saddles: (case, center_inside) -> segments
_SADDLES = {
    (6, True): [(2, 0), (3, 1)],
    (6, False): [(0, 3), (2, 1)],
    (9, True): [(0, 3), (2, 1)],
    (9, False): [(2, 0), (3, 1)],
}


def contour_segments(padded: np.ndarray, level: float,
                     row0: float = 0.0, col0: float = 0.0):
    """Segments of the iso-line ``value == level`` over a padded tile.

    ``padded``: (th+2, tw+2) float array — the tile's cells at
    ``[1:th+1, 1:tw+1]`` plus a 1-cell halo (NaN where absent). The
    tile OWNS the squares whose top-left cell is one of its own, so
    multi-tile coverage is exact and duplicate-free. Returns an
    (n, 4) float64 array of (r1, c1, r2, c2) in global cell-center
    coordinates offset by (row0, col0).
    """
    P = np.asarray(padded, dtype=np.float64)
    th, tw = P.shape[0] - 2, P.shape[1] - 2
    if th < 1 or tw < 1:
        return np.empty((0, 4))
    v00 = P[1:1 + th, 1:1 + tw]
    v01 = P[1:1 + th, 2:2 + tw]
    v10 = P[2:2 + th, 1:1 + tw]
    v11 = P[2:2 + th, 2:2 + tw]
    valid = (
        np.isfinite(v00) & np.isfinite(v01)
        & np.isfinite(v10) & np.isfinite(v11)
    )
    with np.errstate(invalid="ignore"):
        case = (
            (v00 > level).astype(np.int8)
            + 2 * (v01 > level).astype(np.int8)
            + 4 * (v10 > level).astype(np.int8)
            + 8 * (v11 > level).astype(np.int8)
        )
    case[~valid] = 0

    def _edge_points(ii, jj, edge):
        """Crossing point of ``edge`` for squares at (ii, jj), in
        global cell-center coords; canonical parameter direction."""
        if edge == 0:      # top: v00 -> v01, left to right
            va, vb = v00[ii, jj], v01[ii, jj]
            t = (level - va) / (vb - va)
            return row0 + ii, col0 + jj + t
        if edge == 1:      # bottom: v10 -> v11
            va, vb = v10[ii, jj], v11[ii, jj]
            t = (level - va) / (vb - va)
            return row0 + ii + 1.0, col0 + jj + t
        if edge == 2:      # left: v00 -> v10, top to bottom
            va, vb = v00[ii, jj], v10[ii, jj]
            t = (level - va) / (vb - va)
            return row0 + ii + t, col0 + jj
        va, vb = v01[ii, jj], v11[ii, jj]  # right: v01 -> v11
        t = (level - va) / (vb - va)
        return row0 + ii + t, col0 + jj + 1.0

    out = []

    def _emit(ii, jj, segs):
        for ea, eb in segs:
            r1, c1 = _edge_points(ii, jj, ea)
            r2, c2 = _edge_points(ii, jj, eb)
            out.append(np.column_stack([r1, c1, r2, c2]))

    for cs, segs in _CASES.items():
        ii, jj = np.nonzero(case == cs)
        if len(ii):
            _emit(ii, jj, segs)
    for cs in (6, 9):
        ii, jj = np.nonzero(case == cs)
        if len(ii):
            center = 0.25 * (
                v00[ii, jj] + v01[ii, jj] + v10[ii, jj] + v11[ii, jj]
            )
            inside = center > level
            for flag in (True, False):
                m = inside if flag else ~inside
                if m.any():
                    _emit(ii[m], jj[m], _SADDLES[(cs, flag)])
    if not out:
        return np.empty((0, 4))
    return np.concatenate(out)


def stitch_segments(segs: np.ndarray) -> list:
    """Segment soup -> polylines (chains), joining on bit-identical
    endpoint coordinates (valid because every shared crossing is
    computed from the same two cell values with the same canonical
    expression). Returns a list of (k, 2) arrays of (row, col)
    points; closed rings repeat the first point last."""
    n = len(segs)
    if n == 0:
        return []
    pts: dict = {}
    link: dict = {}

    def _key(r, c):
        return (float(r), float(c))

    for i in range(n):
        a = _key(segs[i, 0], segs[i, 1])
        b = _key(segs[i, 2], segs[i, 3])
        if a == b:
            continue
        link.setdefault(a, []).append((i, b))
        link.setdefault(b, []).append((i, a))
        pts[i] = (a, b)

    used = np.zeros(n, dtype=bool)
    chains = []
    # open chains first (endpoints of degree 1), then closed loops
    starts = [k for k, v in link.items() if len(v) == 1]
    for start in starts:
        seg_id, nxt = next(
            ((i, o) for i, o in link[start] if not used[i]),
            (None, None),
        )
        if seg_id is None:
            continue
        chain = [start]
        cur = start
        while seg_id is not None:
            used[seg_id] = True
            chain.append(nxt)
            cur, prev = nxt, cur
            seg_id, nxt = next(
                ((i, o) for i, o in link[cur] if not used[i]),
                (None, None),
            )
        chains.append(np.asarray(chain))
    for i in range(n):
        if used[i] or i not in pts:
            continue
        a, b = pts[i]
        used[i] = True
        chain = [a, b]
        cur = b
        while True:
            nxt_pair = next(
                ((j, o) for j, o in link[cur] if not used[j]),
                None,
            )
            if nxt_pair is None:
                break
            j, o = nxt_pair
            used[j] = True
            chain.append(o)
            cur = o
        chains.append(np.asarray(chain))
    return chains
