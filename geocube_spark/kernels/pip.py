"""Vectorized point-in-polygon (even-odd crossing test).

The reference's point-in-polygon lives inside rasterio's burn
(reference geocube/rasterize.py delegates to
rasterio.features.rasterize); the engine's raster path re-implements
it as a batched scanline (kernels/rasterize.py). This kernel is the
VECTOR-side counterpart used by the distributed vector x vector
spatial join (functions/spatial.py): exact membership of arbitrary
points in arbitrary polygons, no raster grid involved.

Convention: even-odd (crossing number) over ALL rings of the
geometry, so holes and multi-part polygons need no special cases — a
point inside a hole crosses two boundaries and tests outside.
Horizontal-edge handling uses the standard half-open rule
(``y1 > py != y2 > py``), making results deterministic for boundary
points (a point exactly on a horizontal edge belongs to the cell
below, matching the scanline rasterizer's owner rule).
"""

from __future__ import annotations

import numpy as np

from ..geometry import wkb as W

# cap the P x E broadcast matrix at ~8M doubles (~64 MB) per block
_BLOCK_CELLS = 8_000_000


def ring_edges(rings):
    """List of closed ring arrays (k, 2) -> edge arrays x1,y1,x2,y2."""
    xs1, ys1, xs2, ys2 = [], [], [], []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        if len(r) < 2:
            continue
        xs1.append(r[:-1, 0])
        ys1.append(r[:-1, 1])
        xs2.append(r[1:, 0])
        ys2.append(r[1:, 1])
    if not xs1:
        z = np.empty(0, dtype=np.float64)
        return z, z, z, z
    return (
        np.concatenate(xs1), np.concatenate(ys1),
        np.concatenate(xs2), np.concatenate(ys2),
    )


def geometry_rings(geom) -> list:
    """All rings of a Polygon / MultiPolygon Geometry (holes
    included — even-odd needs no outer/inner distinction)."""
    t = geom.geom_type
    if t == W.POLYGON:
        return list(geom.parts)
    if t == W.MULTIPOLYGON:
        return [r for poly in geom.parts for r in poly]
    raise ValueError(
        f"point-in-polygon needs Polygon/MultiPolygon, got "
        f"{geom.type_name}"
    )


def points_in_edges(px, py, x1, y1, x2, y2) -> np.ndarray:
    """Even-odd membership of points against a polygon's edge set.

    Vectorized P x E crossing count, blocked so the intermediate
    stays ~64 MB regardless of input sizes."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n_pts, n_edges = len(px), len(x1)
    out = np.zeros(n_pts, dtype=bool)
    if n_pts == 0 or n_edges == 0:
        return out
    step = max(1, _BLOCK_CELLS // n_edges)
    for s in range(0, n_pts, step):
        e = min(n_pts, s + step)
        yp = py[s:e, None]
        xp = px[s:e, None]
        crosses = (y1[None, :] > yp) != (y2[None, :] > yp)
        # only crossing edges contribute; guard the division on the
        # rest (horizontal edges never cross under the half-open rule)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1[None, :] + (yp - y1[None, :]) * (
                x2[None, :] - x1[None, :]
            ) / (y2[None, :] - y1[None, :])
        hits = crosses & (xp < xint)
        out[s:e] = (hits.sum(axis=1) & 1).astype(bool)
    return out


def points_in_wkb(px, py, wkb_blob) -> np.ndarray:
    """Convenience: membership of points in one WKB polygon."""
    rings = geometry_rings(W.loads(bytes(wkb_blob)))
    return points_in_edges(px, py, *ring_edges(rings))


def _segments_intersect_any(a, b) -> bool:
    """True when ANY segment of edge set ``a`` meets any of ``b``
    (proper crossings, endpoint touches, and collinear overlap).

    Vectorized E1 x E2 orientation test (standard sign method); the
    all-collinear case falls back to per-axis interval overlap."""
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    if len(ax1) == 0 or len(bx1) == 0:
        return False
    # broadcast: rows = edges of a, cols = edges of b
    rx = (ax2 - ax1)[:, None]
    ry = (ay2 - ay1)[:, None]
    d1 = rx * (by1[None, :] - ay1[:, None]) - ry * (
        bx1[None, :] - ax1[:, None]
    )
    d2 = rx * (by2[None, :] - ay1[:, None]) - ry * (
        bx2[None, :] - ax1[:, None]
    )
    sx = (bx2 - bx1)[None, :]
    sy = (by2 - by1)[None, :]
    d3 = sx * (ay1[:, None] - by1[None, :]) - sy * (
        ax1[:, None] - bx1[None, :]
    )
    d4 = sx * (ay2[:, None] - by1[None, :]) - sy * (
        ax2[:, None] - bx1[None, :]
    )
    straddle = (d1 * d2 <= 0) & (d3 * d4 <= 0)
    proper = straddle & ~((d1 == 0) & (d2 == 0))
    if proper.any():
        return True
    col = straddle & (d1 == 0) & (d2 == 0)
    if not col.any():
        return False
    # collinear candidates: intersect iff 1-D projections overlap
    ii, jj = np.nonzero(col)
    alo = np.minimum(ax1[ii], ax2[ii])
    ahi = np.maximum(ax1[ii], ax2[ii])
    blo = np.minimum(bx1[jj], bx2[jj])
    bhi = np.maximum(bx1[jj], bx2[jj])
    ok = (alo <= bhi) & (blo <= ahi)
    alo = np.minimum(ay1[ii], ay2[ii])
    ahi = np.maximum(ay1[ii], ay2[ii])
    blo = np.minimum(by1[jj], by2[jj])
    bhi = np.maximum(by1[jj], by2[jj])
    return bool((ok & (alo <= bhi) & (blo <= ahi)).any())


def polygons_intersect(rings_a, rings_b) -> bool:
    """GEOS-style ``intersects`` for two polygon ring sets: true when
    boundaries meet (any edge pair crosses/touches) or one polygon
    contains a vertex of the other (even-odd, so holes behave: a
    polygon sitting wholly inside the other's hole does NOT
    intersect)."""
    ea = ring_edges(rings_a)
    eb = ring_edges(rings_b)
    if _segments_intersect_any(ea, eb):
        return True
    # No boundary contact: containment decides.  One test point PER
    # RING (not per geometry): with no crossings each ring lies
    # entirely on one side of the other polygon, but different parts
    # of a multi-part geometry can lie on different sides -- a
    # MultiPolygon whose second part sits wholly inside the other
    # polygon must still report True.  Every ring vertex (outer or
    # hole) is a boundary point of its geometry, so "inside the other
    # polygon (even-odd)" always implies intersection; and any wholly
    # contained part's outer ring tests positive, so per-ring vertices
    # are also sufficient.
    if len(ea[0]) and len(eb[0]):
        pax = np.array([r[0, 0] for r in rings_a if len(r) > 1])
        pay = np.array([r[0, 1] for r in rings_a if len(r) > 1])
        if len(pax) and points_in_edges(pax, pay, *eb).any():
            return True
        pbx = np.array([r[0, 0] for r in rings_b if len(r) > 1])
        pby = np.array([r[0, 1] for r in rings_b if len(r) > 1])
        if len(pbx) and points_in_edges(pbx, pby, *ea).any():
            return True
    return False
