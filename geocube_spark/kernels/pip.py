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
