"""Bowyer-Watson Delaunay triangulation, pure numpy.

Used by the 'linear' point-interpolation path (reference
geocube/rasterize.py:136-191 delegates to scipy.interpolate.griddata,
whose 'linear' method is Delaunay + barycentric interpolation). scipy
is not a dependency of this engine, so we triangulate ourselves. Point
counts on this path are small (the interpolation inputs are the vector
rows, not the raster), so an O(n^2)-ish incremental build is fine; the
per-cell interpolation afterwards is fully vectorized.
"""

from __future__ import annotations

import numpy as np


def delaunay(points: np.ndarray) -> np.ndarray:
    """Return (M, 3) int array of triangle vertex indices.

    points: (N, 2) float array, N >= 3. Degenerate (all-collinear)
    inputs return an empty triangle list.
    """
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)

    # super-triangle containing all points
    cx, cy = pts.mean(axis=0)
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1e-12) * 100.0
    st = np.array(
        [[cx - 20 * span, cy - span], [cx, cy + 20 * span], [cx + 20 * span, cy - span]]
    )
    allp = np.vstack([pts, st])
    si = np.array([n, n + 1, n + 2])

    tris = [tuple(si)]

    def circum(tri):
        a, b, c = allp[tri[0]], allp[tri[1]], allp[tri[2]]
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
        if d == 0:
            return (np.inf, np.inf, -1.0)
        a2, b2, c2 = a @ a, b @ b, c @ c
        ux = (a2 * (b[1] - c[1]) + b2 * (c[1] - a[1]) + c2 * (a[1] - b[1])) / d
        uy = (a2 * (c[0] - b[0]) + b2 * (a[0] - c[0]) + c2 * (b[0] - a[0])) / d
        r2 = (a[0] - ux) ** 2 + (a[1] - uy) ** 2
        return (ux, uy, r2)

    centers = {tuple(si): circum(si)}

    for i in range(n):
        p = allp[i]
        bad = []
        for t in tris:
            ux, uy, r2 = centers[t]
            if (p[0] - ux) ** 2 + (p[1] - uy) ** 2 <= r2 * (1 + 1e-12):
                bad.append(t)
        # boundary polygon = edges appearing exactly once among bad tris
        edge_count = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        for t in bad:
            tris.remove(t)
            del centers[t]
        for (u, v), cnt in edge_count.items():
            if cnt == 1:
                nt = (u, v, i)
                tris.append(nt)
                centers[nt] = circum(nt)

    out = [t for t in tris if all(v < n for v in t)]
    return np.asarray(out, dtype=np.int64) if out else np.empty((0, 3), np.int64)


def linear_interpolate(points, values, qx, qy, fill=np.nan):
    """griddata(method='linear') equivalent: barycentric on Delaunay.

    points (N,2), values (N,), qx/qy flat query arrays. Points outside
    the convex hull get ``fill``.
    """
    pts = np.asarray(points, dtype=np.float64)
    vals = np.asarray(values, dtype=np.float64)
    out = np.full(qx.shape, fill, dtype=np.float64)
    tris = delaunay(pts)
    if len(tris) == 0:
        return out
    # vectorized point-in-triangle over all triangles (tri count small)
    for tri in tris:
        a, b, c = pts[tri[0]], pts[tri[1]], pts[tri[2]]
        det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if det == 0:
            continue
        l1 = ((b[1] - c[1]) * (qx - c[0]) + (c[0] - b[0]) * (qy - c[1])) / det
        l2 = ((c[1] - a[1]) * (qx - c[0]) + (a[0] - c[0]) * (qy - c[1])) / det
        l3 = 1.0 - l1 - l2
        eps = -1e-12
        m = (l1 >= eps) & (l2 >= eps) & (l3 >= eps)
        if m.any():
            out[m] = (
                l1[m] * vals[tri[0]] + l2[m] * vals[tri[1]] + l3[m] * vals[tri[2]]
            )
    return out
