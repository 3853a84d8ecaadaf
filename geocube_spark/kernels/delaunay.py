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


def estimate_gradients(points, values, tris, maxiter=400, tol=1e-6):
    """Estimate per-vertex gradients for C1 interpolation.

    Minimizes the sum over triangulation edges of the bending energy of
    the 1D Hermite cubic along each edge (the classical minimum-norm-
    network / global gradient estimation used for Clough-Tocher
    interpolants; scipy.interpolate.griddata(method='cubic') does the
    equivalent). Solved by Gauss-Seidel: each vertex's 2x2 normal
    system against its neighbors' current gradients.

    For the Hermite cubic h on [0,1] with h(0)=f1, h(1)=f2, h'(0)=d1,
    h'(1)=d2 and edge length L, the energy int h''(x)^2 dx works out to
    [12(f1-f2)^2 + 12(f1-f2)(d1+d2) + 4(d1^2+d1*d2+d2^2)] / L^3 with
    d = grad . e; stationarity in g_p gives
        [sum 2 e e^T / L^3] g_p = -sum (3(f1-f2) + g_n . e) e / L^3.
    """
    pts = np.asarray(points, dtype=np.float64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(pts)
    grads = np.zeros((n, 2), dtype=np.float64)
    # undirected edge set -> directed (src, dst) arrays, fully numpy
    if len(tris) == 0:
        return grads
    und = np.concatenate(
        [tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]], axis=0
    )
    und = np.unique(np.sort(und, axis=1), axis=0)
    src = np.concatenate([und[:, 0], und[:, 1]])
    dst = np.concatenate([und[:, 1], und[:, 0]])
    e = pts[dst] - pts[src]                           # (E, 2)
    L3 = np.maximum(np.hypot(e[:, 0], e[:, 1]), 1e-300) ** 3
    w = 1.0 / L3
    # per-vertex 2x2 normal matrices Q = sum 2 e e^T / L^3 (fixed)
    qxx = np.zeros(n)
    qxy = np.zeros(n)
    qyy = np.zeros(n)
    np.add.at(qxx, src, 2.0 * w * e[:, 0] * e[:, 0])
    np.add.at(qxy, src, 2.0 * w * e[:, 0] * e[:, 1])
    np.add.at(qyy, src, 2.0 * w * e[:, 1] * e[:, 1])
    det = qxx * qyy - qxy * qxy
    det[det == 0] = 1.0
    df = 3.0 * (vals[src] - vals[dst])
    # Jacobi iteration (vectorized): every vertex solves its 2x2 system
    # against the neighbors' previous gradients simultaneously — same
    # fixed point as Gauss-Seidel, each sweep O(E) numpy
    for _ in range(maxiter):
        d2 = grads[dst, 0] * e[:, 0] + grads[dst, 1] * e[:, 1]
        coef = (df + d2) * w
        rx = np.zeros(n)
        ry = np.zeros(n)
        np.add.at(rx, src, -coef * e[:, 0])
        np.add.at(ry, src, -coef * e[:, 1])
        gx = (qyy * rx - qxy * ry) / det
        gy = (qxx * ry - qxy * rx) / det
        new = np.column_stack([gx, gy])
        change = np.abs(new - grads).max()
        grads = new
        if change < tol * (1.0 + np.abs(grads).max()):
            break
    return grads


def _ct_patch_coeffs(V, f, g):
    """Clough-Tocher control net for one triangle.

    V: (3,2) vertices, f: (3,) values, g: (3,2) gradients. Returns
    (centroid, coeffs) with coeffs (3, 10): per mini-patch k (on outer
    edge (Vk, Vk+1), internal vertex = centroid) the cubic Bezier
    coefficients ordered
      [b300, b030, b003, b210, b120, b201, b021, b111, b102, b012].

    Construction (reduced Hsieh-Clough-Tocher, public literature —
    Farin, 'Triangles and triangulations'): outer-edge points from
    vertex gradients; each patch interior b111 from the linear-normal-
    derivative condition along its outer edge; internal-edge points
    next to the centroid and the centroid value from C1 continuity
    across the internal edges:
      u_i = (w_left + w_right + t_i) / 3,   c = (u0 + u1 + u2) / 3,
    where t_i = f_i + g_i . (V4 - V_i) / 3.
    """
    V4 = V.mean(axis=0)
    t = np.array([f[i] + g[i] @ (V4 - V[i]) / 3.0 for i in range(3)])
    patches = []
    w = np.empty(3)
    for k in range(3):
        a, b = k, (k + 1) % 3
        A, B = V[a], V[b]
        b300 = f[a]
        b030 = f[b]
        b210 = f[a] + g[a] @ (B - A) / 3.0
        b120 = f[b] + g[b] @ (A - B) / 3.0
        b201 = t[a]
        b021 = t[b]
        # normal-derivative-linear condition -> b111
        M = np.array([[B[0] - A[0], V4[0] - A[0]],
                      [B[1] - A[1], V4[1] - A[1]]])
        Minv = np.linalg.inv(M)
        e = B - A
        nrm = np.array([-e[1], e[0]])
        dB, d4 = Minv[0] @ nrm, Minv[1] @ nrm
        dA = -dB - d4
        q0 = dA * b120 + dB * b030 + d4 * b021
        q2 = dA * b300 + dB * b210 + d4 * b201
        w[k] = ((q0 + q2) / 2.0 - dA * b210 - dB * b120) / d4
        patches.append([b300, b030, 0.0, b210, b120, b201, b021,
                        w[k], 0.0, 0.0])
    # internal-edge points next to centroid (C1 across internal edges)
    u = np.array([
        (w[0] + w[2] + t[0]) / 3.0,
        (w[0] + w[1] + t[1]) / 3.0,
        (w[1] + w[2] + t[2]) / 3.0,
    ])
    c = u.mean()
    for k in range(3):
        patches[k][2] = c
        patches[k][8] = u[k]              # A-side internal edge point
        patches[k][9] = u[(k + 1) % 3]    # B-side
    return V4, np.asarray(patches)


def _ct_eval(coeffs, a, b, m):
    """Evaluate a cubic Bezier triangle with _ct_patch_coeffs ordering
    at barycentric (a, b, m) arrays."""
    (b300, b030, b003, b210, b120, b201, b021, b111, b102, b012) = coeffs
    return (
        a**3 * b300 + b**3 * b030 + m**3 * b003
        + 3 * a * a * b * b210 + 3 * a * b * b * b120
        + 3 * a * a * m * b201 + 3 * b * b * m * b021
        + 3 * a * m * m * b102 + 3 * b * m * m * b012
        + 6 * a * b * m * b111
    )


def cubic_interpolate(points, values, qx, qy, fill=np.nan, gradients=None):
    """griddata(method='cubic') equivalent: C1 Clough-Tocher on
    Delaunay with globally estimated gradients.

    points (N,2), values (N,), qx/qy flat query arrays. Points outside
    the convex hull get ``fill``. Pass ``gradients`` (N,2) to skip
    estimation (tests: exact gradients reproduce quadratics exactly).
    """
    pts = np.asarray(points, dtype=np.float64)
    vals = np.asarray(values, dtype=np.float64)
    out = np.full(qx.shape, fill, dtype=np.float64)
    tris = delaunay(pts)
    if len(tris) == 0:
        return out
    if gradients is None:
        gradients = estimate_gradients(pts, vals, tris)
    grads = np.asarray(gradients, dtype=np.float64)
    for tri in tris:
        Vt = pts[tri]
        A, B, C = Vt
        det = (B[1] - C[1]) * (A[0] - C[0]) + (C[0] - B[0]) * (A[1] - C[1])
        if det == 0:
            continue
        l0 = ((B[1] - C[1]) * (qx - C[0]) + (C[0] - B[0]) * (qy - C[1])) / det
        l1 = ((C[1] - A[1]) * (qx - C[0]) + (A[0] - C[0]) * (qy - C[1])) / det
        l2 = 1.0 - l0 - l1
        eps = -1e-12
        inside = (l0 >= eps) & (l1 >= eps) & (l2 >= eps)
        if not inside.any():
            continue
        V4, patches = _ct_patch_coeffs(Vt, vals[tri], grads[tri])
        lam = np.stack([l0[inside], l1[inside], l2[inside]])
        # mini-patch k covers the region nearest outer edge (k, k+1),
        # i.e. where the opposite coordinate lam[(k+2)%3] is minimal
        patch_of = (np.argmin(lam, axis=0) + 1) % 3
        vals_in = np.empty(lam.shape[1], dtype=np.float64)
        for k in range(3):
            sel = patch_of == k
            if not sel.any():
                continue
            a, b = k, (k + 1) % 3
            Pa, Pb = Vt[a], Vt[b]
            Md = np.array([[Pb[0] - Pa[0], V4[0] - Pa[0]],
                           [Pb[1] - Pa[1], V4[1] - Pa[1]]])
            Mi = np.linalg.inv(Md)
            dx = qx[inside][sel] - Pa[0]
            dy = qy[inside][sel] - Pa[1]
            bb = Mi[0, 0] * dx + Mi[0, 1] * dy
            mm = Mi[1, 0] * dx + Mi[1, 1] * dy
            aa = 1.0 - bb - mm
            vals_in[sel] = _ct_eval(patches[k], aa, bb, mm)
        out_idx = np.flatnonzero(inside)
        out[out_idx] = vals_in
    return out


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
