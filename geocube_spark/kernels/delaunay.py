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


def _batch_circum(allp: np.ndarray, tri: np.ndarray):
    """Vectorized circumcircles for (M, 3) triangles: (ux, uy, r2).

    Degenerate (collinear) triangles get r2 = -1 so the in-circle test
    never admits a point (matches the scalar form's sentinel).
    """
    a = allp[tri[:, 0]]
    b = allp[tri[:, 1]]
    c = allp[tri[:, 2]]
    d = 2 * (
        a[:, 0] * (b[:, 1] - c[:, 1])
        + b[:, 0] * (c[:, 1] - a[:, 1])
        + c[:, 0] * (a[:, 1] - b[:, 1])
    )
    bad = d == 0
    dd = np.where(bad, 1.0, d)
    a2 = a[:, 0] ** 2 + a[:, 1] ** 2
    b2 = b[:, 0] ** 2 + b[:, 1] ** 2
    c2 = c[:, 0] ** 2 + c[:, 1] ** 2
    ux = (
        a2 * (b[:, 1] - c[:, 1])
        + b2 * (c[:, 1] - a[:, 1])
        + c2 * (a[:, 1] - b[:, 1])
    ) / dd
    uy = (
        a2 * (c[:, 0] - b[:, 0])
        + b2 * (a[:, 0] - c[:, 0])
        + c2 * (b[:, 0] - a[:, 0])
    ) / dd
    r2 = (a[:, 0] - ux) ** 2 + (a[:, 1] - uy) ** 2
    ux = np.where(bad, np.inf, ux)
    uy = np.where(bad, np.inf, uy)
    r2 = np.where(bad, -1.0, r2)
    return ux, uy, r2


_BFS_THRESHOLD = 4096    # above this, the O(n^2) scan loses to the walk


# documented single-task ceiling: the adjacency-walk build is expected
# O(n) (~7 s per 100k points) but runs as ONE task per (band, group);
# past this cap the fail-fast error beats a silently-pinned executor.
# Only CUBIC still needs the single global fit (its CT patches read
# gradient estimates that couple across the whole triangulation);
# 'linear' auto-routes to the halo-tiled certified fit above 150k
# points (cube._interp_linear_tiled), whose per-tile builds stay far
# below this cap.
DELAUNAY_MAX_POINTS = 2_000_000


def delaunay(points: np.ndarray) -> np.ndarray:
    """Return (M, 3) int array of triangle vertex indices.

    points: (N, 2) float array, N >= 3. Degenerate (all-collinear)
    inputs return an empty triangle list.

    Two builds share the same super-triangle and in-circle tolerance:

    * n <= _BFS_THRESHOLD: Bowyer-Watson with the per-insertion
      circumcircle scan fully vectorized over the live triangle arrays
      (the former dict/list form cost ~1 s at n=1000; this is
      ~milliseconds). Insertion order (0..n-1) matches the original
      implementation, so co-circular tie-breaks are stable.
    * larger n: adjacency-walk Bowyer-Watson — locate the containing
      triangle by a visibility walk from the previous insertion, grow
      the cavity by BFS over triangle neighbors, retriangulate the
      boundary fan. Insertions go in Morton (Z-curve) order so the
      walk starts adjacent to its target: expected O(1) steps per
      insertion, O(n) overall vs the scan's O(n^2). In general
      position both builds produce THE Delaunay triangulation; they
      can differ only on exactly co-circular quadruples (where any
      diagonal is valid).
    """
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n > DELAUNAY_MAX_POINTS:
        # the fit is one task per (band, group) — inherent to the
        # globally-coupled triangulation, and exactly the reference's
        # own single-node limitation (scipy griddata). Fail fast with
        # guidance instead of grinding one executor core for minutes.
        raise ValueError(
            f"{n} scatter points exceed the single-task Delaunay cap "
            f"of {DELAUNAY_MAX_POINTS} (the triangulation is fitted "
            "once per band; ~7 s per 100k points in one task). "
            "Subsample the input, or use method='nearest' (scales to "
            "any point count) or a burn + interpolate_na pipeline."
        )
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    if n > _BFS_THRESHOLD:
        return _check_build(_delaunay_walk(pts), n)

    # super-triangle containing all points
    cx, cy = pts.mean(axis=0)
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1e-12) * 100.0
    st = np.array(
        [[cx - 20 * span, cy - span], [cx, cy + 20 * span], [cx + 20 * span, cy - span]]
    )
    allp = np.vstack([pts, st])

    cap = 4 * n + 16
    tv = np.empty((cap, 3), dtype=np.int64)     # triangle vertices
    ccx = np.empty(cap, dtype=np.float64)       # circumcenter x
    ccy = np.empty(cap, dtype=np.float64)       # circumcenter y
    cr2 = np.empty(cap, dtype=np.float64)       # circumradius^2
    alive = np.zeros(cap, dtype=bool)

    tv[0] = (n, n + 1, n + 2)
    ux0, uy0, r20 = _batch_circum(allp, tv[:1])
    ccx[0], ccy[0], cr2[0] = ux0[0], uy0[0], r20[0]
    alive[0] = True
    ntri = 1
    ekey_base = n + 3

    for i in range(n):
        px, py = allp[i]
        d2 = (px - ccx[:ntri]) ** 2 + (py - ccy[:ntri]) ** 2
        bad = np.flatnonzero(alive[:ntri] & (d2 <= cr2[:ntri] * (1 + 1e-12)))
        if len(bad) == 0:
            continue
        bt = tv[bad]
        e = np.concatenate([bt[:, [0, 1]], bt[:, [1, 2]], bt[:, [2, 0]]])
        e.sort(axis=1)
        key = e[:, 0] * ekey_base + e[:, 1]
        uniq, counts = np.unique(key, return_counts=True)
        single = uniq[counts == 1]      # boundary polygon edges
        alive[bad] = False
        nb = len(single)
        if nb == 0:
            continue
        if ntri + nb > cap:
            # compact dead slots (amortized; live count is ~2n bounded)
            live = np.flatnonzero(alive[:ntri])
            m = len(live)
            tv[:m] = tv[live]
            ccx[:m] = ccx[live]
            ccy[:m] = ccy[live]
            cr2[:m] = cr2[live]
            alive[:ntri] = False
            alive[:m] = True
            ntri = m
            if ntri + nb > cap:
                cap = max(2 * cap, ntri + nb + 16)
                tv = np.resize(tv, (cap, 3))
                ccx = np.resize(ccx, cap)
                ccy = np.resize(ccy, cap)
                cr2 = np.resize(cr2, cap)
                alive = np.resize(alive, cap)
                alive[ntri:] = False
        new = np.empty((nb, 3), dtype=np.int64)
        new[:, 0] = single // ekey_base
        new[:, 1] = single % ekey_base
        new[:, 2] = i
        sl = slice(ntri, ntri + nb)
        tv[sl] = new
        ux, uy, r2 = _batch_circum(allp, new)
        ccx[sl] = ux
        ccy[sl] = uy
        cr2[sl] = r2
        alive[sl] = True
        ntri += nb

    live = np.flatnonzero(alive[:ntri])
    out = tv[live]
    out = out[(out < n).all(axis=1)]
    if not len(out):
        return np.empty((0, 3), np.int64)
    return _check_build(out, n)


def _check_build(tris: np.ndarray, n: int) -> np.ndarray:
    """Euler-bound sanity check: a planar triangulation of n points
    has at most 2n - 5 triangles (2n - 2 - h for hull size h >= 3).
    Adversarial NEAR-collinear inputs (e.g. a rank-1 lattice whose
    second coordinate is 1 - first, distinct only through fp jitter)
    can defeat the floating-point in-circle predicate and make the
    incremental build emit overlapping garbage (measured: 32k
    'triangles' from 3k such points) — fail fast with guidance
    instead of returning silently wrong interpolants or grinding an
    executor."""
    if len(tris) > 2 * n:
        raise ValueError(
            f"incremental Delaunay build produced {len(tris)} "
            f"triangles for {n} points (planar maximum 2n-5): the "
            "point set is adversarially near-degenerate for the "
            "floating-point in-circle predicate (e.g. all points "
            "within fp jitter of one line). Jitter or rescale the "
            "coordinates, or use method='nearest'."
        )
    return tris


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
        # bincount is the fast scatter-add (np.add.at is ~10x slower)
        rx = -np.bincount(src, weights=coef * e[:, 0], minlength=n)
        ry = -np.bincount(src, weights=coef * e[:, 1], minlength=n)
        gx = (qyy * rx - qxy * ry) / det
        gy = (qxx * ry - qxy * rx) / det
        new = np.column_stack([gx, gy])
        change = np.abs(new - grads).max()
        grads = new
        if change < tol * (1.0 + np.abs(grads).max()):
            break
    return grads


def _ct_patch_nets(V, f, g):
    """Clough-Tocher control nets, vectorized over many triangles.

    V: (T,3,2) vertices, f: (T,3) values, g: (T,3,2) gradients.
    Returns (centroids (T,2), coeffs (T,3,10)): per mini-patch k (on
    outer edge (Vk, Vk+1), internal vertex = centroid) the cubic Bezier
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
    V4 = V.mean(axis=1)                                   # (T, 2)
    t = f + (g * ((V4[:, None, :] - V) / 3.0)).sum(axis=2)  # (T, 3)
    T = len(V)
    coeffs = np.empty((T, 3, 10), dtype=np.float64)
    w = np.empty((T, 3), dtype=np.float64)
    for k in range(3):
        a, b = k, (k + 1) % 3
        A, B = V[:, a], V[:, b]
        e = B - A
        b300 = f[:, a]
        b030 = f[:, b]
        b210 = f[:, a] + (g[:, a] * e).sum(axis=1) / 3.0
        b120 = f[:, b] - (g[:, b] * e).sum(axis=1) / 3.0
        b201 = t[:, a]
        b021 = t[:, b]
        # normal-derivative-linear condition -> b111; the 2x2 system
        # M = [[e, V4-A]] columns inverted in closed form
        m00, m01 = e[:, 0], V4[:, 0] - A[:, 0]
        m10, m11 = e[:, 1], V4[:, 1] - A[:, 1]
        detM = m00 * m11 - m01 * m10
        nx, ny = -e[:, 1], e[:, 0]
        dB = (m11 * nx - m01 * ny) / detM
        d4 = (-m10 * nx + m00 * ny) / detM
        dA = -dB - d4
        q0 = dA * b120 + dB * b030 + d4 * b021
        q2 = dA * b300 + dB * b210 + d4 * b201
        w[:, k] = ((q0 + q2) / 2.0 - dA * b210 - dB * b120) / d4
        coeffs[:, k, 0] = b300
        coeffs[:, k, 1] = b030
        coeffs[:, k, 3] = b210
        coeffs[:, k, 4] = b120
        coeffs[:, k, 5] = b201
        coeffs[:, k, 6] = b021
        coeffs[:, k, 7] = w[:, k]
    # internal-edge points next to centroid (C1 across internal edges)
    u = np.stack(
        [
            (w[:, 0] + w[:, 2] + t[:, 0]) / 3.0,
            (w[:, 0] + w[:, 1] + t[:, 1]) / 3.0,
            (w[:, 1] + w[:, 2] + t[:, 2]) / 3.0,
        ],
        axis=1,
    )
    c = u.mean(axis=1)
    for k in range(3):
        coeffs[:, k, 2] = c
        coeffs[:, k, 8] = u[:, k]             # A-side internal edge point
        coeffs[:, k, 9] = u[:, (k + 1) % 3]   # B-side
    return V4, coeffs


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


def _morton_argsort(pts: np.ndarray) -> np.ndarray:
    """Z-curve ordering of points (16-bit grid): successive points are
    spatial neighbors, so the locate-walk starts next to its target."""
    x, y = pts[:, 0], pts[:, 1]
    sx = x.ptp() or 1.0
    sy = y.ptp() or 1.0
    nx = ((x - x.min()) / sx * 65535.0).astype(np.uint64)
    ny = ((y - y.min()) / sy * 65535.0).astype(np.uint64)

    def spread(v):
        v = (v | (v << 8)) & np.uint64(0x00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x33333333)
        v = (v | (v << 1)) & np.uint64(0x55555555)
        return v

    code = (spread(nx) << np.uint64(1)) | spread(ny)
    return np.argsort(code, kind="stable")


def _delaunay_walk(pts: np.ndarray) -> np.ndarray:
    """Adjacency-walk Bowyer-Watson (see ``delaunay`` docstring).

    Pure-Python scalar hot loop (lists of floats beat numpy scalars at
    per-insertion granularity); expected O(1) walk + O(cavity) update
    per insertion with Morton-ordered input.
    """
    n = len(pts)
    cx, cy = pts.mean(axis=0)
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1e-12) * 100.0
    px = pts[:, 0].tolist() + [cx - 20 * span, cx, cx + 20 * span]
    py = pts[:, 1].tolist() + [cy - span, cy + 20 * span, cy - span]

    def circum(a, b, c):
        ax, ay, bx, by, cxx, cyy = px[a], py[a], px[b], py[b], px[c], py[c]
        d = 2 * (ax * (by - cyy) + bx * (cyy - ay) + cxx * (ay - by))
        if d == 0:
            return (float("inf"), float("inf"), -1.0)
        a2 = ax * ax + ay * ay
        b2 = bx * bx + by * by
        c2 = cxx * cxx + cyy * cyy
        ux = (a2 * (by - cyy) + b2 * (cyy - ay) + c2 * (ay - by)) / d
        uy = (a2 * (cxx - bx) + b2 * (ax - cxx) + c2 * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        return (ux, uy, r2)

    tv = [(n, n + 1, n + 2)]
    nbr = [[-1, -1, -1]]
    cc = [circum(n, n + 1, n + 2)]
    alive = [True]
    last = 0

    def in_circle(t, x, y):
        ux, uy, r2 = cc[t]
        return (x - ux) ** 2 + (y - uy) ** 2 <= r2 * (1 + 1e-12)

    def locate(x, y, start):
        cur = start
        prev = -1
        for _ in range(4 * (len(tv) + 4)):
            a, b, c = tv[cur]
            vs = (a, b, c)
            moved = False
            for k in range(3):
                u, v = vs[k], vs[(k + 1) % 3]
                w = vs[(k + 2) % 3]
                nx_t = nbr[cur][k]
                if nx_t == prev or nx_t == -1:
                    continue
                ex, ey = px[v] - px[u], py[v] - py[u]
                sp = ex * (y - py[u]) - ey * (x - px[u])
                sw = ex * (py[w] - py[u]) - ey * (px[w] - px[u])
                if sp * sw < 0:
                    prev = cur
                    cur = nx_t
                    moved = True
                    break
            if not moved:
                return cur
        # walk failed (degenerate loop): linear fallback
        for t in range(len(tv)):
            if alive[t] and in_circle(t, x, y):
                return t
        return cur

    order = _morton_argsort(pts)
    for i in order.tolist():
        x, y = px[i], py[i]
        seed = locate(x, y, last)
        # cavity: BFS over neighbors; the containing triangle is always
        # included (p inside a triangle is inside its circumcircle,
        # modulo degeneracy, where we force-include it)
        bad = {seed}
        stack = [seed]
        while stack:
            t = stack.pop()
            for o in nbr[t]:
                if o != -1 and o not in bad and in_circle(o, x, y):
                    bad.add(o)
                    stack.append(o)
        # directed boundary edges of the cavity
        boundary = []   # (u, v, outside)
        for t in bad:
            a, b, c = tv[t]
            vs = (a, b, c)
            for k in range(3):
                o = nbr[t][k]
                if o == -1 or o not in bad:
                    boundary.append((vs[k], vs[(k + 1) % 3], o))
        for t in bad:
            alive[t] = False
        # fan: one new triangle (u, v, i) per boundary edge
        base = len(tv)
        by_first = {}
        for j, (u, v, o) in enumerate(boundary):
            tv.append((u, v, i))
            nbr.append([o, -1, -1])
            cc.append(circum(u, v, i))
            alive.append(True)
            by_first[u] = base + j
            if o != -1:
                # fix the outside triangle's back pointer
                ov = tv[o]
                for k in range(3):
                    if (ov[k] == v and ov[(k + 1) % 3] == u) or (
                        ov[k] == u and ov[(k + 1) % 3] == v
                    ):
                        nbr[o][k] = base + j
                        break
        for j, (u, v, o) in enumerate(boundary):
            t = base + j
            # edge 1 = (v, i): neighbor is the fan triangle starting at v
            # edge 2 = (i, u): neighbor is the fan triangle ending at u
            nbr[t][1] = by_first.get(v, -1)
        for j, (u, v, o) in enumerate(boundary):
            t = base + j
            other = nbr[t][1]
            if other != -1:
                nbr[other][2] = t
        last = base if boundary else last

    out = [
        t for k, t in enumerate(tv)
        if alive[k] and t[0] < n and t[1] < n and t[2] < n
    ]
    return (
        np.asarray(out, dtype=np.int64)
        if out
        else np.empty((0, 3), np.int64)
    )


class Triangulation:
    """Fitted Delaunay interpolator: build once, evaluate many times.

    The tile loop in the distributed interp stage calls ``evaluate``
    once per tile; the Delaunay build, gradient estimation and
    Clough-Tocher patch coefficients are computed once per (band,
    group) instead of once per tile (the former per-tile rebuild cost
    ~1 s/tile at 1k points). Point location is a uniform bbox-bin index
    over the triangles, so each query touches only nearby candidates
    instead of every triangle.

    Semantics match the loop-over-triangles form exactly: the in-circle
    tolerance is unchanged and a query inside several triangles (shared
    edges) resolves to the HIGHEST triangle index — the 'last triangle
    wins' behavior of the former sequential overwrite loop.
    """

    def __init__(self, points, values, tris=None):
        self.pts = np.asarray(points, dtype=np.float64)
        self.vals = np.asarray(values, dtype=np.float64)
        # tris: precomputed simplices (the broadcast-eval path ships
        # the fitted triangulation to workers; rebuilding the bin
        # index here is vectorized O(n), only delaunay() is skipped)
        self.tris = delaunay(self.pts) if tris is None else np.asarray(
            tris, dtype=np.int64
        )
        self._grads = None
        t = self.tris
        if len(t) == 0:
            self._ok = False
            return
        a = self.pts[t[:, 0]]
        b = self.pts[t[:, 1]]
        c = self.pts[t[:, 2]]
        det = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + (
            c[:, 0] - b[:, 0]
        ) * (a[:, 1] - c[:, 1])
        self._det = np.where(det == 0, np.nan, det)
        self._a, self._b, self._c = a, b, c
        xs = np.stack([a[:, 0], b[:, 0], c[:, 0]])
        ys = np.stack([a[:, 1], b[:, 1], c[:, 1]])
        self._minx = xs.min(axis=0)
        self._maxx = xs.max(axis=0)
        self._miny = ys.min(axis=0)
        self._maxy = ys.max(axis=0)
        # uniform bins over the hull bbox; triangles registered in every
        # bin their bbox overlaps (CSR layout)
        self._gx0 = float(self._minx.min())
        self._gy0 = float(self._miny.min())
        spanx = float(self._maxx.max()) - self._gx0
        spany = float(self._maxy.max()) - self._gy0
        nb = max(1, int(np.sqrt(len(t))))
        self._nbx = self._nby = nb
        self._pad = 1e-9 * max(spanx, spany, 1e-300)
        # zero-extent dimension: everything lands in bin 0 (consistent
        # for triangles and queries; avoids inf scales)
        self._sx = nb / spanx if spanx > 0 else 0.0
        self._sy = nb / spany if spany > 0 else 0.0
        bx0 = np.clip(((self._minx - self._gx0) * self._sx).astype(np.int64), 0, nb - 1)
        bx1 = np.clip(((self._maxx - self._gx0) * self._sx).astype(np.int64), 0, nb - 1)
        by0 = np.clip(((self._miny - self._gy0) * self._sy).astype(np.int64), 0, nb - 1)
        by1 = np.clip(((self._maxy - self._gy0) * self._sy).astype(np.int64), 0, nb - 1)
        counts = (bx1 - bx0 + 1) * (by1 - by0 + 1)
        rep = np.repeat(np.arange(len(t)), counts)
        j = _dl_multi_arange(counts)
        nx = (bx1 - bx0 + 1)[rep]
        bins = (by0[rep] + j // nx) * nb + (bx0[rep] + j % nx)
        order = np.argsort(bins, kind="stable")
        self._bin_tri = rep[order]
        self._bin_start = np.searchsorted(bins[order], np.arange(nb * nb + 1))
        self._ok = True

    def locate(self, qx, qy):
        """Containing triangle index per query (-1 = outside hull).

        Ties (queries on shared edges) resolve to the highest triangle
        index, matching the former last-wins overwrite loop.
        """
        q = len(qx)
        found = np.full(q, -1, dtype=np.int64)
        if not self._ok or q == 0:
            return found
        nb = self._nbx
        bx = np.clip(((qx - self._gx0) * self._sx).astype(np.int64), 0, nb - 1)
        by = np.clip(((qy - self._gy0) * self._sy).astype(np.int64), 0, nb - 1)
        qbin = by * nb + bx
        s = self._bin_start
        cnt = s[qbin + 1] - s[qbin]
        # zero-count queries (empty bins) must be dropped BEFORE the
        # offset expansion: _dl_multi_arange assumes positive counts
        nz = np.flatnonzero(cnt > 0)
        if not len(nz):
            return found
        rep = np.repeat(nz, cnt[nz])
        j = _dl_multi_arange(cnt[nz])
        cand = self._bin_tri[s[qbin[rep]] + j]
        px = qx[rep]
        py = qy[rep]
        # cheap bbox reject before barycentric math; padded so the
        # barycentric eps (-1e-12, relative to triangle scale) can never
        # admit a point the bbox test rejected
        pad = self._pad
        m = (
            (px >= self._minx[cand] - pad) & (px <= self._maxx[cand] + pad)
            & (py >= self._miny[cand] - pad) & (py <= self._maxy[cand] + pad)
        )
        rep, cand, px, py = rep[m], cand[m], px[m], py[m]
        if not len(rep):
            return found
        a, b, c = self._a[cand], self._b[cand], self._c[cand]
        det = self._det[cand]
        l1 = ((b[:, 1] - c[:, 1]) * (px - c[:, 0]) + (c[:, 0] - b[:, 0]) * (py - c[:, 1])) / det
        l2 = ((c[:, 1] - a[:, 1]) * (px - c[:, 0]) + (a[:, 0] - c[:, 0]) * (py - c[:, 1])) / det
        l3 = 1.0 - l1 - l2
        eps = -1e-12
        inside = (l1 >= eps) & (l2 >= eps) & (l3 >= eps)
        np.maximum.at(found, rep[inside], cand[inside])
        return found

    def linear(self, qx, qy, fill=np.nan):
        out = np.full(qx.shape, fill, dtype=np.float64)
        loc = self.locate(qx, qy)
        m = loc >= 0
        if not m.any():
            return out
        t = self.tris[loc[m]]
        a, b, c = self._a[loc[m]], self._b[loc[m]], self._c[loc[m]]
        det = self._det[loc[m]]
        px, py = qx[m], qy[m]
        l1 = ((b[:, 1] - c[:, 1]) * (px - c[:, 0]) + (c[:, 0] - b[:, 0]) * (py - c[:, 1])) / det
        l2 = ((c[:, 1] - a[:, 1]) * (px - c[:, 0]) + (a[:, 0] - c[:, 0]) * (py - c[:, 1])) / det
        l3 = 1.0 - l1 - l2
        out[m] = (
            l1 * self.vals[t[:, 0]] + l2 * self.vals[t[:, 1]] + l3 * self.vals[t[:, 2]]
        )
        return out

    def gradients(self):
        if self._grads is None:
            self._grads = estimate_gradients(self.pts, self.vals, self.tris)
        return self._grads

    def cubic(self, qx, qy, fill=np.nan, gradients=None):
        out = np.full(qx.shape, fill, dtype=np.float64)
        loc = self.locate(qx, qy)
        mask = loc >= 0
        if not mask.any():
            return out
        grads = (
            np.asarray(gradients, dtype=np.float64)
            if gradients is not None
            else self.gradients()
        )
        ti = loc[mask]
        ut, inv = np.unique(ti, return_inverse=True)
        tri = self.tris[ut]
        V = self.pts[tri]                       # (T', 3, 2)
        V4, coeffs = _ct_patch_nets(V, self.vals[tri], grads[tri])
        Vq, V4q = V[inv], V4[inv]
        A, B, C = Vq[:, 0], Vq[:, 1], Vq[:, 2]
        det = (B[:, 1] - C[:, 1]) * (A[:, 0] - C[:, 0]) + (
            C[:, 0] - B[:, 0]
        ) * (A[:, 1] - C[:, 1])
        px, py = qx[mask], qy[mask]
        l0 = ((B[:, 1] - C[:, 1]) * (px - C[:, 0])
              + (C[:, 0] - B[:, 0]) * (py - C[:, 1])) / det
        l1 = ((C[:, 1] - A[:, 1]) * (px - C[:, 0])
              + (A[:, 0] - C[:, 0]) * (py - C[:, 1])) / det
        lam = np.stack([l0, l1, 1.0 - l0 - l1])
        # mini-patch k covers the region nearest outer edge (k, k+1),
        # i.e. where the opposite coordinate lam[(k+2)%3] is minimal
        patch = (np.argmin(lam, axis=0) + 1) % 3
        qi = np.arange(len(px))
        Pa = Vq[qi, patch]
        Pb = Vq[qi, (patch + 1) % 3]
        m00 = Pb[:, 0] - Pa[:, 0]
        m01 = V4q[:, 0] - Pa[:, 0]
        m10 = Pb[:, 1] - Pa[:, 1]
        m11 = V4q[:, 1] - Pa[:, 1]
        detM = m00 * m11 - m01 * m10
        dx = px - Pa[:, 0]
        dy = py - Pa[:, 1]
        bb = (m11 * dx - m01 * dy) / detM
        mm = (-m10 * dx + m00 * dy) / detM
        cf = coeffs[inv, patch]                 # (Q, 10)
        out[np.flatnonzero(mask)] = _ct_eval(cf.T, 1.0 - bb - mm, bb, mm)
        return out


def _dl_multi_arange(counts):
    """Concatenated arange(0, c) per count (local copy to avoid a
    circular import with kernels.rasterize)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = counts.cumsum()
    out = np.ones(total, dtype=np.int64)
    out[0] = 0
    out[ends[:-1]] = 1 - counts[:-1]
    return out.cumsum()


def cubic_interpolate(points, values, qx, qy, fill=np.nan, gradients=None):
    """griddata(method='cubic') equivalent: C1 Clough-Tocher on
    Delaunay with globally estimated gradients.

    points (N,2), values (N,), qx/qy flat query arrays. Points outside
    the convex hull get ``fill``. Pass ``gradients`` (N,2) to skip
    estimation (tests: exact gradients reproduce quadratics exactly).
    """
    return Triangulation(points, values).cubic(
        np.asarray(qx, dtype=np.float64), np.asarray(qy, dtype=np.float64),
        fill=fill, gradients=gradients,
    )


def linear_interpolate(points, values, qx, qy, fill=np.nan):
    """griddata(method='linear') equivalent: barycentric on Delaunay.

    points (N,2), values (N,), qx/qy flat query arrays. Points outside
    the convex hull get ``fill``.
    """
    return Triangulation(points, values).linear(
        np.asarray(qx, dtype=np.float64), np.asarray(qy, dtype=np.float64),
        fill=fill,
    )
