"""Property fuzz over the round-3 geometry kernels: point-in-polygon
vs the textbook scalar loop, Douglas-Peucker invariants, convex hull
invariants, and measures consistency — randomized shapes with
hypothesis shrinking."""

import numpy as np
from hypothesis import given, settings, strategies as st

from geocube_spark.geometry import wkb as W
from geocube_spark.geometry.measures import polygon_measures
from geocube_spark.geometry.simplify import (
    convex_hull_points, simplify_ring,
)
from geocube_spark.kernels.pip import (
    geometry_rings, points_in_edges, ring_edges,
)


def _star(seed, k, cx, cy, r):
    # Angles are normalized positive gaps summing to 2*pi, so every
    # vertex direction from (cx, cy) is distinct and the ring is
    # star-shaped around the center -- provably SIMPLE.  (The old
    # "sort k uniform angles" form could cluster angles in a
    # half-plane; with varying radii the edges then crossed, giving a
    # self-intersecting ring for which centroid-in-hull is not a
    # theorem -- hypothesis seed 24071, k=4.)
    rng = np.random.default_rng(seed)
    gaps = rng.uniform(0.05, 1.0, k)
    ang = 2 * np.pi * np.cumsum(gaps) / gaps.sum()
    rad = rng.uniform(0.35 * r, r, k)
    xs = cx + rad * np.cos(ang)
    ys = cy + rad * np.sin(ang)
    return np.column_stack(
        [np.append(xs, xs[0]), np.append(ys, ys[0])]
    )


@given(
    seed=st.integers(0, 2**31), k=st.integers(4, 24),
    cx=st.floats(-50, 50), cy=st.floats(-50, 50),
    r=st.floats(0.5, 30),
)
@settings(max_examples=40, deadline=None, derandomize=True)
def test_pip_matches_scalar(seed, k, cx, cy, r):
    ring = _star(seed, k, cx, cy, r)
    rng = np.random.default_rng(seed + 1)
    px = rng.uniform(cx - 1.5 * r, cx + 1.5 * r, 120)
    py = rng.uniform(cy - 1.5 * r, cy + 1.5 * r, 120)
    got = points_in_edges(px, py, *ring_edges([ring]))
    for i in range(len(px)):
        inside = False
        for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
            if (y1 > py[i]) != (y2 > py[i]):
                if px[i] < x1 + (py[i] - y1) * (x2 - x1) / (y2 - y1):
                    inside = not inside
        assert got[i] == inside


@given(
    seed=st.integers(0, 2**31), n=st.integers(5, 120),
    tol=st.floats(0.0, 5.0),
)
@settings(max_examples=40, deadline=None, derandomize=True)
def test_simplify_invariants(seed, n, tol):
    rng = np.random.default_rng(seed)
    chain = np.cumsum(rng.uniform(-1, 1, (n, 2)), axis=0)
    out = simplify_ring(chain, tol)
    # endpoints preserved, kept points a subsequence
    assert (out[0] == chain[0]).all() and (out[-1] == chain[-1]).all()
    pool = {tuple(p) for p in chain}
    assert all(tuple(p) in pool for p in out)
    # idempotent
    again = simplify_ring(out, tol)
    assert len(again) == len(out) and (again == out).all()


@given(seed=st.integers(0, 2**31), n=st.integers(3, 300))
@settings(max_examples=40, deadline=None, derandomize=True)
def test_hull_invariants(seed, n):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-100, 100, (n, 2))
    ring = convex_hull_points(pts)
    if len(ring) <= 2:
        return  # collinear degenerate
    body = ring[:-1]
    m = len(body)
    for i in range(m):
        a, b, c = body[i], body[(i + 1) % m], body[(i + 2) % m]
        cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (
            c[0] - a[0]
        )
        assert cross > 0  # strictly convex, CCW
    # all inputs inside the epsilon-dilated hull
    ctr = body.mean(axis=0)
    big = ctr + (ring - ctr) * (1 + 1e-9)
    inside = points_in_edges(pts[:, 0], pts[:, 1], *ring_edges([big]))
    assert inside.all()


@given(
    seed=st.integers(0, 2**31), k=st.integers(4, 20),
    r=st.floats(1.0, 40.0),
)
@settings(max_examples=40, deadline=None, derandomize=True)
def test_measures_match_scalar_shoelace(seed, k, r):
    ring = _star(seed, k, 0.0, 0.0, r)
    g = W.Geometry(W.POLYGON, [ring])
    area, perim, cx, cy, npts = polygon_measures([g.to_wkb()])
    xr, yr = ring[:, 0], ring[:, 1]
    cross = xr[:-1] * yr[1:] - xr[1:] * yr[:-1]
    a = 0.5 * cross.sum()
    assert area[0] == abs(a) or np.isclose(area[0], abs(a), rtol=1e-12)
    assert np.isclose(
        perim[0], np.hypot(np.diff(xr), np.diff(yr)).sum(), rtol=1e-12
    )
    # hull of the polygon contains its centroid
    hull = convex_hull_points(ring[:-1])
    inside = points_in_edges(
        np.array([cx[0]]), np.array([cy[0]]), *ring_edges([hull])
    )
    assert inside[0]
    assert npts[0] == len(ring)


def _segments_cross(p1, p2, p3, p4):
    def orient(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (
            c[0] - a[0]
        )

    d1, d2 = orient(p3, p4, p1), orient(p3, p4, p2)
    d3, d4 = orient(p1, p2, p3), orient(p1, p2, p4)
    return ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0))


def _ring_is_simple(ring):
    edges = list(zip(ring[:-1], ring[1:]))
    n = len(edges)
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # adjacent through closure
            if _segments_cross(*edges[i], *edges[j]):
                return False
    return True


def test_star_seed_24071_regression():
    """Pinned regression: the old sorted-angle generator emitted a
    self-intersecting ring for (seed=24071, k=4) and the
    centroid-in-hull property then failed (round-3 verdict).  The
    gap-normalized generator must produce a SIMPLE ring for this seed
    (and a sweep of others), and the engine centroid must sit inside
    its hull."""
    for seed in (24071, 0, 1, 7, 12345, 2**31 - 1):
        for k in (4, 5, 8, 20):
            ring = _star(seed, k, 0.0, 0.0, 10.0)
            assert _ring_is_simple(ring), (seed, k)
            g = W.Geometry(W.POLYGON, [ring])
            area, perim, cx, cy, npts = polygon_measures([g.to_wkb()])
            hull = convex_hull_points(ring[:-1])
            inside = points_in_edges(
                np.array([cx[0]]), np.array([cy[0]]),
                *ring_edges([hull]),
            )
            assert inside[0], (seed, k)
