"""Douglas-Peucker simplification: structural guarantees and the
Spark wrapper."""

import numpy as np
import pandas as pd
import pytest

from geocube_spark.geometry import wkb as W
from geocube_spark.geometry.simplify import (
    simplify_geometry, simplify_ring, simplify_wkb,
)

RNG = np.random.default_rng(99)


def _noisy_circle(n=200, r=10.0, noise=0.05):
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    rad = r + RNG.uniform(-noise, noise, n)
    xs, ys = rad * np.cos(th), rad * np.sin(th)
    return np.column_stack(
        [np.append(xs, xs[0]), np.append(ys, ys[0])]
    )


def _line_dist(p, a, b):
    s = b - a
    seg2 = s @ s
    if seg2 == 0:
        return float(np.hypot(*(p - a)))
    return abs((p[0] - a[0]) * s[1] - (p[1] - a[1]) * s[0]) / np.sqrt(
        seg2
    )


def test_dp_guarantee_and_subset():
    ring = _noisy_circle()
    tol = 0.3
    out = simplify_ring(ring, tol)
    # kept points are a subsequence of the input
    orig = {tuple(p) for p in ring}
    assert all(tuple(p) in orig for p in out)
    assert (out[0] == out[-1]).all()
    assert len(out) < len(ring)
    # the DP termination guarantee: every dropped point lies within
    # tol of the line through its bracketing kept pair
    kept_idx = [
        int(np.flatnonzero((ring == p).all(axis=1))[0]) for p in out
    ]
    for (i0, i1) in zip(kept_idx[:-1], kept_idx[1:]):
        for j in range(i0 + 1, i1):
            assert _line_dist(ring[j], ring[i0], ring[i1]) <= tol + 1e-12


def test_dp_idempotent_and_zero_tolerance():
    ring = _noisy_circle(80)
    once = simplify_ring(ring, 0.4)
    twice = simplify_ring(once, 0.4)
    assert (once == twice).all()
    # tol=0 keeps everything except exactly-collinear interiors
    square_mid = np.array(
        [[0, 0], [1, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float
    )
    out = simplify_ring(square_mid, 0.0)
    assert [tuple(p) for p in out] == [
        (0, 0), (2, 0), (2, 2), (0, 2), (0, 0)
    ]


def test_polygon_hole_collapse_semantics():
    outer = np.array(
        [[0, 0], [20, 0], [20, 20], [0, 20], [0, 0]], dtype=float
    )
    tiny = np.array(
        [[5, 5], [5.2, 5], [5.2, 5.2], [5, 5.2], [5, 5]], dtype=float
    )
    g = W.Geometry(W.POLYGON, [outer, tiny])
    out = simplify_geometry(g, 1.0)
    assert out is not None and len(out.parts) == 1  # hole gone
    # whole polygon under tolerance -> None
    g2 = W.Geometry(W.POLYGON, [tiny])
    assert simplify_geometry(g2, 1.0) is None
    # multipolygon keeps the surviving part
    g3 = W.Geometry(W.MULTIPOLYGON, [[tiny], [outer]])
    out3 = simplify_geometry(g3, 1.0)
    assert out3 is not None and len(out3.parts) == 1


def test_wkb_roundtrip_and_lines():
    zig = np.column_stack(
        [np.linspace(0, 10, 50),
         0.01 * np.sin(np.linspace(0, 40, 50))]
    )
    line = W.Geometry(W.LINESTRING, zig)
    out = W.loads(simplify_wkb(line.to_wkb(), 0.5))
    assert out.geom_type == W.LINESTRING
    assert len(out.parts) == 2  # a near-straight line collapses
    pt = W.point(3.0, 4.0)
    assert W.loads(simplify_wkb(pt.to_wkb(), 5.0)).parts.tolist() == [
        3.0, 4.0,
    ]


def test_simplify_geometries_spark(spark):
    from geocube_spark.functions.spatial import simplify_geometries

    rings = [_noisy_circle(120) for _ in range(30)]
    pdf = pd.DataFrame(
        {
            "gid": np.arange(30),
            "geometry_wkb": [
                W.Geometry(W.POLYGON, [r]).to_wkb() for r in rings
            ],
        }
    )
    out = (
        simplify_geometries(
            spark.createDataFrame(pdf).repartition(4), 0.3
        )
        .orderBy("gid")
        .toPandas()
    )
    for i in range(30):
        exp = simplify_wkb(pdf["geometry_wkb"][i], 0.3)
        assert bytes(out["geometry_wkb"][i]) == exp
    with pytest.raises(ValueError, match="tolerance"):
        simplify_geometries(spark.createDataFrame(pdf), -1.0)


# ---------------------------------------------------------------------------
# convex hull
# ---------------------------------------------------------------------------

def _is_ccw_convex(ring):
    r = np.asarray(ring)[:-1]
    n = len(r)
    for i in range(n):
        a, b, c = r[i], r[(i + 1) % n], r[(i + 2) % n]
        cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (
            c[0] - a[0]
        )
        if cross <= 0:
            return False
    return True


def test_convex_hull_properties():
    from geocube_spark.geometry.simplify import convex_hull_points
    from geocube_spark.kernels.pip import points_in_edges, ring_edges

    for _ in range(30):
        pts = RNG.uniform(-10, 10, (200, 2))
        ring = convex_hull_points(pts)
        assert _is_ccw_convex(ring)
        verts = {tuple(p) for p in ring}
        assert verts <= {tuple(p) for p in pts}
        # every input point inside or on the hull: shrink test — all
        # points strictly inside a hull dilated about its centroid
        c = ring[:-1].mean(axis=0)
        big = c + (ring - c) * (1 + 1e-9)
        inside = points_in_edges(
            pts[:, 0], pts[:, 1], *ring_edges([big])
        )
        assert inside.all()


def test_convex_hull_degenerate_and_wkb():
    from geocube_spark.geometry.simplify import (
        convex_hull_points, convex_hull_wkb,
    )

    col = np.array([[0, 0], [1, 1], [2, 2], [3, 3]], dtype=float)
    out = convex_hull_points(col)
    assert out.tolist() == [[0, 0], [3, 3]]
    g = W.loads(
        convex_hull_wkb(W.Geometry(W.LINESTRING, col).to_wkb())
    )
    assert g.geom_type == W.LINESTRING
    sq = W.Geometry(W.MULTIPOINT, np.array(
        [[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5]], dtype=float))
    h = W.loads(convex_hull_wkb(sq.to_wkb()))
    assert h.geom_type == W.POLYGON
    assert len(h.parts[0]) == 5  # square + closure, interior dropped
    p = W.loads(convex_hull_wkb(W.point(2.0, 3.0).to_wkb()))
    assert p.geom_type == W.POINT


def test_convex_hulls_spark(spark):
    from geocube_spark.functions.spatial import convex_hulls
    from geocube_spark.geometry.simplify import convex_hull_wkb

    pdf = pd.DataFrame(
        {
            "gid": np.arange(20),
            "geometry_wkb": [
                W.Geometry(
                    W.MULTIPOINT, RNG.uniform(-5, 5, (30, 2))
                ).to_wkb()
                for _ in range(20)
            ],
        }
    )
    out = (
        convex_hulls(spark.createDataFrame(pdf).repartition(3))
        .orderBy("gid").toPandas()
    )
    for i in range(20):
        assert bytes(out["geometry_wkb"][i]) == convex_hull_wkb(
            pdf["geometry_wkb"][i]
        )
