"""Vector x vector spatial join: the even-odd kernel against a
scalar reference implementation, and the distributed operator against
the brute-force all-pairs answer (which the plan must never build)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geocube_spark.geometry import wkb as W
from geocube_spark.kernels.pip import (
    geometry_rings, points_in_edges, points_in_wkb, ring_edges,
)
from geocube_spark.functions.spatial import points_in_polygons

RNG = np.random.default_rng(42)


def _star_polygon(cx, cy, r, k=9, rng=RNG):
    """Random star-shaped (simple) polygon around a center."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    rad = rng.uniform(0.4 * r, r, k)
    xs = cx + rad * np.cos(ang)
    ys = cy + rad * np.sin(ang)
    ring = np.column_stack([np.append(xs, xs[0]), np.append(ys, ys[0])])
    return W.Geometry(W.POLYGON, [ring])


def _pip_scalar(px, py, rings):
    """Textbook crossing-number loop — the independent referee."""
    inside = False
    for ring in rings:
        for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
            if (y1 > py) != (y2 > py):
                xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
                if px < xint:
                    inside = not inside
    return inside


def test_kernel_matches_scalar_reference():
    polys = [_star_polygon(0, 0, 5), _star_polygon(2, -1, 3)]
    # donut: point in the hole must be OUTSIDE
    outer = np.array(
        [[-4, -4], [4, -4], [4, 4], [-4, 4], [-4, -4]], dtype=float
    )
    inner = np.array(
        [[-1, -1], [1, -1], [1, 1], [-1, 1], [-1, -1]], dtype=float
    )
    polys.append(W.Geometry(W.POLYGON, [outer, inner]))
    px = RNG.uniform(-6, 6, 500)
    py = RNG.uniform(-6, 6, 500)
    for g in polys:
        rings = geometry_rings(g)
        got = points_in_edges(px, py, *ring_edges(rings))
        exp = np.array(
            [_pip_scalar(x, y, rings) for x, y in zip(px, py)]
        )
        assert (got == exp).all()


def test_kernel_donut_and_multipolygon_semantics():
    outer = np.array(
        [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float
    )
    hole = np.array(
        [[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]], dtype=float
    )
    donut = W.Geometry(W.POLYGON, [outer, hole])
    px = np.array([5.0, 1.0, 11.0, 2.0])
    py = np.array([5.0, 1.0, 5.0, 5.0])
    got = points_in_wkb(px, py, donut.to_wkb())
    # center is in the hole (outside); 2.0 is in the ring between
    # outer boundary and hole (inside)
    assert got.tolist() == [False, True, False, True]

    far = np.array(
        [[20, 20], [22, 20], [22, 22], [20, 22], [20, 20]], dtype=float
    )
    multi = W.Geometry(W.MULTIPOLYGON, [[outer, hole], [far]])
    px2 = np.array([5.0, 21.0, 1.0, 15.0])
    py2 = np.array([5.0, 21.0, 1.0, 15.0])
    assert points_in_wkb(px2, py2, multi.to_wkb()).tolist() == [
        False, True, True, False,
    ]


def test_kernel_rejects_non_polygons():
    with pytest.raises(ValueError, match="Polygon"):
        geometry_rings(W.point(1.0, 2.0))


def _brute_force(pts_pdf, polys_pdf):
    pairs = set()
    for _, p in polys_pdf.iterrows():
        inside = points_in_wkb(
            pts_pdf["x"].values, pts_pdf["y"].values, p["geometry_wkb"]
        )
        for qid in pts_pdf["point_id"].values[inside]:
            pairs.add((int(qid), int(p["poly_id"])))
    return pairs


@pytest.fixture(scope="module")
def join_case():
    n_pts = 3000
    pts = pd.DataFrame(
        {
            "point_id": np.arange(n_pts),
            "x": RNG.uniform(-50, 50, n_pts),
            "y": RNG.uniform(-50, 50, n_pts),
        }
    )
    geoms = [
        _star_polygon(RNG.uniform(-40, 40), RNG.uniform(-40, 40),
                      RNG.uniform(2, 12))
        for _ in range(25)
    ]
    # one donut + one multipolygon in the mix
    outer = np.array(
        [[-30, -30], [-10, -30], [-10, -10], [-30, -10], [-30, -30]],
        dtype=float,
    )
    hole = np.array(
        [[-25, -25], [-15, -25], [-15, -15], [-25, -15], [-25, -25]],
        dtype=float,
    )
    geoms.append(W.Geometry(W.POLYGON, [outer, hole]))
    far = np.array(
        [[30, 30], [45, 30], [45, 45], [30, 45], [30, 30]], dtype=float
    )
    geoms.append(W.Geometry(W.MULTIPOLYGON, [[outer, hole], [far]]))
    polys = pd.DataFrame(
        {
            "poly_id": np.arange(len(geoms)),
            "geometry_wkb": [g.to_wkb() for g in geoms],
        }
    )
    return pts, polys


@pytest.mark.parametrize(
    "cell_size,grid",
    [
        (4.0, "square"),
        (17.0, "square"),
        (100.0, "square"),
        (4.0, "hex"),
        (17.0, "hex"),
        (None, "hex"),
    ],
)
def test_join_matches_brute_force(spark, join_case, cell_size, grid):
    """The tile-bucketed candidate join + exact refinement equals the
    all-pairs answer for any bucketing granularity AND either grid
    scheme (cell_size/grid only affect the plan, never the result —
    grid='hex' buckets through the aperture-7 index instead of the
    axis-aligned grid)."""
    pts, polys = join_case
    got = points_in_polygons(
        spark.createDataFrame(pts).repartition(7),
        spark.createDataFrame(polys),
        cell_size=cell_size,
        grid=grid,
    ).collect()
    got_pairs = {(int(r["point_id"]), int(r["poly_id"])) for r in got}
    assert len(got) == len(got_pairs)  # each pair exactly once
    assert got_pairs == _brute_force(pts, polys)


@pytest.mark.parametrize("grid", ["square", "hex"])
def test_join_plan_has_no_cartesian(spark, join_case, grid):
    pts, polys = join_case
    df = points_in_polygons(
        spark.createDataFrame(pts),
        spark.createDataFrame(polys),
        cell_size=10.0,
        grid=grid,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    with pytest.raises(ValueError, match="grid"):
        points_in_polygons(
            spark.createDataFrame(pts),
            spark.createDataFrame(polys),
            grid="triangle",
        )


def test_join_empty_and_validation(spark, join_case):
    pts, polys = join_case
    empty = points_in_polygons(
        spark.createDataFrame(
            pts.head(0), schema="point_id long, x double, y double"
        ),
        spark.createDataFrame(polys),
        cell_size=10.0,
    )
    assert empty.count() == 0
    with pytest.raises(ValueError, match="cell_size"):
        points_in_polygons(
            spark.createDataFrame(pts), spark.createDataFrame(polys),
            cell_size=0.0,
        )


def _brute_force_radius(pts_pdf, q_pdf, r):
    out = set()
    for _, q in q_pdf.iterrows():
        d2 = (pts_pdf["x"].values - q["qx"]) ** 2 + (
            pts_pdf["y"].values - q["qy"]) ** 2
        for pid in pts_pdf["point_id"].values[d2 <= r * r]:
            out.add((int(pid), int(q["query_id"])))
    return out


@pytest.fixture(scope="module")
def radius_case():
    n = 4000
    pts = pd.DataFrame(
        {
            "point_id": np.arange(n),
            "x": RNG.uniform(-50, 50, n),
            "y": RNG.uniform(-50, 50, n),
        }
    )
    qs = pd.DataFrame(
        {
            "query_id": np.arange(30),
            "qx": RNG.uniform(-45, 45, 30),
            "qy": RNG.uniform(-45, 45, 30),
        }
    )
    return pts, qs


@pytest.mark.parametrize("cell_size", [None, 2.0, 31.0])
def test_radius_join_matches_brute_force(spark, radius_case, cell_size):
    from geocube_spark.functions.spatial import points_within_distance

    pts, qs = radius_case
    r = 6.5
    got = points_within_distance(
        spark.createDataFrame(pts).repartition(5),
        spark.createDataFrame(qs),
        radius=r, cell_size=cell_size,
    ).collect()
    pairs = {(int(x["point_id"]), int(x["query_id"])) for x in got}
    assert len(pairs) == len(got)
    assert pairs == _brute_force_radius(pts, qs, r)
    # dist column is the true euclidean distance
    by_pair = {(int(x["point_id"]), int(x["query_id"])): x["dist"]
               for x in got}
    p0, q0 = next(iter(pairs))
    px = float(pts.loc[pts.point_id == p0, "x"].iloc[0])
    py = float(pts.loc[pts.point_id == p0, "y"].iloc[0])
    qx = float(qs.loc[qs.query_id == q0, "qx"].iloc[0])
    qy = float(qs.loc[qs.query_id == q0, "qy"].iloc[0])
    assert by_pair[(p0, q0)] == pytest.approx(
        np.hypot(px - qx, py - qy), rel=1e-12
    )


def test_radius_join_is_pure_jvm_and_no_cartesian(spark, radius_case):
    from geocube_spark.functions.spatial import points_within_distance

    pts, qs = radius_case
    df = points_within_distance(
        spark.createDataFrame(pts), spark.createDataFrame(qs),
        radius=5.0,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the whole operator compiles to JVM expressions - no Python eval
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_radius_join_validation(spark, radius_case):
    from geocube_spark.functions.spatial import points_within_distance

    pts, qs = radius_case
    with pytest.raises(ValueError, match="radius"):
        points_within_distance(
            spark.createDataFrame(pts), spark.createDataFrame(qs),
            radius=-1.0,
        )


def _brute_force_knn(pts_pdf, q_pdf, k):
    rows = set()
    for _, q in q_pdf.iterrows():
        d = np.hypot(pts_pdf["x"].values - q["qx"],
                     pts_pdf["y"].values - q["qy"])
        order = np.lexsort((pts_pdf["point_id"].values, d))[:k]
        for rank, idx in enumerate(order, 1):
            rows.add((int(q["query_id"]),
                      int(pts_pdf["point_id"].values[idx]), rank))
    return rows


@pytest.mark.parametrize("r0", [0.5, 4.0, 1000.0])
def test_knn_join_matches_brute_force(spark, radius_case, r0):
    """Exact for any initial radius: tiny (many doubling rounds),
    moderate, and huge (one round, everything a candidate)."""
    from geocube_spark.functions.spatial import knn_join

    pts, qs = radius_case
    got = knn_join(
        spark.createDataFrame(pts).repartition(5),
        spark.createDataFrame(qs),
        k=5, initial_radius=r0,
    ).collect()
    got_rows = {(int(r["query_id"]), int(r["point_id"]), int(r["rank"]))
                for r in got}
    assert got_rows == _brute_force_knn(pts, qs, 5)
    # dist is consistent with rank ordering
    by_q = {}
    for r in got:
        by_q.setdefault(int(r["query_id"]), []).append(
            (int(r["rank"]), float(r["dist"])))
    for ranks in by_q.values():
        ranks.sort()
        ds = [d for _, d in ranks]
        assert ds == sorted(ds)


def test_knn_join_small_corpus_leftovers(spark):
    """Fewer corpus points than k: every corpus point comes back once
    per query instead of looping forever."""
    from geocube_spark.functions.spatial import knn_join

    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": [1, 2], "x": [0.0, 1.0],
                      "y": [0.0, 0.0]})
    )
    qs = spark.createDataFrame(
        pd.DataFrame({"query_id": [7], "qx": [0.2], "qy": [0.0]})
    )
    got = knn_join(pts, qs, k=5, initial_radius=0.5, max_iter=6)
    rows = sorted(
        (int(r["rank"]), int(r["point_id"])) for r in got.collect()
    )
    assert rows == [(1, 1), (2, 2)]


def test_knn_join_validation(spark, radius_case):
    from geocube_spark.functions.spatial import knn_join

    pts, qs = radius_case
    with pytest.raises(ValueError, match="k must"):
        knn_join(spark.createDataFrame(pts), spark.createDataFrame(qs),
                 k=0, initial_radius=1.0)
    with pytest.raises(ValueError, match="initial_radius"):
        knn_join(spark.createDataFrame(pts), spark.createDataFrame(qs),
                 k=3, initial_radius=0.0)


# ---------------------------------------------------------------------------
# geometry measures (area / perimeter / centroid)
# ---------------------------------------------------------------------------

def _measures_scalar(geom):
    """Scalar shoelace referee over the Geometry object."""
    if geom.geom_type == W.POLYGON:
        parts = [geom.parts]
    else:
        parts = list(geom.parts)
    area = perim = sx = sy = 0.0
    for rings in parts:
        for j, ring in enumerate(rings):
            r = np.asarray(ring, dtype=float)
            xr, yr = r[:, 0], r[:, 1]
            cross = xr[:-1] * yr[1:] - xr[1:] * yr[:-1]
            a = 0.5 * cross.sum()
            role = 1.0 if j == 0 else -1.0
            f = role * np.sign(a) if a != 0 else 0.0
            area += role * abs(a)
            perim += np.hypot(np.diff(xr), np.diff(yr)).sum()
            sx += f * ((xr[:-1] + xr[1:]) * cross).sum()
            sy += f * ((yr[:-1] + yr[1:]) * cross).sum()
    return area, perim, sx / (6 * area), sy / (6 * area)


def test_measures_kernel_matches_scalar_reference():
    from geocube_spark.geometry.measures import polygon_measures

    geoms = [_star_polygon(RNG.uniform(-20, 20), RNG.uniform(-20, 20),
                           RNG.uniform(1, 8)) for _ in range(40)]
    # donut with a REVERSED outer ring (winding must not matter)
    outer = np.array(
        [[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]], dtype=float
    )
    hole = np.array(
        [[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]], dtype=float
    )
    geoms.append(W.Geometry(W.POLYGON, [outer, hole]))
    far = np.array(
        [[20, 20], [24, 20], [24, 24], [20, 24], [20, 20]], dtype=float
    )
    geoms.append(W.Geometry(W.MULTIPOLYGON, [[outer, hole], [far]]))
    blobs = [g.to_wkb() for g in geoms]
    area, perim, cx, cy, npts = polygon_measures(blobs)
    for i, g in enumerate(geoms):
        ea, ep, ex, ey = _measures_scalar(g)
        assert area[i] == pytest.approx(ea, rel=1e-12)
        assert perim[i] == pytest.approx(ep, rel=1e-12)
        assert cx[i] == pytest.approx(ex, rel=1e-9)
        assert cy[i] == pytest.approx(ey, rel=1e-9)
    # closed forms for the donut: 100 - 16 area, 40 + 16 perimeter
    assert area[-2] == pytest.approx(84.0)
    assert perim[-2] == pytest.approx(56.0)
    assert (cx[-2], cy[-2]) == (pytest.approx(5.0), pytest.approx(5.0))
    # non-polygon -> NaN, None -> NaN
    a2, p2, _, _, n2 = polygon_measures(
        [W.point(1, 2).to_wkb(), None, blobs[0]]
    )
    assert np.isnan(a2[0]) and np.isnan(a2[1]) and a2[2] == area[0]


def test_with_geometry_measures_spark(spark):
    from geocube_spark.functions.spatial import with_geometry_measures
    from geocube_spark.geometry.measures import polygon_measures

    geoms = [_star_polygon(0, 0, 3 + i * 0.1) for i in range(50)]
    pdf = pd.DataFrame(
        {"gid": np.arange(50),
         "geometry_wkb": [g.to_wkb() for g in geoms]}
    )
    out = (
        with_geometry_measures(spark.createDataFrame(pdf).repartition(4))
        .orderBy("gid")
        .toPandas()
    )
    area, perim, cx, cy, npts = polygon_measures(
        pdf["geometry_wkb"].values
    )
    np.testing.assert_allclose(out["area"].values, area, rtol=1e-12)
    np.testing.assert_allclose(out["perimeter"].values, perim,
                               rtol=1e-12)
    np.testing.assert_allclose(out["centroid_x"].values, cx, rtol=1e-9)
    assert out["n_points"].values.tolist() == npts.tolist()


# ---------------------------------------------------------------------------
# polygon x polygon intersects
# ---------------------------------------------------------------------------

def _convex_poly(cx, cy, r, n=8, rot=0.0):
    th = rot + np.linspace(0, 2 * np.pi, n, endpoint=False)
    xs, ys = cx + r * np.cos(th), cy + r * np.sin(th)
    ring = np.column_stack([np.append(xs, xs[0]), np.append(ys, ys[0])])
    return W.Geometry(W.POLYGON, [ring])


def _sat_intersects(ga, gb):
    """Separating-axis referee for CONVEX polygons (independent
    logic: no shared code with the kernel)."""
    pa = np.asarray(ga.parts[0])[:-1]
    pb = np.asarray(gb.parts[0])[:-1]
    for poly in (pa, pb):
        for i in range(len(poly)):
            edge = poly[(i + 1) % len(poly)] - poly[i]
            axis = np.array([-edge[1], edge[0]])
            a0, a1 = (pa @ axis).min(), (pa @ axis).max()
            b0, b1 = (pb @ axis).min(), (pb @ axis).max()
            if a1 < b0 or b1 < a0:
                return False
    return True


def test_polygons_intersect_vs_sat_referee():
    from geocube_spark.kernels.pip import geometry_rings, polygons_intersect

    rng = np.random.default_rng(7)
    agree = 0
    for _ in range(300):
        ga = _convex_poly(rng.uniform(-10, 10), rng.uniform(-10, 10),
                          rng.uniform(1, 6), rot=rng.uniform(0, 3))
        gb = _convex_poly(rng.uniform(-10, 10), rng.uniform(-10, 10),
                          rng.uniform(1, 6), rot=rng.uniform(0, 3))
        got = polygons_intersect(geometry_rings(ga), geometry_rings(gb))
        assert got == _sat_intersects(ga, gb)
        agree += 1
    assert agree == 300


def test_polygons_intersect_touch_and_hole_semantics():
    from geocube_spark.kernels.pip import geometry_rings as GR
    from geocube_spark.kernels.pip import polygons_intersect as PI

    def box(x0, y0, x1, y1, holes=()):
        ring = np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
            dtype=float,
        )
        return W.Geometry(W.POLYGON, [ring, *holes])

    a = box(0, 0, 10, 10)
    assert PI(GR(a), GR(box(20, 20, 30, 30))) is False  # disjoint
    assert PI(GR(a), GR(box(5, 5, 15, 15))) is True     # overlap
    assert PI(GR(a), GR(box(10, 0, 20, 10))) is True    # edge touch
    assert PI(GR(a), GR(box(10, 10, 20, 20))) is True   # corner touch
    assert PI(GR(a), GR(box(2, 2, 8, 8))) is True       # containment
    assert PI(GR(a), GR(a)) is True                     # identical
    hole = np.array(
        [[2, 2], [8, 2], [8, 8], [2, 8], [2, 2]], dtype=float
    )
    donut = box(0, 0, 10, 10, holes=(hole,))
    assert PI(GR(donut), GR(box(3, 3, 7, 7))) is False  # in the hole
    assert PI(GR(donut), GR(box(3, 3, 9, 7))) is True   # crosses hole
    assert PI(GR(donut), GR(box(-5, -5, 15, 15))) is True  # contains


def test_polygons_intersect_multipart_containment():
    """Regression (round-3 advice): a MultiPolygon whose NON-FIRST
    part lies wholly inside the other polygon (no boundary contact)
    must intersect — the containment probe has to test a vertex per
    connected part, not just the first vertex of the first ring."""
    from geocube_spark.kernels.pip import geometry_rings as GR
    from geocube_spark.kernels.pip import polygons_intersect as PI

    def ring(x0, y0, x1, y1):
        return np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
            dtype=float,
        )

    b = W.Geometry(W.POLYGON, [ring(0, 0, 10, 10)])
    # part 1 far away, part 2 wholly inside b
    mp = W.multipolygon([[ring(100, 100, 110, 110)], [ring(3, 3, 7, 7)]])
    assert PI(GR(mp), GR(b)) is True
    assert PI(GR(b), GR(mp)) is True
    # both parts outside: still disjoint
    mp2 = W.multipolygon(
        [[ring(100, 100, 110, 110)], [ring(-50, -50, -40, -40)]]
    )
    assert PI(GR(mp2), GR(b)) is False
    assert PI(GR(b), GR(mp2)) is False
    # part 2 inside the other's HOLE: not intersecting
    donut = W.Geometry(
        W.POLYGON, [ring(0, 0, 10, 10), ring(2, 2, 8, 8)]
    )
    mp3 = W.multipolygon([[ring(100, 100, 110, 110)], [ring(4, 4, 6, 6)]])
    assert PI(GR(mp3), GR(donut)) is False
    assert PI(GR(donut), GR(mp3)) is False


def test_polygons_intersect_join_matches_brute_force(spark):
    from geocube_spark.functions.spatial import polygons_intersect_join
    from geocube_spark.kernels.pip import geometry_rings, polygons_intersect

    rng = np.random.default_rng(13)
    mk = lambda: _convex_poly(rng.uniform(-40, 40), rng.uniform(-40, 40),
                              rng.uniform(1, 14), rot=rng.uniform(0, 3))
    la = [mk() for _ in range(40)]
    rb = [mk() for _ in range(35)]
    lpdf = pd.DataFrame({"left_id": np.arange(40),
                         "geometry_wkb": [g.to_wkb() for g in la]})
    rpdf = pd.DataFrame({"right_id": np.arange(35),
                         "geometry_wkb": [g.to_wkb() for g in rb]})
    exp = {
        (i, j)
        for i, ga in enumerate(la)
        for j, gb in enumerate(rb)
        if polygons_intersect(geometry_rings(ga), geometry_rings(gb))
    }
    for cs in (5.0, 23.0):
        got = polygons_intersect_join(
            spark.createDataFrame(lpdf).repartition(4),
            spark.createDataFrame(rpdf),
            cell_size=cs,
        ).collect()
        pairs = [(int(r["left_id"]), int(r["right_id"])) for r in got]
        assert len(pairs) == len(set(pairs))  # reporting-cell dedup
        assert set(pairs) == exp


def test_measures_lines():
    from geocube_spark.geometry.measures import polygon_measures

    # batched simple linestrings + a scalar-path multilinestring
    l1 = W.Geometry(W.LINESTRING, np.array(
        [[0, 0], [3, 4], [3, 10]], dtype=float))
    l2 = W.Geometry(W.LINESTRING, np.array(
        [[1, 1], [4, 5], [4, 11]], dtype=float))
    ml = W.Geometry(W.MULTILINESTRING, [
        np.array([[0, 0], [2, 0]], dtype=float),
        np.array([[10, 0], [10, 4]], dtype=float),
    ])
    area, perim, cx, cy, npts = polygon_measures(
        [l1.to_wkb(), l2.to_wkb(), ml.to_wkb()]
    )
    assert area.tolist() == [0.0, 0.0, 0.0]
    np.testing.assert_allclose(perim, [11.0, 11.0, 6.0], rtol=1e-12)
    # l1: segments len 5 (mid 1.5,2) and 6 (mid 3,7) -> weighted
    np.testing.assert_allclose(
        cx[0], (5 * 1.5 + 6 * 3.0) / 11.0, rtol=1e-12)
    np.testing.assert_allclose(
        cy[0], (5 * 2.0 + 6 * 7.0) / 11.0, rtol=1e-12)
    # ml: centroid weighted across parts: (2*1 + 4*10)/6, (0 + 4*2)/6
    np.testing.assert_allclose(cx[2], (2 * 1.0 + 4 * 10.0) / 6.0)
    np.testing.assert_allclose(cy[2], (2 * 0.0 + 4 * 2.0) / 6.0)
    assert npts.tolist() == [3, 3, 4]


def _haversine_np(lon1, lat1, lon2, lat2, R=6_371_008.8):
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dphi = np.radians(lat1 - lat2)
    dlam = np.radians(lon1 - lon2)
    a = (np.sin(dphi / 2) ** 2
         + np.cos(p1) * np.cos(p2) * np.sin(dlam / 2) ** 2)
    return 2 * R * np.arcsin(np.minimum(1.0, np.sqrt(a)))


def test_haversine_join_matches_brute_force(spark):
    from geocube_spark.functions.spatial import haversine_join

    rng = np.random.default_rng(21)
    n = 5000
    # global points incl. high latitudes and the antimeridian strip
    lon = np.concatenate([rng.uniform(-180, 180, n - 200),
                          rng.uniform(179.0, 180.0, 100),
                          rng.uniform(-180.0, -179.0, 100)])
    lat = np.concatenate([np.degrees(np.arcsin(
        rng.uniform(-1, 1, n - 200))),
        rng.uniform(-60, 60, 200)])
    pts = pd.DataFrame({"point_id": np.arange(n), "lon": lon,
                        "lat": lat})
    qs = pd.DataFrame({
        "query_id": np.arange(40),
        "qlon": np.concatenate([rng.uniform(-180, 180, 36),
                                [179.95, -179.95, 0.0, 10.0]]),
        "qlat": np.concatenate([rng.uniform(-85, 85, 36),
                                [-17.0, -17.1, 89.2, 0.0]]),
    })
    r = 400_000.0  # 400 km
    got = haversine_join(
        spark.createDataFrame(pts).repartition(5),
        spark.createDataFrame(qs), radius_m=r,
    ).collect()
    pairs = {(int(x["point_id"]), int(x["query_id"])) for x in got}
    assert len(pairs) == len(got)  # no duplicate pairs
    exp = set()
    for _, q in qs.iterrows():
        d = _haversine_np(lon, lat, q["qlon"], q["qlat"])
        for pid in pts["point_id"].values[d <= r]:
            exp.add((int(pid), int(q["query_id"])))
    assert pairs == exp
    assert len(exp) > 50
    # antimeridian coverage is real: the 179.95E query matches
    # points on the -180 side
    west_side = {p for (p, q) in pairs if q == 36 and lon[p] < -179.0}
    assert len(west_side) > 0
    # dist_m is the true great-circle distance
    x0 = got[0]
    d0 = _haversine_np(lon[int(x0["point_id"])],
                       lat[int(x0["point_id"])],
                       float(qs.loc[int(x0["query_id"]), "qlon"]),
                       float(qs.loc[int(x0["query_id"]), "qlat"]))
    assert x0["dist_m"] == pytest.approx(d0, rel=1e-12)


def test_haversine_join_is_pure_jvm(spark):
    from geocube_spark.functions.spatial import haversine_join

    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": [1], "lon": [0.0], "lat": [0.0]}))
    qs = spark.createDataFrame(
        pd.DataFrame({"query_id": [1], "qlon": [0.1], "qlat": [0.1]}))
    df = haversine_join(pts, qs, radius_m=50_000.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert "CartesianProduct" not in plan
    with pytest.raises(ValueError, match="radius_m"):
        haversine_join(pts, qs, radius_m=0.0)


def test_knn_join_haversine_matches_brute_force(spark):
    from geocube_spark.functions.spatial import knn_join

    rng = np.random.default_rng(33)
    n = 3000
    lon = np.concatenate([rng.uniform(-180, 180, n - 100),
                          rng.uniform(178.5, 180.0, 50),
                          rng.uniform(-180.0, -178.5, 50)])
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    pts = pd.DataFrame({"point_id": np.arange(n), "lon": lon,
                        "lat": lat})
    qs = pd.DataFrame({
        "query_id": np.arange(12),
        "qlon": np.concatenate([rng.uniform(-180, 180, 10),
                                [179.7, -179.7]]),
        "qlat": np.concatenate([rng.uniform(-80, 80, 10),
                                [5.0, 5.1]]),
    })
    got = knn_join(
        spark.createDataFrame(pts).repartition(4),
        spark.createDataFrame(qs),
        k=4, initial_radius=200_000.0, metric="haversine",
        x_col="lon", y_col="lat", qx_col="qlon", qy_col="qlat",
    ).collect()
    got_rows = {(int(r["query_id"]), int(r["point_id"]), int(r["rank"]))
                for r in got}
    exp = set()
    for _, q in qs.iterrows():
        d = _haversine_np(lon, lat, q["qlon"], q["qlat"])
        order = np.lexsort((pts["point_id"].values, d))[:4]
        for rank, idx in enumerate(order, 1):
            exp.add((int(q["query_id"]),
                     int(pts["point_id"].values[idx]), rank))
    assert got_rows == exp
    with pytest.raises(ValueError, match="metric"):
        knn_join(spark.createDataFrame(pts), spark.createDataFrame(qs),
                 k=2, initial_radius=1.0, metric="chebyshev",
                 x_col="lon", y_col="lat", qx_col="qlon",
                 qy_col="qlat")


def test_vectorize_output_feeds_vector_analytics(spark, sf_dir):
    """Composition: burn -> vectorize (raster->vector) -> geometry
    measures + simplify run directly on the vectorize output — the
    vector analytics accept the engine's own vector tables."""
    from geocube_spark.operators.geocube_queries import (
        WORLD_GEOM, _event_vector_df,
    )
    from geocube_spark.cube import make_geocube
    from geocube_spark.functions.spatial import (
        simplify_geometries, with_geometry_measures,
    )
    from geocube_spark.vector import vectorize

    cube = make_geocube(
        _event_vector_df(spark, sf_dir), measurements=["value"],
        geom=WORLD_GEOM, resolution=(-1.0, 1.0), fill=-9999.0,
        merge_alg="replace", tile_size=64,
    )
    vec = vectorize(cube, measurement="value")
    assert "geometry_wkb" in vec.columns
    measured = with_geometry_measures(vec)
    rows = measured.limit(200).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["area"] > 0 and r["perimeter"] > 0
    simp = simplify_geometries(vec, 0.5)
    n_in = vec.count()
    assert simp.count() == n_in  # tolerance < cell size: nothing collapses


def test_join_correct_under_shuffle_plan(spark, join_case):
    """With broadcast disabled the candidate join becomes a shuffle
    hash/sort-merge join (the big-polygon-table regime at scale) —
    results must be identical to the broadcast plan."""
    pts, polys = join_case
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = points_in_polygons(
            spark.createDataFrame(pts).repartition(7),
            spark.createDataFrame(polys),
            cell_size=10.0,
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert "CartesianProduct" not in plan
        got = {(int(r["point_id"]), int(r["poly_id"]))
               for r in df.collect()}
        assert got == _brute_force(pts, polys)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# ---------------------------------------------------------------------------
# Round-4: shuffle hygiene + adversarial cell_size (verdict items 3 & 7)
# ---------------------------------------------------------------------------


def _tx_exchange_blocks(df):
    """Formatted-explain blocks for Exchange nodes that partition on
    the join-grid key (__tx) — the cover-side shuffles."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    blocks = plan.split("\n(")
    return [
        b for b in blocks
        if b.split("\n", 1)[0].endswith("Exchange")
        and "hashpartitioning(__tx" in b
    ]


def test_cover_shuffle_carries_no_wkb(spark, join_case):
    """Scale guard: the cell-cover explode must shuffle only
    (id, cell[, envelope corner]) — never the geometry blob.  A
    10k-vertex coastline covering 1,000 cells would otherwise ship
    its WKB 1,000x through the exchange (round-3 verdict item 3)."""
    pts, polys = join_case
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = points_in_polygons(
            spark.createDataFrame(pts),
            spark.createDataFrame(polys),
            cell_size=0.5,  # adversarially small: ~100s cells/envelope
        )
        blocks = _tx_exchange_blocks(df)
        assert blocks, "expected a shuffle on the cell key"
        for b in blocks:
            assert "__wkb" not in b and "geometry_wkb" not in b

        from geocube_spark.functions.spatial import polygons_intersect_join
        pj = polygons_intersect_join(
            spark.createDataFrame(polys).toDF("left_id", "geometry_wkb"),
            spark.createDataFrame(polys).toDF("right_id", "geometry_wkb"),
            cell_size=0.5,
        )
        for b in _tx_exchange_blocks(pj):
            assert "__wkb" not in b and "geometry_wkb" not in b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.mark.parametrize("cell_size", [0.25, 3.0, 300.0, None])
def test_pip_join_adversarial_cell_size(spark, join_case, cell_size):
    """cell_size is a plan knob, never a semantics knob: results are
    identical under absurdly small cells (huge candidate fan-out on
    the polygon side), absurdly large cells (one bucket), and the
    auto-derived median-envelope default."""
    pts, polys = join_case
    got = points_in_polygons(
        spark.createDataFrame(pts).repartition(5),
        spark.createDataFrame(polys),
        cell_size=cell_size,
    ).collect()
    pairs = {(int(r["point_id"]), int(r["poly_id"])) for r in got}
    assert len(got) == len(pairs)
    assert pairs == _brute_force(pts, polys)


@pytest.mark.parametrize("cell_size", [0.5, 4.0, 500.0, None])
def test_intersect_join_adversarial_cell_size(spark, cell_size):
    from geocube_spark.functions.spatial import polygons_intersect_join
    from geocube_spark.kernels.pip import polygons_intersect

    rng = np.random.default_rng(1234)
    lg = [_star_polygon(rng.uniform(-20, 20), rng.uniform(-20, 20),
                        rng.uniform(0.5, 8), rng=rng) for _ in range(18)]
    rg = [_star_polygon(rng.uniform(-20, 20), rng.uniform(-20, 20),
                        rng.uniform(0.5, 8), rng=rng) for _ in range(18)]
    left = pd.DataFrame({"left_id": np.arange(len(lg)),
                         "geometry_wkb": [g.to_wkb() for g in lg]})
    right = pd.DataFrame({"right_id": np.arange(len(rg)),
                          "geometry_wkb": [g.to_wkb() for g in rg]})
    want = {
        (i, j)
        for i, ga in enumerate(lg) for j, gb in enumerate(rg)
        if polygons_intersect(geometry_rings(ga), geometry_rings(gb))
    }
    rows = polygons_intersect_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        cell_size=cell_size,
    ).collect()
    got = {(int(r["left_id"]), int(r["right_id"])) for r in rows}
    assert len(rows) == len(got)  # reporting-cell dedup exact
    assert got == want


def test_null_geometry_rows_skipped(spark, join_case):
    """geopandas sjoin skips missing geometries; a NULL WKB row must
    not crash the executor (round-3 advice)."""
    pts, polys = join_case
    polys2 = polys.copy()
    polys2.loc[len(polys2)] = {"poly_id": 9999, "geometry_wkb": None}
    got = points_in_polygons(
        spark.createDataFrame(pts),
        spark.createDataFrame(polys2),
        cell_size=10.0,
    ).collect()
    pairs = {(int(r["point_id"]), int(r["poly_id"])) for r in got}
    assert pairs == _brute_force(pts, polys)


def test_knn_join_max_iter_validation(spark):
    from geocube_spark.functions.spatial import knn_join
    pts = pd.DataFrame({"point_id": [1], "x": [0.0], "y": [0.0]})
    qs = pd.DataFrame({"query_id": [1], "qx": [0.0], "qy": [0.0]})
    with pytest.raises(ValueError, match="max_iter"):
        knn_join(spark.createDataFrame(pts), spark.createDataFrame(qs),
                 k=1, initial_radius=1.0, max_iter=0)


def test_knn_join_releases_cached_rounds(spark):
    """knn_join must not leave per-round persisted partitions behind
    once its result is materialized (round-3 verdict item 4)."""
    from geocube_spark.functions.spatial import knn_join

    rng = np.random.default_rng(7)
    pts = pd.DataFrame({
        "point_id": np.arange(500),
        "x": rng.uniform(0, 100, 500),
        "y": rng.uniform(0, 100, 500),
    })
    qs = pd.DataFrame({
        "query_id": np.arange(40),
        "qx": rng.uniform(0, 100, 40),
        "qy": rng.uniform(0, 100, 40),
    })
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = knn_join(
        spark.createDataFrame(pts), spark.createDataFrame(qs),
        k=3, initial_radius=0.5, max_iter=20,
    )
    n = out.count()
    assert n == 40 * 3
    # the forced-multi-round join (tiny initial radius) left no
    # persisted RDDs beyond what existed before, +1 for the result's
    # own localCheckpoint
    after = jsc.getPersistentRDDs().size()
    assert after <= before + 1
