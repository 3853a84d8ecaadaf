"""Geodesic (spherical) measures: exact closed-form checks the kernel
does not share arithmetic with, plus hole/multipart structure and the
Spark wrapper plan shape.

The Chamberlain-Duquette excess is EXACT for lon/lat-aligned
rectangles (area = R^2 * dlam * (sin(p2) - sin(p1))), and the
haversine length of a meridian arc is exactly R * dphi — both derived
independently here, so agreement validates the per-edge kernel rather
than replaying it.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocube_spark.geometry import wkb as W
from geocube_spark.geometry.measures import (
    EARTH_RADIUS_M,
    geodesic_measures,
)

R = EARTH_RADIUS_M


def _rect_wkb(lon1, lat1, lon2, lat2, ccw=True):
    ring = [
        (lon1, lat1), (lon2, lat1), (lon2, lat2), (lon1, lat2),
        (lon1, lat1),
    ]
    if not ccw:
        ring = ring[::-1]
    arr = np.asarray([ring], dtype=np.float64)
    return W.encode_simple_polygons(arr)[0]


def _rect_area_exact(lon1, lat1, lon2, lat2):
    dlam = np.radians(lon2 - lon1)
    return R * R * dlam * (np.sin(np.radians(lat2))
                           - np.sin(np.radians(lat1)))


def test_rectangle_matches_spherical_closed_form():
    cases = [
        (0.0, 0.0, 10.0, 10.0),
        (-30.0, 40.0, -20.0, 55.0),
        (100.0, -60.0, 140.0, -50.0),
    ]
    blobs = [_rect_wkb(*c) for c in cases]
    area, perim, npts = geodesic_measures(blobs)
    for i, c in enumerate(cases):
        assert area[i] == pytest.approx(_rect_area_exact(*c), rel=1e-12)
        assert npts[i] == 5
        # meridian sides are exactly R * dphi each
        dphi = np.radians(c[3] - c[1])
        assert perim[i] > 2 * R * dphi  # two meridians + two parallels


def test_winding_is_normalized():
    a1 = geodesic_measures([_rect_wkb(0, 0, 10, 10, ccw=True)])[0][0]
    a2 = geodesic_measures([_rect_wkb(0, 0, 10, 10, ccw=False)])[0][0]
    assert a1 == pytest.approx(a2, rel=1e-15)
    assert a1 > 0


def test_hole_subtracts_and_multipolygon_adds():
    outer = [(0, 0), (20, 0), (20, 20), (0, 20), (0, 0)]
    hole = [(5, 5), (5, 10), (10, 10), (10, 5), (5, 5)]
    structs = [[[np.int64(5), np.int64(5)]]]
    coords = np.asarray(outer + hole, dtype=np.float64)
    holed = W.encode_polygons(structs, coords)[0]
    a_holed = geodesic_measures([holed])[0][0]
    a_outer = _rect_area_exact(0, 0, 20, 20)
    a_hole = _rect_area_exact(5, 5, 10, 10)
    assert a_holed == pytest.approx(a_outer - a_hole, rel=1e-12)

    # two disjoint parts sum
    structs = [[[np.int64(5)], [np.int64(5)]]]
    coords = np.asarray(
        [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0),
         (30, 30), (40, 30), (40, 40), (30, 40), (30, 30)],
        dtype=np.float64,
    )
    multi = W.encode_polygons(structs, coords)[0]
    a_multi = geodesic_measures([multi])[0][0]
    want = _rect_area_exact(0, 0, 10, 10) + _rect_area_exact(
        30, 30, 40, 40
    )
    assert a_multi == pytest.approx(want, rel=1e-12)


def test_meridian_perimeter_exact():
    # degenerate two-point "ring" is invalid; use a thin triangle whose
    # long sides are meridian arcs: perimeter ~ 2 * R * dphi as the
    # base shrinks
    eps = 1e-9
    tri = np.asarray(
        [[(0, 0), (eps, 0), (0, 30), (0, 0)]], dtype=np.float64
    )
    blob = W.encode_simple_polygons(tri)[0]
    perim = geodesic_measures([blob])[1][0]
    assert perim == pytest.approx(2 * R * np.radians(30.0), rel=1e-6)


def test_small_polygon_agrees_with_planar_scaling():
    # a tiny diamond at lat 45: geodesic area ~ planar degree-area
    # scaled by (pi R / 180)^2 * cos(lat)
    r = 0.01
    cx, cy = 7.0, 45.0
    ring = np.asarray(
        [[(cx - r, cy), (cx, cy - r), (cx + r, cy), (cx, cy + r),
          (cx - r, cy)]],
        dtype=np.float64,
    )
    blob = W.encode_simple_polygons(ring)[0]
    area = geodesic_measures([blob])[0][0]
    planar_deg2 = 2 * r * r
    want = planar_deg2 * (np.pi * R / 180.0) ** 2 * np.cos(
        np.radians(cy)
    )
    assert area == pytest.approx(want, rel=1e-3)


def test_non_polygon_rows_are_nan():
    pt = W.points_to_wkb(np.asarray([1.0]), np.asarray([2.0]))[0]
    area, perim, npts = geodesic_measures([pt, None])
    assert np.isnan(area).all() and np.isnan(perim).all()
    assert (npts == 0).all()


def test_spark_wrapper_matches_kernel_and_is_narrow(spark):
    from geocube_spark.functions.spatial import with_geodesic_measures

    blobs = [
        _rect_wkb(0, 0, 10, 10),
        _rect_wkb(-30, 40, -20, 55),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(blobs)],
        "id long, geometry_wkb binary",
    )
    out = with_geodesic_measures(df).orderBy("id").collect()
    karea, kperim, knpts = geodesic_measures(blobs)
    for i, row in enumerate(out):
        assert row["area_m2"] == pytest.approx(karea[i], rel=1e-15)
        assert row["perim_m"] == pytest.approx(kperim[i], rel=1e-15)
        assert row["n_points"] == knpts[i]
    plan = (
        with_geodesic_measures(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
