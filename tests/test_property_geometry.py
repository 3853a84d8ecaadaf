"""Property-based tests for CRS math and the WKB codec (hypothesis).

The closed-form transverse-Mercator implementation and the pure-numpy
WKB codec are the engine's most numerically-sensitive non-scanline
code; these pin roundtrip identities over randomized inputs.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geocube_spark.geometry import wkb as W
from geocube_spark.geometry.crs import CRS, transform

finite = st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e7, max_value=1e7)


@given(
    st.floats(min_value=-84.0, max_value=84.0),
    st.floats(min_value=-6.0, max_value=6.0),
    st.integers(min_value=1, max_value=60),
)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_utm_roundtrip_property(lat, dlon, zone):
    """forward+inverse TM is the identity to sub-micrometer within a
    zone's +/-6 degree span, any zone, any latitude in UTM range."""
    lon = (zone - 1) * 6 - 180 + 3 + dlon  # zone center +/- 6 deg
    utm = CRS(32600 + zone) if lat >= 0 else CRS(32700 + zone)
    wgs = CRS(4326)
    x, y = transform(wgs, utm, np.array([lon]), np.array([lat]))
    lon2, lat2 = transform(utm, wgs, x, y)
    # longitudes compare modulo 360 (zone edges near the antimeridian
    # legitimately come back on the other wrap)
    dlon_err = ((lon2[0] - lon + 180.0) % 360.0) - 180.0
    assert abs(dlon_err) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9


_NATIONAL_GRIDS = {
    # epsg: (lon range, lat range, roundtrip tolerance in degrees).
    # Datum-shifted CRS (27700) tolerate ~2e-8: the 2D Helmert drops
    # ellipsoidal height, a mm-level roundtrip effect PROJ shares.
    27700: ((-5.5, 1.5), (50.2, 57.5), 1e-7),
    2180: ((14.2, 24.0), (49.1, 54.7), 1e-9),
    25832: ((6.1, 11.9), (47.5, 54.9), 1e-9),
    2154: ((-4.5, 8.0), (42.5, 50.8), 1e-9),
    5070: ((-120.0, -75.0), (25.0, 48.0), 1e-9),
    3035: ((-8.0, 25.0), (36.0, 60.0), 1e-9),
}


@given(
    st.sampled_from(sorted(_NATIONAL_GRIDS)),
    st.floats(min_value=0.0, max_value=1.0),
    st.floats(min_value=0.0, max_value=1.0),
)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_national_grid_roundtrip_property(epsg, fx, fy):
    """National grids (TM incl. non-UTM params + datum shift, LCC 2SP,
    Albers, LAEA) roundtrip through WGS84 within each grid's domain."""
    (lo0, lo1), (la0, la1), tol = _NATIONAL_GRIDS[epsg]
    lon = lo0 + fx * (lo1 - lo0)
    lat = la0 + fy * (la1 - la0)
    c, wgs = CRS(epsg), CRS(4326)
    x, y = transform(wgs, c, np.array([lon]), np.array([lat]))
    lon2, lat2 = transform(c, wgs, x, y)
    assert abs(lon2[0] - lon) < tol
    assert abs(lat2[0] - lat) < tol


def test_osgb_published_example():
    """Projection-core check against the published OS worked example
    (OSGB36 lat 52d39'27.2531\"N lon 1d43'4.5177\"E ->
    E 651409.903 N 313177.270; 'A guide to coordinate systems in
    Great Britain', Ordnance Survey)."""
    from geocube_spark.geometry.crs import CRS_DEFS, _tm_forward

    d = CRS_DEFS[27700]
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    e, n = _tm_forward(lon, lat, d["lon0"], d["ellps"])
    _, n0 = _tm_forward(d["lon0"], d["lat0"], d["lon0"], d["ellps"])
    E = d["fe"] + d["k0"] * e
    N = d["fn"] + d["k0"] * (n - n0)
    assert abs(E - 651409.903) < 0.01
    assert abs(N - 313177.270) < 0.01


def test_projection_natural_origins():
    """Forward transforms hit each projection's published origin."""
    wgs = CRS(4326)
    x, y = transform(wgs, CRS(2154), np.array([3.0]), np.array([46.5]))
    assert abs(x[0] - 700000) < 0.5 and abs(y[0] - 6600000) < 0.5
    x, y = transform(wgs, CRS(5070), np.array([-96.0]), np.array([23.0]))
    assert abs(x[0]) < 0.5 and abs(y[0]) < 0.5
    x, y = transform(wgs, CRS(3035), np.array([10.0]), np.array([52.0]))
    assert abs(x[0] - 4321000) < 0.5 and abs(y[0] - 3210000) < 0.5


def test_unsupported_crs_raises_with_guidance():
    import pytest

    with pytest.raises(ValueError, match="epsg_table"):
        CRS(9999)._to_lonlat(np.array([0.0]), np.array([0.0]))


@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=8))
@settings(max_examples=100, deadline=None, derandomize=True)
def test_wkb_multipoint_roundtrip(points):
    g = W.Geometry(
        W.MULTIPOINT,
        [np.asarray([p], dtype=np.float64) for p in points],
    )
    g2 = W.loads(g.to_wkb())
    got = sorted(map(tuple, g2.points()))
    want = sorted((float(a), float(b)) for a, b in points)
    assert got == want


@given(
    st.lists(st.tuples(finite, finite), min_size=3, max_size=10),
    st.floats(min_value=-1e3, max_value=1e3),
    st.floats(min_value=-1e3, max_value=1e3),
)
@settings(max_examples=100, deadline=None, derandomize=True)
def test_wkb_polygon_roundtrip_and_transform(pts, dx, dy):
    ring = np.asarray(pts + pts[:1], dtype=np.float64)
    g = W.polygon(ring)
    g2 = W.loads(g.to_wkb())
    np.testing.assert_array_equal(g2.parts[0], ring)
    moved = g2.transform(lambda x, y: (x + dx, y + dy))
    back = moved.transform(lambda x, y: (x - dx, y - dy))
    np.testing.assert_allclose(back.parts[0], ring, atol=1e-6)
    # batch encode/parse agrees with the scalar path
    mask, groups = W.batch_parse_simple_polygons([g.to_wkb()])
    assert mask.all()
    np.testing.assert_array_equal(groups[0][1][0], ring)
    [re] = W.encode_simple_polygons(ring[None, :, :])
    assert re == g.to_wkb()


# ---------------------------------------------------------------------------
# WKT codec properties
# ---------------------------------------------------------------------------

from geocube_spark.geometry import wkt as WT  # noqa: E402

_coord = st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e15, max_value=1e15)


def _ring(draw, n):
    pts = [(draw(_coord), draw(_coord)) for _ in range(n)]
    pts.append(pts[0])
    return pts


@st.composite
def _geometries(draw):
    kind = draw(st.integers(min_value=0, max_value=4))
    if kind == 0:
        return W.point(draw(_coord), draw(_coord))
    if kind == 1:
        n = draw(st.integers(min_value=2, max_value=8))
        return W.linestring([(draw(_coord), draw(_coord))
                             for _ in range(n)])
    if kind == 2:
        n = draw(st.integers(min_value=3, max_value=8))
        holes = [
            _ring(draw, draw(st.integers(min_value=3, max_value=5)))
            for _ in range(draw(st.integers(min_value=0, max_value=2)))
        ]
        return W.polygon(_ring(draw, n), holes)
    if kind == 3:
        n = draw(st.integers(min_value=1, max_value=6))
        return W.Geometry(
            W.MULTIPOINT,
            np.array([[draw(_coord), draw(_coord)] for _ in range(n)]),
        )
    polys = [
        [np.array(_ring(draw, draw(st.integers(min_value=3, max_value=6))))]
        for _ in range(draw(st.integers(min_value=1, max_value=3)))
    ]
    return W.Geometry(W.MULTIPOLYGON, polys)


@given(_geometries())
@settings(max_examples=150, deadline=None, derandomize=True)
def test_wkt_roundtrip_property(g):
    """loads(dumps(g)) is coordinate-exact for arbitrary float64
    geometry, and agrees with the WKB codec's view of the same."""
    g2 = WT.loads(WT.dumps(g))
    assert g2.geom_type == g.geom_type
    a = list(g.coord_arrays())
    b = list(g2.coord_arrays())
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        np.testing.assert_array_equal(ra, rb)
    # WKB -> WKT and WKT -> WKB commute
    assert WT.dumps(W.loads(g.to_wkb())) == WT.dumps(g)
    assert WT.loads(WT.dumps(g)).to_wkb() == g.to_wkb()
