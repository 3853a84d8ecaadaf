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
@settings(max_examples=200, deadline=None)
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


@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
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
@settings(max_examples=100, deadline=None)
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
