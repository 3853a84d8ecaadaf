"""CRS front door: WKT1/WKT2/proj4 parameter ingestion.

The reference accepts any pyproj CRS (reference
geocube/geo_utils/geobox.py:92-98, vector_to_cube.py:112-113); round-2
review flagged the registry-only front door as the #1 real-user wall.
These tests pin the parser: a CRS given as TEXT (no registry entry
needed) must reproject through the same closed-form kernels, ship to
executors via its canonical spec string, and drive a full distributed
burn identically to its registry twin.
"""

import numpy as np
import pytest

from geocube_spark.geometry.crs import CRS, transform

WGS = CRS(4326)
LON = np.array([-93.4, -92.1, -93.9])
LAT = np.array([41.8, 42.3, 40.9])

WKT2_26915 = """PROJCRS["NAD83 / UTM zone 15N",
  BASEGEOGCRS["NAD83",DATUM["North American Datum 1983",
    ELLIPSOID["GRS 1980",6378137,298.257222101,LENGTHUNIT["metre",1]]],
    PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]]],
  CONVERSION["UTM zone 15N",METHOD["Transverse Mercator",ID["EPSG",9807]],
    PARAMETER["Latitude of natural origin",0,ANGLEUNIT["degree",0.0174532925199433]],
    PARAMETER["Longitude of natural origin",-93,ANGLEUNIT["degree",0.0174532925199433]],
    PARAMETER["Scale factor at natural origin",0.9996,SCALEUNIT["unity",1]],
    PARAMETER["False easting",500000,LENGTHUNIT["metre",1]],
    PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],
  CS[Cartesian,2],AXIS["(E)",east],AXIS["(N)",north],LENGTHUNIT["metre",1],
  ID["EPSG",26915]]"""

WKT2_NOID = WKT2_26915[: WKT2_26915.rfind(",\n  ID[")] + "]"

# WKT1 form of EPSG:27700 with inline TOWGS84 and no AUTHORITY tail
WKT1_OSGB = (
    'PROJCS["OSGB 1936 / British National Grid",'
    'GEOGCS["OSGB 1936",DATUM["OSGB_1936",'
    'SPHEROID["Airy 1830",6377563.396,299.3249646],'
    "TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.842,-20.489]],"
    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
    'PROJECTION["Transverse_Mercator"],'
    'PARAMETER["latitude_of_origin",49],'
    'PARAMETER["central_meridian",-2],'
    'PARAMETER["scale_factor",0.9996012717],'
    'PARAMETER["false_easting",400000],'
    'PARAMETER["false_northing",-100000],'
    'UNIT["metre",1]]'
)


def test_registry_gains_nad83_and_nad27_utm():
    d = CRS(26915)._def
    assert d["kind"] == "tm" and d["ellps"] == "GRS80"
    assert d["lon0"] == -93.0 and d["datum"] == "NAD83"
    d27 = CRS(26715)._def
    assert d27["ellps"] == "clrk66" and d27["datum"] == "NAD27"


def test_wkt2_with_registry_id_resolves_to_registry():
    c = CRS.from_user_input(WKT2_26915)
    assert c.epsg == 26915 and c.pdef is None


def test_wkt2_parameterized_matches_registry_utm():
    """The verdict's done-criterion: a CRS built from WKT2 text (no
    usable EPSG id) must project like its registry twin. NAD83/GRS80
    vs WGS84 differ in flattening only -> sub-mm."""
    c = CRS.from_user_input(WKT2_NOID)
    assert c.pdef is not None
    x1, y1 = transform(WGS, CRS(26915), LON, LAT)
    x2, y2 = transform(WGS, c, LON, LAT)
    np.testing.assert_allclose(x2, x1, atol=1e-6)
    np.testing.assert_allclose(y2, y1, atol=1e-6)
    # and against WGS84 UTM within the two ellipsoids' separation
    x3, y3 = transform(WGS, CRS(32615), LON, LAT)
    np.testing.assert_allclose(x2, x3, atol=5e-3)
    np.testing.assert_allclose(y2, y3, atol=5e-3)


def test_proj4_utm_matches_registry_exactly():
    c = CRS.from_user_input("+proj=utm +zone=15 +datum=NAD83 +no_defs")
    x1, y1 = transform(WGS, CRS(26915), LON, LAT)
    x2, y2 = transform(WGS, c, LON, LAT)
    np.testing.assert_array_equal(x2, x1)
    np.testing.assert_array_equal(y2, y1)


def test_spec_round_trips_and_compares_equal():
    for text in (
        WKT2_NOID,
        "+proj=utm +zone=15 +datum=NAD83 +no_defs",
        "+proj=merc +lon_0=110 +k=0.997 +x_0=3900000 +y_0=900000 +ellps=bessel",
        "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +x_0=700000 +y_0=6600000 +ellps=GRS80",
        "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80",
        "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +ellps=GRS80 +datum=NAD83",
        "+proj=longlat +ellps=clrk66 +towgs84=-8,160,176",
    ):
        c = CRS.from_user_input(text)
        c2 = CRS.from_user_input(c.spec)
        assert c2 == c, text
        assert hash(c2) == hash(c)


def test_wkt1_towgs84_matches_registry_osgb():
    c = CRS.from_user_input(WKT1_OSGB)
    lon = np.array([1.717921583, -2.0])
    lat = np.array([52.658007833, 49.0])
    x1, y1 = transform(WGS, CRS(27700), lon, lat)
    x2, y2 = transform(WGS, c, lon, lat)
    # registry Helmert params carry one more decimal; < 2 cm apart
    np.testing.assert_allclose(x2, x1, atol=0.02)
    np.testing.assert_allclose(y2, y1, atol=0.02)


def test_us_survey_foot_unit():
    base = ("+proj=lcc +lat_1=31.883333 +lat_2=30.116667 "
            "+lat_0=29.666667 +lon_0=-100.333333 "
            "+x_0=700000 +y_0=3000000 +ellps=GRS80 +datum=NAD83")
    m = CRS.from_user_input(base)
    ft = CRS.from_user_input(base + " +units=us-ft")
    lon = np.array([-97.7, -98.5])
    lat = np.array([30.3, 31.1])
    xm, ym = transform(WGS, m, lon, lat)
    xf, yf = transform(WGS, ft, lon, lat)
    usft = 1200.0 / 3937.0
    # note: +x_0/+y_0 are metres in proj4 regardless of +units
    np.testing.assert_allclose(xf * usft, xm, rtol=1e-12)
    np.testing.assert_allclose(yf * usft, ym, rtol=1e-12)
    lo, la = transform(ft, WGS, xf, yf)
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-9)


def test_mercator_variants_and_roundtrip():
    # variant B's k0 derives from the standard parallel
    from geocube_spark.geometry.crs import merc_k0_from_sp

    b = CRS.from_user_input("+proj=merc +lat_ts=42 +lon_0=51 +ellps=krass")
    k0 = merc_k0_from_sp(dict(b.pdef and b._def)["ellps"], 42.0)
    a = CRS.from_user_input(f"+proj=merc +k={k0!r} +lon_0=51 +ellps=krass")
    lon = np.array([53.0, 50.0])
    lat = np.array([53.0, 40.0])
    xa, ya = transform(WGS, a, lon, lat)
    xb, yb = transform(WGS, b, lon, lat)
    np.testing.assert_allclose(xb, xa, rtol=1e-15)
    np.testing.assert_allclose(yb, ya, rtol=1e-15)
    lo, la = transform(b, WGS, xb, yb)
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-9)


def test_lcc_1sp_jamaica_easting():
    """EPSG GN7-2 LCC-1SP worked example (Jamaica National Grid,
    Clarke 1866): the easting is pinned to the published value; 1SP
    with k0=1 must equal the degenerate 2SP exactly."""
    c1 = CRS.from_user_input(
        "+proj=lcc +lat_1=18 +lat_0=18 +lon_0=-77 +k_0=1.0 "
        "+x_0=250000 +y_0=150000 +ellps=clrk66"
    )
    c2 = CRS.from_user_input(
        "+proj=lcc +lat_1=18 +lat_2=18 +lat_0=18 +lon_0=-77 "
        "+x_0=250000 +y_0=150000 +ellps=clrk66"
    )
    lon = np.array([-76.943683])
    lat = np.array([17.932167])
    x1, y1 = transform(WGS, c1, lon, lat)
    x2, y2 = transform(WGS, c2, lon, lat)
    assert abs(float(x1[0]) - float(x2[0])) == 0.0
    assert abs(float(y1[0]) - float(y2[0])) == 0.0
    assert abs(float(x1[0]) - 255966.58) < 1.0


def test_unknown_method_raises_parameter_level():
    with pytest.raises(ValueError, match="Hotine_Oblique_Mercator"):
        CRS.from_user_input(
            'PROJCS["x",GEOGCS["g",DATUM["D",'
            'SPHEROID["s",6378137,298.25]],PRIMEM["Greenwich",0],'
            'UNIT["degree",0.0174532925199433]],'
            'PROJECTION["Hotine_Oblique_Mercator"],'
            'PARAMETER["central_meridian",0],UNIT["metre",1]]'
        )
    with pytest.raises(ValueError, match=r"\+proj=somethingelse"):
        CRS.from_user_input("+proj=somethingelse +lon_0=3")


def test_geobox_dict_roundtrip_parameterized():
    from geocube_spark.geometry.affine import Affine
    from geocube_spark.grid.geobox import GeoBox

    c = CRS.from_user_input(WKT2_NOID)
    gb = GeoBox(10, 8, Affine(10.0, 0.0, 700000.0, 0.0, -10.0, 4600000.0), c)
    gb2 = GeoBox.from_dict(gb.to_dict())
    assert gb2.crs == gb.crs
    assert gb2.affine == gb.affine
    # older checkpoints recorded a bare EPSG int
    gb3 = GeoBox.from_dict({"width": 4, "height": 4,
                            "affine": gb.affine.tolist(), "crs": 32615})
    assert gb3.crs.epsg == 32615


def test_burn_parameterized_crs_matches_registry(spark):
    """End-to-end: make_geocube with a WKT2-text output CRS (no
    registry entry) must produce the same chunks as epsg:32615 — the
    spec string survives the GeoBox dict ship + executor rebuild."""
    from geocube_spark import datagen as DG
    from geocube_spark.cube import make_geocube

    docs = DG.to_spark(spark, DG.flat_polygon_docs(n=7))

    def burn(crs):
        cube = make_geocube(
            docs, measurements=["om_r"], output_crs=crs,
            resolution=(-10, 10), fill=0.0, tile_size=64,
        )
        rows = cube.chunks.select(
            "tile_id", "measurement", "values"
        ).orderBy("tile_id", "measurement").collect()
        return [(r["tile_id"], r["measurement"], list(r["values"]))
                for r in rows]

    ref = burn("epsg:32615")
    # WGS84-ellipsoid twin of the WKT above so cells match bit-exact
    wkt = WKT2_NOID.replace(
        'ELLIPSOID["GRS 1980",6378137,298.257222101',
        'ELLIPSOID["WGS 84",6378137,298.257223563'
    ).replace('"NAD83"', '"WGS 84"').replace(
        "North American Datum 1983", "World Geodetic System 1984")
    got = burn(wkt)
    assert got == ref


def test_polar_stereographic_sphere_limit():
    """On a sphere (e=0), variant-B PS must equal the textbook
    spherical formula rho = 2 a k0 tan(pi/4 - phi/2) with
    k0 = (1 + sin(lat_ts)) / 2 (Snyder 21-1..21-4)."""
    a = 6370000.0
    c = CRS.from_user_input(
        f"+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +a={a} +b={a}"
    )
    lon = np.array([-45.0, 10.0, 135.0])
    lat = np.array([85.0, 70.0, 60.0])
    x, y = transform(WGS, c, lon, lat)
    k0 = (1 + np.sin(np.radians(70.0))) / 2
    rho = 2 * a * k0 * np.tan(np.pi / 4 - np.radians(lat) / 2)
    lam = np.radians(lon + 45.0)
    np.testing.assert_allclose(x, rho * np.sin(lam), rtol=1e-12)
    np.testing.assert_allclose(y, -rho * np.cos(lam), rtol=1e-12)


def test_polar_stereographic_scale_true_at_parallel():
    """EPSG:3031 (Antarctic PS, lat_ts=-71): the local scale factor at
    the standard parallel must be 1 (that's what defines variant B)."""
    c = CRS(3031)
    lat = np.array([-71.0, -71.0001])
    lon = np.array([30.0, 30.0])
    x, y = transform(WGS, c, lon, lat)
    dist = float(np.hypot(x[1] - x[0], y[1] - y[0]))
    # true meridian arc length for 0.0001 deg at lat -71 on WGS84
    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2 - f)
    phi = np.radians(-71.0)
    M = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    arc = M * np.radians(0.0001)
    assert abs(dist / arc - 1.0) < 1e-6


def test_polar_stereographic_variants_equivalent():
    """Variant B (lat_ts) == variant A with the derived k0."""
    from geocube_spark.geometry.crs import _ps_scale, _eccentricity

    b = CRS(3413)
    K = _ps_scale(b._def)
    a_, e2, e = _eccentricity("WGS84")
    C = np.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
    k0 = K * C / (2 * a_)
    va = CRS.from_user_input(
        f"+proj=stere +lat_0=90 +k={float(k0)!r} +lon_0=-45 +ellps=WGS84"
    )
    lon = np.array([-45.0, 100.0])
    lat = np.array([80.0, 65.0])
    xb, yb = transform(WGS, b, lon, lat)
    xa, ya = transform(WGS, va, lon, lat)
    np.testing.assert_allclose(xa, xb, rtol=1e-14)
    np.testing.assert_allclose(ya, yb, rtol=1e-14)


def test_polar_stereographic_south_roundtrip_and_pole():
    for code in (3031, 3976):
        c = CRS(code)
        lon = np.array([0.0, 120.0, -77.7])
        lat = np.array([-90.0, -75.0, -68.0])
        x, y = transform(WGS, c, lon, lat)
        assert abs(float(x[0])) < 1e-6 and abs(float(y[0])) < 1e-6
        lo, la = transform(c, WGS, x[1:], y[1:])
        np.testing.assert_allclose(lo, lon[1:], atol=1e-9)
        np.testing.assert_allclose(la, lat[1:], atol=1e-9)
    # spec round-trip
    c = CRS.from_user_input(CRS(3031).to_wkt())
    assert c.epsg == 3031
    p = CRS.from_user_input("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +datum=WGS84")
    x1, y1 = transform(WGS, CRS(3031), np.array([55.0]), np.array([-80.0]))
    x2, y2 = transform(WGS, p, np.array([55.0]), np.array([-80.0]))
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    assert CRS.from_user_input(p.spec) == p


def test_world_mercator_3395():
    c = CRS(3395)
    x, y = transform(WGS, c, np.array([1.0]), np.array([0.0]))
    assert float(x[0]) == pytest.approx(111319.49079327357)
    assert float(y[0]) == pytest.approx(0.0, abs=1e-9)
    # ellipsoidal: y at 60N differs from spherical web mercator
    xw, yw = transform(WGS, CRS(3857), np.array([0.0]), np.array([60.0]))
    xm, ym = transform(WGS, c, np.array([0.0]), np.array([60.0]))
    assert abs(float(yw[0]) - float(ym[0])) > 10000
    lo, la = transform(c, WGS, xm, ym)
    assert float(la[0]) == pytest.approx(60.0, abs=1e-9)


# ---------------------------------------------------------------------------
# round-3 code-review regressions
# ---------------------------------------------------------------------------

WKT2_FT = """PROJCRS["NAD83 / Texas South Central (ftUS)",
  BASEGEOGCRS["NAD83",DATUM["North American Datum 1983",
    ELLIPSOID["GRS 1980",6378137,298.257222101,LENGTHUNIT["metre",1]]],
    PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]]],
  CONVERSION["SPCS83 Texas South Central zone (US Survey feet)",
    METHOD["Lambert Conic Conformal (2SP)",ID["EPSG",9802]],
    PARAMETER["Latitude of false origin",27.8333333333333,ANGLEUNIT["degree",0.0174532925199433]],
    PARAMETER["Longitude of false origin",-99,ANGLEUNIT["degree",0.0174532925199433]],
    PARAMETER["Latitude of 1st standard parallel",30.2833333333333,ANGLEUNIT["degree",0.0174532925199433]],
    PARAMETER["Latitude of 2nd standard parallel",28.3833333333333,ANGLEUNIT["degree",0.0174532925199433]],
    PARAMETER["Easting at false origin",1968500,LENGTHUNIT["US survey foot",0.304800609601219]],
    PARAMETER["Northing at false origin",13123333.333,LENGTHUNIT["US survey foot",0.304800609601219]]],
  CS[Cartesian,2],
  AXIS["easting (X)",east,ORDER[1],LENGTHUNIT["US survey foot",0.304800609601219]],
  AXIS["northing (Y)",north,ORDER[2],LENGTHUNIT["US survey foot",0.304800609601219]]]"""


def test_axis_nested_lengthunit_feet():
    """pyproj/GDAL WKT2 nests the CRS linear unit inside the AXIS
    nodes; a feet CRS must NOT silently be treated as metres."""
    c = CRS.from_user_input(WKT2_FT)
    d = c._def
    assert abs(d["to_meter"] - 1200.0 / 3937.0) < 1e-12
    # projecting the false origin returns its easting in FEET
    x, y = transform(WGS, c, np.array([-99.0]),
                     np.array([27.8333333333333]))
    assert abs(float(x[0]) - 1968500.0) < 0.01
    assert abs(float(y[0]) - 13123333.333) < 0.01


WKT1_NTF_PARIS = (
    'PROJCS["NTF (Paris) / Lambert zone II",'
    'GEOGCS["NTF (Paris)",DATUM["Nouvelle_Triangulation_Francaise_Paris",'
    'SPHEROID["Clarke 1880 (IGN)",6378249.2,293.4660212936269],'
    "TOWGS84[-168,-60,320,0,0,0,0]],"
    'PRIMEM["Paris",2.33722917],'
    'UNIT["grad",0.01570796326794897]],'
    'PROJECTION["Lambert_Conformal_Conic_1SP"],'
    'PARAMETER["latitude_of_origin",52],'
    'PARAMETER["central_meridian",0],'
    'PARAMETER["scale_factor",0.99987742],'
    'PARAMETER["false_easting",600000],'
    'PARAMETER["false_northing",2200000],'
    'UNIT["metre",1]]'
)


def test_paris_prime_meridian_folded_into_lon0():
    """EPSG:27572-style WKT1: central_meridian 0 grad EAST OF PARIS
    with grad angle units. The def must be Greenwich-relative: a point
    on the TRUE central meridian (2.337229... E Greenwich) maps to the
    false easting."""
    c = CRS.from_user_input(WKT1_NTF_PARIS)
    d = c._def
    assert abs(d["lon0"] - 2.33722917) < 1e-9  # grads->deg + PM fold
    assert abs(d["lat0"] - 46.8) < 1e-9        # 52 grad = 46.8 deg
    x, y = transform(WGS, c, np.array([2.33722917]), np.array([46.8]))
    # the datum shift moves the geodetic coords, so compute via the
    # CRS's own inverse for an exact round-trip check instead
    lo, la = transform(c, WGS, np.array([600000.0]),
                       np.array([2200000.0]))
    x2, y2 = transform(WGS, c, lo, la)
    np.testing.assert_allclose(x2, [600000.0], atol=1e-6)
    np.testing.assert_allclose(y2, [2200000.0], atol=1e-6)
    # and the forward of the PM longitude lands near the FE line
    assert abs(float(x[0]) - 600000.0) < 2000.0  # datum shift ~hundreds m


def test_geographic_nongreenwich_pm_raises():
    with pytest.raises(ValueError, match="prime meridian"):
        CRS.from_user_input(
            'GEOGCS["NTF (Paris)",DATUM["D",'
            'SPHEROID["c",6378249.2,293.466],TOWGS84[-168,-60,320]],'
            'PRIMEM["Paris",2.33722917],'
            'UNIT["degree",0.0174532925199433]]'
        )


def test_lcc_1sp_spec_survives_worker_rebuild():
    """The worker-shipped spec of an LCC-1SP CRS must reconstruct the
    SAME projection (round-2 review: +k was dropped when +lat_2 was
    present, skewing worker grids ~9 m)."""
    c = CRS.from_user_input(
        "+proj=lcc +lat_1=49.5 +lat_0=49.5 +lon_0=3 +k_0=0.999877341 "
        "+x_0=600000 +y_0=200000 +ellps=clrk80ign"
    )
    w = CRS.from_user_input(c.spec)
    assert w == c
    lon = np.array([3.0, 5.5])
    lat = np.array([50.0, 48.0])
    x1, y1 = transform(WGS, c, lon, lat)
    x2, y2 = transform(WGS, w, lon, lat)
    np.testing.assert_array_equal(x2, x1)
    np.testing.assert_array_equal(y2, y1)


def test_unknown_datum_without_towgs84_raises():
    with pytest.raises(ValueError, match="Deutsches_Hauptdreiecksnetz"):
        CRS.from_user_input(
            'PROJCS["DHDN / 3-degree Gauss zone 3",'
            'GEOGCS["DHDN",DATUM["Deutsches_Hauptdreiecksnetz",'
            'SPHEROID["Bessel 1841",6377397.155,299.1528128]],'
            'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
            'PROJECTION["Transverse_Mercator"],'
            'PARAMETER["central_meridian",9],'
            'PARAMETER["scale_factor",1],'
            'PARAMETER["false_easting",3500000],UNIT["metre",1]]'
        )


def test_inline_towgs84_overrides_registry_shortcut():
    """A WKT whose EPSG id IS registered but which carries its own
    TOWGS84 must honor the stated transformation, not the registry's
    (that's the entire point of sending a BOUNDCRS/TOWGS84)."""
    wkt = WKT1_OSGB[:-1] + ',AUTHORITY["EPSG","27700"]]'
    c = CRS.from_user_input(wkt)
    assert c.pdef is not None  # parameterized, not the registry CRS
    assert c.epsg == 27700     # identity retained for display
    # ~cm-level agreement with the registry (params differ in the
    # 4th decimal of the rotations)
    x1, y1 = transform(WGS, CRS(27700), np.array([-2.0]), np.array([52.0]))
    x2, y2 = transform(WGS, c, np.array([-2.0]), np.array([52.0]))
    assert abs(float(x2[0] - x1[0])) < 0.05
    assert abs(float(y2[0] - y1[0])) < 0.05


def test_truncated_wkt_raises_valueerror():
    with pytest.raises(ValueError, match="WKT"):
        CRS.from_user_input('PROJCS["x", GEOGCS[')


def test_geotiff_user_defined_geokey_requires_crs(spark, tmp_path):
    """A file written from a parameterized CRS carries geokey 32767;
    reading it back must demand an explicit crs= (not defer to a
    misleading 'unsupported EPSG:32767' later), and the override must
    restore the original grid."""
    import dataclasses

    from geocube_spark import datagen as DG
    from geocube_spark.cube import make_geocube
    from geocube_spark.sources.geotiff import (
        geobox_from_geotiff, read_geotiff, write_geotiff,
    )

    spec = "+proj=tmerc +lat_0=0 +lon_0=-93 +k=0.9996 +x_0=500000 +y_0=0 +ellps=WGS84"
    docs = DG.to_spark(spark, DG.flat_polygon_docs(n=7))
    cube = make_geocube(
        docs, measurements=["om_r"], output_crs=spec,
        resolution=(-50, 50), fill=0.0, tile_size=64,
    )
    path = str(tmp_path / "param_crs.tif")
    write_geotiff(cube, path)
    with pytest.raises(ValueError, match="32767"):
        geobox_from_geotiff(path)
    with pytest.raises(ValueError, match="32767"):
        read_geotiff(spark, path)
    back = read_geotiff(spark, path, crs=spec)
    assert back.geobox.crs == cube.geobox.crs
    np.testing.assert_array_equal(
        back.assemble()["band_1"].astype(np.float64),
        cube.assemble()["om_r"].astype(np.float64),
    )


# ---------------------------------------------------------------------------
# property fuzz: spec and WKT round-trips over random parameters
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_ELLPS_CHOICES = ["WGS84", "GRS80", "airy", "intl", "clrk66", "bessel",
                  "krass"]

_lat = st.floats(-60.0, 60.0)
_lon = st.floats(-179.0, 179.0)
_off = st.floats(-2e6, 2e6)
_k = st.floats(0.99, 1.01)


def _proj4_of(kind, lon0, lat0, k0, fe, fn, sp1, sp2, ellps):
    if kind == "tmerc":
        return (f"+proj=tmerc +lat_0={lat0} +lon_0={lon0} +k={k0} "
                f"+x_0={fe} +y_0={fn} +ellps={ellps}")
    if kind == "lcc1":
        # keep the single parallel off the equator: lat_1 = 0 makes
        # the cone constant sin(lat_1) = 0 and the CRS is (correctly)
        # rejected at parse time
        sp = (1.0 if sp1 >= 0 else -1.0) * (abs(sp1) + 5.0)
        return (f"+proj=lcc +lat_1={sp} +lat_0={sp} +lon_0={lon0} "
                f"+k_0={k0} +x_0={fe} +y_0={fn} +ellps={ellps}")
    if kind == "lcc2":
        # same-hemisphere parallels so lat_1 != -lat_2 (a symmetric
        # pair zeroes the cone constant and is rejected at parse time)
        s = 1.0 if lat0 >= 0 else -1.0
        lo, hi = sorted((abs(sp1) + 2.0, abs(sp2) + 10.0))
        return (f"+proj=lcc +lat_1={s * lo} +lat_2={s * (hi + 1.0)} "
                f"+lat_0={lat0} +lon_0={lon0} +x_0={fe} +y_0={fn} "
                f"+ellps={ellps}")
    if kind == "aea":
        lo, hi = sorted((abs(sp1) + 5.0, abs(sp2) + 20.0))
        return (f"+proj=aea +lat_1={lo} +lat_2={hi + 1.0} "
                f"+lat_0={lat0} +lon_0={lon0} +x_0={fe} +y_0={fn} "
                f"+ellps={ellps}")
    if kind == "laea":
        return (f"+proj=laea +lat_0={lat0} +lon_0={lon0} +x_0={fe} "
                f"+y_0={fn} +ellps={ellps}")
    if kind == "merc":
        return (f"+proj=merc +lon_0={lon0} +k={k0} +x_0={fe} "
                f"+y_0={fn} +ellps={ellps}")
    if kind == "stere":
        return (f"+proj=stere +lat_0=90 +lat_ts={abs(sp1) + 20.0} "
                f"+lon_0={lon0} +x_0={fe} +y_0={fn} +ellps={ellps}")
    raise AssertionError(kind)


@given(
    kind=st.sampled_from(
        ["tmerc", "lcc1", "lcc2", "aea", "laea", "merc", "stere"]),
    lon0=_lon, lat0=_lat, k0=_k, fe=_off, fn=_off,
    sp1=st.floats(-55.0, 55.0), sp2=st.floats(-55.0, 55.0),
    ellps=st.sampled_from(_ELLPS_CHOICES),
)
@settings(max_examples=60, deadline=None)
def test_spec_and_wkt_roundtrip_property(kind, lon0, lat0, k0, fe, fn,
                                         sp1, sp2, ellps):
    """For random parameters of every projection family: the canonical
    spec AND the generated WKT2 must both reconstruct a CRS that
    projects identically (the driver->executor ship path and the
    file-metadata path)."""
    c = CRS.from_user_input(
        _proj4_of(kind, lon0, lat0, k0, fe, fn, sp1, sp2, ellps)
    )
    lon = np.array([lon0 - 1.5, lon0 + 2.0])
    lat = np.array([max(-55.0, lat0 - 2.0), min(55.0, lat0 + 1.5)])
    if kind == "stere":
        lat = np.array([70.0, 80.0])
    x1, y1 = transform(WGS, c, lon, lat)
    assert np.isfinite(x1).all() and np.isfinite(y1).all()

    c2 = CRS.from_user_input(c.spec)
    assert c2 == c
    x2, y2 = transform(WGS, c2, lon, lat)
    np.testing.assert_array_equal(x2, x1)
    np.testing.assert_array_equal(y2, y1)

    c3 = CRS.from_user_input(c.to_wkt())
    x3, y3 = transform(WGS, c3, lon, lat)
    np.testing.assert_allclose(x3, x1, rtol=1e-12, atol=1e-7)
    np.testing.assert_allclose(y3, y1, rtol=1e-12, atol=1e-7)

    # inverse round-trip through the original
    lo, la = transform(c, WGS, x1, y1)
    np.testing.assert_allclose(lo, lon, atol=1e-7)
    np.testing.assert_allclose(la, lat, atol=1e-7)


# ---------------------------------------------------------------------------
# degenerate conic parameter sets (cone constant n = 0)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "spec",
    [
        # LCC 1SP on the equator: n = sin(0) = 0
        "+proj=lcc +lat_1=0 +lat_0=0 +lon_0=0 +ellps=WGS84",
        # LCC 2SP symmetric about the equator: m(lat_1) = m(lat_2)
        "+proj=lcc +lat_1=-10 +lat_2=10 +lat_0=0 +lon_0=0 +ellps=WGS84",
        # Albers symmetric parallels: m1^2 = m2^2
        "+proj=aea +lat_1=-20 +lat_2=20 +lat_0=0 +lon_0=0 +ellps=GRS80",
    ],
)
def test_degenerate_cone_rejected_at_parse(spec):
    """proj rejects these parameter sets too — the engine must raise a
    parameter-level error at parse time instead of emitting NaN from a
    divide-by-zero inside a Spark task later."""
    with pytest.raises(ValueError, match="parallel"):
        CRS.from_user_input(spec)


def test_degenerate_cone_rejected_in_wkt_path():
    wkt = (
        'PROJCS["bad",GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Lambert_Conformal_Conic_2SP"],'
        'PARAMETER["standard_parallel_1",-15],'
        'PARAMETER["standard_parallel_2",15],'
        'PARAMETER["latitude_of_origin",0],'
        'PARAMETER["central_meridian",0],'
        'PARAMETER["false_easting",0],PARAMETER["false_northing",0],'
        'UNIT["metre",1]]'
    )
    with pytest.raises(ValueError, match="parallel"):
        CRS.from_user_input(wkt)


# ---------------------------------------------------------------------------
# Round 4: bare-EPSG front door (geometry/epsg_table.py)
# ---------------------------------------------------------------------------


def test_epsg_table_natural_origins():
    """Each tabled projection maps its natural origin to exactly
    (FE, FN) in the CRS's own unit — pins false origins and the
    us-ft unit factor against the public EPSG parameters."""
    from geocube_spark.geometry.crs import transform
    wgs = CRS(4326)
    cases = [
        # code, lon0, lat0, FE, FN (CRS units)
        (2193, 173.0, 0.0, 1600000.0, 10000000.0),       # NZTM2000
        (2263, -74.0, 40.16666666666666, 984250.0, 0.0),  # NY LI ftUS
        (2229, -118.0, 33.5, 6561666.667, 1640416.66691667),
        (2271, -77.75, 40.16666666666666, 1968500.0, 0.0),  # PA North
        (2157, -8.0, 53.5, 600000.0, 750000.0),          # Irish TM
        (3006, 15.0, 0.0, 500000.0, 0.0),                # SWEREF99 TM
        (3978, -95.0, 49.0, 0.0, 0.0),                   # Canada Atlas
        (3946, 3.0, 46.0, 1700000.0, 5200000.0),         # RGF93 CC46
        (32118, -74.0, 40.16666666666666, 300000.0, 0.0),  # NY LI m
    ]
    for code, lon, lat, fe, fn in cases:
        x, y = transform(wgs, CRS(code), np.array([lon]), np.array([lat]))
        assert abs(x[0] - fe) < 1e-3, (code, x[0], fe)
        assert abs(y[0] - fn) < 1e-3, (code, y[0], fn)


def test_epsg_table_null_transform_twins_match_utm_registry():
    """Tabled national TM grids that are parameter-identical to a UTM
    zone (null datum transformation) must agree with the trusted UTM
    registry kernels to sub-millimeter."""
    from geocube_spark.geometry.crs import transform
    wgs = CRS(4326)
    twins = [
        (3006, 32633, 15.8, 59.3),    # SWEREF99 TM == UTM 33N
        (3067, 32635, 27.5, 61.5),    # ETRS-TM35FIN == UTM 35N
        (28355, 32755, 147.3, -37.8),  # GDA94 MGA55 == UTM 55S
        (7855, 32755, 147.3, -37.8),   # GDA2020 MGA55 == UTM 55S
        (31983, 32723, -45.6, -23.55),  # SIRGAS UTM 23S == WGS84 23S
    ]
    for ncode, ucode, lon, lat in twins:
        x1, y1 = transform(wgs, CRS(ncode), np.array([lon]), np.array([lat]))
        x2, y2 = transform(wgs, CRS(ucode), np.array([lon]), np.array([lat]))
        assert abs(x1[0] - x2[0]) < 1e-3
        assert abs(y1[0] - y2[0]) < 1e-3


def test_epsg_table_city_anchors():
    """Published coordinate anchors (loose tolerance: catches unit,
    false-origin, and parallel mix-ups; exact kernels are pinned by
    the worked-example tests above)."""
    from geocube_spark.geometry.crs import transform
    wgs = CRS(4326)
    # Empire State Building in NY Long Island ftUS: ~ (988200, 211900)
    x, y = transform(wgs, CRS(2263), np.array([-73.9857]), np.array([40.7484]))
    assert abs(x[0] - 988212.0) < 50 and abs(y[0] - 211939.0) < 50
    # Wellington in NZTM2000: ~ (1748735, 5427916)
    x, y = transform(wgs, CRS(2193), np.array([174.7762]), np.array([-41.2865]))
    assert abs(x[0] - 1748736.0) < 50 and abs(y[0] - 5427916.0) < 50
    # Munich in DHDN GK zone 4: ~ (4468600, 5333100) +- datum residue
    x, y = transform(wgs, CRS(31468), np.array([11.5755]), np.array([48.1374]))
    assert 4.46e6 < x[0] < 4.48e6 and 5.32e6 < y[0] < 5.34e6


def test_epsg_table_roundtrip_and_unknown_still_raises():
    from geocube_spark.geometry.crs import transform
    wgs = CRS(4326)
    rng = np.random.default_rng(5)
    lon = rng.uniform(-74.2, -73.8, 50)
    lat = rng.uniform(40.4, 41.0, 50)
    c = CRS(2263)
    x, y = transform(wgs, c, lon, lat)
    lon2, lat2 = transform(c, wgs, x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    with pytest.raises(ValueError, match="unsupported projected CRS"):
        CRS(99999)._def


def test_burn_bare_epsg_codes(spark):
    """Round-3 verdict item 5 done-criterion: a US state-plane code
    and NZTM burn the soil-like fixture with NO WKT text supplied,
    bit-identical to the same parameters pasted as proj4 text (the
    already-trusted front door)."""
    from geocube_spark import datagen as DG
    from geocube_spark.cube import make_geocube
    from geocube_spark.geometry.epsg_table import EPSG_PROJ4

    docs = DG.to_spark(spark, DG.flat_polygon_docs(n=7))

    def burn(crs, res):
        cube = make_geocube(
            docs, measurements=["om_r"], output_crs=crs,
            resolution=res, fill=0.0, tile_size=64,
        )
        rows = cube.chunks.select(
            "tile_id", "measurement", "values"
        ).orderBy("tile_id", "measurement").collect()
        assert rows, crs
        return [(r["tile_id"], r["measurement"], list(r["values"]))
                for r in rows]

    for code, res in ((2263, (-40, 40)), (2193, (-10, 10))):
        bare = burn(f"EPSG:{code}", res)
        pasted = burn(EPSG_PROJ4[code], res)
        assert bare == pasted, code
