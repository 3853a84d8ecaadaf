"""Round-5 EPSG table expansion: every public-registry family whose
projection method the closed-form kernels support.

Verdict r04 item 3: the r4 curated table covered the common families;
this round generates the rest (ED50/Pulkovo/AGD Gauss-Krueger & UTM,
Japan JGD zones, CGCS2000, POSGAR fajas, TUREF, Baltic/Balkan/Benelux
national grids, polar LAEA/stere, Albers singles, CA meter twins).
Invariants per family:

* every tabled code resolves and roundtrips lon/lat exactly,
* natural origin -> (FE, FN) evaluated DATUM-INTERNALLY (shifted
  datums get a zeroed-towgs84 twin — the projection stage must be
  exact regardless of the Helmert accuracy),
* null-transformation twins are coordinate-identical (JGD2000 ==
  JGD2011, POSGAR94 == POSGAR2007, UPS == WGS84-coded UPS, SIRGAS
  north == WGS84 UTM, CGCS zone-FE == CM twin + zone offset),
* city anchors land on published coordinates (catches unit,
  false-origin, parallel and zone-formula mix-ups),
* a representative of each new family burns the soil-like fixture
  bit-identical to the same parameters pasted as proj4 text.
"""

import re

import numpy as np
import pytest

from geocube_spark.geometry.crs import CRS, transform
from geocube_spark.geometry.epsg_table import EPSG_PROJ4

WGS = CRS(4326)


def _fwd(code, lon, lat):
    x, y = transform(WGS, CRS(code), np.array([lon]), np.array([lat]))
    return x[0], y[0]


def test_all_tabled_codes_resolve():
    assert len(EPSG_PROJ4) >= 250
    for code in EPSG_PROJ4:
        d = CRS(code)._def
        assert d["kind"] in ("tm", "lcc", "albers", "laea", "merc",
                             "ps"), code


def test_roundtrip_every_family():
    """>= 20 codes per kernel family (where the registry has that
    many): WGS -> CRS -> WGS within 1e-9 deg near each CRS's own
    natural origin."""
    rng = np.random.default_rng(9)
    codes = sorted(EPSG_PROJ4)
    assert len(codes) > 100
    for code in codes:
        d = CRS(code)._def
        lon0 = d.get("lon0", 0.0)
        lat0 = d.get("lat0", 0.0)
        if abs(lat0) > 89.0:  # polar-origin grids: test mid-latitudes
            lat0 = np.sign(lat0) * -40.0 if d["kind"] == "tm" else \
                np.sign(lat0) * 75.0
        lat0 = float(np.clip(lat0, -84.0, 84.0))
        lon = lon0 + rng.uniform(-1.5, 1.5, 8)
        lat = np.clip(lat0 + rng.uniform(-1.5, 1.5, 8), -84.0, 84.0)
        c = CRS(code)
        x, y = transform(WGS, c, lon, lat)
        lon2, lat2 = transform(c, WGS, x, y)
        # null-shift codes roundtrip exactly; classic datums carry the
        # inherent 2D-transform height-drop residue (the shifted point
        # is off the target ellipsoid surface; dropping h moves lat by
        # a few mm — identical to proj's 2D pipelines), so ~1e-7 deg
        null_shift = "+towgs84=0,0,0" in EPSG_PROJ4[code]
        tol = 1e-9 if null_shift else 1.5e-7
        dlon = (lon2 - lon + 180.0) % 360.0 - 180.0  # antimeridian wrap
        np.testing.assert_allclose(dlon, 0.0, rtol=0, atol=tol,
                                   err_msg=str(code))
        np.testing.assert_allclose(lat2, lat, rtol=0, atol=tol,
                                   err_msg=str(code))


def _null_twin(code):
    """Projection-stage twin: same parameters, zeroed datum shift."""
    p4 = EPSG_PROJ4[code]
    p4 = re.sub(r"\+towgs84=\S+", "+towgs84=0,0,0", p4)
    return CRS.from_user_input(p4)


def test_natural_origins_datum_internal():
    """Natural origin -> (FE, FN) for one code per new family,
    evaluated with a null shift so the check is projection-pure."""
    cases = [
        # code, lon0, lat0, FE, FN
        (23032, 9.0, 0.0, 500000.0, 0.0),         # ED50 UTM 32N
        (28412, 69.0, 0.0, 12500000.0, 0.0),      # Pulkovo GK z12
        (20255, 147.0, 0.0, 500000.0, 10000000.0),  # AGD66 AMG 55
        (20355, 147.0, 0.0, 500000.0, 10000000.0),  # AGD84 AMG 55
        (2100, 24.0, 0.0, 500000.0, 0.0),         # GGRS87
        (2451, 139.83333333333334, 36.0, 0.0, 0.0),  # JGD2000 CS IX
        (4498, 117.0, 0.0, 20500000.0, 0.0),      # CGCS2000 GK z20
        (4509, 117.0, 0.0, 500000.0, 0.0),        # CGCS2000 CM 117E
        (5253, 27.0, 0.0, 500000.0, 0.0),         # TUREF TM27
        (2176, 15.0, 0.0, 5500000.0, 0.0),        # Poland CS2000 z5
        (3765, 16.5, 0.0, 500000.0, 0.0),         # HTRS96
        (3059, 24.0, 0.0, 500000.0, -6000000.0),  # LKS92
        (3346, 24.0, 0.0, 500000.0, 0.0),         # LKS94
        (29902, -8.0, 53.5, 200000.0, 250000.0),  # Irish Grid
        (3301, 24.0, 57.51755393055556, 500000.0, 6375000.0),
        (3057, -19.0, 65.0, 500000.0, 500000.0),  # ISN93
        (3812, 4.359215833333333, 50.797815, 649328.0, 665262.0),
        (3310, -120.0, 0.0, 0.0, -4000000.0),     # CA Albers
        (3577, 132.0, 0.0, 0.0, 0.0),             # Australian Albers
        (6350, -96.0, 23.0, 0.0, 0.0),            # Conus Albers 2011
        (6931, 0.0, 90.0, 0.0, 0.0),              # EASE-2 North
        (3995, 0.0, 90.0, 0.0, 0.0),              # Arctic PS
        (5041, 0.0, 90.0, 2000000.0, 2000000.0),  # UPS North
        (26943, -120.5, 36.5, 2000000.0, 500000.0),  # CA z3 meters
    ]
    for code, lon, lat, fe, fn in cases:
        c = _null_twin(code)
        x, y = transform(WGS, c, np.array([lon]), np.array([lat]))
        assert abs(x[0] - fe) < 1e-3, (code, x[0], fe)
        assert abs(y[0] - fn) < 1e-3, (code, y[0], fn)


def test_null_transform_twin_families():
    """Whole-family twin identities, coordinate-exact."""
    # JGD2000 CS I-XIX == JGD2011 CS I-XIX
    for i in range(19):
        d1, d2 = CRS(2443 + i)._def, CRS(6669 + i)._def
        assert d1 == d2, (2443 + i, 6669 + i)
    # POSGAR 94 fajas == POSGAR 2007 fajas
    for f in range(1, 8):
        assert CRS(22180 + f)._def == CRS(5342 + f)._def
    # UPS == WGS84-coded UPS
    assert CRS(5041)._def == CRS(32661)._def
    assert CRS(5042)._def == CRS(32761)._def
    # SIRGAS 2000 north zones == WGS84 UTM north (GRS80 vs WGS84:
    # flattening-only difference, < 0.1 mm at these latitudes)
    for z in range(11, 23):
        x1, y1 = _fwd(31954 + z, -183.0 + 6 * z + 1.2, 6.0)
        x2, y2 = _fwd(32600 + z, -183.0 + 6 * z + 1.2, 6.0)
        assert abs(x1 - x2) < 1e-3 and abs(y1 - y2) < 1e-3, z
    # CGCS2000 zone-coded FE == CM twin + zone offset, exactly
    for z in range(13, 24):
        xz, yz = _fwd(4478 + z, 6 * z - 3 + 0.8, 40.0)
        xc, yc = _fwd(4489 + z, 6 * z - 3 + 0.8, 40.0)
        assert abs((xz - z * 1_000_000) - xc) < 1e-9
        assert abs(yz - yc) < 1e-9


def test_city_anchors_new_families():
    """Published coordinates, loose tolerance (datum-shift residue)."""
    anchors = [
        # code, lon, lat, X, Y, tol_m
        (31370, 4.3517, 50.8466, 148799.0, 170689.0, 5.0),  # Brussels
        (28407, 37.6176, 55.7558, 7413327.0, 6182349.0, 10.0),  # Moscow
        (3310, -118.24, 34.05, 162485.0, -439112.0, 2.0),   # LA
        (3577, 151.21, -33.87, 1761025.0, -3828891.0, 2.0),  # Sydney
        (2100, 23.7275, 37.9838, 475920.0, 4203765.0, 5.0),  # Athens
        (3057, -21.94, 64.15, 356960.0, 408568.0, 2.0),     # Reykjavik
        (3301, 24.7536, 59.437, 542763.0, 6589036.0, 2.0),  # Tallinn
        (3346, 25.2797, 54.6872, 582510.0, 6061949.0, 2.0),  # Vilnius
        (2178, 21.0122, 52.2297, 7500834.0, 5788456.0, 2.0),  # Warsaw
        (4498, 116.4074, 39.9042, 20449325.0, 4419060.0, 2.0),  # Beijing
        (22185, -58.3816, -34.6037, 5648457.0, 6170146.0, 2.0),  # BsAs
        (5254, 32.8597, 39.9334, 744456.0, 4426052.0, 2.0),  # Ankara
        (29902, -6.2603, 53.3498, 315901.0, 234671.0, 5.0),  # Dublin
    ]
    for code, lon, lat, X, Y, tol in anchors:
        x, y = _fwd(code, lon, lat)
        assert abs(x - X) < tol, (code, x, X)
        assert abs(y - Y) < tol, (code, y, Y)
    # classic-datum sanity: ED50 UTM vs WGS84 UTM differ by the
    # familiar ~(80 m E, 200 m N) in central Europe; AGD66 vs GDA94
    # by ~(100-210 m) in SE Australia
    xe, ye = _fwd(23032, 11.5755, 48.1374)
    xw, yw = _fwd(32632, 11.5755, 48.1374)
    assert 50 < xe - xw < 120 and 150 < ye - yw < 260
    xa, ya = _fwd(20256, 151.21, -33.87)
    xm, ym = _fwd(28356, 151.21, -33.87)
    assert 50 < abs(xa - xm) < 210 and 100 < abs(ya - ym) < 260


def test_polar_laea_published_radius():
    """EASE-Grid 2.0: the ring radius at |lat| = 80 is the published
    1115409.05 m (polar-aspect kernel, Snyder 24-23/24-24), and the
    polar aspect roundtrips exactly."""
    x, y = _fwd(6931, 0.0, 80.0)
    assert abs(np.hypot(x, y) - 1115409.05) < 0.01
    x, y = _fwd(6932, 0.0, -80.0)
    assert abs(np.hypot(x, y) - 1115409.05) < 0.01
    # quadrant orientation: north aspect has y = -rho at lon 0;
    # south aspect has y = +rho
    assert _fwd(6931, 0.0, 80.0)[1] < 0 < _fwd(6932, 0.0, -80.0)[1]
    for code, lat in ((6931, 72.0), (6932, -72.0), (3571, 66.0),
                      (3576, 80.0)):
        c = CRS(code)
        lon = np.array([33.0])
        la = np.array([lat])
        x, y = transform(WGS, c, lon, la)
        lon2, lat2 = transform(c, WGS, x, y)
        assert abs(lon2[0] - 33.0) < 1e-9 and abs(lat2[0] - lat) < 1e-9


def test_burn_representative_new_codes(spark):
    """One representative per new family burns the soil-like fixture
    bit-identical to the same parameters pasted as proj4 text (the
    r3-trusted front door) — proves bare-code resolution feeds the
    full distributed burn, not just the transform kernel."""
    from geocube_spark import datagen as DG
    from geocube_spark.cube import make_geocube

    docs = DG.to_spark(spark, DG.flat_polygon_docs(n=7))

    def burn(crs, res):
        cube = make_geocube(
            docs, measurements=["om_r"], output_crs=crs,
            resolution=res, fill=0.0, tile_size=64,
        )
        rows = cube.chunks.select("tile_id", "values").collect()
        return {r["tile_id"]: tuple(r["values"]) for r in rows}

    reps = {
        23032: (-50, 50),    # ED50 UTM (tm + intl + towgs84)
        28407: (-50, 50),    # Pulkovo GK (krass)
        2445: (-50, 50),     # JGD2000 CS III
        22185: (-50, 50),    # POSGAR faja 5
        3301: (-50, 50),     # Estonian LCC
        3577: (-50, 50),     # Australian Albers
        3575: (-50, 50),     # North Pole LAEA Europe
        3995: (-50, 50),     # Arctic polar stereographic
    }
    for code, res in reps.items():
        got = burn(f"EPSG:{code}", res)
        want = burn(EPSG_PROJ4[code], res)
        assert got == want, code
        assert got, code


def test_burn_osgb_27700(spark):
    """The verdict's named example: EPSG:27700 (British National
    Grid) burns the soil-like fixture from the bare code, identically
    to the same parameters pasted as WKT1 text with the registry's
    TOWGS84."""
    from geocube_spark import datagen as DG
    from geocube_spark.cube import make_geocube

    wkt = (
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
    docs = DG.to_spark(spark, DG.flat_polygon_docs(n=7))

    def burn(crs):
        cube = make_geocube(
            docs, measurements=["om_r"], output_crs=crs,
            resolution=(-50, 50), fill=0.0, tile_size=64,
        )
        return {r["tile_id"]: tuple(r["values"])
                for r in cube.chunks.select("tile_id", "values").collect()}

    got = burn("EPSG:27700")
    want = burn(wkt)
    assert got and got.keys() == want.keys()
    # registry Helmert carries one more decimal than common WKT dumps;
    # identical here because the WKT uses the registry's own values
    for k in got:
        a = np.asarray(got[k]); b = np.asarray(want[k])
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
