"""Compact public-EPSG parameter table: bare ``EPSG:<code>`` front
door for common projected families outside the closed-form registry in
``crs.CRS_DEFS``.

The reference resolves any code through pyproj's bundled EPSG database
(/root/reference/geocube/geo_utils/geobox.py:92-98).  This engine
ships no database; instead this module carries a curated table of
EPSG codes -> canonical proj4 text for the projected families real
users hit most (US State Plane NAD83, NZTM2000, MGA/GDA, SIRGAS UTM,
European national TM/LCC grids, German Gauss-Krueger, French Lambert
CC zones).  Every entry is public EPSG registry data (the registry's
parameter values, expressed in proj4 form); resolution routes through
the same text front door (``crs_parse.parse_proj4``) as user-pasted
WKT/proj4, so the table adds ZERO new kernel code -- only parameters.

Codes outside both the registry and this table still raise with
guidance ("paste the WKT"), exactly as before.

Per-family invariants pinned in tests/test_crs_frontdoor.py:
  * projection natural origin maps to (FE, FN) exactly,
  * null-transformation twins agree with the trusted UTM registry
    kernels to < 1e-6 m (SWEREF99-TM == UTM33N, ETRS-TM35FIN == UTM35N,
    MGA55 == UTM55S, SIRGAS UTM23S == WGS84 UTM23S),
  * city anchor points land inside their zone's published coordinate
    ranges (unit + false-origin sanity).
"""

from __future__ import annotations

from functools import lru_cache

_GRS80_NULL = "+ellps=GRS80 +towgs84=0,0,0,0,0,0,0"
_USFT = "+units=us-ft"


def _spcs_lcc(lat1, lat2, lat0, lon0, x0, y0=0.0, units=_USFT):
    return (
        f"+proj=lcc +lat_1={lat1} +lat_2={lat2} +lat_0={lat0} "
        f"+lon_0={lon0} +x_0={x0} +y_0={y0} {_GRS80_NULL} {units}"
    )


def _spcs_tm(lat0, lon0, k, x0, y0=0.0, units=_USFT):
    return (
        f"+proj=tmerc +lat_0={lat0} +lon_0={lon0} +k={k} "
        f"+x_0={x0} +y_0={y0} {_GRS80_NULL} {units}"
    )


EPSG_PROJ4: dict = {
    # ---- New Zealand --------------------------------------------------
    # NZGD2000 / New Zealand Transverse Mercator 2000
    2193: "+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 +x_0=1600000 "
          f"+y_0=10000000 {_GRS80_NULL} +units=m",
    # ---- US State Plane NAD83 (US survey foot zones) ------------------
    # California zones 1-6 (EPSG 2225-2230)
    2225: _spcs_lcc(41.66666666666666, 40.0, 39.33333333333334, -122.0,
                    2000000.0001016, 500000.0001016001),
    2226: _spcs_lcc(39.83333333333334, 38.33333333333334,
                    37.66666666666666, -122.0,
                    2000000.0001016, 500000.0001016001),
    2227: _spcs_lcc(38.43333333333333, 37.06666666666667, 36.5, -120.5,
                    2000000.0001016, 500000.0001016001),
    2228: _spcs_lcc(37.25, 36.0, 35.33333333333334, -119.0,
                    2000000.0001016, 500000.0001016001),
    2229: _spcs_lcc(35.46666666666667, 34.03333333333333, 33.5, -118.0,
                    2000000.0001016, 500000.0001016001),
    2230: _spcs_lcc(33.88333333333333, 32.78333333333333,
                    32.16666666666666, -116.25,
                    2000000.0001016, 500000.0001016001),
    # Colorado North / Central / South (2231-2233)
    2231: _spcs_lcc(40.78333333333333, 39.71666666666667,
                    39.33333333333334, -105.5,
                    914401.8288036576, 304800.6096012192),
    2232: _spcs_lcc(39.75, 38.45, 37.83333333333334, -105.5,
                    914401.8288036576, 304800.6096012192),
    2233: _spcs_lcc(38.43333333333333, 37.23333333333333,
                    36.66666666666666, -105.5,
                    914401.8288036576, 304800.6096012192),
    # Florida East / West (TM) and North (LCC) (2236-2238)
    2236: _spcs_tm(24.33333333333333, -81.0, 0.9999411764705882,
                   200000.0001016002),
    2237: _spcs_tm(24.33333333333333, -82.0, 0.9999411764705882,
                   200000.0001016002),
    2238: _spcs_lcc(30.75, 29.58333333333333, 29.0, -84.5,
                    600000.0000000001, 0.0),
    # Massachusetts Mainland (2249)
    2249: _spcs_lcc(42.68333333333333, 41.71666666666667, 41.0, -71.5,
                    200000.0001016002, 750000.0),
    # New York East / Central / West (TM) + Long Island (LCC)
    2260: _spcs_tm(38.83333333333334, -74.5, 0.9999,
                   150000.0000000001),
    2261: _spcs_tm(40.0, -76.58333333333333, 0.9999375,
                   250000.0000000002),
    2262: _spcs_tm(40.0, -78.58333333333333, 0.9999375,
                   350000.0000000001),
    2263: _spcs_lcc(41.03333333333333, 40.66666666666666,
                    40.16666666666666, -74.0, 300000.0000000001, 0.0),
    # Pennsylvania North / South (2271-2272)
    2271: _spcs_lcc(41.95, 40.88333333333333, 40.16666666666666,
                    -77.75, 600000.0000000001, 0.0),
    2272: _spcs_lcc(40.96666666666667, 39.93333333333333,
                    39.33333333333334, -77.75, 600000.0000000001, 0.0),
    # Washington North / South (2285-2286)
    2285: _spcs_lcc(48.73333333333333, 47.5, 47.0, -120.8333333333333,
                    500000.0001016001, 0.0),
    2286: _spcs_lcc(47.33333333333334, 45.83333333333334,
                    45.33333333333334, -120.5, 500000.0001016001, 0.0),
    # Illinois East / West (3435-3436)
    3435: _spcs_tm(36.66666666666666, -88.33333333333333,
                   0.9999749999999999, 300000.0000000001),
    3436: _spcs_tm(36.66666666666666, -90.16666666666667,
                   0.9999411764705882, 700000.0000000001),
    # New Jersey (3424)
    3424: _spcs_tm(38.83333333333334, -74.5, 0.9999,
                   150000.0000000001),
    # NY Long Island METER twin (32118) — same cone, metric axes
    32118: "+proj=lcc +lat_1=41.03333333333333 +lat_2=40.66666666666666 "
           "+lat_0=40.16666666666666 +lon_0=-74 +x_0=300000 +y_0=0 "
           f"{_GRS80_NULL} +units=m",
    # ---- Europe --------------------------------------------------------
    # ETRS89 / LCC Europe
    3034: "+proj=lcc +lat_1=35 +lat_2=65 +lat_0=52 +lon_0=10 "
          f"+x_0=4000000 +y_0=2800000 {_GRS80_NULL} +units=m",
    # IRENET95 / Irish Transverse Mercator
    2157: "+proj=tmerc +lat_0=53.5 +lon_0=-8 +k=0.99982 +x_0=600000 "
          f"+y_0=750000 {_GRS80_NULL} +units=m",
    # SWEREF99 TM (Sweden)
    3006: "+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9996 +x_0=500000 "
          f"+y_0=0 {_GRS80_NULL} +units=m",
    # ETRS89 / TM35FIN (Finland)
    3067: "+proj=tmerc +lat_0=0 +lon_0=27 +k=0.9996 +x_0=500000 "
          f"+y_0=0 {_GRS80_NULL} +units=m",
    # ---- Canada --------------------------------------------------------
    # NAD83 / Canada Atlas Lambert
    3978: "+proj=lcc +lat_1=49 +lat_2=77 +lat_0=49 +lon_0=-95 "
          f"+x_0=0 +y_0=0 {_GRS80_NULL} +units=m",
    # NAD83 / Statistics Canada Lambert
    3347: "+proj=lcc +lat_1=49 +lat_2=77 +lat_0=63.390675 "
          "+lon_0=-91.86666666666666 +x_0=6200000 +y_0=3000000 "
          f"{_GRS80_NULL} +units=m",
}

# German DHDN / 3-degree Gauss-Krueger zones 2-5 (31466-31469):
# Bessel ellipsoid, BeTA2007-style 7-parameter Helmert (EPSG 1777)
_DHDN = ("+ellps=bessel "
         "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7")
for _z in range(2, 6):
    EPSG_PROJ4[31464 + _z] = (
        f"+proj=tmerc +lat_0=0 +lon_0={3 * _z} +k=1 "
        f"+x_0={_z}500000 +y_0=0 {_DHDN} +units=m"
    )

# RGF93 / Lambert CC zones 42-50 (EPSG 3942-3950): one cone per
# degree of latitude, lat_0=N, parallels N +/- 0.75, FN keyed to N
for _n in range(42, 51):
    EPSG_PROJ4[3900 + _n] = (
        f"+proj=lcc +lat_1={_n - 0.75} +lat_2={_n + 0.75} "
        f"+lat_0={_n} +lon_0=3 +x_0=1700000 "
        f"+y_0={(_n - 41) * 1_000_000 + 200_000} {_GRS80_NULL} +units=m"
    )

# GDA94 / MGA zones 48-58 (28348-28358) and GDA2020 / MGA zones
# 46-59 (7846-7859): UTM south, GRS80, null transformation
for _z in range(48, 59):
    EPSG_PROJ4[28300 + _z] = (
        f"+proj=utm +zone={_z} +south {_GRS80_NULL} +units=m"
    )
for _z in range(46, 60):
    EPSG_PROJ4[7800 + _z] = (
        f"+proj=utm +zone={_z} +south {_GRS80_NULL} +units=m"
    )

# SIRGAS 2000 / UTM south zones 17S-25S (31977-31985) and north
# zones 11N-22N (31965-31976)
for _z in range(17, 26):
    EPSG_PROJ4[31960 + _z] = (
        f"+proj=utm +zone={_z} +south {_GRS80_NULL} +units=m"
    )
for _z in range(11, 23):
    EPSG_PROJ4[31954 + _z] = (
        f"+proj=utm +zone={_z} {_GRS80_NULL} +units=m"
    )

# ---------------------------------------------------------------------------
# round-5 expansion: every public-registry family whose projection
# method the closed-form kernels already support (tmerc/utm, lcc
# 1SP/2SP, aea, laea, merc, polar stere). Parameters are the public
# EPSG registry values in proj4 form; datum shifts are the registry's
# published national/mean Helmert transformations (their stated
# accuracy is the registry's, typically 1-10 m for the classic
# datums — the projection math itself is exact).
# ---------------------------------------------------------------------------

# ED50 / UTM zones 28N-38N (23028-23038): International 1924
# ellipsoid, mean-European Helmert
_ED50 = "+ellps=intl +towgs84=-87,-98,-121"
for _z in range(28, 39):
    EPSG_PROJ4[23000 + _z] = f"+proj=utm +zone={_z} {_ED50} +units=m"

# Pulkovo 1942 / Gauss-Krueger zones 2-32 (28402-28432): Krassowsky
# 1940, registry mean USSR transformation; 6-degree zones, zone-coded
# false easting
_PULKOVO = "+ellps=krass +towgs84=28,-130,-95"
for _z in range(2, 33):
    EPSG_PROJ4[28400 + _z] = (
        f"+proj=tmerc +lat_0=0 +lon_0={6 * _z - 3} +k=1 "
        f"+x_0={_z * 1_000_000 + 500_000} +y_0=0 {_PULKOVO} +units=m"
    )

# AGD66 / AMG zones 48-58 (20248-20258) and AGD84 / AMG zones 48-58
# (20348-20358): Australian National Spheroid, registry national
# transformations (7-param for AGD66, 3-param for AGD84)
_AGD66 = ("+ellps=aust_SA "
          "+towgs84=-117.808,-51.536,137.784,0.303,0.446,0.234,-0.29")
_AGD84 = "+ellps=aust_SA +towgs84=-134,-48,149"
for _z in range(48, 59):
    EPSG_PROJ4[20200 + _z] = (
        f"+proj=utm +zone={_z} +south {_AGD66} +units=m"
    )
    EPSG_PROJ4[20300 + _z] = (
        f"+proj=utm +zone={_z} +south {_AGD84} +units=m"
    )

# Japan Plane Rectangular CS zones I-XIX: JGD2000 (2443-2461) and
# JGD2011 (6669-6687), identical parameters (GRS80, null transform,
# k=0.9999, zero false origin); per-zone natural origins from the
# public registry
_JPRCS = [
    (33.0, 129.5), (33.0, 131.0), (36.0, 132.16666666666666),
    (33.0, 133.5), (36.0, 134.33333333333334), (36.0, 136.0),
    (36.0, 137.16666666666666), (36.0, 138.5),
    (36.0, 139.83333333333334), (40.0, 140.83333333333334),
    (44.0, 140.25), (44.0, 142.25), (44.0, 144.25), (26.0, 142.0),
    (26.0, 127.5), (26.0, 124.0), (26.0, 131.0), (20.0, 136.0),
    (26.0, 154.0),
]
for _i, (_la, _lo) in enumerate(_JPRCS):
    _p4 = (f"+proj=tmerc +lat_0={_la} +lon_0={_lo} +k=0.9999 "
           f"+x_0=0 +y_0=0 {_GRS80_NULL} +units=m")
    EPSG_PROJ4[2443 + _i] = _p4
    EPSG_PROJ4[6669 + _i] = _p4

# CGCS2000 / Gauss-Krueger 6-degree zones 13-23 (4491-4501,
# zone-coded FE) and CM variants 75E-135E (4502-4512, FE=500000);
# the CGCS2000 ellipsoid is numerically GRS80
for _z in range(13, 24):
    _lon = 6 * _z - 3
    EPSG_PROJ4[4478 + _z] = (
        f"+proj=tmerc +lat_0=0 +lon_0={_lon} +k=1 "
        f"+x_0={_z * 1_000_000 + 500_000} +y_0=0 {_GRS80_NULL} +units=m"
    )
    EPSG_PROJ4[4489 + _z] = (
        f"+proj=tmerc +lat_0=0 +lon_0={_lon} +k=1 "
        f"+x_0=500000 +y_0=0 {_GRS80_NULL} +units=m"
    )

# Argentina Gauss-Krueger fajas 1-7: POSGAR 94 (22181-22187) and
# POSGAR 2007 (5343-5349), identical parameters (lat_0 at the pole,
# faja-coded FE)
for _f in range(1, 8):
    _p4 = (f"+proj=tmerc +lat_0=-90 +lon_0={-75 + 3 * _f} +k=1 "
           f"+x_0={_f * 1_000_000 + 500_000} +y_0=0 "
           f"{_GRS80_NULL} +units=m")
    EPSG_PROJ4[22180 + _f] = _p4
    EPSG_PROJ4[5342 + _f] = _p4

# TUREF / TM zones 27..45 (5253-5259)
for _i in range(7):
    EPSG_PROJ4[5253 + _i] = (
        f"+proj=tmerc +lat_0=0 +lon_0={27 + 3 * _i} +k=1 "
        f"+x_0=500000 +y_0=0 {_GRS80_NULL} +units=m"
    )

# ETRS89 / Poland CS2000 zones 5-8 (2176-2179), zone-coded FE
for _z in range(5, 9):
    EPSG_PROJ4[2171 + _z] = (
        f"+proj=tmerc +lat_0=0 +lon_0={3 * _z} +k=0.999923 "
        f"+x_0={_z * 1_000_000 + 500_000} +y_0=0 {_GRS80_NULL} +units=m"
    )

# national TM singles
EPSG_PROJ4.update({
    # GGRS87 / Greek Grid (registry national transformation)
    2100: "+proj=tmerc +lat_0=0 +lon_0=24 +k=0.9996 +x_0=500000 "
          "+y_0=0 +ellps=GRS80 +towgs84=-199.87,74.79,246.62 +units=m",
    # HTRS96 / Croatia TM
    3765: "+proj=tmerc +lat_0=0 +lon_0=16.5 +k=0.9999 +x_0=500000 "
          f"+y_0=0 {_GRS80_NULL} +units=m",
    # LKS92 / Latvia TM
    3059: "+proj=tmerc +lat_0=0 +lon_0=24 +k=0.9996 +x_0=500000 "
          f"+y_0=-6000000 {_GRS80_NULL} +units=m",
    # LKS94 / Lithuania TM
    3346: "+proj=tmerc +lat_0=0 +lon_0=24 +k=0.9998 +x_0=500000 "
          f"+y_0=0 {_GRS80_NULL} +units=m",
    # TM65 / Irish Grid (modified Airy, registry 7-param)
    29902: "+proj=tmerc +lat_0=53.5 +lon_0=-8 +k=1.000035 "
           "+x_0=200000 +y_0=250000 +ellps=mod_airy "
           "+towgs84=482.5,-130.6,564.6,-1.042,-0.214,-0.631,8.15 "
           "+units=m",
    # TM75 / Irish Grid (same projection/datum family)
    29903: "+proj=tmerc +lat_0=53.5 +lon_0=-8 +k=1.000035 "
           "+x_0=200000 +y_0=250000 +ellps=mod_airy "
           "+towgs84=482.5,-130.6,564.6,-1.042,-0.214,-0.631,8.15 "
           "+units=m",
})

# LCC singles
EPSG_PROJ4.update({
    # L-EST97 / Estonian Coordinate System of 1997
    3301: "+proj=lcc +lat_1=59.33333333333334 +lat_2=58 "
          "+lat_0=57.51755393055556 +lon_0=24 +x_0=500000 "
          f"+y_0=6375000 {_GRS80_NULL} +units=m",
    # ISN93 / Lambert 1993 (Iceland)
    3057: "+proj=lcc +lat_1=64.25 +lat_2=65.75 +lat_0=65 +lon_0=-19 "
          f"+x_0=500000 +y_0=500000 {_GRS80_NULL} +units=m",
    # BD72 / Belgian Lambert 72 (registry national 7-param)
    31370: "+proj=lcc +lat_1=51.16666723333333 +lat_2=49.8333339 "
           "+lat_0=90 +lon_0=4.367486666666666 +x_0=150000.013 "
           "+y_0=5400088.438 +ellps=intl +towgs84=-106.8686,52.2978,"
           "-103.7239,0.3366,-0.457,1.8422,-1.2747 +units=m",
    # ETRS89 / Belgian Lambert 2008
    3812: "+proj=lcc +lat_1=49.83333333333334 +lat_2=51.16666666666667 "
          "+lat_0=50.797815 +lon_0=4.359215833333333 +x_0=649328 "
          f"+y_0=665262 {_GRS80_NULL} +units=m",
})

# Albers equal-area singles
EPSG_PROJ4.update({
    # NAD83 / California Albers
    3310: "+proj=aea +lat_1=34 +lat_2=40.5 +lat_0=0 +lon_0=-120 "
          f"+x_0=0 +y_0=-4000000 {_GRS80_NULL} +units=m",
    # GDA94 / Australian Albers
    3577: "+proj=aea +lat_1=-18 +lat_2=-36 +lat_0=0 +lon_0=132 "
          f"+x_0=0 +y_0=0 {_GRS80_NULL} +units=m",
    # NAD83(2011) / Conus Albers (parameter twin of EPSG:5070)
    6350: "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
          f"+x_0=0 +y_0=0 {_GRS80_NULL} +units=m",
})

# LAEA: WGS 84 / North Pole LAEA regional variants (3571-3576) and
# EASE-Grid 2.0 North/South (6931/6932)
for _code, _lon in ((3571, 180), (3572, -150), (3573, -100),
                    (3574, -40), (3575, 10), (3576, 90)):
    EPSG_PROJ4[_code] = (
        f"+proj=laea +lat_0=90 +lon_0={_lon} +x_0=0 +y_0=0 "
        "+ellps=WGS84 +towgs84=0,0,0 +units=m"
    )
EPSG_PROJ4[6931] = ("+proj=laea +lat_0=90 +lon_0=0 +x_0=0 +y_0=0 "
                    "+ellps=WGS84 +towgs84=0,0,0 +units=m")
EPSG_PROJ4[6932] = ("+proj=laea +lat_0=-90 +lon_0=0 +x_0=0 +y_0=0 "
                    "+ellps=WGS84 +towgs84=0,0,0 +units=m")

# polar stereographic: Arctic Polar Stereographic (3995) and
# Universal Polar Stereographic north/south (5041/5042 and the
# WGS84-coded twins 32661/32761)
EPSG_PROJ4[3995] = ("+proj=stere +lat_0=90 +lat_ts=71 +lon_0=0 "
                    "+x_0=0 +y_0=0 +ellps=WGS84 +towgs84=0,0,0 "
                    "+units=m")
for _c in (5041, 32661):
    EPSG_PROJ4[_c] = (
        "+proj=stere +lat_0=90 +k=0.994 +lon_0=0 +x_0=2000000 "
        "+y_0=2000000 +ellps=WGS84 +towgs84=0,0,0 +units=m"
    )
for _c in (5042, 32761):
    EPSG_PROJ4[_c] = (
        "+proj=stere +lat_0=-90 +k=0.994 +lon_0=0 +x_0=2000000 "
        "+y_0=2000000 +ellps=WGS84 +towgs84=0,0,0 +units=m"
    )

# NAD83 / California zones 1-6 in METERS (26941-26946): same cones
# as the ftUS zones 2225-2230, metric false origins
for _i, _usft_code in enumerate((2225, 2226, 2227, 2228, 2229, 2230)):
    EPSG_PROJ4[26941 + _i] = (
        EPSG_PROJ4[_usft_code]
        .replace("+x_0=2000000.0001016", "+x_0=2000000")
        .replace("+y_0=500000.0001016001", "+y_0=500000")
        .replace(_USFT, "+units=m")
    )


@lru_cache(maxsize=512)
def lookup_def(epsg: int):
    """Kernel-ready definition dict for a tabled EPSG code, or None.

    Routes through the proj4 text front door so tabled codes and
    pasted text resolve through identical code paths."""
    p4 = EPSG_PROJ4.get(epsg)
    if p4 is None:
        return None
    from . import crs_parse as _cp
    from .crs import _resolve_pdef

    _, d = _cp.parse_proj4(p4)
    return _resolve_pdef(tuple(sorted(d.items())))
