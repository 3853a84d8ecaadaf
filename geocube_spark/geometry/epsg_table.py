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

# SIRGAS 2000 / UTM south zones 17S-25S (31977-31985)
for _z in range(17, 26):
    EPSG_PROJ4[31960 + _z] = (
        f"+proj=utm +zone={_z} +south {_GRS80_NULL} +units=m"
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
