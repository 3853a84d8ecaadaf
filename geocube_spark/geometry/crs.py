"""Minimal CRS registry + vectorized numpy reprojection (no pyproj).

The engine supports the CRS families exercised by the reference test
suite plus the common national-grid families (SURVEY.md §2.8
"CRS reproject"; the reference accepts any pyproj CRS,
vector_to_cube.py:112-113):

* EPSG:4326 / CRS84 / 4258 / 4269  — geographic lon/lat
* EPSG:326xx / 327xx               — WGS84 / UTM zone xx N / S
* EPSG:258xx                       — ETRS89 / UTM (GRS80)
* EPSG:3857                        — spherical web mercator
* EPSG:27700                       — British National Grid
                                     (Airy 1830 + OSGB36 Helmert)
* EPSG:2154                        — RGF93 / Lambert-93 (LCC 2SP)
* EPSG:5070                        — NAD83 / CONUS Albers
* EPSG:3035                        — ETRS89-LAEA Europe
* EPSG:2180                        — ETRS89 / Poland CS92 (TM)

Transforms are closed-form numpy over coordinate arrays — exactly what
a vectorized pandas UDF wants. Transverse Mercator uses Karney's
6th-order Krüger series (public: C. F. F. Karney, "Transverse Mercator
with an accuracy of a few nanometers", J. Geodesy 85, 2011), with
series coefficients computed per ellipsoid. LCC 2SP / Albers / LAEA
follow the published EPSG Guidance Note 7-2 formulas. Datum changes go
through a 7-parameter Helmert on geocentric coordinates
(position-vector convention, EPSG parameter sets).

Reference parity: geocube reprojects the whole vector table to the
target grid CRS (reference geocube/vector_to_cube.py:112-113) and
reprojects bounds before grid planning (geobox.py:196-199).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

# ---------------------------------------------------------------------------
# ellipsoids & datums
# ---------------------------------------------------------------------------

ELLPS = {
    "WGS84": (6378137.0, 1.0 / 298.257223563),
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "airy": (6377563.396, 1.0 / 299.3249646),
    "intl": (6378388.0, 1.0 / 297.0),
    "clrk66": (6378206.4, 1.0 / 294.9786982139006),
    "bessel": (6377397.155, 1.0 / 299.1528128),
}


def register_ellps(a: float, invf: float) -> str:
    """Resolve an (a, 1/f) pair to an ELLPS name, registering a
    dynamic entry for non-stock ellipsoids (WKT/proj4 front door).
    Names are deterministic so driver and executor processes agree."""
    f = 1.0 / invf if invf else 0.0
    for name, (ka, kf) in ELLPS.items():
        if abs(ka - a) < 1e-4 and abs(kf - f) < 1e-12:
            return name
    name = f"a{a!r}_rf{invf!r}"
    ELLPS.setdefault(name, (a, f))
    return name

# 7-parameter Helmert to WGS84, position-vector convention:
# (tx, ty, tz [m], rx, ry, rz [arc-sec], ds [ppm]).  None = identity
# (WGS84 / ETRS89 / NAD83 agree within the engine's tolerance).
DATUM_TO_WGS84 = {
    "WGS84": None,
    "ETRS89": None,
    "NAD83": None,
    # OSGB36 -> WGS84 (EPSG transformation 1314, ~2 m accuracy)
    "OSGB36": (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894),
    # NAD27 -> WGS84 (EPSG transformation 1173 geocentric translations,
    # ~5 m CONUS; exact NAD27 needs NADCON grids the engine does not
    # ship)
    "NAD27": (-8.0, 160.0, 176.0, 0.0, 0.0, 0.0, 0.0),
}


def register_datum(towgs84: tuple) -> str:
    """Resolve a 7-parameter Helmert tuple to a datum name,
    registering a dynamic entry when it is not a stock datum."""
    tw = tuple(float(v) for v in towgs84)
    if all(abs(v) < 1e-12 for v in tw):
        return "WGS84"
    for name, params in DATUM_TO_WGS84.items():
        if params is not None and all(
            abs(p - v) < 1e-9 for p, v in zip(params, tw)
        ):
            return name
    name = "helmert" + ",".join(repr(v) for v in tw)
    DATUM_TO_WGS84.setdefault(name, tw)
    return name

_R_SPHERE = 6378137.0  # web mercator sphere radius


@lru_cache(maxsize=16)
def _kruger(ellps: str):
    """Karney 2011 6th-order alpha/beta series + rectifying radius for
    an ellipsoid (third flattening n)."""
    a, f = ELLPS[ellps]
    n = f / (2.0 - f)
    n2, n3, n4, n5, n6 = n**2, n**3, n**4, n**5, n**6
    a1 = a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    alpha = np.array(
        [
            n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180
            - 127 * n5 / 288 + 7891 * n6 / 37800,
            13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630
            - 1983433 * n6 / 1935360,
            61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880
            + 167603 * n6 / 181440,
            49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
            34729 * n5 / 80640 - 3418889 * n6 / 1995840,
            212378941 * n6 / 319334400,
        ]
    )
    beta = np.array(
        [
            n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512
            + 96199 * n6 / 604800,
            n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105
            - 1118711 * n6 / 3870720,
            17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480
            + 5569 * n6 / 90720,
            4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
            4583 * n5 / 161280 - 108847 * n6 / 3991680,
            20648693 * n6 / 638668800,
        ]
    )
    return a1, alpha, beta


def _eccentricity(ellps: str):
    a, f = ELLPS[ellps]
    e2 = f * (2 - f)
    return a, e2, np.sqrt(e2)


# ---------------------------------------------------------------------------
# transverse Mercator (Karney/Krüger series, any ellipsoid)
# ---------------------------------------------------------------------------

def _tm_forward(lon_deg, lat_deg, lon0_deg: float, ellps: str = "WGS84"):
    """Geographic -> transverse Mercator (unscaled easting/northing)."""
    a1, alpha, _ = _kruger(ellps)
    _, _, e = _eccentricity(ellps)
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64) - lon0_deg)
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    sphi = np.sin(phi)
    # conformal latitude tangent; arctanh(+-1) = +-inf at the poles
    # (legal input: e.g. the Gauss-Krueger fajas put lat_0 at -90) and
    # the downstream arctan2/hypot recover the exact finite limit
    with np.errstate(divide="ignore"):
        t = np.sinh(np.arctanh(sphi) - e * np.arctanh(e * sphi))
    xip = np.arctan2(t, np.cos(lam))
    etap = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xip.copy()
    eta = etap.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi += alpha[j] * np.sin(k * xip) * np.cosh(k * etap)
        eta += alpha[j] * np.cos(k * xip) * np.sinh(k * etap)
    return a1 * eta, a1 * xi  # (easting', northing')


def _tm_inverse(x, y, lon0_deg: float, ellps: str = "WGS84"):
    """Transverse Mercator (unscaled) -> geographic lon/lat degrees."""
    a1, _, beta = _kruger(ellps)
    _, e2, e = _eccentricity(ellps)
    eta = np.asarray(x, dtype=np.float64) / a1
    xi = np.asarray(y, dtype=np.float64) / a1
    xip = xi.copy()
    etap = eta.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xip -= beta[j] * np.sin(k * xi) * np.cosh(k * eta)
        etap -= beta[j] * np.cos(k * xi) * np.sinh(k * eta)
    se = np.sinh(etap)
    cx = np.cos(xip)
    taup = np.sin(xip) / np.hypot(se, cx)
    lam = np.arctan2(se, cx)

    # invert conformal latitude: Newton on tau (Karney 2011 eq. 19-21)
    tau = taup / np.sqrt(1 - e2)  # first guess
    for _ in range(5):
        sig = np.sinh(e * np.arctanh(e * tau / np.hypot(1.0, tau)))
        taup_i = tau * np.hypot(1.0, sig) - sig * np.hypot(1.0, tau)
        dtau = (
            (taup - taup_i)
            * (1 + (1 - e2) * tau**2)
            / ((1 - e2) * np.hypot(1.0, taup_i) * np.hypot(1.0, tau))
        )
        tau = tau + dtau
    phi = np.arctan(tau)
    return np.degrees(lam) + lon0_deg, np.degrees(phi)


# ---------------------------------------------------------------------------
# Lambert conformal conic (2SP), Albers equal-area, Lambert azimuthal
# equal-area — EPSG Guidance Note 7-2 closed forms
# ---------------------------------------------------------------------------

def _lcc_consts(ellps, lat0, sp1, sp2):
    a, e2, e = _eccentricity(ellps)

    def m(phi):
        s = np.sin(phi)
        return np.cos(phi) / np.sqrt(1 - e2 * s * s)

    def t(phi):
        s = np.sin(phi)
        return np.tan(np.pi / 4 - phi / 2) / (
            (1 - e * s) / (1 + e * s)
        ) ** (e / 2)

    p0, p1, p2 = np.radians([lat0, sp1, sp2])
    m1, m2 = m(p1), m(p2)
    t0, t1, t2 = t(p0), t(p1), t(p2)
    if abs(sp1 - sp2) < 1e-12:
        nn = np.sin(p1)
    else:
        nn = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    if abs(nn) < 1e-9:
        # parallels symmetric about / on the equator: the cone
        # degenerates to a cylinder and every formula divides by n
        raise ValueError(
            f"LCC standard parallels lat_1={sp1}, lat_2={sp2} give a "
            "zero cone constant (projection undefined); use Mercator "
            "for an equatorial aspect"
        )
    F = m1 / (nn * t1**nn)
    rho0 = a * F * t0**nn
    return a, e, nn, F, rho0, t


def _lcc_forward(lon, lat, p):
    a, e, nn, F, rho0, t = _lcc_consts(
        p["ellps"], p["lat0"], p["sp1"], p["sp2"]
    )
    # 1SP variant (EPSG 9801): rho and rho0 both scale by k0, which
    # scales the whole (x, y) offset; 2SP has k0 = 1.
    k0 = p.get("k0", 1.0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    rho = a * F * t(phi) ** nn
    th = nn * np.radians(np.asarray(lon, dtype=np.float64) - p["lon0"])
    return k0 * rho * np.sin(th), k0 * (rho0 - rho * np.cos(th))


def _lcc_inverse(x, y, p):
    a, e, nn, F, rho0, _ = _lcc_consts(
        p["ellps"], p["lat0"], p["sp1"], p["sp2"]
    )
    k0 = p.get("k0", 1.0)
    x = np.asarray(x, dtype=np.float64) / k0
    y = np.asarray(y, dtype=np.float64) / k0
    rho = np.sign(nn) * np.hypot(x, rho0 - y)
    th = np.arctan2(np.sign(nn) * x, np.sign(nn) * (rho0 - y))
    tp = (rho / (a * F)) ** (1.0 / nn)
    # invert isometric latitude by fixed point (EPSG 7-2)
    phi = np.pi / 2 - 2 * np.arctan(tp)
    for _ in range(8):
        s = e * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(
            tp * ((1 - s) / (1 + s)) ** (e / 2)
        )
    return np.degrees(th / nn) + p["lon0"], np.degrees(phi)


def _albers_consts(ellps, lat0, sp1, sp2):
    a, e2, e = _eccentricity(ellps)

    def m(phi):
        s = np.sin(phi)
        return np.cos(phi) / np.sqrt(1 - e2 * s * s)

    def q(phi):
        s = np.sin(phi)
        return (1 - e2) * (
            s / (1 - e2 * s * s)
            - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
        )

    p0, p1, p2 = np.radians([lat0, sp1, sp2])
    m1, m2 = m(p1), m(p2)
    q0, q1, q2 = q(p0), q(p1), q(p2)
    if abs(sp1 - sp2) < 1e-12:
        nn = np.sin(p1)
    else:
        nn = (m1 * m1 - m2 * m2) / (q2 - q1)
    if abs(nn) < 1e-9:
        raise ValueError(
            f"Albers standard parallels lat_1={sp1}, lat_2={sp2} give "
            "a zero cone constant (projection undefined); use a "
            "cylindrical equal-area CRS for an equatorial aspect"
        )
    C = m1 * m1 + nn * q1
    rho0 = a * np.sqrt(C - nn * q0) / nn
    return a, e, e2, nn, C, rho0, q


def _albers_forward(lon, lat, p):
    a, e, e2, nn, C, rho0, q = _albers_consts(
        p["ellps"], p["lat0"], p["sp1"], p["sp2"]
    )
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    rho = a * np.sqrt(C - nn * q(phi)) / nn
    th = nn * np.radians(np.asarray(lon, dtype=np.float64) - p["lon0"])
    return rho * np.sin(th), rho0 - rho * np.cos(th)


def _albers_inverse(x, y, p):
    a, e, e2, nn, C, rho0, _ = _albers_consts(
        p["ellps"], p["lat0"], p["sp1"], p["sp2"]
    )
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    # Snyder 14-10/14-11: rho and theta take the cone constant's sign
    # (southern-parallel cones have n < 0, e.g. Australian Albers)
    sgn = 1.0 if nn >= 0 else -1.0
    rho = sgn * np.hypot(x, rho0 - y)
    qv = (C - (rho * nn / a) ** 2) / nn
    th = np.arctan2(sgn * x, sgn * (rho0 - y))
    # invert authalic latitude (Snyder 3-16 iteration)
    phi = np.arcsin(np.clip(qv / 2, -1, 1))
    for _ in range(8):
        s = np.sin(phi)
        phi = phi + (
            (1 - e2 * s * s) ** 2
            / (2 * np.cos(phi) + 1e-300)
            * (
                qv / (1 - e2)
                - s / (1 - e2 * s * s)
                + (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
            )
        )
    return np.degrees(th / nn) + p["lon0"], np.degrees(phi)


def _laea_forward(lon, lat, p):
    a, e2, e = _eccentricity(p["ellps"])

    def q(phi):
        s = np.sin(phi)
        return (1 - e2) * (
            s / (1 - e2 * s * s)
            - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
        )

    qp = q(np.pi / 2)
    p0 = np.radians(p["lat0"])
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - p["lon0"])
    if abs(abs(p["lat0"]) - 90.0) < 1e-9:
        # polar aspect (Snyder 24-23/24-24): the oblique form's D
        # divides by cos(beta_0) = 0 here
        if p["lat0"] > 0:
            rho = a * np.sqrt(np.maximum(qp - q(phi), 0.0))
            return rho * np.sin(lam), -rho * np.cos(lam)
        rho = a * np.sqrt(np.maximum(qp + q(phi), 0.0))
        return rho * np.sin(lam), rho * np.cos(lam)
    b0 = np.arcsin(q(p0) / qp)
    bb = np.arcsin(np.clip(q(phi) / qp, -1, 1))
    rq = a * np.sqrt(qp / 2)
    D = a * (np.cos(p0) / np.sqrt(1 - e2 * np.sin(p0) ** 2)) / (
        rq * np.cos(b0)
    )
    B = rq * np.sqrt(
        2
        / (
            1
            + np.sin(b0) * np.sin(bb)
            + np.cos(b0) * np.cos(bb) * np.cos(lam)
        )
    )
    x = B * D * np.cos(bb) * np.sin(lam)
    y = (B / D) * (
        np.cos(b0) * np.sin(bb) - np.sin(b0) * np.cos(bb) * np.cos(lam)
    )
    return x, y


def _laea_inverse(x, y, p):
    a, e2, e = _eccentricity(p["ellps"])

    def q(phi):
        s = np.sin(phi)
        return (1 - e2) * (
            s / (1 - e2 * s * s)
            - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
        )

    qp = q(np.pi / 2)
    p0 = np.radians(p["lat0"])
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if abs(abs(p["lat0"]) - 90.0) < 1e-9:
        # polar aspect: invert Snyder 24-23/24-24 directly
        rho = np.hypot(x, y)
        if p["lat0"] > 0:
            qv = qp - (rho / a) ** 2
            lam = np.arctan2(x, -y)
        else:
            qv = (rho / a) ** 2 - qp
            lam = np.arctan2(x, y)
    else:
        b0 = np.arcsin(q(p0) / qp)
        rq = a * np.sqrt(qp / 2)
        D = a * (np.cos(p0) / np.sqrt(1 - e2 * np.sin(p0) ** 2)) / (
            rq * np.cos(b0)
        )
        rho = np.hypot(x / D, D * y)
        ce = 2 * np.arcsin(np.clip(rho / (2 * rq), -1, 1))
        with np.errstate(invalid="ignore", divide="ignore"):
            bb = np.where(
                rho == 0,
                b0,
                np.arcsin(
                    np.cos(ce) * np.sin(b0)
                    + (D * y * np.sin(ce) * np.cos(b0))
                    / np.where(rho == 0, 1, rho)
                ),
            )
            lam = np.arctan2(
                x * np.sin(ce),
                D * rho * np.cos(b0) * np.cos(ce)
                - D * D * y * np.sin(b0) * np.sin(ce),
            )
            qv = qp * np.sin(bb)
    # authalic-latitude start (== beta in the oblique branch)
    phi = np.arcsin(np.clip(qv / qp, -1, 1))
    for _ in range(8):
        s = np.sin(phi)
        phi = phi + (
            (1 - e2 * s * s) ** 2
            / (2 * np.cos(phi) + 1e-300)
            * (
                qv / (1 - e2)
                - s / (1 - e2 * s * s)
                + (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
            )
        )
    return np.degrees(lam) + p["lon0"], np.degrees(phi)


# ---------------------------------------------------------------------------
# ellipsoidal Mercator (EPSG 9804 variant A / 9805 variant B)
# ---------------------------------------------------------------------------

def _merc_forward(lon, lat, p):
    a, e2, e = _eccentricity(p["ellps"])
    k0 = p.get("k0", 1.0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - p["lon0"])
    s = e * np.sin(phi)
    x = a * k0 * lam
    y = a * k0 * np.log(
        np.tan(np.pi / 4 + phi / 2) * ((1 - s) / (1 + s)) ** (e / 2)
    )
    return x, y


def _merc_inverse(x, y, p):
    a, e2, e = _eccentricity(p["ellps"])
    k0 = p.get("k0", 1.0)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    t = np.exp(-y / (a * k0))
    phi = np.pi / 2 - 2 * np.arctan(t)
    # invert the isometric latitude (EPSG GN7-2 fixed point)
    for _ in range(8):
        s = e * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t * ((1 - s) / (1 + s)) ** (e / 2))
    lon = np.degrees(x / (a * k0)) + p["lon0"]
    return lon, np.degrees(phi)


def merc_k0_from_sp(ellps: str, sp1_deg: float) -> float:
    """Variant B (2SP): scale factor from the standard parallel
    (EPSG GN7-2: k0 = cos(sp1)/sqrt(1 - e^2 sin^2 sp1))."""
    a, e2, e = _eccentricity(ellps)
    sp = np.radians(sp1_deg)
    return float(np.cos(sp) / np.sqrt(1 - e2 * np.sin(sp) ** 2))


# ---------------------------------------------------------------------------
# polar stereographic (EPSG 9810 variant A / 9829 variant B)
# ---------------------------------------------------------------------------

def _ps_scale(p):
    """rho = K * t(phi); K from the standard parallel (variant B,
    'sp1' in the def) or the natural-origin scale factor (variant A,
    'k0'). EPSG GN7-2 formulas."""
    a, e2, e = _eccentricity(p["ellps"])
    if "sp1" in p and p["sp1"] is not None:
        pf = np.radians(abs(p["sp1"]))
        s = e * np.sin(pf)
        mF = np.cos(pf) / np.sqrt(1 - e2 * np.sin(pf) ** 2)
        tF = np.tan(np.pi / 4 - pf / 2) * ((1 + s) / (1 - s)) ** (e / 2)
        return a * mF / tF
    k0 = p.get("k0", 1.0)
    C = np.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
    return 2 * a * k0 / C


def _ps_forward(lon, lat, p):
    """North aspect; the south aspect maps through (-lat, same lon)
    with the northing mirrored (the two variants' published formulas
    are exactly this reflection of each other)."""
    a, e2, e = _eccentricity(p["ellps"])
    K = _ps_scale(p)
    south = p.get("south", False)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    if south:
        phi = -phi
    lam = np.radians(np.asarray(lon, dtype=np.float64) - p["lon0"])
    s = e * np.sin(phi)
    t = np.tan(np.pi / 4 - phi / 2) * ((1 + s) / (1 - s)) ** (e / 2)
    rho = K * t
    x = rho * np.sin(lam)
    y = -rho * np.cos(lam)
    if south:
        y = -y
    return x, y


def _ps_inverse(x, y, p):
    a, e2, e = _eccentricity(p["ellps"])
    K = _ps_scale(p)
    south = p.get("south", False)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if south:
        y = -y
    rho = np.hypot(x, y)
    t = rho / K
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        s = e * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t * ((1 - s) / (1 + s)) ** (e / 2))
    lam = np.arctan2(x, -y)
    if south:
        phi = -phi
    return np.degrees(lam) + p["lon0"], np.degrees(phi)


# ---------------------------------------------------------------------------
# datum shift: geodetic <-> geocentric + 7-parameter Helmert
# ---------------------------------------------------------------------------

def _geodetic_to_geocentric(lon, lat, ellps):
    a, e2, _ = _eccentricity(ellps)
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    s, c = np.sin(phi), np.cos(phi)
    nu = a / np.sqrt(1 - e2 * s * s)
    return nu * c * np.cos(lam), nu * c * np.sin(lam), nu * (1 - e2) * s


def _geocentric_to_geodetic(X, Y, Z, ellps):
    a, e2, _ = _eccentricity(ellps)
    lam = np.arctan2(Y, X)
    pr = np.hypot(X, Y)
    phi = np.arctan2(Z, pr * (1 - e2))
    for _ in range(12):  # converges geometrically; 12 gives < 0.1 nm
        s = np.sin(phi)
        nu = a / np.sqrt(1 - e2 * s * s)
        phi = np.arctan2(Z + e2 * nu * s, pr)
    return np.degrees(lam), np.degrees(phi)


def _helmert(X, Y, Z, params, inverse=False):
    tx, ty, tz, rx, ry, rz, ds = params
    rx, ry, rz = np.radians(np.array([rx, ry, rz]) / 3600.0)
    m = 1.0 + ds * 1e-6
    if inverse:
        # exact inverse of the (small-angle) position-vector transform
        Xs = (np.asarray(X) - tx)
        Ys = (np.asarray(Y) - ty)
        Zs = (np.asarray(Z) - tz)
        # solve m * R v = s with R = I + skew(r): invert linearly
        det = 1 + rx * rx + ry * ry + rz * rz
        vx = (Xs * (1 + rx * rx) + Ys * (rz + rx * ry)
              + Zs * (rx * rz - ry)) / (m * det)
        vy = (Xs * (rx * ry - rz) + Ys * (1 + ry * ry)
              + Zs * (ry * rz + rx)) / (m * det)
        vz = (Xs * (ry + rx * rz) + Ys * (ry * rz - rx)
              + Zs * (1 + rz * rz)) / (m * det)
        return vx, vy, vz
    Xp = tx + m * (np.asarray(X) - rz * np.asarray(Y) + ry * np.asarray(Z))
    Yp = ty + m * (rz * np.asarray(X) + np.asarray(Y) - rx * np.asarray(Z))
    Zp = tz + m * (-ry * np.asarray(X) + rx * np.asarray(Y) + np.asarray(Z))
    return Xp, Yp, Zp


def _datum_to_wgs84(lon, lat, ellps, datum):
    params = DATUM_TO_WGS84.get(datum)
    if params is None:
        return lon, lat
    X, Y, Z = _geodetic_to_geocentric(lon, lat, ellps)
    X, Y, Z = _helmert(X, Y, Z, params)
    return _geocentric_to_geodetic(X, Y, Z, "WGS84")


def _wgs84_to_datum(lon, lat, ellps, datum):
    params = DATUM_TO_WGS84.get(datum)
    if params is None:
        return lon, lat
    X, Y, Z = _geodetic_to_geocentric(lon, lat, "WGS84")
    X, Y, Z = _helmert(X, Y, Z, params, inverse=True)
    return _geocentric_to_geodetic(X, Y, Z, ellps)


# ---------------------------------------------------------------------------
# projected CRS registry (parameters are public EPSG definitions)
# ---------------------------------------------------------------------------

def _tm_def(lon0, lat0, k0, fe, fn, ellps="WGS84", datum="WGS84"):
    return {"kind": "tm", "lon0": lon0, "lat0": lat0, "k0": k0,
            "fe": fe, "fn": fn, "ellps": ellps, "datum": datum}


CRS_DEFS: dict = {
    4326: {"kind": "geographic", "ellps": "WGS84", "datum": "WGS84"},
    4258: {"kind": "geographic", "ellps": "GRS80", "datum": "ETRS89"},
    4269: {"kind": "geographic", "ellps": "GRS80", "datum": "NAD83"},
    3857: {"kind": "webmerc"},
    # OSGB36 / British National Grid
    27700: _tm_def(-2.0, 49.0, 0.9996012717, 400000.0, -100000.0,
                   "airy", "OSGB36"),
    # ETRS89 / Poland CS92
    2180: _tm_def(19.0, 0.0, 0.9993, 500000.0, -5300000.0,
                  "GRS80", "ETRS89"),
    # RGF93 / Lambert-93
    2154: {"kind": "lcc", "lon0": 3.0, "lat0": 46.5, "sp1": 44.0,
           "sp2": 49.0, "fe": 700000.0, "fn": 6600000.0,
           "ellps": "GRS80", "datum": "ETRS89"},
    # NAD83 / CONUS Albers
    5070: {"kind": "albers", "lon0": -96.0, "lat0": 23.0, "sp1": 29.5,
           "sp2": 45.5, "fe": 0.0, "fn": 0.0,
           "ellps": "GRS80", "datum": "NAD83"},
    # ETRS89-extended / LAEA Europe
    3035: {"kind": "laea", "lon0": 10.0, "lat0": 52.0,
           "fe": 4321000.0, "fn": 3210000.0,
           "ellps": "GRS80", "datum": "ETRS89"},
    # WGS 84 / World Mercator (ellipsoidal, variant A, k0=1)
    3395: {"kind": "merc", "lon0": 0.0, "k0": 1.0, "fe": 0.0, "fn": 0.0,
           "ellps": "WGS84", "datum": "WGS84"},
    # WGS 84 / Antarctic Polar Stereographic (variant B, sp=-71)
    3031: {"kind": "ps", "south": True, "sp1": -71.0, "lon0": 0.0,
           "fe": 0.0, "fn": 0.0, "ellps": "WGS84", "datum": "WGS84"},
    # WGS 84 / NSIDC Sea Ice Polar Stereographic North (sp=70, lon0=-45)
    3413: {"kind": "ps", "south": False, "sp1": 70.0, "lon0": -45.0,
           "fe": 0.0, "fn": 0.0, "ellps": "WGS84", "datum": "WGS84"},
    # WGS 84 / NSIDC Sea Ice Polar Stereographic South (sp=-70)
    3976: {"kind": "ps", "south": True, "sp1": -70.0, "lon0": 0.0,
           "fe": 0.0, "fn": 0.0, "ellps": "WGS84", "datum": "WGS84"},
}

# WGS84 / UTM north + south and ETRS89 / UTM
for _z in range(1, 61):
    CRS_DEFS[32600 + _z] = _tm_def(-183.0 + 6.0 * _z, 0.0, 0.9996,
                                   500000.0, 0.0)
    CRS_DEFS[32700 + _z] = _tm_def(-183.0 + 6.0 * _z, 0.0, 0.9996,
                                   500000.0, 10000000.0)
for _z in range(28, 39):
    CRS_DEFS[25800 + _z] = _tm_def(-183.0 + 6.0 * _z, 0.0, 0.9996,
                                   500000.0, 0.0, "GRS80", "ETRS89")
# NAD83 / UTM zones 1N-23N (EPSG 26901-26923, GRS80) and
# NAD27 / UTM zones 1N-22N (EPSG 26701-26722, Clarke 1866)
for _z in range(1, 24):
    CRS_DEFS[26900 + _z] = _tm_def(-183.0 + 6.0 * _z, 0.0, 0.9996,
                                   500000.0, 0.0, "GRS80", "NAD83")
for _z in range(1, 23):
    CRS_DEFS[26700 + _z] = _tm_def(-183.0 + 6.0 * _z, 0.0, 0.9996,
                                   500000.0, 0.0, "clrk66", "NAD27")


def _wkt_tail_epsg(s: str):
    """CRS-level EPSG id from a WKT tail (WKT2 ID / WKT1 AUTHORITY)."""
    m = re.search(r'ID\["EPSG",\s*(\d+)\]\s*\]\s*$', s)
    if m:
        return int(m.group(1))
    m = re.search(r'AUTHORITY\["EPSG",\s*"(\d+)"\]\s*\]\s*$', s)
    if m:
        return int(m.group(1))
    return None


@lru_cache(maxsize=256)
def _resolve_pdef(pdef: tuple) -> dict:
    """Raw parsed parameters (hashable item-tuple) -> kernel-ready
    definition: ellipsoid/datum resolved to registered names, variant-B
    Mercator k0 derived from its standard parallel. Cached per process
    so executors pay the resolution once per CRS."""
    raw = dict(pdef)
    d = {"kind": raw["kind"]}
    ellps = register_ellps(raw["ellps_a"], raw["ellps_invf"])
    d["ellps"] = ellps
    if "towgs84" in raw:
        d["datum"] = register_datum(raw["towgs84"])
    else:
        d["datum"] = raw.get("datum", "WGS84")
    for k in ("lon0", "lat0", "k0", "fe", "fn", "sp1", "sp2",
              "south", "to_meter"):
        if k in raw:
            d[k] = raw[k]
    if d["kind"] == "merc" and d.get("k0") is None:
        d["k0"] = merc_k0_from_sp(ellps, d.get("sp1", 0.0))
    return d


@dataclass(frozen=True, eq=False)
class CRS:
    """A coordinate reference system: an EPSG code from the built-in
    registry, or parsed projection parameters (``pdef``) from
    WKT1/WKT2/proj4 text for CRSs outside it (epsg = -1 when the text
    carried no EPSG identity)."""

    epsg: int
    pdef: tuple = None

    # Parameterized CRSs compare by parameters, not by code: a worker
    # rebuilt from .spec loses a non-registry EPSG id, and two texts
    # with identical parameters ARE the same CRS.
    def __eq__(self, other):
        if not isinstance(other, CRS):
            return NotImplemented
        if self.pdef is not None or other.pdef is not None:
            return self.pdef == other.pdef
        return self.epsg == other.epsg

    def __hash__(self):
        return hash(self.pdef) if self.pdef is not None else hash(self.epsg)

    # ---- constructors ---------------------------------------------------
    @staticmethod
    def from_user_input(value) -> "CRS":
        if value is None:
            raise ValueError("CRS value is None")
        if isinstance(value, CRS):
            return value
        if isinstance(value, int):
            return CRS(value)
        s = str(value).strip()
        m = re.match(r"(?i)^(?:urn:ogc:def:crs:)?epsg:+(?:\d+\.?\d*:)?(\d+)$", s)
        if m:
            return CRS(int(m.group(1)))
        if re.match(r"(?i)^(?:urn:ogc:def:crs:)?(?:OGC:(?:1\.3:)?)?CRS84$", s):
            return CRS(4326)
        m = re.match(r"(?i)^\+?init=epsg:(\d+)$", s)
        if m:
            return CRS(int(m.group(1)))

        from . import crs_parse as _cp

        if _cp.looks_like_wkt(s):
            try:
                epsg, d = _cp.parse_wkt(s)
            except ValueError:
                # structurally odd WKT: fall back to the EPSG tail
                # (e.g. an exotic method whose code IS registered)
                code = _wkt_tail_epsg(s)
                if code is not None and code in CRS_DEFS:
                    return CRS(code)
                raise
            # registry shortcut ONLY when the text carries no custom
            # datum transformation — a BOUNDCRS (or inline TOWGS84)
            # wrapping a registry code exists precisely to override
            # the registry's transformation, so honor it
            if (epsg is not None and epsg in CRS_DEFS
                    and "towgs84" not in d):
                return CRS(epsg)
            return CRS(epsg if epsg is not None else -1,
                       tuple(sorted(d.items())))
        if _cp.looks_like_proj4(s):
            _, d = _cp.parse_proj4(s)
            return CRS(-1, tuple(sorted(d.items())))

        code = _wkt_tail_epsg(s)
        if code is not None:
            return CRS(code)
        raise ValueError(f"unsupported CRS: {value!r}")

    # ---- properties -----------------------------------------------------
    @property
    def _def(self) -> dict:
        if self.pdef is not None:
            return _resolve_pdef(self.pdef)
        try:
            return CRS_DEFS[self.epsg]
        except KeyError:
            pass
        # bare-EPSG front door: curated public-registry parameter
        # table for common projected families (routes through the
        # same proj4 parser as pasted text)
        from .epsg_table import lookup_def

        d = lookup_def(self.epsg)
        if d is not None:
            return d
        raise ValueError(
            f"unsupported projected CRS EPSG:{self.epsg} — supported "
            "families: geographic (4326/4258/4269), UTM (326xx/327xx/"
            "258xx/269xx/267xx), web mercator (3857), TM national "
            "grids (27700, 2180), LCC (2154), Albers (5070), LAEA "
            "(3035), plus the curated bare-code table in "
            "geometry/epsg_table.py (US State Plane NAD83, NZTM, "
            "MGA/GDA/AGD, SIRGAS UTM, ED50/Pulkovo/CGCS2000/POSGAR "
            "Gauss-Krueger, Japan JGD zones, European TM/LCC grids, "
            "polar LAEA/stereographic, Albers). Any other "
            "CRS can be passed as WKT1/WKT2 or proj4 TEXT (Transverse "
            "Mercator, LCC 1SP/2SP, Albers, LAEA, Mercator, polar "
            "stereographic methods are parsed into closed-form "
            "kernels), or extend geometry.epsg_table.EPSG_PROJ4 with "
            "public EPSG parameters"
        ) from None

    @property
    def spec(self) -> str:
        """Worker-shippable string handle: ``epsg:N`` for registry
        CRSs, canonical proj4 text for parameterized ones.
        ``CRS.from_user_input(spec)`` reconstructs an equal CRS in any
        process."""
        if self.pdef is None:
            return f"epsg:{self.epsg}"
        from . import crs_parse as _cp

        return _cp.def_to_spec(dict(self.pdef))

    @property
    def is_geographic(self) -> bool:
        return self._def["kind"] == "geographic"

    @property
    def is_utm(self) -> bool:
        return 32601 <= self.epsg <= 32660 or 32701 <= self.epsg <= 32760

    @property
    def utm_zone(self) -> int:
        if not self.is_utm:
            raise ValueError(f"EPSG:{self.epsg} is not UTM")
        return self.epsg % 100

    @property
    def utm_south(self) -> bool:
        return 32701 <= self.epsg <= 32760

    @property
    def central_meridian(self) -> float:
        return -183.0 + 6.0 * self.utm_zone

    def to_string(self) -> str:
        if self.pdef is not None and self.epsg <= 0:
            return self.spec
        return f"EPSG:{self.epsg}"

    def to_wkt(self) -> str:
        """WKT2 with real projection parameters (from CRS_DEFS), so
        files carrying this WKT are interpretable by GDAL/pyproj."""
        d = self._def

        def _geog(name_id=None):
            ellps = d.get("ellps", "WGS84")
            a, f = ELLPS[ellps]
            datum = d.get("datum", "WGS84")
            names = {
                "WGS84": ("WGS 84", "World Geodetic System 1984",
                          "WGS 84"),
                "ETRS89": ("ETRS89", "European Terrestrial Reference "
                           "System 1989", "GRS 1980"),
                "NAD83": ("NAD83", "North American Datum 1983",
                          "GRS 1980"),
                "OSGB36": ("OSGB36", "Ordnance Survey of Great Britain "
                           "1936", "Airy 1830"),
            }
            gname, dname, ename = names.get(datum, (datum, datum, ellps))
            inner = (
                f'BASEGEOGCRS["{gname}",DATUM["{dname}",'
                f'ELLIPSOID["{ename}",{a!r},{1.0 / f!r},'
                'LENGTHUNIT["metre",1]]],'
                'PRIMEM["Greenwich",0,ANGLEUNIT["degree",'
                "0.0174532925199433]]]"
            )
            return inner

        if d["kind"] == "geographic":
            g = _geog().replace("BASEGEOGCRS", "GEOGCRS", 1)[:-1]
            return (
                g + ',CS[ellipsoidal,2],AXIS["latitude",north],'
                'AXIS["longitude",east],ANGLEUNIT["degree",'
                "0.0174532925199433],"
                f'ID["EPSG",{self.epsg}]]'
            )
        if d["kind"] == "webmerc":
            return (
                f'PROJCRS["WGS 84 / Pseudo-Mercator",'
                'BASEGEOGCRS["WGS 84",DATUM["World Geodetic System '
                '1984",ELLIPSOID["WGS 84",6378137,298.257223563,'
                'LENGTHUNIT["metre",1]]]],'
                'CONVERSION["Popular Visualisation Pseudo-Mercator",'
                'METHOD["Popular Visualisation Pseudo Mercator",'
                'ID["EPSG",1024]],'
                'PARAMETER["Latitude of natural origin",0],'
                'PARAMETER["Longitude of natural origin",0],'
                'PARAMETER["False easting",0],'
                'PARAMETER["False northing",0]],'
                "CS[Cartesian,2],"
                'AXIS["easting (X)",east],AXIS["northing (Y)",north],'
                'LENGTHUNIT["metre",1],'
                f'ID["EPSG",{self.epsg}]]'
            )
        kind = d["kind"]
        lcc_1sp = kind == "lcc" and d.get("k0", 1.0) != 1.0
        method = {
            "tm": ('Transverse Mercator', 9807),
            "lcc": (('Lambert Conic Conformal (1SP)', 9801) if lcc_1sp
                    else ('Lambert Conic Conformal (2SP)', 9802)),
            "albers": ('Albers Equal Area', 9822),
            "laea": ('Lambert Azimuthal Equal Area', 9820),
            "merc": ('Mercator (variant A)', 9804),
            "ps": (('Polar Stereographic (variant B)', 9829)
                   if d.get("sp1") is not None
                   else ('Polar Stereographic (variant A)', 9810)),
        }[kind]
        if kind == "ps" and d.get("sp1") is not None:
            params = [
                ("Latitude of standard parallel", d["sp1"]),
                ("Longitude of origin", d.get("lon0", 0.0)),
            ]
        elif kind == "ps":
            params = [
                ("Latitude of natural origin",
                 -90.0 if d.get("south") else 90.0),
                ("Longitude of natural origin", d.get("lon0", 0.0)),
                ("Scale factor at natural origin", d.get("k0", 1.0)),
            ]
        else:
            natural = kind in ("tm", "laea", "merc") or lcc_1sp
            params = [
                ("Latitude of natural origin"
                 if natural else "Latitude of false origin",
                 d.get("lat0", 0.0)),
                ("Longitude of natural origin"
                 if natural else "Longitude of false origin",
                 d.get("lon0", 0.0)),
            ]
        if kind in ("tm", "merc") or lcc_1sp:
            params.append(
                ("Scale factor at natural origin", d.get("k0", 1.0))
            )
        if (kind in ("lcc", "albers")) and not lcc_1sp:
            params.append(("Latitude of 1st standard parallel",
                           d["sp1"]))
            params.append(("Latitude of 2nd standard parallel",
                           d["sp2"]))
        # false easting/northing are stored in metres internally but
        # written in the CRS's own linear unit (WKT convention)
        unit = d.get("to_meter", 1.0)
        params.append(("False easting", d.get("fe", 0.0) / unit))
        params.append(("False northing", d.get("fn", 0.0) / unit))
        pw = ",".join(
            f'PARAMETER["{n}",{v!r}]' for n, v in params
        )
        name = (f"EPSG:{self.epsg}" if self.epsg > 0
                else "engine parameterized CRS")
        tail = (f',ID["EPSG",{self.epsg}]]' if self.epsg > 0 else "]")
        return (
            f'PROJCRS["{name}",{_geog()},'
            f'CONVERSION["{method[0]}",METHOD["{method[0]}",'
            f'ID["EPSG",{method[1]}]],{pw}],'
            "CS[Cartesian,2],"
            'AXIS["easting (E)",east],AXIS["northing (N)",north],'
            f'LENGTHUNIT["unit",{unit!r}]' + tail
        )

    def __str__(self):
        return self.to_string()

    # ---- projection core --------------------------------------------------
    def _to_lonlat(self, x, y):
        """Projected/native -> WGS84 lon/lat degrees."""
        d = self._def
        kind = d["kind"]
        tmu = d.get("to_meter", 1.0)
        if tmu != 1.0:
            # CRS expressed in feet etc.: kernels work in metres
            x = np.asarray(x, dtype=np.float64) * tmu
            y = np.asarray(y, dtype=np.float64) * tmu
        if kind == "merc":
            lon, lat = _merc_inverse(
                np.asarray(x, dtype=np.float64) - d["fe"],
                np.asarray(y, dtype=np.float64) - d["fn"], d,
            )
            return _datum_to_wgs84(lon, lat, d["ellps"], d["datum"])
        if kind == "ps":
            lon, lat = _ps_inverse(
                np.asarray(x, dtype=np.float64) - d["fe"],
                np.asarray(y, dtype=np.float64) - d["fn"], d,
            )
            return _datum_to_wgs84(lon, lat, d["ellps"], d["datum"])
        if kind == "geographic":
            lon = np.asarray(x, dtype=np.float64)
            lat = np.asarray(y, dtype=np.float64)
            return _datum_to_wgs84(lon, lat, d["ellps"], d["datum"])
        if kind == "webmerc":
            lon = np.degrees(np.asarray(x, dtype=np.float64) / _R_SPHERE)
            lat = np.degrees(
                2 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / _R_SPHERE))
                - np.pi / 2
            )
            return lon, lat
        if kind == "tm":
            fe = np.asarray(x, dtype=np.float64) - d["fe"]
            fn = np.asarray(y, dtype=np.float64) - d["fn"]
            if d["lat0"] != 0.0:
                _, n0 = _tm_forward(d["lon0"], d["lat0"], d["lon0"],
                                    d["ellps"])
                fn = fn + d["k0"] * n0
            lon, lat = _tm_inverse(fe / d["k0"], fn / d["k0"], d["lon0"],
                                   d["ellps"])
            return _datum_to_wgs84(lon, lat, d["ellps"], d["datum"])
        if kind == "lcc":
            lon, lat = _lcc_inverse(
                np.asarray(x, dtype=np.float64) - d["fe"],
                np.asarray(y, dtype=np.float64) - d["fn"], d,
            )
            return _datum_to_wgs84(lon, lat, d["ellps"], d["datum"])
        if kind == "albers":
            lon, lat = _albers_inverse(
                np.asarray(x, dtype=np.float64) - d["fe"],
                np.asarray(y, dtype=np.float64) - d["fn"], d,
            )
            return _datum_to_wgs84(lon, lat, d["ellps"], d["datum"])
        if kind == "laea":
            lon, lat = _laea_inverse(
                np.asarray(x, dtype=np.float64) - d["fe"],
                np.asarray(y, dtype=np.float64) - d["fn"], d,
            )
            return _datum_to_wgs84(lon, lat, d["ellps"], d["datum"])
        raise ValueError(f"unsupported projected CRS EPSG:{self.epsg}")

    def _from_lonlat(self, lon, lat):
        """WGS84 lon/lat degrees -> projected/native."""
        d = self._def
        kind = d["kind"]
        if kind == "geographic":
            lon, lat = _wgs84_to_datum(lon, lat, d["ellps"], d["datum"])
            return (
                np.asarray(lon, dtype=np.float64),
                np.asarray(lat, dtype=np.float64),
            )
        if kind == "webmerc":
            x = _R_SPHERE * np.radians(np.asarray(lon, dtype=np.float64))
            latr = np.radians(np.asarray(lat, dtype=np.float64))
            y = _R_SPHERE * np.log(np.tan(np.pi / 4 + latr / 2))
            return x, y
        lon, lat = _wgs84_to_datum(lon, lat, d["ellps"], d["datum"])
        tmu = d.get("to_meter", 1.0)
        if kind == "merc":
            x, y = _merc_forward(lon, lat, d)
            return (x + d["fe"]) / tmu, (y + d["fn"]) / tmu
        if kind == "ps":
            x, y = _ps_forward(lon, lat, d)
            return (x + d["fe"]) / tmu, (y + d["fn"]) / tmu
        if kind == "tm":
            e, n = _tm_forward(lon, lat, d["lon0"], d["ellps"])
            if d["lat0"] != 0.0:
                _, n0 = _tm_forward(d["lon0"], d["lat0"], d["lon0"],
                                    d["ellps"])
                n = n - n0
            return ((d["fe"] + d["k0"] * e) / tmu,
                    (d["fn"] + d["k0"] * n) / tmu)
        if kind == "lcc":
            x, y = _lcc_forward(lon, lat, d)
            return (x + d["fe"]) / tmu, (y + d["fn"]) / tmu
        if kind == "albers":
            x, y = _albers_forward(lon, lat, d)
            return (x + d["fe"]) / tmu, (y + d["fn"]) / tmu
        if kind == "laea":
            x, y = _laea_forward(lon, lat, d)
            return (x + d["fe"]) / tmu, (y + d["fn"]) / tmu
        raise ValueError(f"unsupported projected CRS EPSG:{self.epsg}")


def transform(src: CRS, dst: CRS, x, y):
    """Vectorized coordinate transform src -> dst (numpy arrays in/out)."""
    if src == dst:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    lon, lat = src._to_lonlat(x, y)
    return dst._from_lonlat(lon, lat)


def transformer(src, dst):
    """Return func(x_arr, y_arr) -> (x_arr, y_arr) for Geometry.transform."""
    s = CRS.from_user_input(src)
    d = CRS.from_user_input(dst)

    def _fn(x, y):
        return transform(s, d, x, y)

    return _fn
