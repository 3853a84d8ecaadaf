"""WKT1 / WKT2 / proj4 CRS parameter parsing (the CRS "front door").

The reference accepts any pyproj CRS (reference
geocube/geo_utils/geobox.py:92-98, vector_to_cube.py:112-113); this
module converts the textual CRS forms users actually hold — WKT1
(``PROJCS[...]``), WKT2 (``PROJCRS[...]`` / ``BOUNDCRS[...]``) and
proj4 strings — into the engine's closed-form projection definitions
(``geometry.crs`` kernel families: tm / lcc / albers / laea / merc /
webmerc / geographic), so that a CRS whose EPSG code is not in the
registry still reprojects, as long as its projection *method* is one
the engine implements.

Everything here is public knowledge: the WKT grammar is OGC 18-010r7
(ISO 19162), the parameter/method names and formulas are EPSG
Guidance Note 7-2, and the proj4 keys are the PROJ documentation.

Output: a plain ``dict`` definition (same shape as
``geometry.crs.CRS_DEFS`` values) plus the embedded EPSG code when
one is present. Unknown projection *methods* raise ``ValueError``
naming the method and the supported set — a parameter-level error,
not a code-level one.
"""

from __future__ import annotations

import re

__all__ = ["parse_wkt", "parse_proj4", "def_to_spec", "looks_like_wkt",
           "looks_like_proj4"]

# ---------------------------------------------------------------------------
# WKT tokenizer / recursive-descent parser (OGC 18-010r7 grammar subset)
# ---------------------------------------------------------------------------


class _Node:
    __slots__ = ("name", "args")

    def __init__(self, name, args):
        self.name = name  # keyword, upper-cased
        self.args = args  # list of str | float | _Node

    def children(self, name):
        name = name.upper()
        return [a for a in self.args if isinstance(a, _Node) and a.name == name]

    def child(self, name):
        c = self.children(name)
        return c[0] if c else None

    def find(self, *names):
        """Depth-first search for the first node with any given name."""
        names = {n.upper() for n in names}
        stack = [self]
        while stack:
            n = stack.pop(0)
            if n.name in names and n is not self:
                return n
            stack.extend(a for a in n.args if isinstance(a, _Node))
        return None

    def strings(self):
        return [a for a in self.args if isinstance(a, str)]

    def numbers(self):
        return [a for a in self.args if isinstance(a, float)]


_TOKEN = re.compile(
    r'\s*(?:"((?:[^"]|"")*)"'          # quoted string ("" escapes ")
    r"|([A-Za-z_][A-Za-z0-9_]*)"       # keyword
    r"|([-+]?\d+\.?\d*(?:[eE][-+]?\d+)?)"  # number
    r"|([\[\](),]))"                   # punctuation
)


def _tokenize(s):
    pos, out = 0, []
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"WKT parse error at char {pos}: {s[pos:pos+24]!r}")
        if m.group(1) is not None:
            out.append(("str", m.group(1).replace('""', '"')))
        elif m.group(2) is not None:
            out.append(("kw", m.group(2)))
        elif m.group(3) is not None:
            out.append(("num", float(m.group(3))))
        else:
            out.append(("punc", m.group(4)))
        pos = m.end()
    return out


def _parse_node(toks, i):
    kind, val = toks[i]
    if kind != "kw":
        raise ValueError(f"expected WKT keyword, got {val!r}")
    i += 1
    if i >= len(toks) or toks[i] != ("punc", "[") and toks[i] != ("punc", "("):
        return _Node(val.upper(), []), i
    close = "]" if toks[i] == ("punc", "[") else ")"
    i += 1
    args = []
    while True:
        kind2, val2 = toks[i]
        if kind2 == "punc" and val2 == close:
            return _Node(val.upper(), args), i + 1
        if kind2 == "punc" and val2 == ",":
            i += 1
            continue
        if kind2 == "str":
            args.append(val2)
            i += 1
        elif kind2 == "num":
            args.append(val2)
            i += 1
        elif kind2 == "kw":
            node, i = _parse_node(toks, i)
            args.append(node)
        else:
            raise ValueError(f"unexpected WKT token {val2!r}")


def _parse_wkt_tree(s) -> _Node:
    toks = _tokenize(s)
    try:
        node, i = _parse_node(toks, 0)
    except IndexError:
        raise ValueError(
            f"malformed WKT (truncated): {s[:48]!r}..."
        ) from None
    return node


# ---------------------------------------------------------------------------
# name normalization maps (EPSG GN7-2 / OGC / ESRI spellings)
# ---------------------------------------------------------------------------

def _norm(name: str) -> str:
    return re.sub(r"[^a-z0-9]", "", name.lower())


# projection method -> engine kind (plus 1sp/2sp flavor notes)
_METHODS = {
    "transversemercator": ("tm", None),
    "gausskruger": ("tm", None),
    "gaussboaga": ("tm", None),
    "lambertconicconformal2sp": ("lcc", "2sp"),
    "lambertconformalconic2sp": ("lcc", "2sp"),
    "lambertconicconformal1sp": ("lcc", "1sp"),
    "lambertconformalconic1sp": ("lcc", "1sp"),
    # ESRI WKT1 spells both flavors identically; flavor decided by
    # which parameters are present.
    "lambertconformalconic": ("lcc", None),
    "albersequalarea": ("albers", None),
    "albersconicequalarea": ("albers", None),
    "albers": ("albers", None),
    "lambertazimuthalequalarea": ("laea", None),
    "mercatorvarianta": ("merc", "1sp"),
    "mercator1sp": ("merc", "1sp"),
    "mercatorvariantb": ("merc", "2sp"),
    "mercator2sp": ("merc", "2sp"),
    "mercator": ("merc", None),
    "popularvisualisationpseudomercator": ("webmerc", None),
    "popularvisualisationpseudomercator3857": ("webmerc", None),
    "pseudomercator": ("webmerc", None),
    "mercatorauxiliarysphere": ("webmerc", None),
    "polarstereographic": ("ps", None),
    "polarstereographicvarianta": ("ps", "a"),
    "polarstereographicvariantb": ("ps", "b"),
    "stereographicnorthpole": ("ps", "b"),
    "stereographicsouthpole": ("ps", "b"),
}

# parameter name -> canonical key
_PARAMS = {
    "latitudeofnaturalorigin": "lat0",
    "latitudeoforigin": "lat0",
    "latitudeoffalseorigin": "lat0",
    "latitudeofcenter": "lat0",
    "latitudeofprojectioncentre": "lat0",
    "longitudeofnaturalorigin": "lon0",
    "centralmeridian": "lon0",
    "longitudeoffalseorigin": "lon0",
    "longitudeofcenter": "lon0",
    "longitudeoforigin": "lon0",
    "longitudeofprojectioncentre": "lon0",
    "scalefactoratnaturalorigin": "k0",
    "scalefactor": "k0",
    "falseeasting": "fe",
    "eastingatfalseorigin": "fe",
    "eastingatprojectioncentre": "fe",
    "falsenorthing": "fn",
    "northingatfalseorigin": "fn",
    "northingatprojectioncentre": "fn",
    "latitudeof1ststandardparallel": "sp1",
    "standardparallel1": "sp1",
    "latitudeof2ndstandardparallel": "sp2",
    "standardparallel2": "sp2",
    "latitudeofstandardparallel": "sp1",
    "standardparallel": "sp1",
    "latitudeoftruescale": "sp1",
}

_ANGLE_KEYS = {"lat0", "lon0", "sp1", "sp2"}
_LINEAR_KEYS = {"fe", "fn"}

_DEG = 0.017453292519943295

# well-known unit conversion factors (to metre / to radian)
_US_FT = 1200.0 / 3937.0


def _check_cone_parallels(proj_label: str, sp1, sp2) -> None:
    """Reject degenerate conic parameter sets at parse time.

    For both LCC and Albers the cone constant is ``n = sin(lat_1)``
    when the parallels coincide and an odd function of the parallel
    pair otherwise; it vanishes exactly when ``lat_1 = -lat_2``
    (including both on the equator). ``n = 0`` means the cone
    degenerates to a cylinder: every closed form divides by ``n``, so
    the projection is undefined (proj rejects these parameter sets
    too). Raising here, with the parameters in the message, beats a
    divide-by-zero NaN surfacing later inside a Spark task."""
    if abs(float(sp1) + float(sp2)) < 1e-6:
        raise ValueError(
            f"{proj_label}: standard parallels lat_1={sp1}, "
            f"lat_2={sp2} are symmetric about (or on) the equator, so "
            "the cone constant is 0 and the projection is undefined; "
            "use Mercator for an equatorial aspect"
        )


def _supported():
    return (
        "Transverse Mercator, Lambert Conic Conformal (1SP/2SP), "
        "Albers Equal Area, Lambert Azimuthal Equal Area, "
        "Mercator (variant A/B), Polar Stereographic (variant A/B), "
        "Popular Visualisation Pseudo Mercator, geographic"
    )


# ---------------------------------------------------------------------------
# WKT semantic extraction
# ---------------------------------------------------------------------------

def _unit_factor(node):
    """Conversion factor from a UNIT/LENGTHUNIT/ANGLEUNIT node."""
    if node is None:
        return None
    nums = node.numbers()
    return nums[0] if nums else None


def _ellipsoid(tree):
    ell = tree.find("SPHEROID", "ELLIPSOID")
    if ell is None:
        raise ValueError("WKT has no SPHEROID/ELLIPSOID")
    nums = ell.numbers()
    if len(nums) < 2:
        raise ValueError(f"ELLIPSOID needs (a, 1/f): {ell.strings()}")
    a, invf = nums[0], nums[1]
    # axis-length unit (WKT2 ELLIPSOID may carry LENGTHUNIT)
    u = _unit_factor(ell.find("LENGTHUNIT", "UNIT"))
    if u is not None and abs(u - 1.0) > 1e-12:
        a *= u
    return a, invf


def _towgs84(tree):
    """TOWGS84 node (WKT1) or ABRIDGEDTRANSFORMATION params (BOUNDCRS)."""
    t = tree.find("TOWGS84")
    if t is not None:
        nums = list(t.numbers())
        while len(nums) < 7:
            nums.append(0.0)
        return tuple(nums[:7])
    at = tree.find("ABRIDGEDTRANSFORMATION")
    if at is not None:
        vals = {"tx": 0.0, "ty": 0.0, "tz": 0.0, "rx": 0.0, "ry": 0.0,
                "rz": 0.0, "ds": 0.0}
        m = {"xaxistranslation": "tx", "yaxistranslation": "ty",
             "zaxistranslation": "tz", "xaxisrotation": "rx",
             "yaxisrotation": "ry", "zaxisrotation": "rz",
             "scaledifference": "ds"}
        for p in at.children("PARAMETER"):
            strs, nums = p.strings(), p.numbers()
            key = m.get(_norm(strs[0])) if strs else None
            if key and nums:
                v = nums[0]
                # abridged transformations may encode scale as the
                # multiplier (1 + ds*1e-6) instead of ppm
                if key == "ds" and 0.9 < v < 1.1:
                    v = (v - 1.0) * 1e6
                vals[key] = v
        return (vals["tx"], vals["ty"], vals["tz"], vals["rx"],
                vals["ry"], vals["rz"], vals["ds"])
    return None


_DATUM_NAMES = {
    "wgs84": "WGS84",
    "worldgeodeticsystem1984": "WGS84",
    "worldgeodeticsystem1984ensemble": "WGS84",
    "wgs1984": "WGS84",
    "dwgs84": "WGS84",
    "etrs89": "ETRS89",
    "europeanterrestrialreferencesystem1989": "ETRS89",
    "europeanterrestrialreferencesystem1989ensemble": "ETRS89",
    "detrs89": "ETRS89",
    "nad83": "NAD83",
    "northamericandatum1983": "NAD83",
    "dnorthamericandatum1983": "NAD83",
    "nad27": "NAD27",
    "northamericandatum1927": "NAD27",
    "dnorthamericandatum1927": "NAD27",
    "osgb36": "OSGB36",
    "osgb1936": "OSGB36",
    "ordnancesurveyofgreatbritain1936": "OSGB36",
    "dosgb1936": "OSGB36",
}


def _datum_name(tree):
    """Datum name -> engine datum, or raise for unknown datums.

    An unknown datum with no TOWGS84 must NOT silently default to an
    identity shift — that is a ~100 m-class silent georeferencing
    error (e.g. DHDN/Potsdam is ~120 m off WGS84)."""
    d = tree.find("DATUM", "TRF", "ENSEMBLE")
    if d is None:
        return "WGS84"
    strs = d.strings()
    if not strs:
        return "WGS84"
    mapped = _DATUM_NAMES.get(_norm(strs[0]))
    if mapped is None:
        raise ValueError(
            f"unsupported datum {strs[0]!r} with no TOWGS84: add a "
            "TOWGS84[tx,ty,tz,rx,ry,rz,ds] node with the Helmert "
            "parameters, or use a supported datum (WGS84, ETRS89, "
            "NAD83, NAD27, OSGB36)"
        )
    return mapped


def _prime_meridian_deg(tree, ang_factor):
    """PRIMEM longitude in degrees east of Greenwich.

    Uses the node's own ANGLEUNIT when present (WKT2); otherwise the
    value is taken as DEGREES — the GDAL/PROJ WKT1 dialect always
    writes PRIMEM in degrees even when the GEOGCS unit is grads
    (e.g. NTF Paris: 2.33722917 deg, not 2.5969213 grads), and that
    dialect dominates WKT1 in the wild. ``ang_factor`` is accepted
    for signature symmetry but deliberately NOT applied here."""
    pm = tree.find("PRIMEM", "PRIMEMERIDIAN")
    if pm is None:
        return 0.0
    nums = pm.numbers()
    if not nums:
        return 0.0
    u = pm.find("ANGLEUNIT", "UNIT")
    pf = _unit_factor(u) if u is not None else None
    return _angle_to_deg(nums[0], pf)  # pf None -> value already deg


def _angle_to_deg(value, factor):
    """Angle parameter value -> degrees given its unit factor
    (factor = radians per unit; degree factor is ~0.01745...)."""
    if factor is None or abs(factor - _DEG) < 1e-15:
        return value
    return value * factor / _DEG


def parse_wkt(s: str):
    """Parse a WKT1/WKT2 CRS string.

    Returns ``(epsg_or_None, def_dict)``. ``def_dict`` is ``None`` for
    a bare EPSG-identified CRS only when parsing fails structurally
    (callers fall back to tail sniffing)."""
    tree = _parse_wkt_tree(s)

    if tree.name == "BOUNDCRS":
        src = tree.child("SOURCECRS")
        inner = None
        if src is not None:
            for a in src.args:
                if isinstance(a, _Node):
                    inner = a
                    break
        if inner is None:
            raise ValueError("BOUNDCRS without SOURCECRS")
        epsg, d = _parse_crs_node(inner)
        tw = _towgs84(tree)
        if tw is not None and d is not None:
            d["towgs84"] = tw
            d.pop("datum", None)
        return epsg, d

    return _parse_crs_node(tree)


def _crs_epsg_id(tree):
    """The CRS-level ID/AUTHORITY (last top-level child only — inner
    nodes also carry IDs)."""
    for a in reversed(tree.args):
        if isinstance(a, _Node) and a.name in ("ID", "AUTHORITY"):
            strs, nums = a.strings(), a.numbers()
            if strs and _norm(strs[0]) == "epsg":
                if nums:
                    return int(nums[0])
                if len(strs) > 1 and strs[1].isdigit():
                    return int(strs[1])
    return None


def _parse_crs_node(tree):
    epsg = _crs_epsg_id(tree)

    if tree.name in ("GEOGCS", "GEOGCRS", "GEODCRS", "GEODETICCRS"):
        a, invf = _ellipsoid(tree)
        u = tree.find("UNIT", "ANGLEUNIT")
        gang = _unit_factor(u) if u is not None else None
        pm = _prime_meridian_deg(tree, gang)
        if abs(pm) > 1e-12:
            raise ValueError(
                f"geographic CRS with non-Greenwich prime meridian "
                f"({pm} deg east) is not supported"
            )
        d = {"kind": "geographic", "ellps_a": a, "ellps_invf": invf}
        tw = _towgs84(tree)
        if tw is not None:
            d["towgs84"] = tw
        else:
            d["datum"] = _datum_name(tree)
        return epsg, d

    if tree.name not in ("PROJCS", "PROJCRS", "PROJECTEDCRS"):
        raise ValueError(
            f"unsupported WKT root {tree.name!r} (expected PROJCS/"
            "PROJCRS/GEOGCS/GEOGCRS/BOUNDCRS)"
        )

    # ---- method ---------------------------------------------------------
    conv = tree.child("CONVERSION")
    scope = conv if conv is not None else tree
    meth = scope.find("METHOD", "PROJECTION")
    if meth is None and conv is None:
        meth = tree.find("PROJECTION")
    if meth is None:
        raise ValueError("projected WKT has no PROJECTION/METHOD")
    mname = meth.strings()[0]
    kindrec = _METHODS.get(_norm(mname))
    if kindrec is None:
        raise ValueError(
            f"unsupported projection method {mname!r}; supported: "
            + _supported()
        )
    kind, flavor = kindrec

    # ---- units ----------------------------------------------------------
    # linear unit of the projected CRS: WKT1 puts the last UNIT at the
    # PROJCS top level; WKT2 (pyproj/GDAL output) usually nests the
    # LENGTHUNIT inside each AXIS of CS[Cartesian,2]
    lin = 1.0
    found_lin = False
    for a in tree.args:
        if isinstance(a, _Node) and a.name in ("UNIT", "LENGTHUNIT"):
            f = _unit_factor(a)
            if f:
                lin, found_lin = f, True
    if not found_lin:
        for ax in tree.children("AXIS"):
            u = ax.find("LENGTHUNIT", "UNIT")
            f = _unit_factor(u) if u is not None else None
            if f:
                lin = f
    geog = tree.find("GEOGCS", "BASEGEOGCRS", "GEOGCRS")
    if conv is None:
        # WKT1 angle unit comes from the GEOGCS UNIT
        ang = None
        if geog is not None:
            u = geog.find("UNIT", "ANGLEUNIT")
            ang = _unit_factor(u) if u is not None else None
    else:
        ang = None  # WKT2 defaults to degree unless per-param unit

    # non-Greenwich prime meridian: projected lon0 is stated relative
    # to it; folding it into lon0 makes the definition
    # Greenwich-relative (what the kernels and datum shifts expect)
    pm = _prime_meridian_deg(geog if geog is not None else tree, ang)

    # ---- parameters -----------------------------------------------------
    vals = {}
    for p in scope.children("PARAMETER"):
        strs, nums = p.strings(), p.numbers()
        if not strs or not nums:
            continue
        key = _PARAMS.get(_norm(strs[0]))
        if key is None:
            continue
        v = nums[0]
        pu = p.find("ANGLEUNIT", "LENGTHUNIT", "UNIT")
        pf = _unit_factor(pu) if pu is not None else None
        if key in _ANGLE_KEYS:
            v = _angle_to_deg(v, pf if pf is not None else ang)
        elif key in _LINEAR_KEYS:
            f = pf if pf is not None else lin
            v *= f
        vals[key] = v

    a, invf = _ellipsoid(tree)
    d = {"kind": kind, "ellps_a": a, "ellps_invf": invf}
    tw = _towgs84(tree)
    if tw is not None:
        d["towgs84"] = tw
    else:
        d["datum"] = _datum_name(tree)

    if abs(pm) > 1e-12:
        vals["lon0"] = vals.get("lon0", 0.0) + pm
    _assemble_projected(d, kind, flavor, vals, mname)
    if abs(lin - 1.0) > 1e-12:
        d["to_meter"] = lin
    return epsg, d


def _assemble_projected(d, kind, flavor, vals, mname):
    if kind == "webmerc":
        return
    d["lon0"] = vals.get("lon0", 0.0)
    d["lat0"] = vals.get("lat0", 0.0)
    d["fe"] = vals.get("fe", 0.0)
    d["fn"] = vals.get("fn", 0.0)
    if kind == "tm":
        d["k0"] = vals.get("k0", 1.0)
    elif kind == "lcc":
        if flavor is None:
            flavor = "2sp" if "sp2" in vals else "1sp"
        if flavor == "1sp":
            d["sp1"] = d["sp2"] = vals.get("sp1", d["lat0"])
            d["k0"] = vals.get("k0", 1.0)
        else:
            if "sp1" not in vals or "sp2" not in vals:
                raise ValueError(
                    f"{mname!r} (2SP) requires standard_parallel_1/2; "
                    f"got {sorted(vals)}"
                )
            d["sp1"], d["sp2"] = vals["sp1"], vals["sp2"]
            d["k0"] = 1.0
        _check_cone_parallels(mname, d["sp1"], d["sp2"])
    elif kind == "albers":
        if "sp1" not in vals or "sp2" not in vals:
            raise ValueError(
                f"{mname!r} requires standard_parallel_1/2; got "
                f"{sorted(vals)}"
            )
        d["sp1"], d["sp2"] = vals["sp1"], vals["sp2"]
        _check_cone_parallels(mname, d["sp1"], d["sp2"])
    elif kind == "laea":
        pass
    elif kind == "merc":
        if flavor == "2sp" or ("sp1" in vals and "k0" not in vals):
            d["sp1"] = vals.get("sp1", 0.0)
            d["k0"] = None  # derived from sp1 by the kernel setup
        else:
            d["k0"] = vals.get("k0", 1.0)
        if abs(d.get("lat0", 0.0)) > 1e-9:
            raise ValueError(
                "Mercator with non-zero latitude of origin is not "
                "supported (EPSG 9804/9805 define it as 0)"
            )
        d.pop("lat0", None)
    elif kind == "ps":
        lat0 = d.pop("lat0", 0.0)
        if flavor == "b" or ("sp1" in vals and "k0" not in vals):
            sp1 = vals.get("sp1", lat0)
            d["sp1"] = sp1
            d["south"] = sp1 < 0
        else:
            if abs(abs(lat0) - 90.0) > 1e-9:
                raise ValueError(
                    f"{mname!r}: oblique stereographic (latitude of "
                    f"origin {lat0}) is not supported; only the polar "
                    "aspects (+/-90)"
                )
            d["south"] = lat0 < 0
            d["k0"] = vals.get("k0", 1.0)


# ---------------------------------------------------------------------------
# proj4
# ---------------------------------------------------------------------------

_P4_ELLPS = {
    "wgs84": (6378137.0, 298.257223563),
    "grs80": (6378137.0, 298.257222101),
    "airy": (6377563.396, 299.3249646),
    "mod_airy": (6377340.189, 299.3249646),
    "intl": (6378388.0, 297.0),
    "clrk66": (6378206.4, 294.9786982139006),
    "clrk80": (6378249.145, 293.465),
    "clrk80ign": (6378249.2, 293.4660212936269),
    "bessel": (6377397.155, 299.1528128),
    "krass": (6378245.0, 298.3),
    "evrst30": (6377276.345, 300.8017),
    "aust_sa": (6378160.0, 298.25),
}

_P4_DATUMS = {
    "wgs84": ("WGS84", (6378137.0, 298.257223563)),
    "nad83": ("NAD83", (6378137.0, 298.257222101)),
    "nad27": ("NAD27", (6378206.4, 294.9786982139006)),
    "osgb36": ("OSGB36", (6377563.396, 299.3249646)),
    # not a stock proj4 datum name, but the engine's canonical spec
    # serializer emits it so parse(def_to_spec(d)) round-trips
    "etrs89": ("ETRS89", (6378137.0, 298.257222101)),
}

_P4_UNITS = {"m": 1.0, "meter": 1.0, "metre": 1.0,
             "us-ft": _US_FT, "ft": 0.3048}


def looks_like_proj4(s: str) -> bool:
    return "+proj=" in s or "+init=" in s or s.strip().startswith("+")


def looks_like_wkt(s: str) -> bool:
    return bool(re.match(
        r"\s*(PROJCS|PROJCRS|PROJECTEDCRS|GEOGCS|GEOGCRS|GEODCRS|"
        r"GEODETICCRS|BOUNDCRS)\s*[\[(]", s, re.I))


def parse_proj4(s: str):
    """Parse a proj4 string -> (None, def_dict)."""
    kv = {}
    for tok in s.split():
        if not tok.startswith("+"):
            continue
        if "=" in tok:
            k, v = tok[1:].split("=", 1)
            kv[k] = v
        else:
            kv[tok[1:]] = True

    proj = kv.get("proj")
    if proj is None:
        raise ValueError(f"proj4 string has no +proj: {s!r}")

    # ellipsoid / datum: explicit +a/+rf wins over +ellps wins over
    # the +datum default ellipsoid
    datum = None
    towgs84 = None
    if "datum" in kv:
        rec = _P4_DATUMS.get(str(kv["datum"]).lower())
        if rec is None:
            raise ValueError(
                f"unsupported +datum={kv['datum']}; supported: "
                + ", ".join(sorted(_P4_DATUMS))
            )
        datum, (a, invf) = rec
    if "ellps" in kv:
        rec = _P4_ELLPS.get(str(kv["ellps"]).lower())
        if rec is None:
            raise ValueError(
                f"unsupported +ellps={kv['ellps']}; supported: "
                + ", ".join(sorted(_P4_ELLPS))
            )
        a, invf = rec
    if "a" in kv:
        a = float(kv["a"])
        if "rf" in kv:
            invf = float(kv["rf"])
        elif "b" in kv:
            b = float(kv["b"])
            invf = a / (a - b) if a != b else 0.0
        elif "f" in kv:
            invf = 1.0 / float(kv["f"])
        else:
            invf = 0.0  # sphere
    if "datum" not in kv and "ellps" not in kv and "a" not in kv:
        a, invf = _P4_ELLPS["wgs84"]
    if "towgs84" in kv:
        nums = [float(x) for x in str(kv["towgs84"]).split(",")]
        while len(nums) < 7:
            nums.append(0.0)
        towgs84 = tuple(nums[:7])

    d = {"ellps_a": a, "ellps_invf": invf}
    if towgs84 is not None:
        d["towgs84"] = towgs84
    else:
        d["datum"] = datum or "WGS84"

    def fl(key, default=0.0):
        return float(kv.get(key, default))

    if proj in ("longlat", "latlong", "latlon", "lonlat"):
        d["kind"] = "geographic"
        return None, d
    if proj == "webmerc":
        d["kind"] = "webmerc"
        return None, d
    if proj == "utm":
        zone = int(kv.get("zone", 0))
        if not 1 <= zone <= 60:
            raise ValueError(f"+proj=utm needs +zone=1..60, got {kv.get('zone')}")
        d.update(kind="tm", lon0=-183.0 + 6.0 * zone, lat0=0.0,
                 k0=0.9996, fe=500000.0,
                 fn=10000000.0 if "south" in kv else 0.0)
    elif proj in ("tmerc", "etmerc"):
        d.update(kind="tm", lon0=fl("lon_0"), lat0=fl("lat_0"),
                 k0=float(kv.get("k", kv.get("k_0", 1.0))),
                 fe=fl("x_0"), fn=fl("y_0"))
    elif proj == "lcc":
        d.update(kind="lcc", lon0=fl("lon_0"), lat0=fl("lat_0"),
                 fe=fl("x_0"), fn=fl("y_0"))
        # +k applies in BOTH branches: def_to_spec serializes an LCC
        # 1SP as lat_1=lat_2 plus +k, and dropping it here would make
        # a worker rebuilt from the spec disagree with the driver
        if "lat_2" in kv:
            d["sp1"], d["sp2"] = fl("lat_1"), fl("lat_2")
        else:
            sp = fl("lat_1", kv.get("lat_0", 0.0))
            d["sp1"] = d["sp2"] = sp
        d["k0"] = float(kv.get("k", kv.get("k_0", 1.0)))
        _check_cone_parallels("+proj=lcc", d["sp1"], d["sp2"])
    elif proj == "aea":
        d.update(kind="albers", lon0=fl("lon_0"), lat0=fl("lat_0"),
                 sp1=fl("lat_1"), sp2=fl("lat_2"),
                 fe=fl("x_0"), fn=fl("y_0"))
        _check_cone_parallels("+proj=aea", d["sp1"], d["sp2"])
    elif proj == "laea":
        d.update(kind="laea", lon0=fl("lon_0"), lat0=fl("lat_0"),
                 fe=fl("x_0"), fn=fl("y_0"))
    elif proj == "merc":
        d.update(kind="merc", lon0=fl("lon_0"), fe=fl("x_0"),
                 fn=fl("y_0"))
        if "lat_ts" in kv:
            d["sp1"] = fl("lat_ts")
            d["k0"] = None
        else:
            d["k0"] = float(kv.get("k", kv.get("k_0", 1.0)))
    elif proj == "stere":
        lat0 = fl("lat_0")
        if abs(abs(lat0) - 90.0) > 1e-9:
            raise ValueError(
                f"+proj=stere with +lat_0={lat0}: only the polar "
                "aspects (+/-90) are supported"
            )
        d.update(kind="ps", south=lat0 < 0, lon0=fl("lon_0"),
                 fe=fl("x_0"), fn=fl("y_0"))
        if "lat_ts" in kv:
            d["sp1"] = fl("lat_ts")
        else:
            d["k0"] = float(kv.get("k", kv.get("k_0", 1.0)))
    else:
        raise ValueError(
            f"unsupported +proj={proj}; supported: longlat, utm, "
            "tmerc, lcc, aea, laea, merc, webmerc (methods: "
            + _supported() + ")"
        )

    if "to_meter" in kv:
        d["to_meter"] = float(kv["to_meter"])
    elif "units" in kv:
        u = _P4_UNITS.get(str(kv["units"]).lower())
        if u is None:
            raise ValueError(f"unsupported +units={kv['units']}")
        if abs(u - 1.0) > 1e-12:
            d["to_meter"] = u
    # false easting/northing in proj4 are always metres already
    return None, d


# ---------------------------------------------------------------------------
# canonical spec serialization (round-trips through parse_proj4)
# ---------------------------------------------------------------------------

def def_to_spec(d: dict) -> str:
    """Serialize a parsed definition to a canonical proj4-style string
    (the worker-shippable CRS handle for non-registry CRSs)."""
    kind = d["kind"]
    parts = []
    if kind == "geographic":
        parts.append("+proj=longlat")
    elif kind == "webmerc":
        parts.append("+proj=webmerc")
    elif kind == "tm":
        parts.append("+proj=tmerc")
        parts.append(f"+lat_0={d.get('lat0', 0.0)!r}")
        parts.append(f"+lon_0={d.get('lon0', 0.0)!r}")
        parts.append(f"+k={d.get('k0', 1.0)!r}")
        parts.append(f"+x_0={d.get('fe', 0.0)!r}")
        parts.append(f"+y_0={d.get('fn', 0.0)!r}")
    elif kind == "lcc":
        parts.append("+proj=lcc")
        parts.append(f"+lat_0={d.get('lat0', 0.0)!r}")
        parts.append(f"+lon_0={d.get('lon0', 0.0)!r}")
        parts.append(f"+lat_1={d.get('sp1', 0.0)!r}")
        parts.append(f"+lat_2={d.get('sp2', 0.0)!r}")
        if d.get("k0", 1.0) != 1.0:
            parts.append(f"+k={d['k0']!r}")
        parts.append(f"+x_0={d.get('fe', 0.0)!r}")
        parts.append(f"+y_0={d.get('fn', 0.0)!r}")
    elif kind == "albers":
        parts.append("+proj=aea")
        parts.append(f"+lat_0={d.get('lat0', 0.0)!r}")
        parts.append(f"+lon_0={d.get('lon0', 0.0)!r}")
        parts.append(f"+lat_1={d.get('sp1', 0.0)!r}")
        parts.append(f"+lat_2={d.get('sp2', 0.0)!r}")
        parts.append(f"+x_0={d.get('fe', 0.0)!r}")
        parts.append(f"+y_0={d.get('fn', 0.0)!r}")
    elif kind == "laea":
        parts.append("+proj=laea")
        parts.append(f"+lat_0={d.get('lat0', 0.0)!r}")
        parts.append(f"+lon_0={d.get('lon0', 0.0)!r}")
        parts.append(f"+x_0={d.get('fe', 0.0)!r}")
        parts.append(f"+y_0={d.get('fn', 0.0)!r}")
    elif kind == "merc":
        parts.append("+proj=merc")
        parts.append(f"+lon_0={d.get('lon0', 0.0)!r}")
        if d.get("k0") is None:
            parts.append(f"+lat_ts={d.get('sp1', 0.0)!r}")
        else:
            parts.append(f"+k={d.get('k0', 1.0)!r}")
        parts.append(f"+x_0={d.get('fe', 0.0)!r}")
        parts.append(f"+y_0={d.get('fn', 0.0)!r}")
    elif kind == "ps":
        parts.append("+proj=stere")
        parts.append("+lat_0=-90.0" if d.get("south") else "+lat_0=90.0")
        if d.get("sp1") is not None:
            parts.append(f"+lat_ts={d['sp1']!r}")
        else:
            parts.append(f"+k={d.get('k0', 1.0)!r}")
        parts.append(f"+lon_0={d.get('lon0', 0.0)!r}")
        parts.append(f"+x_0={d.get('fe', 0.0)!r}")
        parts.append(f"+y_0={d.get('fn', 0.0)!r}")
    else:
        raise ValueError(f"cannot serialize CRS kind {kind!r}")

    if "ellps_a" in d:
        parts.append(f"+a={d['ellps_a']!r}")
        parts.append(f"+rf={d['ellps_invf']!r}")
    if "towgs84" in d:
        parts.append("+towgs84=" + ",".join(repr(v) for v in d["towgs84"]))
    elif d.get("datum", "WGS84") != "WGS84":
        parts.append(f"+datum={d['datum']}")
    if "to_meter" in d:
        parts.append(f"+to_meter={d['to_meter']!r}")
    parts.append("+no_defs")
    return " ".join(parts)
