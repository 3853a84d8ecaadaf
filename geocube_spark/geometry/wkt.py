"""WKT (Well-Known Text) codec for the lightweight Geometry model.

The reference ingests any OGR-readable vector source via geopandas
(/root/reference/geocube/geo_utils/geobox.py:30-38 accepts
GeoDataFrames whose geometries GDAL parsed from WKT/WKB alike); this
engine keeps geometry as WKB columns, so WKT support is a text codec
on top of :mod:`geocube_spark.geometry.wkb` — no GEOS, pure Python/
numpy, 2-D (Z/M ordinates are dropped on parse like the rest of the
engine).

Supported: POINT, LINESTRING, POLYGON, MULTIPOINT, MULTILINESTRING,
MULTIPOLYGON, GEOMETRYCOLLECTION, each with an EMPTY form.
"""

from __future__ import annotations

import re

import numpy as np

from . import wkb as W

__all__ = ["loads", "dumps", "wkt_to_wkb", "wkb_to_wkt"]

_TYPE_BY_NAME = {
    "POINT": W.POINT,
    "LINESTRING": W.LINESTRING,
    "POLYGON": W.POLYGON,
    "MULTIPOINT": W.MULTIPOINT,
    "MULTILINESTRING": W.MULTILINESTRING,
    "MULTIPOLYGON": W.MULTIPOLYGON,
    "GEOMETRYCOLLECTION": W.GEOMETRYCOLLECTION,
}

_HEAD = re.compile(
    r"\s*([A-Za-z]+)\s*(ZM|Z|M)?\s*(EMPTY)?\s*", re.IGNORECASE
)
_NUM = r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"
_COORD_SEQ = re.compile(_NUM)


class WKTError(ValueError):
    pass


def _parse_parens(s: str, pos: int):
    """Return (inner string, end pos) of the paren group starting at
    the first '(' at/after pos."""
    start = s.index("(", pos)
    depth = 0
    for i in range(start, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return s[start + 1:i], i + 1
    raise WKTError(f"unbalanced parentheses in WKT near {s[pos:pos+40]!r}")


def _split_top(s: str):
    """Split on top-level commas (not inside parentheses)."""
    parts, depth, last = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[last:i])
            last = i + 1
    parts.append(s[last:])
    return parts


def _coords(s: str, dim: int) -> np.ndarray:
    """Coordinate list 'x y[, x y ...]' -> (N, 2) array (extra
    ordinates beyond x y are dropped)."""
    nums = _COORD_SEQ.findall(s)
    if not nums or len(nums) % dim:
        raise WKTError(f"bad coordinate run {s[:40]!r} (dim {dim})")
    arr = np.array(nums, dtype=np.float64).reshape(-1, dim)
    return np.ascontiguousarray(arr[:, :2])


def _strip_parens(part: str) -> str:
    part = part.strip()
    if part.startswith("("):
        inner, end = _parse_parens(part, 0)
        if part[end:].strip():
            raise WKTError(f"trailing text after group: {part[end:]!r}")
        return inner
    return part


def loads(text: str) -> W.Geometry:
    """Parse a WKT string into a Geometry."""
    m = _HEAD.match(text)
    if not m:
        raise WKTError(f"no geometry type tag in {text[:40]!r}")
    name = m.group(1).upper()
    t = _TYPE_BY_NAME.get(name)
    if t is None:
        raise WKTError(f"unsupported WKT type {name!r}")
    zm = (m.group(2) or "").upper()
    dim = 2 + len(zm)
    if m.group(3):  # EMPTY
        if t == W.POINT:
            return W.Geometry(t, np.array([np.nan, np.nan]))
        if t in (W.LINESTRING, W.MULTIPOINT):
            return W.Geometry(t, np.empty((0, 2)))
        if t == W.GEOMETRYCOLLECTION:
            return W.Geometry(t, [])
        return W.Geometry(t, [])
    body, end = _parse_parens(text, m.end() - 1)
    if text[end:].strip():
        raise WKTError(f"trailing text {text[end:][:20]!r}")

    if t == W.POINT:
        c = _coords(body, dim)
        return W.Geometry(t, c[0])
    if t in (W.LINESTRING, W.MULTIPOINT):
        # MULTIPOINT accepts both 'MULTIPOINT (1 2, 3 4)' and
        # 'MULTIPOINT ((1 2), (3 4))'
        parts = [_strip_parens(p) for p in _split_top(body)]
        return W.Geometry(t, _coords(", ".join(parts), dim))
    if t in (W.POLYGON, W.MULTILINESTRING):
        rings = [_coords(_strip_parens(p), dim) for p in _split_top(body)]
        return W.Geometry(t, rings)
    if t == W.MULTIPOLYGON:
        polys = []
        for poly in _split_top(body):
            inner = _strip_parens(poly)
            polys.append(
                [_coords(_strip_parens(r), dim) for r in _split_top(inner)]
            )
        return W.Geometry(t, polys)
    # GEOMETRYCOLLECTION: recurse on top-level comma-split members
    return W.Geometry(t, [loads(p.strip()) for p in _split_top(body)])


def _fmt(v: float) -> str:
    # repr keeps round-trip exactness for float64; trim trailing '.0'
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


def _ring_txt(arr: np.ndarray) -> str:
    return "(" + ", ".join(
        f"{_fmt(x)} {_fmt(y)}" for x, y in arr
    ) + ")"


def dumps(g: W.Geometry) -> str:
    """Geometry -> canonical 2-D WKT."""
    t = g.geom_type
    name = g.type_name.upper()
    if t == W.POINT:
        if np.isnan(g.parts).all():
            return "POINT EMPTY"
        return f"POINT ({_fmt(g.parts[0])} {_fmt(g.parts[1])})"
    if t in (W.LINESTRING, W.MULTIPOINT):
        if not len(g.parts):
            return f"{name} EMPTY"
        return f"{name} {_ring_txt(g.parts)}"
    if t in (W.POLYGON, W.MULTILINESTRING):
        if not g.parts:
            return f"{name} EMPTY"
        return f"{name} (" + ", ".join(
            _ring_txt(r) for r in g.parts
        ) + ")"
    if t == W.MULTIPOLYGON:
        if not g.parts:
            return "MULTIPOLYGON EMPTY"
        return "MULTIPOLYGON (" + ", ".join(
            "(" + ", ".join(_ring_txt(r) for r in poly) + ")"
            for poly in g.parts
        ) + ")"
    if t == W.GEOMETRYCOLLECTION:
        if not g.parts:
            return "GEOMETRYCOLLECTION EMPTY"
        return "GEOMETRYCOLLECTION (" + ", ".join(
            dumps(m) for m in g.parts
        ) + ")"
    raise WKTError(f"bad geom_type {t}")  # pragma: no cover


def wkt_to_wkb(texts) -> list:
    """Batch WKT strings -> WKB bytes (None passes through) — the
    mapInPandas-friendly form used by the WKT ingest path."""
    return [
        None if s is None else loads(s).to_wkb() for s in texts
    ]


def wkb_to_wkt(blobs) -> list:
    """Batch WKB bytes -> WKT strings (None passes through)."""
    return [
        None if b is None else dumps(W.loads(bytes(b))) for b in blobs
    ]
