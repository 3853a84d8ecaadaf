"""Pure-numpy WKB (Well-Known Binary) geometry codec.

The engine keeps geometries as WKB ``binary`` columns everywhere
(SURVEY.md §1.1); this module decodes them into lightweight
numpy-coordinate geometries inside pandas UDF batches and re-encodes
after reprojection. No GEOS/shapely dependency.

Supports 2-D Point, LineString, Polygon, MultiPoint, MultiLineString,
MultiPolygon, GeometryCollection. EWKB SRID flags are tolerated
(skipped); Z/M dimensions are rejected with a clear error.

Reference behavior being reproduced: geometries in the reference are
shapely objects carried by a GeoDataFrame (reference
geocube/geo_utils/geobox.py:84-90); here the same information is a WKB
byte string plus a table-level CRS.
"""

from __future__ import annotations

import struct

import numpy as np

POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

_TYPE_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}

# EWKB / ISO flags
_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


class Geometry:
    """Lightweight geometry: a type tag plus numpy coordinate arrays.

    parts layout by type:
      Point              -> ndarray shape (2,)
      LineString         -> ndarray shape (N, 2)
      Polygon            -> list[ndarray (N, 2)]   (ring 0 = exterior)
      MultiPoint         -> ndarray shape (N, 2)
      MultiLineString    -> list[ndarray (N, 2)]
      MultiPolygon       -> list[list[ndarray (N, 2)]]
      GeometryCollection -> list[Geometry]
    """

    __slots__ = ("geom_type", "parts")

    def __init__(self, geom_type: int, parts):
        self.geom_type = geom_type
        self.parts = parts

    @property
    def type_name(self) -> str:
        return _TYPE_NAMES[self.geom_type]

    # -- coordinate access -------------------------------------------------
    def coord_arrays(self):
        """Yield every (N,2) coordinate array (points viewed as (1,2))."""
        t = self.geom_type
        if t == POINT:
            yield self.parts.reshape(1, 2)
        elif t in (LINESTRING, MULTIPOINT):
            yield self.parts
        elif t in (POLYGON, MULTILINESTRING):
            yield from self.parts
        elif t == MULTIPOLYGON:
            for poly in self.parts:
                yield from poly
        elif t == GEOMETRYCOLLECTION:
            for g in self.parts:
                yield from g.coord_arrays()
        else:  # pragma: no cover
            raise ValueError(f"bad geom_type {t}")

    def transform(self, func) -> "Geometry":
        """Apply func(x_arr, y_arr) -> (x_arr, y_arr) to all coords."""

        def _tx(arr):
            x, y = func(arr[:, 0], arr[:, 1])
            return np.column_stack([x, y])

        t = self.geom_type
        if t == POINT:
            return Geometry(t, _tx(self.parts.reshape(1, 2))[0])
        if t in (LINESTRING, MULTIPOINT):
            return Geometry(t, _tx(self.parts))
        if t in (POLYGON, MULTILINESTRING):
            return Geometry(t, [_tx(r) for r in self.parts])
        if t == MULTIPOLYGON:
            return Geometry(t, [[_tx(r) for r in poly] for poly in self.parts])
        if t == GEOMETRYCOLLECTION:
            return Geometry(t, [g.transform(func) for g in self.parts])
        raise ValueError(f"bad geom_type {t}")  # pragma: no cover

    def bounds(self):
        """(minx, miny, maxx, maxy)."""
        xs_min = ys_min = np.inf
        xs_max = ys_max = -np.inf
        for arr in self.coord_arrays():
            if len(arr) == 0:
                continue
            xs_min = min(xs_min, arr[:, 0].min())
            xs_max = max(xs_max, arr[:, 0].max())
            ys_min = min(ys_min, arr[:, 1].min())
            ys_max = max(ys_max, arr[:, 1].max())
        return (xs_min, ys_min, xs_max, ys_max)

    def polygons(self):
        """Yield ring-lists for every polygon in this geometry."""
        t = self.geom_type
        if t == POLYGON:
            yield self.parts
        elif t == MULTIPOLYGON:
            yield from self.parts
        elif t == GEOMETRYCOLLECTION:
            for g in self.parts:
                yield from g.polygons()

    def lines(self):
        t = self.geom_type
        if t == LINESTRING:
            yield self.parts
        elif t == MULTILINESTRING:
            yield from self.parts
        elif t == GEOMETRYCOLLECTION:
            for g in self.parts:
                yield from g.lines()

    def points(self):
        t = self.geom_type
        if t == POINT:
            yield self.parts
        elif t == MULTIPOINT:
            yield from self.parts
        elif t == GEOMETRYCOLLECTION:
            for g in self.parts:
                yield from g.points()

    def to_wkb(self) -> bytes:
        return _encode(self)

    def __repr__(self):  # pragma: no cover
        return f"<Geometry {self.type_name} bounds={self.bounds()}>"


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _read_coords(buf: memoryview, off: int, n: int, lt: bool):
    dt = "<f8" if lt else ">f8"
    arr = np.frombuffer(buf, dtype=dt, count=2 * n, offset=off)
    return arr.reshape(n, 2).astype(np.float64, copy=False), off + 16 * n


def _decode_at(buf: memoryview, off: int):
    byte_order = buf[off]
    lt = byte_order == 1
    fmt = "<I" if lt else ">I"
    (raw_type,) = struct.unpack_from(fmt, buf, off + 1)
    off += 5
    if raw_type & (_EWKB_Z | _EWKB_M):
        raise ValueError("Z/M WKB dimensions are not supported")
    if raw_type & _EWKB_SRID:
        off += 4  # skip srid
    gtype = raw_type & 0xFF
    # ISO WKB encodes Z as type+1000, M as +2000
    if gtype != raw_type & 0xFFFF and (raw_type & 0xFFFF) > 7:
        raise ValueError("Z/M WKB dimensions are not supported")
    gtype = (raw_type & 0xFFFF) % 1000
    if (raw_type & 0xFFFF) >= 1000:
        raise ValueError("Z/M WKB dimensions are not supported")

    if gtype == POINT:
        arr, off = _read_coords(buf, off, 1, lt)
        return Geometry(POINT, arr[0]), off
    if gtype in (LINESTRING, MULTIPOINT):
        (n,) = struct.unpack_from(fmt, buf, off)
        off += 4
        if gtype == LINESTRING:
            arr, off = _read_coords(buf, off, n, lt)
            return Geometry(LINESTRING, arr), off
        pts = np.empty((n, 2), dtype=np.float64)
        for i in range(n):
            g, off = _decode_at(buf, off)
            pts[i] = g.parts
        return Geometry(MULTIPOINT, pts), off
    if gtype == POLYGON:
        (nrings,) = struct.unpack_from(fmt, buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(fmt, buf, off)
            off += 4
            arr, off = _read_coords(buf, off, n, lt)
            rings.append(arr)
        return Geometry(POLYGON, rings), off
    if gtype in (MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        (n,) = struct.unpack_from(fmt, buf, off)
        off += 4
        subs = []
        for _ in range(n):
            g, off = _decode_at(buf, off)
            subs.append(g)
        if gtype == MULTILINESTRING:
            return Geometry(MULTILINESTRING, [g.parts for g in subs]), off
        if gtype == MULTIPOLYGON:
            return Geometry(MULTIPOLYGON, [g.parts for g in subs]), off
        return Geometry(GEOMETRYCOLLECTION, subs), off
    raise ValueError(f"unsupported WKB geometry type {raw_type}")


def loads(data: bytes) -> Geometry:
    """Decode WKB bytes (or hex string) into a Geometry."""
    if isinstance(data, str):
        data = bytes.fromhex(data)
    g, _ = _decode_at(memoryview(data), 0)
    return g


# ---------------------------------------------------------------------------
# encode (always little-endian)
# ---------------------------------------------------------------------------

def _enc_coords(out: list, arr: np.ndarray):
    out.append(np.ascontiguousarray(arr, dtype="<f8").tobytes())


def _encode(g: Geometry) -> bytes:
    out = [b"\x01", struct.pack("<I", g.geom_type)]
    t = g.geom_type
    if t == POINT:
        _enc_coords(out, g.parts.reshape(1, 2))
    elif t == LINESTRING:
        out.append(struct.pack("<I", len(g.parts)))
        _enc_coords(out, g.parts)
    elif t == POLYGON:
        out.append(struct.pack("<I", len(g.parts)))
        for r in g.parts:
            out.append(struct.pack("<I", len(r)))
            _enc_coords(out, r)
    elif t == MULTIPOINT:
        out.append(struct.pack("<I", len(g.parts)))
        for p in g.parts:
            out.append(_encode(Geometry(POINT, p)))
    elif t == MULTILINESTRING:
        out.append(struct.pack("<I", len(g.parts)))
        for ls in g.parts:
            out.append(_encode(Geometry(LINESTRING, ls)))
    elif t == MULTIPOLYGON:
        out.append(struct.pack("<I", len(g.parts)))
        for poly in g.parts:
            out.append(_encode(Geometry(POLYGON, poly)))
    elif t == GEOMETRYCOLLECTION:
        out.append(struct.pack("<I", len(g.parts)))
        for sub in g.parts:
            out.append(_encode(sub))
    else:  # pragma: no cover
        raise ValueError(f"bad geom_type {t}")
    return b"".join(out)


# ---------------------------------------------------------------------------
# constructors / GeoJSON bridge
# ---------------------------------------------------------------------------

def point(x: float, y: float) -> Geometry:
    return Geometry(POINT, np.array([x, y], dtype=np.float64))


def linestring(coords) -> Geometry:
    return Geometry(LINESTRING, np.asarray(coords, dtype=np.float64))


def polygon(exterior, holes=()) -> Geometry:
    rings = [np.asarray(exterior, dtype=np.float64)]
    rings.extend(np.asarray(h, dtype=np.float64) for h in holes)
    return Geometry(POLYGON, rings)


def box(minx: float, miny: float, maxx: float, maxy: float) -> Geometry:
    return polygon(
        [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny)]
    )


def multipolygon(polys) -> Geometry:
    return Geometry(
        MULTIPOLYGON,
        [[np.asarray(r, dtype=np.float64) for r in rings] for rings in polys],
    )


_GJ_TYPES = {v: k for k, v in _TYPE_NAMES.items()}


def from_geojson(geom: dict) -> Geometry:
    """GeoJSON geometry dict -> Geometry (2-D coords only)."""
    t = geom["type"]
    c = geom.get("coordinates")

    def _xy(seq):
        return np.asarray([p[:2] for p in seq], dtype=np.float64)

    if t == "Point":
        return point(c[0], c[1])
    if t == "LineString":
        return Geometry(LINESTRING, _xy(c))
    if t == "Polygon":
        return Geometry(POLYGON, [_xy(r) for r in c])
    if t == "MultiPoint":
        return Geometry(MULTIPOINT, _xy(c))
    if t == "MultiLineString":
        return Geometry(MULTILINESTRING, [_xy(ls) for ls in c])
    if t == "MultiPolygon":
        return Geometry(MULTIPOLYGON, [[_xy(r) for r in poly] for poly in c])
    if t == "GeometryCollection":
        return Geometry(
            GEOMETRYCOLLECTION, [from_geojson(g) for g in geom["geometries"]]
        )
    raise ValueError(f"unsupported GeoJSON type {t}")


def to_geojson(g: Geometry) -> dict:
    t = g.geom_type
    if t == POINT:
        return {"type": "Point", "coordinates": list(g.parts)}
    if t == LINESTRING:
        return {"type": "LineString", "coordinates": g.parts.tolist()}
    if t == POLYGON:
        return {"type": "Polygon", "coordinates": [r.tolist() for r in g.parts]}
    if t == MULTIPOINT:
        return {"type": "MultiPoint", "coordinates": g.parts.tolist()}
    if t == MULTILINESTRING:
        return {
            "type": "MultiLineString",
            "coordinates": [ls.tolist() for ls in g.parts],
        }
    if t == MULTIPOLYGON:
        return {
            "type": "MultiPolygon",
            "coordinates": [[r.tolist() for r in p] for p in g.parts],
        }
    if t == GEOMETRYCOLLECTION:
        return {
            "type": "GeometryCollection",
            "geometries": [to_geojson(s) for s in g.parts],
        }
    raise ValueError(f"bad geom_type {t}")  # pragma: no cover


# ---------------------------------------------------------------------------
# vectorized batch codecs (point fast path)
# ---------------------------------------------------------------------------
# Point WKB is a fixed 21-byte record (1 byte order + 4 type + 2 f8);
# inside Arrow batches that makes encode/decode a pure numpy reshape —
# ~100x faster than per-row struct packing. Mixed-geometry batches fall
# back to the generic codec automatically.

def points_to_wkb(xs, ys) -> list:
    """Encode arrays of x/y into little-endian point WKB, vectorized."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(xs)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1  # little-endian
    buf[:, 1] = POINT
    buf[:, 2:5] = 0
    buf[:, 5:13] = xs.astype("<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = ys.astype("<f8").view(np.uint8).reshape(n, 8)
    raw = buf.tobytes()
    return [raw[i * 21:(i + 1) * 21] for i in range(n)]


def try_parse_points(blobs):
    """If every blob is a plain 2-D little-endian point, return (x, y)
    float64 arrays; else None (caller falls back to ``loads``)."""
    bs = []
    for b in blobs:
        if b is None or len(b) != 21:
            return None
        bs.append(bytes(b))
    raw = np.frombuffer(b"".join(bs), dtype=np.uint8).reshape(-1, 21)
    if not (
        (raw[:, 0] == 1).all()
        and (raw[:, 1] == POINT).all()
        and (raw[:, 2:5] == 0).all()
    ):
        return None
    x = raw[:, 5:13].copy().view("<f8").ravel()
    y = raw[:, 13:21].copy().view("<f8").ravel()
    return x, y


def partition_points(blobs):
    """Split a mixed batch by geometry type: returns ``(is_pt, x, y)``
    where ``is_pt`` is a bool mask over ``blobs`` and ``x``/``y`` are
    float64 coords aligned with ``blobs[is_pt]``. Lets callers run the
    vectorized point path on point rows even when a batch mixes points
    with polygons/lines (the common interleaved-corpus case)."""
    n = len(blobs)
    is_pt = np.zeros(n, dtype=bool)
    pts = []
    for i in range(n):
        b = blobs[i]
        if b is not None and len(b) == 21:
            bb = bytes(b)
            if (
                bb[0] == 1
                and bb[1] == POINT
                and bb[2] == 0
                and bb[3] == 0
                and bb[4] == 0
            ):
                is_pt[i] = True
                pts.append(bb)
    if not pts:
        return is_pt, np.empty(0, np.float64), np.empty(0, np.float64)
    raw = np.frombuffer(b"".join(pts), dtype=np.uint8).reshape(-1, 21)
    x = raw[:, 5:13].copy().view("<f8").ravel()
    y = raw[:, 13:21].copy().view("<f8").ravel()
    return is_pt, x, y


def batch_parse_simple_polygons(blobs):
    """Vectorized parse of single-ring little-endian polygons.

    Groups blobs by byte length (same-length single-ring polygons share
    a point count K: len == 13 + 16*K) and decodes each group with one
    ``frombuffer`` — no per-geometry Python in the common case.

    Returns ``(mask, groups)``: ``mask[i]`` True when ``blobs[i]`` was
    parsed here; ``groups`` is a list of ``(idx, coords)`` with ``idx``
    an int64 array of positions into ``blobs`` and ``coords`` a
    ``(n, K, 2)`` float64 array (rings closed, first == last point).
    Blobs with holes, multi-parts, or non-polygon types are left to the
    caller's per-geometry fallback.
    """
    n = len(blobs)
    mask = np.zeros(n, dtype=bool)
    by_len: dict = {}
    for i in range(n):
        b = blobs[i]
        if b is None:
            continue
        lb = len(b)
        if lb >= 61 and (lb - 13) % 16 == 0:
            by_len.setdefault(lb, []).append(i)
    groups = []
    for lb, idxs in by_len.items():
        k = (lb - 13) // 16
        raw = np.frombuffer(
            b"".join(bytes(blobs[i]) for i in idxs), dtype=np.uint8
        ).reshape(len(idxs), lb)
        hdr_ok = (
            (raw[:, 0] == 1)
            & (raw[:, 1] == POLYGON)
            & (raw[:, 2] == 0)
            & (raw[:, 3] == 0)
            & (raw[:, 4] == 0)
        )
        counts = raw[:, 5:13].copy().view("<u4").reshape(len(idxs), 2)
        ok = hdr_ok & (counts[:, 0] == 1) & (counts[:, 1] == k)
        if not ok.any():
            continue
        idx = np.asarray(idxs, dtype=np.int64)[ok]
        coords = (
            raw[ok, 13:].copy().view("<f8").reshape(len(idx), k, 2)
        )
        # unclosed rings would give odd crossing counts and corrupt the
        # batched scanline's global even-odd pairing for OTHER polygons
        # in the tile - route them to the per-geometry fallback instead
        closed = (coords[:, 0, :] == coords[:, -1, :]).all(axis=1)
        if not closed.all():
            idx = idx[closed]
            coords = coords[closed]
            if len(idx) == 0:
                continue
        mask[idx] = True
        groups.append((idx, coords))
    return mask, groups


def encode_simple_polygons(coords: np.ndarray) -> list:
    """Vectorized WKB encode of ``(n, K, 2)`` closed rings -> list of
    ``bytes`` (single-ring polygons). Inverse of the batch parser."""
    n, k, _ = coords.shape
    lb = 13 + 16 * k
    out = np.empty((n, lb), dtype=np.uint8)
    out[:, 0] = 1
    hdr = np.empty(3, dtype="<u4")
    hdr[0] = POLYGON
    hdr[1] = 1
    hdr[2] = k
    out[:, 1:13] = np.frombuffer(hdr.tobytes(), dtype=np.uint8)
    out[:, 13:] = (
        np.ascontiguousarray(coords, dtype="<f8")
        .view(np.uint8)
        .reshape(n, 16 * k)
    )
    return [r.tobytes() for r in out]


def batch_parse_simple_lines(blobs):
    """Vectorized parse of little-endian LINESTRING blobs.

    Same length-grouping trick as ``batch_parse_simple_polygons``:
    a K-point linestring is exactly ``9 + 16*K`` bytes, so same-length
    blobs decode with one ``frombuffer`` each. Returns ``(mask,
    groups)`` with ``groups`` a list of ``(idx, coords)``, ``coords``
    shaped ``(n, K, 2)`` (OPEN polylines). MULTILINESTRING and mixed
    structures stay on the caller's per-geometry fallback.
    """
    n = len(blobs)
    mask = np.zeros(n, dtype=bool)
    by_len: dict = {}
    for i in range(n):
        b = blobs[i]
        if b is None:
            continue
        lb = len(b)
        if lb >= 41 and (lb - 9) % 16 == 0:   # >= 2 points
            by_len.setdefault(lb, []).append(i)
    groups = []
    for lb, idxs in by_len.items():
        k = (lb - 9) // 16
        raw = np.frombuffer(
            b"".join(bytes(blobs[i]) for i in idxs), dtype=np.uint8
        ).reshape(len(idxs), lb)
        hdr_ok = (
            (raw[:, 0] == 1)
            & (raw[:, 1] == LINESTRING)
            & (raw[:, 2] == 0)
            & (raw[:, 3] == 0)
            & (raw[:, 4] == 0)
        )
        npts = raw[:, 5:9].copy().view("<u4").ravel()
        ok = hdr_ok & (npts == k)
        if not ok.any():
            continue
        idx = np.asarray(idxs, dtype=np.int64)[ok]
        coords = raw[ok, 9:].copy().view("<f8").reshape(len(idx), k, 2)
        mask[idx] = True
        groups.append((idx, coords))
    return mask, groups


def encode_simple_lines(coords: np.ndarray) -> list:
    """Vectorized WKB encode of ``(n, K, 2)`` polylines -> list of
    ``bytes`` (LINESTRING). Inverse of ``batch_parse_simple_lines``."""
    n, k, _ = coords.shape
    lb = 9 + 16 * k
    out = np.empty((n, lb), dtype=np.uint8)
    out[:, 0] = 1
    hdr = np.empty(2, dtype="<u4")
    hdr[0] = LINESTRING
    hdr[1] = k
    out[:, 1:9] = np.frombuffer(hdr.tobytes(), dtype=np.uint8)
    out[:, 9:] = (
        np.ascontiguousarray(coords, dtype="<f8")
        .view(np.uint8)
        .reshape(n, 16 * k)
    )
    return [r.tobytes() for r in out]


def batch_parse_polygons(blobs):
    """Structure-walking parse of POLYGON/MULTIPOLYGON blobs with any
    ring structure (holes, multi parts).

    Complements ``batch_parse_simple_polygons`` (which stays the fast
    path for single-ring polygons): the Python loop here touches only
    ring HEADERS (a handful per geometry); every coordinate moves via
    ``np.frombuffer`` views, so cost is O(#rings) Python + O(#points)
    numpy — not O(#points) Python like a full ``loads``.

    Returns ``(mask, parsed)``; ``parsed`` is None when nothing matched,
    else a dict with:
      pos        (B,)  int64   blob positions parsed
      coords     (P,2) float64 all ring points, blob-major order
      ring_len   (R,)  int64   points per ring (rings closed)
      ring_owner (R,)  int64   index into ``pos`` per ring
      blob_pts   (B,)  int64   total points per blob
      structs    list  per-blob [[ring lens of part 0], [part 1], ...]
    Unclosed rings / big-endian / other types are left unparsed for the
    caller's fallback.
    """
    n = len(blobs)
    mask = np.zeros(n, dtype=bool)
    pos, structs, blob_pts = [], [], []
    coord_parts, ring_len, ring_owner = [], [], []
    for i in range(n):
        b = blobs[i]
        if b is None or len(b) < 9:
            continue
        bb = bytes(b)
        if bb[0] != 1:
            continue
        gtype = int.from_bytes(bb[1:5], "little")
        try:
            if gtype == POLYGON:
                parts_off = [(0, 5)]
            elif gtype == MULTIPOLYGON:
                nparts = int.from_bytes(bb[5:9], "little")
                parts_off = []
                off = 9
                for _ in range(nparts):
                    if bb[off] != 1 or int.from_bytes(
                        bb[off + 1 : off + 5], "little"
                    ) != POLYGON:
                        raise ValueError
                    parts_off.append((off, off + 5))
                    # skim to find the end of this part
                    nr = int.from_bytes(bb[off + 5 : off + 9], "little")
                    o = off + 9
                    for _ in range(nr):
                        k = int.from_bytes(bb[o : o + 4], "little")
                        o += 4 + 16 * k
                    off = o
            else:
                continue
            blob_coords, blob_struct, total = [], [], 0
            ok = True
            for _, hdr in parts_off:
                nr = int.from_bytes(bb[hdr : hdr + 4], "little")
                o = hdr + 4
                lens = []
                for _ in range(nr):
                    k = int.from_bytes(bb[o : o + 4], "little")
                    o += 4
                    if k < 4 or o + 16 * k > len(bb):
                        ok = False
                        break
                    ring = np.frombuffer(
                        bb, dtype="<f8", count=2 * k, offset=o
                    ).reshape(k, 2)
                    if not (ring[0] == ring[-1]).all():
                        ok = False
                        break
                    blob_coords.append(ring)
                    lens.append(k)
                    total += k
                    o += 16 * k
                if not ok:
                    break
                blob_struct.append(lens)
            if not ok or total == 0:
                continue
        except (ValueError, IndexError):
            continue
        bidx = len(pos)
        pos.append(i)
        structs.append(blob_struct)
        blob_pts.append(total)
        coord_parts.extend(blob_coords)
        for lens in blob_struct:
            for k in lens:
                ring_len.append(k)
                ring_owner.append(bidx)
        mask[i] = True
    if not pos:
        return mask, None
    return mask, {
        "pos": np.asarray(pos, dtype=np.int64),
        "coords": np.ascontiguousarray(
            np.concatenate(coord_parts, axis=0), dtype=np.float64
        ),
        "ring_len": np.asarray(ring_len, dtype=np.int64),
        "ring_owner": np.asarray(ring_owner, dtype=np.int64),
        "blob_pts": np.asarray(blob_pts, dtype=np.int64),
        "structs": structs,
    }


def encode_polygons(structs, coords: np.ndarray) -> list:
    """Re-encode parsed polygons (``batch_parse_polygons`` layout) to
    WKB after a coordinate transform. ``coords``: (P, 2) transformed
    points in the same blob-major order. Returns list of bytes."""
    out = []
    o = 0
    cbytes = np.ascontiguousarray(coords, dtype="<f8")
    for blob_struct in structs:
        parts = []
        for lens in blob_struct:
            rings = []
            for k in lens:
                rings.append(
                    int(k).to_bytes(4, "little")
                    + cbytes[o : o + k].tobytes()
                )
                o += k
            parts.append(
                b"\x01"
                + POLYGON.to_bytes(4, "little")
                + len(lens).to_bytes(4, "little")
                + b"".join(rings)
            )
        if len(blob_struct) == 1:
            out.append(parts[0])
        else:
            out.append(
                b"\x01"
                + MULTIPOLYGON.to_bytes(4, "little")
                + len(parts).to_bytes(4, "little")
                + b"".join(parts)
            )
    return out


def batch_bounds(blobs) -> np.ndarray:
    """Per-blob envelopes (minx, miny, maxx, maxy), point-vectorized."""
    pts = try_parse_points(blobs)
    if pts is not None:
        x, y = pts
        return np.column_stack([x, y, x, y])
    return np.asarray([loads(bytes(b)).bounds() for b in blobs])
