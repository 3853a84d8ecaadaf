"""ESRI Shapefile source/sink — pure Python/numpy, no GDAL.

The reference ingests vector files through geopandas/OGR
(/root/reference/geocube/cli/geocube.py:69-75 passes any OGR path into
make_geocube); the shapefile is the canonical such format, so this
module implements the public ESRI Shapefile Technical Description
(July 1998) directly: .shp geometry records, .dbf (dBASE III)
attributes, .shx index, and a best-effort .prj EPSG sniff.

Layout notes (all from the public spec):

* .shp = 100-byte header (big-endian file code 9994, length in 16-bit
  words; little-endian version 1000, shape type, bbox), then records
  of (BE record number, BE content words) + LE content.
* Polygon/PolyLine content = bbox, numparts, numpoints, part start
  indices, xy doubles. Polygon outer rings are CLOCKWISE, holes
  COUNTER-CLOCKWISE; readers must regroup rings into polygons.
* Z/M shape types (11,13,15,18,21,23,25,28) carry extra ordinate
  blocks after xy; this engine is 2-D so they parse and drop them.
* .dbf = version byte 0x03, record count, 32-byte field descriptors
  (name, type C/N/F/L/D, width, decimals), fixed-width ASCII records
  with a deletion-flag byte.

Distributed read: file paths are globbed on the driver, per-file
record counts come from the 32-byte .dbf headers (so every row gets a
globally stable ``seq`` without reading data), and the actual parse
runs one file per task via mapInPandas — the standard many-files
ingest shape. A single giant shapefile is inherently one stream (the
format has no split points without .shx); convert to parquet for
100 TB-scale inputs.
"""

from __future__ import annotations

import glob as _glob
import os
import re
import struct
from typing import Iterator

import numpy as np
import pandas as pd

from ..geometry import wkb as W

__all__ = [
    "read_shapefile", "read_shapefile_local",
    "write_shapefile", "write_shapefile_local",
]

SHP_NULL = 0
SHP_POINT = 1
SHP_POLYLINE = 3
SHP_POLYGON = 5
SHP_MULTIPOINT = 8

# z/m variants parse like their 2-D base type (extra ordinates ignored)
_BASE_TYPE = {
    0: 0,
    1: 1, 11: 1, 21: 1,
    3: 3, 13: 3, 23: 3,
    5: 5, 15: 5, 25: 5,
    8: 8, 18: 8, 28: 8,
}


class ShapefileError(ValueError):
    pass


# ---------------------------------------------------------------------------
# ring grouping (read) / winding (write)
# ---------------------------------------------------------------------------

def _signed_area2(ring: np.ndarray) -> float:
    """Twice the shoelace signed area; > 0 = counter-clockwise."""
    x, y = ring[:, 0], ring[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    """Even-odd ray cast (open ray toward +x)."""
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    crosses = ((y > py) != (y2 > py))
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = x + (py - y) * (x2 - x) / (y2 - y)
    return bool(np.count_nonzero(crosses & (px < xi)) % 2)


def _rings_to_geometry(rings: list) -> W.Geometry:
    """Shapefile ring soup -> Polygon / MultiPolygon.

    Outer rings are CW per spec (negative shoelace area); every CCW
    ring is a hole of the smallest outer ring containing one of its
    vertices. Degenerate files with only CCW rings (common in the
    wild) fall back to treating every ring as an outer ring.
    """
    outers, holes = [], []
    for r in rings:
        (holes if _signed_area2(r) > 0 else outers).append(r)
    if not outers:
        outers, holes = holes, []
    polys = [[o] for o in outers]
    if holes:
        areas = [abs(_signed_area2(o)) for o in outers]
        for h in holes:
            px, py = float(h[0, 0]), float(h[0, 1])
            best, best_area = None, None
            for i, o in enumerate(outers):
                if _point_in_ring(px, py, o) and (
                    best is None or areas[i] < best_area
                ):
                    best, best_area = i, areas[i]
            if best is None:
                polys.append([h])   # orphan hole: keep as its own part
            else:
                polys[best].append(h)
    if len(polys) == 1:
        return W.Geometry(W.POLYGON, polys[0])
    return W.Geometry(W.MULTIPOLYGON, polys)


def _close_ring(r: np.ndarray) -> np.ndarray:
    if len(r) and not np.array_equal(r[0], r[-1]):
        return np.vstack([r, r[:1]])
    return r


def _oriented(r: np.ndarray, clockwise: bool) -> np.ndarray:
    a = _signed_area2(r)
    if (a > 0) == clockwise:
        return r[::-1]
    return r


# ---------------------------------------------------------------------------
# .shp records
# ---------------------------------------------------------------------------

def _parse_shp(buf: bytes) -> list:
    """.shp bytes -> list of Geometry | None (record order)."""
    if len(buf) < 100 or struct.unpack(">i", buf[:4])[0] != 9994:
        raise ShapefileError("not a shapefile (.shp magic 9994 missing)")
    file_words = struct.unpack(">i", buf[24:28])[0]
    end = min(len(buf), file_words * 2)
    geoms = []
    off = 100
    while off + 8 <= end:
        _, content_words = struct.unpack(">ii", buf[off:off + 8])
        off += 8
        rec = buf[off:off + content_words * 2]
        off += content_words * 2
        st = _BASE_TYPE.get(struct.unpack("<i", rec[:4])[0])
        if st is None:
            raise ShapefileError(
                f"unsupported shape type {struct.unpack('<i', rec[:4])[0]}"
            )
        if st == SHP_NULL:
            geoms.append(None)
        elif st == SHP_POINT:
            x, y = struct.unpack("<2d", rec[4:20])
            geoms.append(W.point(x, y))
        elif st == SHP_MULTIPOINT:
            n = struct.unpack("<i", rec[36:40])[0]
            pts = np.frombuffer(rec, "<f8", 2 * n, 40).reshape(-1, 2)
            geoms.append(W.Geometry(W.MULTIPOINT, pts.copy()))
        else:  # polyline / polygon
            nparts, npoints = struct.unpack("<2i", rec[36:44])
            parts = np.frombuffer(rec, "<i4", nparts, 44)
            pts = np.frombuffer(
                rec, "<f8", 2 * npoints, 44 + 4 * nparts
            ).reshape(-1, 2)
            bounds = np.append(parts, npoints)
            rings = [
                pts[bounds[i]:bounds[i + 1]].copy()
                for i in range(nparts)
                if bounds[i + 1] > bounds[i]
            ]
            if st == SHP_POLYLINE:
                geoms.append(
                    W.Geometry(W.LINESTRING, rings[0]) if len(rings) == 1
                    else W.Geometry(W.MULTILINESTRING, rings)
                )
            else:
                geoms.append(
                    _rings_to_geometry([_close_ring(r) for r in rings])
                )
    return geoms


def _shape_record(g) -> bytes:
    """Geometry | None -> one .shp record content (LE bytes)."""
    if g is None:
        return struct.pack("<i", SHP_NULL)
    t = g.geom_type
    if t == W.POINT:
        return struct.pack("<i2d", SHP_POINT, g.parts[0], g.parts[1])
    if t == W.MULTIPOINT:
        pts = np.asarray(g.parts, dtype="<f8")
        return (
            struct.pack(
                "<i4di", SHP_MULTIPOINT,
                pts[:, 0].min(), pts[:, 1].min(),
                pts[:, 0].max(), pts[:, 1].max(), len(pts),
            ) + pts.tobytes()
        )
    if t in (W.LINESTRING, W.MULTILINESTRING):
        rings = [g.parts] if t == W.LINESTRING else list(g.parts)
        st = SHP_POLYLINE
    elif t in (W.POLYGON, W.MULTIPOLYGON):
        polys = [g.parts] if t == W.POLYGON else g.parts
        rings = []
        for poly in polys:
            for j, r in enumerate(poly):
                rings.append(
                    _oriented(_close_ring(np.asarray(r)), clockwise=(j == 0))
                )
        st = SHP_POLYGON
    else:
        raise ShapefileError(
            f"geometry type {g.type_name} has no shapefile encoding"
        )
    rings = [np.asarray(r, dtype="<f8") for r in rings]
    pts = np.vstack(rings)
    lens = np.array([len(r) for r in rings])
    parts = np.zeros(len(rings), dtype="<i4")
    np.cumsum(lens[:-1], out=parts[1:])
    return (
        struct.pack(
            "<i4d2i", st,
            pts[:, 0].min(), pts[:, 1].min(),
            pts[:, 0].max(), pts[:, 1].max(),
            len(rings), len(pts),
        ) + parts.tobytes() + pts.astype("<f8").tobytes()
    )


# ---------------------------------------------------------------------------
# .dbf attributes
# ---------------------------------------------------------------------------

def _parse_dbf(buf: bytes) -> pd.DataFrame:
    n_rec, hdr_size, rec_size = struct.unpack("<iHH", buf[4:12])
    fields = []
    off = 32
    while off < hdr_size - 1 and buf[off] != 0x0D:
        d = buf[off:off + 32]
        name = d[:11].split(b"\x00")[0].decode("latin-1")
        fields.append((name, chr(d[11]), d[16], d[17]))  # type, len, dec
        off += 32
    cols: dict = {name: [] for name, *_ in fields}
    n_kept = 0
    off = hdr_size
    for _ in range(n_rec):
        rec = buf[off:off + rec_size]
        off += rec_size
        if not rec or rec[0:1] == b"*":      # deleted row
            continue
        n_kept += 1
        p = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[p:p + flen]
            p += flen
            txt = raw.decode("latin-1").strip()
            if ftype in ("N", "F"):
                if not txt or txt == "*" * len(txt):
                    val = None
                elif fdec or ftype == "F" or "." in txt or "e" in txt.lower():
                    val = float(txt)
                else:
                    val = int(txt)
            elif ftype == "L":
                val = (True if txt in "TtYy" else
                       False if txt in "FfNn" else None)
            else:                            # C, D, and anything else: text
                val = txt or None
            cols[name].append(val)
    if not fields:   # attribute-less .dbf still counts records
        return pd.DataFrame(index=range(n_kept))
    # deterministic dtypes regardless of which rows happen to be null
    # (files of one dataset must infer the same schema): numeric
    # fields with decimals -> float64, integer fields -> nullable
    # Int64, logicals -> nullable boolean, text -> object
    out = {}
    for name, ftype, flen, fdec in fields:
        vals = cols[name]
        if ftype in ("N", "F") and (fdec or ftype == "F"):
            out[name] = pd.array(
                [np.nan if v is None else float(v) for v in vals],
                dtype="float64",
            )
        elif ftype == "N":
            out[name] = pd.array(vals, dtype="Int64")
        elif ftype == "L":
            out[name] = pd.array(vals, dtype="boolean")
        else:
            out[name] = pd.Series(vals, dtype="object")
    return pd.DataFrame(out)


def _dbf_bytes(attrs: pd.DataFrame) -> bytes:
    fields = []
    for c in attrs.columns:
        s = attrs[c]
        if pd.api.types.is_bool_dtype(s):
            fields.append((c, "L", 1, 0))
        elif pd.api.types.is_integer_dtype(s):
            fields.append((c, "N", 18, 0))
        elif pd.api.types.is_float_dtype(s):
            # dBASE 'F' float field in %.17e form: 17 significant
            # digits round-trip any float64 exactly through text
            # (atof-style readers, GDAL included, accept exponents)
            # width 26 = sign + d.17digits + 'e±XXX' (3-digit exps)
            fields.append((c, "F", 26, 17))
        else:
            wmax = s.dropna().astype(str).str.encode(
                "latin-1", errors="replace"
            ).str.len().max()
            # an empty / all-null column: pandas max() is NaN, and
            # `NaN or 1` stays NaN (NaN is truthy) — guard explicitly
            width = int(wmax) if pd.notna(wmax) else 1
            fields.append((c, "C", min(max(width, 1), 254), 0))
    hdr_size = 32 + 32 * len(fields) + 1
    rec_size = 1 + sum(f[2] for f in fields)
    out = [struct.pack(
        "<B3BiHH20x", 0x03, 26, 8, 17, len(attrs), hdr_size, rec_size
    )]
    for name, ftype, flen, fdec in fields:
        out.append(struct.pack(
            "<11sc4xBB14x",
            name.encode("latin-1", errors="replace")[:11].ljust(11, b"\x00"),
            ftype.encode(), flen, fdec,
        ))
    out.append(b"\x0d")
    for _, row in attrs.iterrows():
        parts = [b" "]
        for name, ftype, flen, fdec in fields:
            v = row[name]
            if v is None or pd.isna(v):
                txt = b" " * flen
            elif ftype == "L":
                txt = b"T" if v else b"F"
            elif ftype == "F":
                txt = f"{float(v):>{flen}.{fdec}e}".encode()[:flen]
            elif ftype == "N" and fdec:
                txt = f"{float(v):>{flen}.{fdec}f}".encode()[:flen]
            elif ftype == "N":
                txt = f"{int(v):>{flen}d}".encode()[:flen]
            else:
                txt = str(v).encode("latin-1", errors="replace")[
                    :flen].ljust(flen, b" ")
            parts.append(txt)
        out.append(b"".join(parts))
    out.append(b"\x1a")
    return b"".join(out)


def _dbf_record_count(path: str) -> int:
    with open(path, "rb") as f:
        head = f.read(12)
    return struct.unpack("<i", head[4:8])[0]


# ---------------------------------------------------------------------------
# .prj sniff
# ---------------------------------------------------------------------------

_AUTH = re.compile(
    r'AUTHORITY\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]', re.IGNORECASE
)


def sniff_prj_epsg(wkt_text: str):
    """Best-effort EPSG from an ESRI .prj (WKT1). The LAST
    AUTHORITY[...] in the text is the whole-CRS authority; falls back
    to a few ubiquitous ESRI names. None when unknown."""
    codes = _AUTH.findall(wkt_text)
    if codes:
        return int(codes[-1])
    up = wkt_text.upper()
    if "WEB_MERCATOR" in up or "PSEUDO-MERCATOR" in up:
        return 3857
    m = re.search(r"UTM_ZONE_(\d+)([NS])", up)
    if m and "1984" in up:
        return (32600 if m.group(2) == "N" else 32700) + int(m.group(1))
    if "GCS_WGS_1984" in up or ('GEOGCS["WGS 84"' in wkt_text):
        return 4326
    return None


# ---------------------------------------------------------------------------
# local (single-file) API
# ---------------------------------------------------------------------------

def read_shapefile_local(shp_path: str):
    """One .shp (+ sibling .dbf/.prj) -> (geoms, attrs DataFrame, epsg).

    geoms[i] is a Geometry or None (null shape); attrs has one row per
    record (empty frame when no .dbf); epsg is None when no/unknown
    .prj.
    """
    with open(shp_path, "rb") as f:
        geoms = _parse_shp(f.read())
    base = os.path.splitext(shp_path)[0]
    attrs = pd.DataFrame(index=range(len(geoms)))
    if os.path.exists(base + ".dbf"):
        with open(base + ".dbf", "rb") as f:
            attrs = _parse_dbf(f.read())
        if len(attrs) != len(geoms):
            raise ShapefileError(
                f".dbf has {len(attrs)} rows but .shp has "
                f"{len(geoms)} records"
            )
    epsg = None
    if os.path.exists(base + ".prj"):
        with open(base + ".prj", "r", errors="replace") as f:
            epsg = sniff_prj_epsg(f.read())
    return geoms, attrs, epsg


def write_shapefile_local(shp_path: str, geoms, attrs: pd.DataFrame = None,
                          epsg: int = None) -> None:
    """Write one .shp/.shx/.dbf (+ .prj when epsg given)."""
    recs = [_shape_record(g) for g in geoms]
    shape_types = {struct.unpack("<i", r[:4])[0] for r in recs} - {SHP_NULL}
    if len(shape_types) > 1:
        raise ShapefileError(
            f"shapefiles hold one shape type, got {sorted(shape_types)}"
        )
    st = shape_types.pop() if shape_types else SHP_NULL
    bounds = [g.bounds() for g in geoms if g is not None]
    if bounds:
        b = np.array(bounds)
        bbox = (b[:, 0].min(), b[:, 1].min(), b[:, 2].max(), b[:, 3].max())
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)

    def _header(total_words: int) -> bytes:
        # bytes 0-3 file code BE, 4-23 unused, 24-27 length in 16-bit
        # words BE, 28-35 version + shape type LE, 36-99 bbox (x y
        # range, then unused z/m ranges) LE
        return (
            struct.pack(">i20xi", 9994, total_words)
            + struct.pack("<2i", 1000, st)
            + struct.pack("<4d", *bbox)
            + struct.pack("<4d", 0, 0, 0, 0)
        )

    shp_parts, shx_parts = [], []
    off_words = 50
    for i, r in enumerate(recs):
        words = len(r) // 2
        shp_parts.append(struct.pack(">2i", i + 1, words) + r)
        shx_parts.append(struct.pack(">2i", off_words, words))
        off_words += 4 + words
    with open(shp_path, "wb") as f:
        f.write(_header(off_words))
        f.writelines(shp_parts)
    base = os.path.splitext(shp_path)[0]
    with open(base + ".shx", "wb") as f:
        f.write(_header(50 + 4 * len(recs)))
        f.writelines(shx_parts)
    if attrs is None:
        attrs = pd.DataFrame(index=range(len(geoms)))
    with open(base + ".dbf", "wb") as f:
        f.write(_dbf_bytes(attrs))
    if epsg == 4326:
        with open(base + ".prj", "w") as f:
            f.write(
                'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
                'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
                'PRIMEM["Greenwich",0.0],'
                'UNIT["Degree",0.0174532925199433],'
                'AUTHORITY["EPSG","4326"]]'
            )
    elif epsg is not None:
        with open(base + ".prj", "w") as f:
            f.write(f'AUTHORITY["EPSG","{epsg}"]')


# ---------------------------------------------------------------------------
# Spark API
# ---------------------------------------------------------------------------

def read_shapefile(spark, path, id_prefix: str = "shp"):
    """Shapefile path / glob / directory -> vector-table DataFrame
    ``(doc_id, seq, geometry_wkb, <attribute columns...>)`` ready for
    ``make_geocube(vector_df=...)``.

    ``seq`` is the global record ordinal across files (file order =
    sorted paths; per-file record counts come from the 32-byte .dbf
    headers, so the plan is sized without reading geometry). One file
    parses per task — the many-files layout parallelizes; a single
    file is a single stream by format design.
    """
    from pyspark.sql import types as T

    if os.path.isdir(path):
        paths = sorted(_glob.glob(os.path.join(path, "*.shp")))
    else:
        paths = sorted(_glob.glob(path)) if any(
            ch in path for ch in "*?[") else [path]
    if not paths:
        raise ShapefileError(f"no .shp files match {path!r}")

    counts = [_dbf_record_count(os.path.splitext(p)[0] + ".dbf")
              if os.path.exists(os.path.splitext(p)[0] + ".dbf") else None
              for p in paths]
    bases = []
    acc = 0
    for c in counts:
        bases.append(acc)
        # unknown counts (no .dbf) get a 1 << 40 stride: still globally
        # ordered, never colliding
        acc += c if c is not None else (1 << 40)

    # attribute schema from the first file's .dbf (all files of one
    # dataset share it, like OGR layers). A 'doc_id' attribute takes
    # over row identity (roundtrip fidelity with write_shapefile);
    # attributes colliding with the engine's 'seq'/'geometry_wkb'
    # columns are renamed with an '_attr' suffix.
    _, attrs0, _ = read_shapefile_local(paths[0])
    attr_doc_id = "doc_id" in attrs0.columns
    renames = {
        c: f"{c}_attr" for c in attrs0.columns
        if c in ("seq", "geometry_wkb")
    }
    attr_fields = []
    for c in attrs0.columns:
        if c == "doc_id":
            continue
        if pd.api.types.is_bool_dtype(attrs0[c]):
            t = T.BooleanType()
        elif pd.api.types.is_integer_dtype(attrs0[c]):
            t = T.LongType()
        elif pd.api.types.is_float_dtype(attrs0[c]):
            t = T.DoubleType()
        else:
            t = T.StringType()
        attr_fields.append(T.StructField(renames.get(c, c), t))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("geometry_wkb", T.BinaryType()),
        ]
        + attr_fields
    )
    attr_names = [c for c in attrs0.columns if c != "doc_id"]

    files_df = spark.createDataFrame(
        [(p, int(b)) for p, b in zip(paths, bases)], "path string, base long"
    ).repartition(len(paths), "path")

    def _load(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, base in zip(pdf["path"].values, pdf["base"].values):
                geoms, attrs, _ = read_shapefile_local(p)
                stem = os.path.splitext(os.path.basename(p))[0]
                if attr_doc_id and "doc_id" in attrs:
                    ids = attrs["doc_id"].astype("object").values
                else:
                    ids = [
                        f"{id_prefix}-{stem}-{i}" for i in range(len(geoms))
                    ]
                out = pd.DataFrame(
                    {
                        "doc_id": ids,
                        "seq": np.arange(len(geoms), dtype=np.int64) + base,
                        "geometry_wkb": [
                            None if g is None else g.to_wkb() for g in geoms
                        ],
                    }
                )
                for c in attr_names:
                    out[renames.get(c, c)] = (
                        attrs[c].values if c in attrs else None
                    )
                yield out

    return files_df.mapInPandas(_load, schema=schema)


def write_shapefile(df, path: str, geometry_column: str = "geometry_wkb",
                    epsg: int = None, mode: str = "single") -> list:
    """Vector-table DataFrame -> shapefile(s). Returns written paths.

    ``mode='single'`` collects to the driver and writes one .shp —
    the right sink for small outputs (the format caps at 2 GB and has
    no parallel append). ``mode='parts'`` writes one shapefile per
    Spark partition under ``path``/part-N.shp, fully distributed.
    """
    cols = [c for c in df.columns if c != geometry_column]

    def _write_one(pdf: pd.DataFrame, out_path: str):
        geoms = [
            None if b is None else W.loads(bytes(b))
            for b in pdf[geometry_column].values
        ]
        write_shapefile_local(
            out_path, geoms, pdf[cols].reset_index(drop=True), epsg=epsg
        )

    if mode == "single":
        _write_one(df.toPandas(), path)
        return [path]
    if mode != "parts":
        raise ValueError(f"unknown mode {mode!r}")
    os.makedirs(path, exist_ok=True)
    from pyspark.sql import functions as F

    tagged = df.withColumn("__pid", F.spark_partition_id())

    def _per_part(key, pdf):
        pid = int(key[0])
        out = os.path.join(path, f"part-{pid:05d}.shp")
        _write_one(pdf.drop(columns="__pid"), out)
        return pd.DataFrame({"path": [out], "n": [len(pdf)]})

    written = (
        tagged.groupBy("__pid")
        .applyInPandas(_per_part, schema="path string, n long")
        .collect()
    )
    return [r["path"] for r in written]
