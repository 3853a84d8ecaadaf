"""GeoTIFF source + sink — pure Python/numpy, no GDAL/rasterio.

The reference ingests and emits rasters through rioxarray/GDAL
(`like=xarray raster`, reference geobox.py:169-186; golden comparison
rasters in its test suite are GDAL products). This module implements
the public TIFF 6.0 + BigTIFF + GeoTIFF 1.1 specs directly so the
engine can exchange rasters with that ecosystem:

* ``read_geotiff(spark, path)``   distributed raster scan -> GeoCube
  (chunk DataFrame tiled at ``tile_size``; each Spark task reads only
  its own byte ranges of the file — on object storage this is the
  ranged-GET access pattern, so a 100 GB COG never passes through the
  driver).
* ``write_geotiff(cube, path)``   tiled-GeoTIFF sink (deflate), the
  interchange hatch mirroring ``GeoCube.to_netcdf`` — driver-side
  assembly, GDAL/QGIS-readable output with CRS + nodata metadata.
* ``geobox_from_geotiff(path)``   grid of an existing raster for
  ``make_geocube(like=...)`` (reference CLI ``-l`` parity for rasters).

Format support: classic + BigTIFF headers, both byte orders, tiled and
stripped layouts, PlanarConfig 1/2, compression none/deflate/LZW/
PackBits, horizontal predictor, GeoKey CRS (projected + geographic
EPSG), ModelPixelScale/Tiepoint and full ModelTransformation, and
GDAL's ASCII nodata tag.
"""

from __future__ import annotations

import math
import os
import struct
import zlib
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np
import pandas as pd

# --------------------------------------------------------------------------
# TIFF constants
# --------------------------------------------------------------------------

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8, 16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
             12: "d", 16: "Q", 17: "q"}

T_NEWSUBFILE = 254
T_WIDTH = 256
T_HEIGHT = 257
T_BITS = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_STRIP_OFFSETS = 273
T_SAMPLES = 277
T_ROWS_PER_STRIP = 278
T_STRIP_COUNTS = 279
T_PLANAR = 284
T_PREDICTOR = 317
T_TILE_W = 322
T_TILE_H = 323
T_TILE_OFFSETS = 324
T_TILE_COUNTS = 325
T_SAMPLE_FORMAT = 339
T_PIXEL_SCALE = 33550
T_TIEPOINT = 33922
T_TRANSFORM = 34264
T_GEO_DIR = 34735
T_GEO_DOUBLES = 34736
T_GEO_ASCII = 34737
T_GDAL_NODATA = 42113

C_NONE = 1
C_LZW = 5
C_DEFLATE = 8
C_PACKBITS = 32773
C_DEFLATE_OLD = 32946

_SF_DTYPE = {
    (1, 8): "u1", (1, 16): "u2", (1, 32): "u4", (1, 64): "u8",
    (2, 8): "i1", (2, 16): "i2", (2, 32): "i4", (2, 64): "i8",
    (3, 32): "f4", (3, 64): "f8",
}
_DTYPE_SF = {v: k for k, v in _SF_DTYPE.items()}


# --------------------------------------------------------------------------
# codecs
# --------------------------------------------------------------------------

def lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (MSB-first codes, early code-size change,
    ClearCode 256 / EOI 257). Spec: TIFF 6.0 §13."""
    out = bytearray()
    table: list[bytes] = []
    prev: Optional[bytes] = None
    bitpos = 0
    nbits = 9
    n = len(data)

    def _reset():
        nonlocal table, nbits
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        nbits = 9

    _reset()
    total_bits = n * 8
    while bitpos + nbits <= total_bits:
        byte0 = bitpos >> 3
        # up to 12 bits span at most 3 bytes
        chunk = data[byte0:byte0 + 3]
        acc = int.from_bytes(chunk.ljust(3, b"\0"), "big")
        code = (acc >> (24 - (bitpos & 7) - nbits)) & ((1 << nbits) - 1)
        bitpos += nbits
        if code == 256:
            _reset()
            prev = None
            continue
        if code == 257:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        # TIFF switches code width one code EARLY; the decoder's table
        # lags the encoder's by one pending entry, so it widens at
        # (1<<n)-2 where the encoder widens at next_code == (1<<n)-1
        if len(table) >= (1 << nbits) - 2 and nbits < 12:
            nbits += 1
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (for the test roundtrip; the sink's
    default compression is deflate)."""
    out = bytearray()
    acc = 0
    accbits = 0

    def put(code: int, nbits: int):
        nonlocal acc, accbits
        acc = (acc << nbits) | code
        accbits += nbits
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    nbits = 9
    put(256, nbits)  # Clear
    w = b""
    for i in range(len(data)):
        c = data[i:i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        put(table[w], nbits)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << nbits) - 1 and nbits < 12:
            nbits += 1
        elif next_code == 4094:
            put(256, nbits)
            table = {bytes([j]): j for j in range(256)}
            next_code = 258
            nbits = 9
        w = c
    if w:
        put(table[w], nbits)
    put(257, nbits)  # EOI
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:
            out += data[i:i + 1] * (257 - h)
            i += 1
    return bytes(out)


def _decompress(raw: bytes, compression: int) -> bytes:
    if compression == C_NONE:
        return raw
    if compression in (C_DEFLATE, C_DEFLATE_OLD):
        return zlib.decompress(raw)
    if compression == C_LZW:
        return lzw_decode(raw)
    if compression == C_PACKBITS:
        return packbits_decode(raw)
    raise NotImplementedError(
        f"TIFF compression {compression} not supported "
        "(supported: none, deflate, LZW, PackBits)"
    )


def _unpredict(arr: np.ndarray, predictor: int) -> np.ndarray:
    """arr shape (rows, cols[, samples]); predictor 2 = horizontal
    differencing (cumulative sum along the row, wrap-around int math)."""
    if predictor in (0, 1):
        return arr
    if predictor == 2:
        if arr.dtype.kind == "f":
            raise NotImplementedError(
                "predictor=2 on float samples is invalid TIFF"
            )
        return np.cumsum(arr, axis=1, dtype=arr.dtype)
    raise NotImplementedError(f"TIFF predictor {predictor} not supported")


# --------------------------------------------------------------------------
# IFD parsing
# --------------------------------------------------------------------------

@dataclass
class TiffInfo:
    path: str
    width: int
    height: int
    dtype: str                     # numpy dtype string, native order
    samples: int
    planar: int
    compression: int
    predictor: int
    tiled: bool
    tile_w: int                    # strips: width
    tile_h: int                    # strips: rows_per_strip
    offsets: np.ndarray            # (n_chunks,) file offsets
    bytecounts: np.ndarray
    nodata: Optional[float]
    epsg: Optional[int]
    transform: tuple               # (a, b, c, d, e, f) affine
    big_endian: bool

    @property
    def tiles_across(self) -> int:
        return (self.width + self.tile_w - 1) // self.tile_w

    @property
    def tiles_down(self) -> int:
        return (self.height + self.tile_h - 1) // self.tile_h

    @property
    def chunks_per_plane(self) -> int:
        return self.tiles_across * self.tiles_down

    def chunk_index(self, plane: int, ty: int, tx: int) -> int:
        i = ty * self.tiles_across + tx
        if self.planar == 2:
            return plane * self.chunks_per_plane + i
        return i


def _read_ifd_entries(buf: bytes, fp, bo: str, big: bool):
    """Yield (tag, type, count, value_bytes) for one IFD at buf start."""
    if big:
        n = struct.unpack(bo + "Q", buf[:8])[0]
        esz, off0, inline = 20, 8, 8
    else:
        n = struct.unpack(bo + "H", buf[:2])[0]
        esz, off0, inline = 12, 2, 4
    entries = {}
    for i in range(n):
        e = buf[off0 + i * esz: off0 + (i + 1) * esz]
        if big:
            tag, typ, cnt = struct.unpack(bo + "HHQ", e[:12])
            val = e[12:20]
        else:
            tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
            val = e[8:12]
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size > inline:
            ptr = struct.unpack(bo + ("Q" if big else "I"), val)[0]
            fp.seek(ptr)
            val = fp.read(size)
        else:
            val = val[:size]
        entries[tag] = (typ, cnt, val)
    next_off = struct.unpack(
        bo + ("Q" if big else "I"), buf[off0 + n * esz: off0 + n * esz
                                        + (8 if big else 4)]
    )[0]
    return entries, next_off


def _tag_values(entries, tag, bo: str, default=None):
    if tag not in entries:
        return default
    typ, cnt, val = entries[tag]
    if typ == 2:  # ASCII
        return val.rstrip(b"\0").decode("latin-1")
    if typ == 5:  # RATIONAL
        vals = struct.unpack(bo + "I" * (2 * cnt), val)
        return [vals[2 * i] / vals[2 * i + 1] for i in range(cnt)]
    fmt = _TYPE_FMT.get(typ)
    if fmt is None:
        return default
    return list(struct.unpack(bo + fmt * cnt, val))


def read_tiff_info(path: str, *, ifd_index: int = 0) -> TiffInfo:
    """Parse one IFD of a TIFF. ``ifd_index`` walks the IFD chain —
    index 0 is the full-resolution image, higher indexes are the
    reduced-resolution overviews a COG writer appends (GDAL internal-
    overview layout). Overview IFDs usually carry no georeferencing
    tags; the transform then comes back as the identity placeholder
    and callers scale the full-resolution affine themselves."""
    with open(path, "rb") as fp:
        head = fp.read(16)
        if head[:2] == b"II":
            bo = "<"
        elif head[:2] == b"MM":
            bo = ">"
        else:
            raise ValueError(f"{path}: not a TIFF file")
        magic = struct.unpack(bo + "H", head[2:4])[0]
        if magic == 42:
            big = False
            ifd_off = struct.unpack(bo + "I", head[4:8])[0]
        elif magic == 43:
            big = True
            ifd_off = struct.unpack(bo + "Q", head[8:16])[0]
        else:
            raise ValueError(f"{path}: bad TIFF magic {magic}")
        for hop in range(ifd_index + 1):
            fp.seek(ifd_off)
            buf = fp.read(8 + 4096 * (20 if big else 12) + 8)
            entries, next_off = _read_ifd_entries(buf, fp, bo, big)
            if hop < ifd_index:
                if not next_off:
                    raise IndexError(
                        f"{path}: no IFD #{ifd_index} "
                        f"(chain ends at #{hop})"
                    )
                ifd_off = next_off

    def tv(tag, default=None):
        return _tag_values(entries, tag, bo, default)

    width = int(tv(T_WIDTH)[0])
    height = int(tv(T_HEIGHT)[0])
    samples = int(tv(T_SAMPLES, [1])[0])
    bits = tv(T_BITS, [8])
    sf = tv(T_SAMPLE_FORMAT, [1] * samples)
    key = (int(sf[0]), int(bits[0]))
    if key not in _SF_DTYPE:
        raise NotImplementedError(f"{path}: sample format {key}")
    dtype = _SF_DTYPE[key]
    compression = int(tv(T_COMPRESSION, [C_NONE])[0])
    predictor = int(tv(T_PREDICTOR, [1])[0])
    planar = int(tv(T_PLANAR, [1])[0])

    tiled = T_TILE_OFFSETS in entries
    if tiled:
        tile_w = int(tv(T_TILE_W)[0])
        tile_h = int(tv(T_TILE_H)[0])
        offsets = np.asarray(tv(T_TILE_OFFSETS), dtype=np.int64)
        counts = np.asarray(tv(T_TILE_COUNTS), dtype=np.int64)
    else:
        tile_w = width
        tile_h = int(tv(T_ROWS_PER_STRIP, [height])[0])
        offsets = np.asarray(tv(T_STRIP_OFFSETS), dtype=np.int64)
        counts = np.asarray(tv(T_STRIP_COUNTS), dtype=np.int64)

    nodata = None
    nd = tv(T_GDAL_NODATA)
    if nd is not None:
        try:
            nodata = float(nd.strip())
        except ValueError:
            pass

    # affine: full matrix wins, else scale+tiepoint
    tr = tv(T_TRANSFORM)
    if tr is not None:
        a, b, c, d, e, f = tr[0], tr[1], tr[3], tr[4], tr[5], tr[7]
    else:
        scale = tv(T_PIXEL_SCALE)
        tie = tv(T_TIEPOINT)
        if scale is None or tie is None:
            if ifd_index > 0:
                # overview IFDs carry no geo tags; identity placeholder
                a, b, c, d, e, f = 1.0, 0.0, 0.0, 0.0, -1.0, 0.0
            else:
                raise ValueError(f"{path}: no georeferencing tags")
        else:
            i, j, _k, x, y, _z = tie[:6]
            sx, sy = scale[0], scale[1]
            a, b, c = sx, 0.0, x - i * sx
            d, e, f = 0.0, -sy, y + j * sy

    # CRS from GeoKeyDirectory
    epsg = None
    gk = tv(T_GEO_DIR)
    if gk is not None:
        nkeys = int(gk[3])
        keys = {}
        for i in range(nkeys):
            kid, loc, cnt, val = gk[4 + 4 * i: 8 + 4 * i]
            if loc == 0:
                keys[int(kid)] = int(val)
        if keys.get(3072, 32767) != 32767 and 3072 in keys:
            epsg = keys[3072]
        elif keys.get(2048, 32767) != 32767 and 2048 in keys:
            epsg = keys[2048]
        elif keys.get(3072) == 32767 or keys.get(2048) == 32767:
            # user-defined CRS sentinel: distinguish from "no geokeys"
            # so readers demand an explicit crs= instead of silently
            # defaulting to EPSG:4326
            epsg = 32767

    return TiffInfo(
        path=path, width=width, height=height, dtype=dtype,
        samples=samples, planar=planar, compression=compression,
        predictor=predictor, tiled=tiled, tile_w=tile_w, tile_h=tile_h,
        offsets=offsets, bytecounts=counts, nodata=nodata, epsg=epsg,
        transform=(a, b, c, d, e, f), big_endian=(bo == ">"),
    )


def _decode_chunk(fp, info: TiffInfo, idx: int, plane: int) -> np.ndarray:
    """One tile/strip -> ndarray (tile_h, tile_w) of the requested
    sample plane (edge tiles still full-size; caller clips)."""
    fp.seek(int(info.offsets[idx]))
    raw = fp.read(int(info.bytecounts[idx]))
    data = _decompress(raw, info.compression)
    dt = np.dtype(info.dtype)
    if info.big_endian:
        dt = dt.newbyteorder(">")
    if info.tiled:
        th, tw = info.tile_h, info.tile_w
    else:
        ty = idx % info.chunks_per_plane if info.planar == 2 else idx
        th = min(info.tile_h, info.height - ty * info.tile_h)
        tw = info.tile_w
    if info.planar == 1 and info.samples > 1:
        arr = np.frombuffer(data, dtype=dt,
                            count=th * tw * info.samples)
        arr = arr.reshape(th, tw, info.samples)
        arr = _unpredict(arr, info.predictor)
        arr = arr[:, :, plane]
    else:
        arr = np.frombuffer(data, dtype=dt, count=th * tw)
        arr = arr.reshape(th, tw)
        arr = _unpredict(arr, info.predictor)
    if info.big_endian:
        arr = arr.astype(info.dtype)
    return arr


def geobox_from_geotiff(path: str, crs=None):
    """Grid of an existing GeoTIFF for ``make_geocube(like=...)``.

    ``crs`` overrides the file's CRS geokey (any
    ``CRS.from_user_input`` form). Required when the file carries the
    user-defined sentinel 32767 — GeoTIFF geokeys cannot describe a
    parameterized CRS, so the writer records 32767 and the identity
    must be supplied out-of-band on read.
    """
    from ..geometry.affine import Affine
    from ..geometry.crs import CRS
    from ..grid.geobox import GeoBox

    info = read_tiff_info(path)
    if crs is not None:
        c = CRS.from_user_input(crs)
    elif info.epsg == 32767:
        raise ValueError(
            f"{path}: CRS geokey is 32767 (user-defined) — the file "
            "was written from a parameterized CRS whose identity "
            "GeoTIFF cannot carry; pass crs=<wkt/proj4/epsg> to "
            "read it"
        )
    else:
        c = CRS(info.epsg) if info.epsg else CRS(4326)
    return GeoBox(info.width, info.height, Affine(*info.transform), c)


# --------------------------------------------------------------------------
# distributed read -> GeoCube
# --------------------------------------------------------------------------

def tiff_ifd_count(path: str) -> int:
    """Number of IFDs in the chain (1 + overview count)."""
    with open(path, "rb") as fp:
        head = fp.read(16)
        bo = "<" if head[:2] == b"II" else ">"
        magic = struct.unpack(bo + "H", head[2:4])[0]
        big = magic == 43
        off = struct.unpack(
            bo + ("Q" if big else "I"), head[8:16] if big else head[4:8]
        )[0]
        n = 0
        while off:
            fp.seek(off)
            buf = fp.read(8 + 4096 * (20 if big else 12) + 8)
            _, off = _read_ifd_entries(buf, fp, bo, big)
            n += 1
        return n


def read_geotiff(spark, path: str, *, measurements: Optional[list] = None,
                 tile_size: Optional[int] = None, fill=None,
                 overview: int = 0, crs=None):
    """Read a GeoTIFF into a GeoCube, distributed.

    The driver parses only the IFD (KBs); every Spark task then reads
    and decodes its own byte ranges — on object storage this is the
    COG ranged-GET pattern, so the raster never flows through the
    driver. Output chunks are re-tiled to ``tile_size`` (default: the
    source tile size if square, else 256): each task owns one output
    TILE ROW of one band and reads exactly the source tiles/strips
    intersecting it, so every source chunk is read once per band-row.

    ``measurements`` names the bands (default band_1..band_n).
    ``fill`` overrides the file's nodata as the BandMeta fill.
    ``crs`` overrides the file's CRS geokey (required for files whose
    geokey is the user-defined sentinel 32767).
    """
    import pandas as pd
    from pyspark.sql import types as T

    from ..cube import CHUNK_SCHEMA, BandMeta, GeoCube, _zoom_for
    from ..grid.geobox import GeoBox

    info = read_tiff_info(path, ifd_index=overview)
    gb = geobox_from_geotiff(path, crs=crs)
    if overview:
        # reduced-resolution read (the COG zoom-out path): same CRS
        # and origin, cell size scaled by the decimation factor
        from ..geometry.affine import Affine

        a = gb.affine
        fx = gb.width / info.width
        fy = gb.height / info.height
        gb = GeoBox(
            info.width, info.height,
            Affine(a.a * fx, a.b * fx, a.c, a.d * fy, a.e * fy, a.f),
            gb.crs,
        )
    if tile_size is None:
        tile_size = (info.tile_w
                     if info.tiled and info.tile_w == info.tile_h else 256)
    names = measurements or [f"band_{i+1}" for i in range(info.samples)]
    if len(names) != info.samples:
        raise ValueError(
            f"{len(names)} measurement names for {info.samples} bands"
        )
    if fill is not None:
        nodata = fill
    elif info.nodata is not None:
        nodata = info.nodata
    else:
        # integer rasters can't carry NaN; 0 matches GDAL's default
        nodata = 0.0 if np.dtype(info.dtype).kind in "ui" else np.nan
    zoom = _zoom_for(gb, tile_size)
    _, ntx, nty = gb.n_tiles(tile_size)

    tasks = pd.DataFrame(
        [
            {"plane": p, "ty": ty}
            for p in range(info.samples)
            for ty in range(nty)
        ]
    )
    gb_dict = gb.to_dict()
    info_fields = vars(info).copy()
    info_fields["offsets"] = info.offsets.tolist()
    info_fields["bytecounts"] = info.bytecounts.tolist()

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        inf = TiffInfo(**{
            **info_fields,
            "offsets": np.asarray(info_fields["offsets"], dtype=np.int64),
            "bytecounts": np.asarray(info_fields["bytecounts"],
                                     dtype=np.int64),
        })
        g = GeoBox.from_dict(gb_dict)
        with open(inf.path, "rb") as fp:
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    plane, ty = int(r.plane), int(r.ty)
                    row0 = ty * tile_size
                    h = min(tile_size, g.height - row0)
                    # source chunk rows intersecting [row0, row0+h)
                    sty0 = row0 // inf.tile_h
                    sty1 = (row0 + h - 1) // inf.tile_h
                    band_rows = np.empty((h, g.width), dtype=np.float64)
                    for sty in range(sty0, sty1 + 1):
                        srow0 = sty * inf.tile_h
                        sh = min(inf.tile_h, inf.height - srow0)
                        strip = np.empty((sh, inf.width),
                                         dtype=np.float64)
                        for stx in range(inf.tiles_across):
                            idx = inf.chunk_index(plane, sty, stx)
                            t = _decode_chunk(fp, inf, idx, plane)
                            scol0 = stx * inf.tile_w
                            sw = min(inf.tile_w, inf.width - scol0)
                            strip[:, scol0:scol0 + sw] = (
                                t[:sh, :sw].astype(np.float64)
                            )
                        lo = max(row0, srow0)
                        hi = min(row0 + h, srow0 + sh)
                        band_rows[lo - row0:hi - row0, :] = (
                            strip[lo - srow0:hi - srow0, :]
                        )
                    out = []
                    for tx in range(ntx):
                        col0 = tx * tile_size
                        w = min(tile_size, g.width - col0)
                        vals = band_rows[:, col0:col0 + w]
                        out.append({
                            "measurement": names[plane],
                            "group_key": None,
                            "zoom": zoom,
                            "tile_id": ty * ntx + tx,
                            "row0": row0, "col0": col0, "h": h, "w": w,
                            "values": vals.ravel(),
                            "n_geoms": 0,
                            "n_cells_burned": int(h * w),
                            "min_seq": -1, "max_seq": -1,
                        })
                    yield pd.DataFrame(
                        out, columns=[f.name for f in CHUNK_SCHEMA.fields]
                    )

    sc = spark.sparkContext
    n_parts = max(1, min(len(tasks), 4 * sc.defaultParallelism))
    tdf = spark.createDataFrame(tasks).repartition(n_parts)
    chunks = tdf.mapInPandas(_read, schema=CHUNK_SCHEMA)
    bands = {
        m: BandMeta(name=m, dtype=info.dtype, fill=float(nodata))
        for m in names
    }
    return GeoCube(
        chunks=chunks, geobox=gb, bands=bands, group_by=None,
        group_keys=None, tile_size=tile_size,
        fill=float(nodata),
    )


# --------------------------------------------------------------------------
# sink
# --------------------------------------------------------------------------

def _decimate2(arr: np.ndarray, valid: np.ndarray):
    """Fill-aware 2x2 average decimation (GDAL 'average' with nodata):
    each output cell is the mean of its up-to-4 VALID source cells;
    all-invalid blocks stay invalid. Odd edges average the 1-2 cells
    that exist."""
    H, W = arr.shape
    H2, W2 = (H + 1) // 2, (W + 1) // 2
    pa = np.zeros((H2 * 2, W2 * 2), dtype=np.float64)
    va = np.zeros((H2 * 2, W2 * 2), dtype=bool)
    pa[:H, :W] = np.where(valid, arr, 0.0)
    va[:H, :W] = valid
    s = pa.reshape(H2, 2, W2, 2).sum(axis=(1, 3))
    c = va.reshape(H2, 2, W2, 2).sum(axis=(1, 3))
    out = np.divide(s, np.maximum(c, 1))
    return out, c > 0


def write_geotiff(cube, path: str, *, compression: str = "deflate",
                  tile_size: Optional[int] = None,
                  overviews=0, mode: str = "file") -> str:
    """Write an (ungrouped) GeoCube as a tiled GeoTIFF, optionally
    Cloud-Optimized: ``overviews=N`` appends N chained reduced-
    resolution IFDs (2x decimation each, fill-aware averaging, GDAL
    internal-overview layout); ``overviews='auto'`` halves until the
    overview fits one tile. Readers that zoom out then ranged-read
    only the small overview IFD — the COG access pattern — via
    ``read_geotiff(..., overview=k)`` here or any COG-aware client.

    Multi-band output uses PlanarConfiguration=2 (band-sequential) so
    each band's tiles map 1:1 onto the cube's chunk rows; bands share
    one promoted dtype (GDAL multiband semantics). Driver-side
    assembly like ``to_netcdf`` (dense band arrays are materialized on
    the driver) — the distributed sink is ``GeoCube.write``; this is
    the GDAL-interchange hatch.
    """
    if cube.group_by:
        raise ValueError(
            "write_geotiff writes ungrouped cubes; select one group "
            "(filter chunks on group_key) or use to_netcdf"
        )
    if mode == "parts":
        return _write_geotiff_parts(cube, path, compression=compression,
                                    tile_size=tile_size,
                                    overviews=overviews)
    if mode != "file":
        raise ValueError(f"mode must be 'file' or 'parts', got {mode!r}")
    comp = {"none": C_NONE, "deflate": C_DEFLATE, "lzw": C_LZW}[compression]
    ts = tile_size or cube.tile_size
    if ts != cube.tile_size:
        raise ValueError(
            f"tile_size {ts} != cube chunk size {cube.tile_size}: the "
            "writer maps chunks 1:1 onto TIFF tiles — re-chunk first "
            "(e.g. cube.warp(cube.geobox, tile_size=...))"
        )
    if ts % 16:
        raise ValueError(f"TIFF tile size must be a multiple of 16: {ts}")
    gb = cube.geobox
    names = list(cube.bands)
    dtype = np.result_type(*[np.dtype(cube.bands[m].dtype) for m in names])
    if dtype.kind not in "uif":
        raise ValueError(f"cannot write dtype {dtype} to GeoTIFF")
    dts = dtype.str.lstrip("<>|=")
    if dts not in _DTYPE_SF:
        raise ValueError(f"unsupported GeoTIFF dtype {dtype}")
    sf, bits = _DTYPE_SF[dts]
    # each band pads with ITS OWN fill; the file-level GDAL nodata tag
    # (a single value by format) records band 0's
    fills = [cube.bands[m].fill for m in names]
    H, W = int(gb.height), int(gb.width)

    # dense per-band assembly (working precision float64; missing
    # tiles stay fill)
    dense = {
        m: np.full((H, W), float(cube.bands[m].fill), dtype=np.float64)
        for m in names
    }
    for row in cube.chunks.toLocalIterator():
        m = row["measurement"]
        if m not in dense:
            continue
        if (row["row0"] % ts) or (row["col0"] % ts):
            raise ValueError(
                "chunk grid does not align with the requested tile size; "
                f"pass tile_size={cube.tile_size}"
            )
        vals = np.asarray(row["values"], dtype=np.float64).reshape(
            row["h"], row["w"]
        )
        dense[m][row["row0"]:row["row0"] + row["h"],
                 row["col0"]:row["col0"] + row["w"]] = vals

    if overviews == "auto":
        n_ov = 0
        w_, h_ = W, H
        while max(w_, h_) > ts:
            w_, h_ = (w_ + 1) // 2, (h_ + 1) // 2
            n_ov += 1
    else:
        n_ov = int(overviews)
    if n_ov < 0:
        raise ValueError("overviews must be >= 0 or 'auto'")

    def _compress(data: bytes) -> bytes:
        if comp == C_DEFLATE:
            return zlib.compress(data, 6)
        if comp == C_LZW:
            return lzw_encode(data)
        return data

    def _valid(m, arr):
        f = float(cube.bands[m].fill)
        return ~np.isnan(arr) if math.isnan(f) else arr != f

    # pyramid: levels[k] = (w, h, {band: float64 array})
    levels = [(W, H, dense)]
    for _ in range(n_ov):
        pw, ph, prev = levels[-1]
        if max(pw, ph) <= 1:
            break
        nxt = {}
        for m, arr in prev.items():
            out, ok = _decimate2(arr, _valid(m, arr))
            nxt[m] = np.where(ok, out, float(cube.bands[m].fill))
        levels.append((((pw + 1) // 2), ((ph + 1) // 2), nxt))

    nb = len(names)
    a, b, c, d, e, f = gb.affine.tolist()[:6]
    nd = cube.bands[names[0]].fill
    nd_s = ("nan" if (isinstance(nd, float) and math.isnan(nd))
            else repr(float(nd)))

    def _entry(tag, typ, vals):
        cnt = len(vals)
        if typ == 2:
            payload = vals[0]
            cnt = len(payload)
        else:
            payload = struct.pack("<" + _TYPE_FMT[typ] * cnt, *vals)
        return tag, typ, cnt, payload

    def _level_block(lw, lh, arrays, base_off, is_overview):
        """Render one image level as [IFD][payload][tile body] bytes
        with absolute offsets; returns (block_bytes, next_ptr_pos)."""
        lntx = (lw + ts - 1) // ts
        lnty = (lh + ts - 1) // ts
        ln_tiles = lntx * lnty
        ln_chunks = ln_tiles * nb

        tiles = []
        for m in names:
            arr = arrays[m]
            fill_v = cube.bands[m].fill
            for ty in range(lnty):
                for tx in range(lntx):
                    full = np.full((ts, ts), fill_v, dtype=dtype)
                    blk = arr[ty * ts:(ty + 1) * ts,
                              tx * ts:(tx + 1) * ts]
                    if is_overview and dtype.kind in "ui":
                        blk = np.rint(blk)
                    full[:blk.shape[0], :blk.shape[1]] = blk.astype(dtype)
                    tiles.append(_compress(full.tobytes()))

        tags = [
            _entry(T_WIDTH, 4, [lw]),
            _entry(T_HEIGHT, 4, [lh]),
            _entry(T_BITS, 3, [bits] * nb),
            _entry(T_COMPRESSION, 3, [comp]),
            _entry(T_PHOTOMETRIC, 3, [1]),
            _entry(T_SAMPLES, 3, [nb]),
            _entry(T_PLANAR, 3, [2]),
            _entry(T_TILE_W, 3, [ts]),
            _entry(T_TILE_H, 3, [ts]),
            _entry(T_TILE_OFFSETS, 4, [0] * ln_chunks),   # patched below
            _entry(T_TILE_COUNTS, 4, [0] * ln_chunks),    # patched below
            _entry(T_SAMPLE_FORMAT, 3, [sf] * nb),
            _entry(T_GDAL_NODATA, 2, [nd_s.encode() + b"\0"]),
        ]
        if is_overview:
            # reduced-resolution flag; geo tags live on the full image
            tags.append(_entry(T_NEWSUBFILE, 4, [1]))
        else:
            rotated = (b != 0.0) or (d != 0.0)
            if rotated:
                tags.append(_entry(T_TRANSFORM, 12,
                                   [a, b, 0.0, c, d, e, 0.0, f,
                                    0.0, 0.0, 0.0, 0.0,
                                    0.0, 0.0, 0.0, 1.0]))
            else:
                tags.append(_entry(T_PIXEL_SCALE, 12, [a, -e, 0.0]))
                tags.append(
                    _entry(T_TIEPOINT, 12, [0.0, 0.0, 0.0, c, f, 0.0])
                )
            epsg = gb.crs.epsg
            # GeoTIFF geokeys can only carry an EPSG code; a
            # parameterized CRS (parsed from WKT/proj4 with no EPSG
            # identity) writes the user-defined sentinel 32767 — the
            # grid georeferencing stays intact, only the CRS identity
            # is not self-describing in the file.
            if epsg <= 0:
                epsg = 32767
            geo = [1, 1, 0, 3,
                   1024, 0, 1, (2 if gb.crs.is_geographic else 1),
                   1025, 0, 1, 1,
                   (2048 if gb.crs.is_geographic else 3072), 0, 1, epsg]
            tags.append(_entry(T_GEO_DIR, 3, geo))
        tags.sort(key=lambda t: t[0])

        n_entries = len(tags)
        ifd_size = 2 + n_entries * 12 + 4
        data_off = base_off + ifd_size

        def _render(tag_list):
            """Entry table + out-of-line payload (spec rule: values of
            <= 4 bytes are INLINE — including 1-tile offset/count
            arrays, which the old patch-after-layout scheme broke)."""
            entry_bytes = b""
            payload = b""
            for tag, typ, cnt, pl in tag_list:
                size = _TYPE_SIZE[typ] * cnt
                if size <= 4:
                    val = pl.ljust(4, b"\0")
                else:
                    val = struct.pack("<I", data_off + len(payload))
                    payload += pl
                entry_bytes += struct.pack("<HHI", tag, typ, cnt) + val
            return entry_bytes, payload

        # pass 1 with zeroed offsets/counts fixes the layout (sizes do
        # not depend on the values); pass 2 renders the real values
        _, payload0 = _render(tags)
        tile_data_off = data_off + len(payload0)
        offsets, counts = [], []
        body = b""
        for data in tiles:
            offsets.append(tile_data_off + len(body))
            counts.append(len(data))
            body += data
        tags = [
            _entry(T_TILE_OFFSETS, 4, offsets) if t[0] == T_TILE_OFFSETS
            else _entry(T_TILE_COUNTS, 4, counts) if t[0] == T_TILE_COUNTS
            else t
            for t in tags
        ]
        entry_bytes, payload = _render(tags)
        assert len(payload) == len(payload0)
        next_ptr_pos = base_off + 2 + n_entries * 12
        ifd = (struct.pack("<H", n_entries) + entry_bytes
               + struct.pack("<I", 0))  # next pointer patched later
        return ifd + payload + body, next_ptr_pos

    out = bytearray(b"II*\0" + struct.pack("<I", 8))
    prev_next_pos = None
    for li, (lw, lh, arrays) in enumerate(levels):
        base = len(out)
        if prev_next_pos is not None:
            out[prev_next_pos:prev_next_pos + 4] = struct.pack("<I", base)
        block, next_pos = _level_block(lw, lh, arrays, base, li > 0)
        out += block
        prev_next_pos = next_pos
    if len(out) > 0xFFFFFFFF:
        raise ValueError(
            "output exceeds 4 GB classic-TIFF limit; write per-band "
            "files or increase compression"
        )
    with open(path, "wb") as fp:
        fp.write(bytes(out))
    return path


def _write_geotiff_parts(cube, path: str, *, compression: str = "deflate",
                         tile_size: Optional[int] = None,
                         overviews=0) -> str:
    """Distributed GeoTIFF export (round-2 review item 5): executors
    compress their chunk rows into per-partition part files plus a
    tiny manifest; the driver renders the IFDs with absolute offsets
    and STREAMS the part bodies into the final file. Nothing dense is
    ever materialized on the driver — memory is O(n_tiles) manifest
    rows, disk I/O is one sequential concatenation pass.

    Overviews are built DISTRIBUTED: each level decimates the previous
    level's chunks 2x with the same fill-aware averaging as the
    single-file writer (chunk grids are tile-aligned, so 2x2 blocks
    never cross a chunk border — a narrow map, no shuffle), and each
    level gets its own IFD with tile size ts/2^k. Depth is capped
    where the tile size would drop below TIFF's 16px minimum; levels
    DECODE identically to mode='file' output (same pixels — the tile
    grids and bytes differ, since mode='file' keeps tile size ts at
    every level, and depths past the 16px floor that mode='file'
    accepts raise here).

    Tiles land in the body in whatever order partitions finished;
    TIFF's explicit per-tile offset array makes that legal. Grid
    positions with no chunk all point at ONE shared compressed fill
    tile per (band fill, level) (offset reuse is legal TIFF and is
    how sparse COGs keep empty oceans free).

    The parts directory (``<path>.parts``) must be on storage the
    driver can read — the same contract as every Spark file sink.
    """
    import shutil
    import uuid

    from pyspark.sql import functions as F

    comp = {"none": C_NONE, "deflate": C_DEFLATE, "lzw": C_LZW}[compression]
    ts = tile_size or cube.tile_size
    if ts != cube.tile_size:
        raise ValueError(
            f"tile_size {ts} != cube chunk size {cube.tile_size}: the "
            "writer maps chunks 1:1 onto TIFF tiles — re-chunk first"
        )
    if ts % 16:
        raise ValueError(f"TIFF tile size must be a multiple of 16: {ts}")
    gb = cube.geobox
    names = list(cube.bands)
    dtype = np.result_type(*[np.dtype(cube.bands[m].dtype) for m in names])
    if dtype.kind not in "uif":
        raise ValueError(f"cannot write dtype {dtype} to GeoTIFF")
    dts = dtype.str.lstrip("<>|=")
    if dts not in _DTYPE_SF:
        raise ValueError(f"unsupported GeoTIFF dtype {dtype}")
    sf, bits = _DTYPE_SF[dts]
    fills = {m: float(cube.bands[m].fill) for m in names}
    H, W = int(gb.height), int(gb.width)
    nb = len(names)

    # ---- overview depth (per-level tile size ts >> k, floor 16px) ------
    max_depth = 0
    while (ts >> (max_depth + 1)) >= 16 and not (ts >> (max_depth + 1)) % 16:
        max_depth += 1
    if overviews == "auto":
        n_ov, w_, h_ = 0, W, H
        while max(w_, h_) > ts and n_ov < max_depth:
            w_, h_ = (w_ + 1) // 2, (h_ + 1) // 2
            n_ov += 1
    else:
        n_ov = int(overviews or 0)
        if n_ov < 0:
            raise ValueError("overviews must be >= 0 or 'auto'")
        if n_ov > max_depth:
            raise ValueError(
                f"overviews={n_ov} exceeds mode='parts' depth "
                f"{max_depth} for tile_size {ts} (per-level tile size "
                "halves and TIFF tiles must be >=16px and a multiple "
                "of 16); use fewer levels or mode='file'"
            )

    parts_dir = path + ".parts"
    os.makedirs(parts_dir, exist_ok=True)
    dtype_str = dtype.str
    fills_c = dict(fills)

    man_schema = (
        "measurement string, ty int, tx int, part string, "
        "off long, nbytes long"
    )
    dec_schema = (
        "measurement string, row0 int, col0 int, h int, w int, "
        "values array<double>"
    )

    def _emit_level(ts_k, comp_c, is_overview):
        """mapInPandas stage: chunk rows -> compressed tile bytes in a
        per-task part file + manifest rows."""

        def _emit(batches):
            dt = np.dtype(dtype_str)
            fname = os.path.join(
                parts_dir, f"part-{uuid.uuid4().hex}.bin"
            )
            rows = []
            off = 0
            fp = None
            try:
                for pdf in batches:
                    for r in pdf.itertuples(index=False):
                        m = r.measurement
                        if m not in fills_c:
                            continue
                        if (r.row0 % ts_k) or (r.col0 % ts_k):
                            raise ValueError(
                                "chunk grid does not align with the "
                                f"tile size {ts_k}"
                            )
                        if fp is None:
                            fp = open(fname, "wb")
                        arr = np.asarray(
                            r.values, dtype=np.float64
                        ).reshape(r.h, r.w)
                        if is_overview and dt.kind in "ui":
                            arr = np.rint(arr)
                        full = np.full((ts_k, ts_k), fills_c[m], dtype=dt)
                        full[: r.h, : r.w] = arr.astype(dt)
                        raw = full.tobytes()
                        if comp_c == C_DEFLATE:
                            data = zlib.compress(raw, 6)
                        elif comp_c == C_LZW:
                            data = lzw_encode(raw)
                        else:
                            data = raw
                        fp.write(data)
                        rows.append(
                            (m, r.row0 // ts_k, r.col0 // ts_k,
                             os.path.basename(fname), off, len(data))
                        )
                        off += len(data)
            finally:
                if fp is not None:
                    fp.close()
            yield pd.DataFrame(
                rows, columns=["measurement", "ty", "tx", "part",
                               "off", "nbytes"],
            )

        return _emit

    def _decimate_level(level_df):
        """Narrow 2x decimation of chunk rows (same fill-aware
        averaging as the single-file writer's _decimate2)."""

        def _dec(batches):
            for pdf in batches:
                out = []
                for r in pdf.itertuples(index=False):
                    f_v = fills_c[r.measurement]
                    arr = np.asarray(
                        r.values, dtype=np.float64
                    ).reshape(r.h, r.w)
                    valid = (~np.isnan(arr) if math.isnan(f_v)
                             else arr != f_v)
                    o, ok = _decimate2(arr, valid)
                    o = np.where(ok, o, f_v)
                    out.append(
                        (r.measurement, r.row0 // 2, r.col0 // 2,
                         o.shape[0], o.shape[1], o.ravel().tolist())
                    )
                yield pd.DataFrame(
                    out, columns=["measurement", "row0", "col0", "h",
                                  "w", "values"],
                )

        return level_df.mapInPandas(_dec, schema=dec_schema)

    # ---- run the per-level distributed stages --------------------------
    base_df = (
        cube.chunks.filter(F.col("measurement").isin(names))
        .select("measurement", "row0", "col0", "h", "w", "values")
    )
    # persist each level: the emit-collect of level k and the
    # derivation of level k+1 both consume it, and without a persist
    # the full burn lineage would re-execute once per level (O(n^2)
    # stage work on a large export)
    level_dfs = [base_df if n_ov == 0 else base_df.persist()]
    dims = [(W, H)]
    for k in range(n_ov):
        level_dfs.append(_decimate_level(level_dfs[-1]).persist())
        pw, ph = dims[-1]
        dims.append((((pw + 1) // 2), ((ph + 1) // 2)))

    manifests = []
    try:
        for k, df in enumerate(level_dfs):
            manifests.append(
                df.mapInPandas(_emit_level(ts >> k, comp, k > 0),
                               schema=man_schema).collect()
            )
    finally:
        if n_ov:
            for df in level_dfs:
                df.unpersist()

    # ---- driver: fill tiles + IFD chain + streamed bodies --------------
    def _compress(raw: bytes) -> bytes:
        if comp == C_DEFLATE:
            return zlib.compress(raw, 6)
        if comp == C_LZW:
            return lzw_encode(raw)
        return raw

    def _entry(tag, typ, vals):
        cnt = len(vals)
        if typ == 2:
            payload = vals[0]
            cnt = len(payload)
        else:
            payload = struct.pack("<" + _TYPE_FMT[typ] * cnt, *vals)
        return tag, typ, cnt, payload

    a, b, c, d, e, f = gb.affine.tolist()[:6]
    nd = fills[names[0]]
    nd_s = "nan" if math.isnan(nd) else repr(nd)

    def _level_tags(k):
        lw, lh = dims[k]
        ts_k = ts >> k
        lntx = (lw + ts_k - 1) // ts_k
        lnty = (lh + ts_k - 1) // ts_k
        ln_chunks = lntx * lnty * nb
        tags = [
            _entry(T_WIDTH, 4, [lw]),
            _entry(T_HEIGHT, 4, [lh]),
            _entry(T_BITS, 3, [bits] * nb),
            _entry(T_COMPRESSION, 3, [comp]),
            _entry(T_PHOTOMETRIC, 3, [1]),
            _entry(T_SAMPLES, 3, [nb]),
            _entry(T_PLANAR, 3, [2]),
            _entry(T_TILE_W, 3, [ts_k]),
            _entry(T_TILE_H, 3, [ts_k]),
            _entry(T_TILE_OFFSETS, 4, [0] * ln_chunks),
            _entry(T_TILE_COUNTS, 4, [0] * ln_chunks),
            _entry(T_SAMPLE_FORMAT, 3, [sf] * nb),
            _entry(T_GDAL_NODATA, 2, [nd_s.encode() + b"\0"]),
        ]
        if k > 0:
            tags.append(_entry(T_NEWSUBFILE, 4, [1]))
        else:
            rotated = (b != 0.0) or (d != 0.0)
            if rotated:
                tags.append(_entry(T_TRANSFORM, 12,
                                   [a, b, 0.0, c, d, e, 0.0, f,
                                    0.0, 0.0, 0.0, 0.0,
                                    0.0, 0.0, 0.0, 1.0]))
            else:
                tags.append(_entry(T_PIXEL_SCALE, 12, [a, -e, 0.0]))
                tags.append(
                    _entry(T_TIEPOINT, 12, [0.0, 0.0, 0.0, c, f, 0.0])
                )
            epsg = gb.crs.epsg
            if epsg <= 0:
                epsg = 32767  # user-defined: parameterized CRS
            geo = [1, 1, 0, 3,
                   1024, 0, 1, (2 if gb.crs.is_geographic else 1),
                   1025, 0, 1, 1,
                   (2048 if gb.crs.is_geographic else 3072), 0, 1,
                   epsg]
            tags.append(_entry(T_GEO_DIR, 3, geo))
        tags.sort(key=lambda t: t[0])
        return tags, lntx, lnty, ln_chunks

    def _render(tag_list, data_off):
        entry_bytes = b""
        payload = b""
        for tag, typ, cnt, pl in tag_list:
            size = _TYPE_SIZE[typ] * cnt
            if size <= 4:
                val = pl.ljust(4, b"\0")
            else:
                val = struct.pack("<I", data_off + len(payload))
                payload += pl
            entry_bytes += struct.pack("<HHI", tag, typ, cnt) + val
        return entry_bytes, payload

    # layout pass: IFD block extents (sizes independent of values)
    levels_meta = []
    pos = 8
    for k in range(len(level_dfs)):
        tags, lntx, lnty, ln_chunks = _level_tags(k)
        n_entries = len(tags)
        ifd_size = 2 + n_entries * 12 + 4
        _, payload0 = _render(tags, 0)
        levels_meta.append({
            "tags": tags, "lntx": lntx, "lnty": lnty,
            "ln_chunks": ln_chunks, "n_entries": n_entries,
            "base": pos, "data_off": pos + ifd_size,
            "payload_len": len(payload0),
        })
        pos += ifd_size + len(payload0)

    # shared fill tiles, one per (fill value, level tile size)
    fill_tiles: dict = {}
    for k in range(len(level_dfs)):
        ts_k = ts >> k
        for m in names:
            f_v = fills[m]
            key = ((f_v if not math.isnan(f_v) else "nan"), ts_k)
            if key not in fill_tiles:
                data = _compress(
                    np.full((ts_k, ts_k), f_v, dtype=dtype).tobytes()
                )
                fill_tiles[key] = (pos, len(data), data)
                pos += len(data)

    # part bodies, per level in sorted-name order
    for k, man in enumerate(manifests):
        part_sizes: dict = {}
        for r in man:
            part_sizes[r["part"]] = max(
                part_sizes.get(r["part"], 0), r["off"] + r["nbytes"]
            )
        part_base = {}
        for pname in sorted(part_sizes):
            part_base[pname] = pos
            pos += part_sizes[pname]
        levels_meta[k]["part_base"] = part_base
    total = pos
    if total > 0xFFFFFFFF:
        raise ValueError(
            "output exceeds 4 GB classic-TIFF limit; write per-band "
            "files or increase compression"
        )

    plane = {m: i for i, m in enumerate(names)}
    with open(path, "wb") as out_fp:
        out_fp.write(b"II*\0" + struct.pack("<I", 8))
        for k, meta in enumerate(levels_meta):
            ts_k = ts >> k
            n_tiles_k = meta["lntx"] * meta["lnty"]
            offsets = [0] * meta["ln_chunks"]
            counts = [0] * meta["ln_chunks"]
            for m in names:
                f_v = fills[m]
                key = ((f_v if not math.isnan(f_v) else "nan"), ts_k)
                o, n, _data = fill_tiles[key]
                p0 = plane[m] * n_tiles_k
                for i in range(n_tiles_k):
                    offsets[p0 + i] = o
                    counts[p0 + i] = n
            for r in manifests[k]:
                idx = (plane[r["measurement"]] * n_tiles_k
                       + r["ty"] * meta["lntx"] + r["tx"])
                offsets[idx] = meta["part_base"][r["part"]] + r["off"]
                counts[idx] = r["nbytes"]
            tags = [
                _entry(T_TILE_OFFSETS, 4, offsets)
                if t[0] == T_TILE_OFFSETS
                else _entry(T_TILE_COUNTS, 4, counts)
                if t[0] == T_TILE_COUNTS
                else t
                for t in meta["tags"]
            ]
            entry_bytes, payload = _render(tags, meta["data_off"])
            assert len(payload) == meta["payload_len"]
            nxt = (levels_meta[k + 1]["base"]
                   if k + 1 < len(levels_meta) else 0)
            out_fp.write(struct.pack("<H", meta["n_entries"])
                         + entry_bytes + struct.pack("<I", nxt))
            out_fp.write(payload)
        for _o, _n, data in fill_tiles.values():
            out_fp.write(data)
        for k, meta in enumerate(levels_meta):
            for pname in sorted(meta["part_base"]):
                with open(os.path.join(parts_dir, pname), "rb") as pf:
                    shutil.copyfileobj(pf, out_fp, 1 << 20)
    shutil.rmtree(parts_dir, ignore_errors=True)
    return path
