"""Pure-stdlib PNG codec (W3C PNG spec / RFC 2083; no PIL).

The container has no image libraries, but PNG needs only ``zlib``
(stdlib) plus the five scanline filters — so the engine's multimodal
``codec='real'`` path can do REAL decoding for PNG instead of
stubbing everything (``functions/multimodal.py``; JPEG/video stay
honestly stubbed — their codecs genuinely aren't available here).

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced. 16-bit and Adam7 interlace
raise with a clear message. The encoder writes filter-0 rows (always
valid PNG; decodable by any reader) — decode(encode(x)) == x exactly.

Reference for parity: the reference repo has no raster-image codec
at all (it delegates to rioxarray/GDAL for GeoTIFF only); this module
exists for the multimodal pipeline ops, not for geo rasters — the
GeoTIFF codec lives in ``sources/geotiff.py``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(blob: bytes) -> bool:
    return blob is not None and bytes(blob[:8]) == _SIG


def png_info(blob: bytes) -> dict:
    """Parse IHDR only -> {width, height, bit_depth, color_type,
    channels, interlace} without inflating pixel data."""
    b = bytes(blob)
    if not is_png(b):
        raise ValueError("not a PNG (bad signature)")
    length, ctype = struct.unpack(">I4s", b[8:16])
    if ctype != b"IHDR" or length != 13:
        raise ValueError("corrupt PNG: first chunk is not IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", b[16:29]
    )
    if comp != 0 or filt != 0:
        raise ValueError("corrupt PNG: unknown compression/filter method")
    if color not in _CHANNELS:
        raise ValueError(f"corrupt PNG: color type {color}")
    return {
        "width": int(w),
        "height": int(h),
        "bit_depth": int(depth),
        "color_type": int(color),
        "channels": _CHANNELS[color],
        "interlace": int(interlace),
    }


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering (types 0-4). Rows are sequential by
    construction (each depends on the previous reconstructed row);
    within a row, Sub/Average/Paeth are sequential in x, so those rows
    run a per-pixel loop — fine for the metadata/feature-extraction
    sizes this pipeline decodes."""
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = int(raw[pos])
        row = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        if ftype == 0:
            rec = row
        elif ftype == 2:  # Up
            rec = (row + prev) & 0xFF
        elif ftype == 1:  # Sub
            rec = row
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            rec = row
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = row
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pr) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png(blob: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (h, w) for grayscale or
    (h, w, channels) otherwise. Palette images expand to RGB."""
    b = bytes(blob)
    info = png_info(b)
    if info["bit_depth"] != 8:
        raise NotImplementedError(
            f"PNG bit depth {info['bit_depth']} not supported (8 only)"
        )
    if info["interlace"] != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    w, h, ch = info["width"], info["height"], info["channels"]

    idat = []
    palette = None
    pos = 8
    while pos + 8 <= len(b):
        (length,), ctype = struct.unpack(">I", b[pos : pos + 4]), b[
            pos + 4 : pos + 8
        ]
        data = b[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
    if not idat:
        raise ValueError("corrupt PNG: no IDAT data")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"corrupt PNG: {len(raw)} filtered bytes for {h}x{stride}"
        )
    px = _unfilter(raw, h, stride, ch)
    if info["color_type"] == 3:
        if palette is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        return palette[px.reshape(h, w)]
    if ch == 1:
        return px.reshape(h, w)
    return px.reshape(h, w, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) / (h, w, 2|3|4) -> PNG bytes (filter-0 rows,
    single IDAT). decode_png(encode_png(x)) == x exactly."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_png wants uint8, got {a.dtype}")
    if a.ndim == 2:
        color, ch = 0, 1
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        color, ch = {2: 4, 3: 2, 4: 6}[a.shape[2]], a.shape[2]
    else:
        raise ValueError(f"encode_png: unsupported shape {a.shape}")
    h, w = a.shape[:2]
    body = a.reshape(h, w * ch)
    filtered = np.zeros((h, w * ch + 1), dtype=np.uint8)
    filtered[:, 1:] = body
    idat = zlib.compress(filtered.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
