"""Pure-stdlib BMP codec (Windows BITMAPINFOHEADER DIBs; no PIL).

Round 4 widens the multimodal ``codec='real'`` path beyond PNG
(``kernels/png.py``) and WAV (``kernels/wav.py``): BMP needs only
``struct`` + numpy, so real decoding is possible here too. The same
row layout (bottom-up, 4-byte-aligned rows, BGR sample order) is what
uncompressed AVI video frames use (``kernels/avi.py``), so this
module is also the frame codec for the real video path.

Supported: BI_RGB (uncompressed) 8-bit palette, 24-bit BGR and 32-bit
BGRA, bottom-up and top-down row orders, BITMAPINFOHEADER (40) and
the larger V4/V5 headers (extra fields ignored for BI_RGB). RLE and
16-bit raise with a clear message.

Reference for parity: the reference repo has no image codec at all
(GDAL handles rasters there); this exists for the multimodal pipeline
ops, mirroring how the reference delegates decode to external libs.
"""

from __future__ import annotations

import struct

import numpy as np


def is_bmp(blob: bytes) -> bool:
    return blob is not None and bytes(blob[:2]) == b"BM"


def bmp_info(blob: bytes) -> dict:
    """Parse the file + info headers only -> {width, height, bpp,
    top_down, n_colors, data_offset} without touching pixel rows."""
    b = bytes(blob)
    if not is_bmp(b):
        raise ValueError("not a BMP (bad signature)")
    if len(b) < 54:
        raise ValueError("corrupt BMP: truncated headers")
    data_offset = struct.unpack("<I", b[10:14])[0]
    hdr_size = struct.unpack("<I", b[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError(
            f"BMP header size {hdr_size} not supported (BITMAPINFOHEADER+)"
        )
    w, h, planes, bpp, comp, _, _, _, n_colors, _ = struct.unpack(
        "<iiHHIIiiII", b[18:54]
    )
    if planes != 1:
        raise ValueError(f"corrupt BMP: planes {planes}")
    if comp != 0:
        raise NotImplementedError(f"BMP compression {comp} not supported")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP bit depth {bpp} not supported")
    return {
        "width": int(w),
        "height": abs(int(h)),
        "bpp": int(bpp),
        "top_down": h < 0,
        "n_colors": int(n_colors) if n_colors else (256 if bpp == 8 else 0),
        "data_offset": int(data_offset),
        "header_size": int(hdr_size),
    }


def _rows(b: bytes, info: dict) -> np.ndarray:
    """Pixel area -> (h, row_bytes) uint8 in top-down order."""
    w, h, bpp = info["width"], info["height"], info["bpp"]
    stride = ((w * bpp // 8) + 3) & ~3
    pix = np.frombuffer(
        b, dtype=np.uint8, count=h * stride, offset=info["data_offset"]
    ).reshape(h, stride)
    if not info["top_down"]:
        pix = pix[::-1]
    return pix


def decode_bmp(blob: bytes) -> np.ndarray:
    """BMP bytes -> uint8 array, top-down, RGB sample order: (h, w)
    for grayscale-palette images whose palette is gray, else
    (h, w, 3) / (h, w, 4)."""
    b = bytes(blob)
    info = bmp_info(b)
    w, h, bpp = info["width"], info["height"], info["bpp"]
    if len(b) < info["data_offset"] + h * (((w * bpp // 8) + 3) & ~3):
        raise ValueError("corrupt BMP: truncated pixel data")
    pix = _rows(b, info)
    if bpp == 8:
        pal_off = 14 + info["header_size"]
        n = info["n_colors"]
        pal = np.frombuffer(
            b, dtype=np.uint8, count=n * 4, offset=pal_off
        ).reshape(n, 4)[:, [2, 1, 0]]  # stored BGRX -> RGB
        idx = pix[:, :w]
        rgb = pal[idx]
        if np.array_equal(rgb[..., 0], rgb[..., 1]) and np.array_equal(
            rgb[..., 1], rgb[..., 2]
        ):
            return rgb[..., 0].copy()
        return rgb
    ch = bpp // 8
    a = pix[:, : w * ch].reshape(h, w, ch)
    if ch == 3:
        return a[..., [2, 1, 0]].copy()  # BGR -> RGB
    return a[..., [2, 1, 0, 3]].copy()  # BGRA -> RGBA


def encode_bmp(arr: np.ndarray, *, top_down: bool = False) -> bytes:
    """uint8 (h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA -> BMP bytes
    (gray as an 8-bit palette image). decode_bmp(encode_bmp(x)) == x."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_bmp wants uint8, got {a.dtype}")
    if a.ndim == 2:
        bpp, ch = 8, 1
    elif a.ndim == 3 and a.shape[2] in (3, 4):
        ch = a.shape[2]
        bpp = ch * 8
    else:
        raise ValueError(f"encode_bmp: unsupported shape {a.shape}")
    h, w = a.shape[:2]
    stride = ((w * bpp // 8) + 3) & ~3
    if ch == 1:
        body = a
        palette = np.zeros((256, 4), dtype=np.uint8)
        palette[:, 0] = palette[:, 1] = palette[:, 2] = np.arange(256)
        pal_bytes = palette.tobytes()
    elif ch == 3:
        body = a[..., [2, 1, 0]].reshape(h, w * 3)
        pal_bytes = b""
    else:
        body = a[..., [2, 1, 0, 3]].reshape(h, w * 4)
        pal_bytes = b""
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * bpp // 8] = body.reshape(h, -1)
    if not top_down:
        rows = rows[::-1]
    data_offset = 14 + 40 + len(pal_bytes)
    info = struct.pack(
        "<IiiHHIIiiII",
        40,
        w,
        -h if top_down else h,
        1,
        bpp,
        0,
        h * stride,
        2835,
        2835,
        256 if ch == 1 else 0,
        0,
    )
    file_hdr = struct.pack(
        "<2sIHHI", b"BM", data_offset + h * stride, 0, 0, data_offset
    )
    return file_hdr + info + pal_bytes + rows.tobytes()
