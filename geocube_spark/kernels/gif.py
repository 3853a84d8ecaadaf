"""Pure-stdlib GIF codec (GIF87a/89a public spec; no PIL).

GIF needs only bit twiddling (variable-width LZW) + numpy, so the
multimodal ``codec='real'`` path can decode it for real, like PNG
(``kernels/png.py``) and BMP (``kernels/bmp.py``). Multi-frame GIFs
report a true ``n_frames``, which makes GIF the one *image* container
whose frame count is real data rather than 1.

Supported: GIF87a + GIF89a, global and local color tables, interlaced
and sequential images, multiple image blocks (animation frames),
extension blocks (skipped; GCE transparency index honored as a
palette passthrough — compositing/disposal is out of scope for
feature extraction). The encoder emits spec-valid variable-width LZW
(clear-code reset at table overflow) — decode(encode(x)) == x.

Reference for parity: the reference repo has no image codec (GDAL
territory); this exists for the multimodal pipeline ops only.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def is_gif(blob: bytes) -> bool:
    return blob is not None and bytes(blob[:6]) in (b"GIF87a", b"GIF89a")


def gif_info(blob: bytes) -> dict:
    """Header + block walk -> {width, height, n_frames} without
    LZW-decoding any pixel data (sub-blocks are skipped by length)."""
    b = bytes(blob)
    if not is_gif(b):
        raise ValueError("not a GIF (bad signature)")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    frames = 0
    while pos < len(b):
        tag = b[pos]
        pos += 1
        if tag == 0x3B:  # trailer
            break
        if tag == 0x21:  # extension: label + sub-blocks
            pos += 1
            pos = _skip_subblocks(b, pos)
        elif tag == 0x2C:  # image descriptor
            _l, _t, _iw, _ih, ipacked = struct.unpack(
                "<HHHHB", b[pos : pos + 9]
            )
            pos += 9
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))
            pos += 1  # LZW min code size
            pos = _skip_subblocks(b, pos)
            frames += 1
        else:
            raise ValueError(f"corrupt GIF: block tag 0x{tag:02X}")
    return {"width": int(w), "height": int(h), "n_frames": frames}


def _skip_subblocks(b: bytes, pos: int) -> int:
    while pos < len(b):
        n = b[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n
    raise ValueError("corrupt GIF: unterminated sub-blocks")


def _read_subblocks(b: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while pos < len(b):
        n = b[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        parts.append(b[pos : pos + n])
        pos += n
    raise ValueError("corrupt GIF: unterminated sub-blocks")


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF variable-width LZW -> uint8 index stream of n_pixels."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    bits = 0
    acc = 0
    pos = 0
    width = min_code_size + 1
    # table: list of byte strings; rebuilt on clear
    table: list[bytes] = []
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    ln = len(data)
    while n_out < n_pixels:
        while bits < width:
            if pos >= ln:
                raise ValueError("corrupt GIF: LZW stream exhausted")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF: first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF: LZW code out of range")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        n_out += len(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out != n_pixels:
        raise ValueError(
            f"corrupt GIF: decoded {n_out} pixels, wanted {n_pixels}"
        )
    return out


def _deinterlace(idx: np.ndarray, h: int) -> np.ndarray:
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE_PASSES:
        rows = range(start, h, step)
        for r in rows:
            out[r] = idx[src]
            src += 1
    return out


def decode_gif(blob: bytes, frame: int = 0) -> np.ndarray:
    """GIF bytes -> uint8 RGB array (h, w, 3) of the requested frame.

    Frames are decoded standalone against their own (or the global)
    palette — no inter-frame compositing; each image block's pixels
    land at its (left, top) offset on a canvas initialized to the
    background color.
    """
    b = bytes(blob)
    info = gif_info(b)
    if frame >= info["n_frames"]:
        raise ValueError(f"GIF has {info['n_frames']} frames, no #{frame}")
    w, h = info["width"], info["height"]
    packed, bg = b[10], b[11]
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = np.frombuffer(
            b, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if global_pal is not None and bg < len(global_pal):
        canvas[:] = global_pal[bg]
    seen = 0
    while pos < len(b):
        tag = b[pos]
        pos += 1
        if tag == 0x3B:
            break
        if tag == 0x21:
            pos += 1
            pos = _skip_subblocks(b, pos)
            continue
        if tag != 0x2C:
            raise ValueError(f"corrupt GIF: block tag 0x{tag:02X}")
        left, top, iw, ih, ipacked = struct.unpack("<HHHHB", b[pos : pos + 9])
        pos += 9
        pal = global_pal
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(
                b, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        min_code = b[pos]
        pos += 1
        data, pos = _read_subblocks(b, pos)
        if seen == frame:
            if pal is None:
                raise ValueError("corrupt GIF: image without a color table")
            idx = _lzw_decode(data, int(min_code), iw * ih).reshape(ih, iw)
            if ipacked & 0x40:
                idx = _deinterlace(idx, ih)
            canvas[top : top + ih, left : left + iw] = pal[idx]
            return canvas
        seen += 1
    raise ValueError("corrupt GIF: frame not found")


def _lzw_encode(idx: np.ndarray, min_code_size: int) -> bytes:
    """Spec LZW: dict of pixel strings, variable code width, clear on
    table overflow at 4096."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    bits = 0
    width = min_code_size + 1

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    prev = b""
    for v in idx.reshape(-1).tolist():
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code >= 4096:  # 4095 is the widest 12-bit code
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prev = bytes([v])
    if prev:
        emit(table[prev])
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames, palette: np.ndarray) -> bytes:
    """Index frames (list of uint8 (h, w) arrays, all same shape) +
    palette (n<=256, 3) -> GIF89a bytes. decode_gif round-trips each
    frame exactly (palette[frame] == decode_gif(g, i))."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
        raise ValueError(f"palette must be (n<=256, 3), got {pal.shape}")
    size_field = 0
    while (2 << size_field) < len(pal):
        size_field += 1
    n_slots = 2 << size_field
    pal_full = np.zeros((n_slots, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal
    h, w = frames[0].shape
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += pal_full.tobytes()
    min_code = max(2, size_field + 1)
    for fr in frames:
        a = np.asarray(fr)
        if a.shape != (h, w) or a.dtype != np.uint8:
            raise ValueError("all frames must be uint8 (h, w)")
        if int(a.max(initial=0)) >= len(pal):
            raise ValueError("frame index out of palette range")
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        data = _lzw_encode(a, min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3B"
    return bytes(out)
