"""Pure-stdlib AVI container codec (Microsoft RIFF AVI spec; no
ffmpeg).

AVI with uncompressed DIB video frames ('DIB ' handler, BI_RGB) is
just a RIFF walk — the same chunk grammar as WAV (``kernels/wav.py``)
with BMP-layout frames (``kernels/bmp.py`` row math: bottom-up,
4-byte-aligned, BGR). That makes REAL video frame sampling possible
in this container-less environment: ``frame_sample(codec='real')``
decodes true frames instead of hashing bytes. Compressed codecs
(MJPG/H.264/...) raise with a clear message — those decoders
genuinely aren't available here.

Supported: RIFF 'AVI ' with one 'vids' stream, BI_RGB 24-bit frames
('00db'/'00dc' chunks), fps from the stream header (rate/scale),
'idx1' optional (frames are walked from 'movi' directly, so truncated
indexes don't matter). The encoder writes the same shape back —
decode(encode(frames)) == frames exactly.
"""

from __future__ import annotations

import struct

import numpy as np


def is_avi(blob: bytes) -> bool:
    return (
        blob is not None
        and bytes(blob[:4]) == b"RIFF"
        and bytes(blob[8:12]) == b"AVI "
    )


def _walk(b: bytes, pos: int, end: int):
    """Yield (fourcc, list_type_or_None, body_start, body_end) for
    each chunk between pos and end. LIST bodies start after the list
    type fourcc."""
    while pos + 8 <= end:
        fcc = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = pos + 8
        if fcc == b"LIST":
            yield fcc, b[body : body + 4], body + 4, body + size
        else:
            yield fcc, None, body, body + size
        pos = body + size + (size & 1)  # chunks are word-aligned


def avi_info(blob: bytes) -> dict:
    """Parse hdrl only -> {width, height, n_frames, fps, handler,
    bpp} without touching frame data."""
    b = bytes(blob)
    if not is_avi(b):
        raise ValueError("not an AVI (bad RIFF signature)")
    info: dict = {}
    for fcc, ltype, s, e in _walk(b, 12, len(b)):
        if fcc != b"LIST" or ltype != b"hdrl":
            continue
        for fcc2, ltype2, s2, e2 in _walk(b, s, e):
            if fcc2 == b"avih":
                us_pf, _, _, _, total, _, _streams = struct.unpack(
                    "<7I", b[s2 : s2 + 28]
                )
                w, h = struct.unpack("<II", b[s2 + 32 : s2 + 40])
                info.update(
                    width=int(w), height=int(h), n_frames=int(total),
                    fps=(1e6 / us_pf if us_pf else 0.0),
                )
            elif fcc2 == b"LIST" and ltype2 == b"strl":
                for fcc3, _lt3, s3, e3 in _walk(b, s2, e2):
                    if fcc3 == b"strh" and b[s3 : s3 + 4] == b"vids":
                        handler = b[s3 + 4 : s3 + 8].decode(
                            "ascii", "replace"
                        ).strip()
                        scale, rate = struct.unpack(
                            "<II", b[s3 + 20 : s3 + 28]
                        )
                        info["handler"] = handler
                        if scale:
                            info["fps"] = rate / scale
                    elif fcc3 == b"strf" and "bpp" not in info:
                        bpp, comp = struct.unpack(
                            "<HI", b[s3 + 14 : s3 + 20]
                        )
                        info["bpp"] = int(bpp)
                        info["compression"] = int(comp)
        break
    if "width" not in info:
        raise ValueError("corrupt AVI: no avih header")
    return info


def decode_avi_frames(blob: bytes, indices=None) -> list[np.ndarray]:
    """AVI bytes -> list of uint8 (h, w, 3) RGB frames. ``indices``
    (sorted iterable) selects a subset without decoding the rest —
    the walk still skips over other chunks by size, O(bytes) scan but
    zero row decode for unselected frames."""
    b = bytes(blob)
    info = avi_info(b)
    if info.get("compression", 0) != 0 or info.get("bpp", 24) != 24:
        raise NotImplementedError(
            f"AVI codec bpp={info.get('bpp')} compression="
            f"{info.get('compression')} not supported (BI_RGB 24 only)"
        )
    w, h = info["width"], info["height"]
    stride = ((w * 3) + 3) & ~3
    want = None if indices is None else set(int(i) for i in indices)
    frames: list[np.ndarray] = []
    k = 0
    for fcc, ltype, s, e in _walk(b, 12, len(b)):
        if fcc != b"LIST" or ltype != b"movi":
            continue
        for fcc2, _lt2, s2, e2 in _walk(b, s, e):
            if fcc2[2:4] not in (b"db", b"dc"):
                continue
            if want is None or k in want:
                if e2 - s2 < h * stride:
                    raise ValueError(f"corrupt AVI: short frame {k}")
                rows = np.frombuffer(
                    b, dtype=np.uint8, count=h * stride, offset=s2
                ).reshape(h, stride)[::-1, : w * 3]
                frames.append(
                    rows.reshape(h, w, 3)[..., ::-1].copy()  # BGR->RGB
                )
            k += 1
        break
    return frames


def encode_avi(frames, fps: float = 10.0) -> bytes:
    """uint8 (h, w, 3) RGB frames -> AVI bytes (BI_RGB 'DIB ' vids
    stream + idx1). decode_avi_frames(encode_avi(x)) == x exactly."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("encode_avi: no frames")
    h, w, ch = frames[0].shape
    if ch != 3 or frames[0].dtype != np.uint8:
        raise ValueError("encode_avi wants uint8 (h, w, 3) frames")
    stride = ((w * 3) + 3) & ~3
    frame_bytes = h * stride

    def chunk(fcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fcc + struct.pack("<I", len(data)) + data + pad

    def lst(ltype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", ltype + data)

    us_pf = int(round(1e6 / fps)) if fps else 0
    avih = struct.pack(
        "<10I4I",
        us_pf, frame_bytes * max(1, int(fps)), 0, 0x10,  # HASINDEX
        len(frames), 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    scale, rate = 1000, int(round(fps * 1000))
    strh = (
        b"vids" + b"DIB "
        + struct.pack(
            "<IHHIIIIIIiI", 0, 0, 0, 0, scale, rate, 0, len(frames),
            frame_bytes, -1, 0,
        )
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    idx = b""
    offset = 4  # relative to start of 'movi' list data
    for f in frames:
        a = np.asarray(f)
        if a.shape != (h, w, 3) or a.dtype != np.uint8:
            raise ValueError("all frames must match the first frame")
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR
        data = rows.tobytes()
        movi_body += chunk(b"00db", data)
        idx += b"00db" + struct.pack("<III", 0x10, offset, len(data))
        offset += 8 + len(data) + (len(data) & 1)
    movi = chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body
