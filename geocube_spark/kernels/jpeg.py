"""Pure-stdlib baseline JPEG codec (ITU-T T.81 / JFIF public spec;
no PIL, no libjpeg).

The last honestly-stubbed image format: baseline sequential JPEG
needs only Huffman bit-reading, dequantization, an 8x8 IDCT, and the
BT.601 YCbCr transform — all expressible with stdlib + numpy, so the
multimodal ``codec='real'`` path can decode real JPEGs like it does
PNG/GIF/BMP. Entropy decoding is inherently bit-serial (a Python
loop, O(coefficients)); the IDCT and color math run as single batched
numpy einsums over all blocks. Sized for feature-extraction payloads,
not a bulk transcoder.

Supported: baseline DCT (SOF0), 8-bit, grayscale and 3-component
YCbCr with any sampling factors up to 4:4:4/4:2:2/4:2:0, restart
intervals (DRI/RSTn), 16-bit DQT precision, multi-table DHT/DQT.
Progressive (SOF2) and arithmetic coding raise with a clear message;
``jpeg_info`` still reports dimensions for any SOF variant.

The encoder writes baseline 4:4:4 (or grayscale) with the spec's
Annex K quantization + Huffman tables (quality-scaled per the public
IJG formula) — decode(encode(x)) reconstructs x up to quantization
error, and at quality=100 the quant tables are all-ones so the only
loss is DCT rounding (max |err| <= 1 per sample in practice).

Reference for parity: the reference repo has no image codec (it
delegates rasters to GDAL); this exists for the multimodal pipeline
ops only.
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8x8 DCT-II basis: T[u, x] = a(u) cos((2x+1)u pi / 16)
_T = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else np.sqrt(0.25)
    for _x in range(8):
        _T[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# ITU T.81 Annex K.1 quantization tables (public spec constants)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# ITU T.81 Annex K.3 typical Huffman tables: (BITS counts, HUFFVAL)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

_SOF_BASELINE = {0xC0, 0xC1}
_SOF_ALL = set(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def is_jpeg(blob: bytes) -> bool:
    return blob is not None and bytes(blob[:3]) == b"\xFF\xD8\xFF"


def _markers(b: bytes):
    """Yield (marker, seg_start, seg_end) for each marker segment;
    stops at SOS (scan data follows) or EOI."""
    pos = 2
    ln = len(b)
    while pos + 4 <= ln:
        if b[pos] != 0xFF:
            raise ValueError("corrupt JPEG: lost marker sync")
        m = b[pos + 1]
        if m == 0xD9:  # EOI
            return
        (size,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        yield m, pos + 4, pos + 2 + size
        if m == 0xDA:  # SOS: entropy data follows, not marker segments
            return
        pos += 2 + size


def jpeg_info(blob: bytes) -> dict:
    """Marker walk -> {width, height, n_components, progressive}
    without entropy-decoding anything."""
    b = bytes(blob)
    if not is_jpeg(b):
        raise ValueError("not a JPEG (bad SOI)")
    for m, s, e in _markers(b):
        if m in _SOF_ALL:
            _prec, h, w, nc = struct.unpack(">BHHB", b[s : s + 6])
            return {
                "width": int(w),
                "height": int(h),
                "n_components": int(nc),
                "progressive": m == 0xC2,
                "baseline": m in _SOF_BASELINE,
            }
    raise ValueError("corrupt JPEG: no SOF marker")


def _build_decode_table(counts, symbols) -> dict:
    """Canonical Huffman (T.81 C.2): {(length, code) -> symbol}."""
    tbl = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            tbl[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return tbl


def _build_encode_table(counts, symbols) -> dict:
    """{symbol -> (code, length)}."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-stuffing removal. Stops (raises) at any real marker."""

    __slots__ = ("d", "pos", "acc", "bits")

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.bits = 0

    def _fill(self):
        d = self.d
        p = self.pos
        if p >= len(d):
            raise ValueError("corrupt JPEG: entropy data exhausted")
        byte = d[p]
        if byte == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt != 0x00:
                raise ValueError("corrupt JPEG: marker inside scan")
            self.pos = p + 2
        else:
            self.pos = p + 1
        # mask consumed high bits so acc stays a small int
        self.acc = ((self.acc & ((1 << self.bits) - 1)) << 8) | byte
        self.bits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        while self.bits < n:
            self._fill()
        self.bits -= n
        return (self.acc >> self.bits) & ((1 << n) - 1)

    def huff(self, tbl: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = tbl.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt JPEG: invalid Huffman code")

    def align_restart(self, n: int):
        """Discard to byte boundary and consume the expected RSTn."""
        self.bits = 0
        self.acc = 0
        d = self.d
        p = self.pos
        while p + 1 < len(d) and not (
            d[p] == 0xFF and d[p + 1] == 0xD0 + (n & 7)
        ):
            p += 1
        if p + 1 >= len(d):
            raise ValueError("corrupt JPEG: missing restart marker")
        self.pos = p + 2


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 (h, w) grayscale or (h, w, 3)
    RGB (JFIF BT.601 full-range conversion)."""
    b = bytes(blob)
    if not is_jpeg(b):
        raise ValueError("not a JPEG (bad SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart = 0
    scan = None
    for m, s, e in _markers(b):
        if m == 0xDB:  # DQT
            p = s
            while p < e:
                pq, tq = b[p] >> 4, b[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = np.frombuffer(b, np.uint8, 64, p).astype(np.int64)
                    p += 64
                else:
                    vals = np.frombuffer(b, ">u2", 64, p).astype(np.int64)
                    p += 128
                z = np.zeros(64, dtype=np.int64)
                z[_ZIGZAG] = vals
                qt[tq] = z.reshape(8, 8)
        elif m == 0xC4:  # DHT
            p = s
            while p < e:
                tc, th = b[p] >> 4, b[p] & 0x0F
                counts = list(b[p + 1 : p + 17])
                n = sum(counts)
                symbols = list(b[p + 17 : p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(
                    counts, symbols
                )
                p += 17 + n
        elif m in _SOF_ALL:
            if m not in _SOF_BASELINE:
                raise NotImplementedError(
                    "progressive/extended JPEG not supported (baseline only)"
                )
            prec, h, w, nc = struct.unpack(">BHHB", b[s : s + 6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = b[s + 6 + 3 * i : s + 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": int(h), "w": int(w), "comps": comps}
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", b[s : s + 2])
        elif m == 0xDA:  # SOS
            ns = b[s]
            sel = {}
            for i in range(ns):
                cid, tt = b[s + 1 + 2 * i], b[s + 2 + 2 * i]
                sel[cid] = (tt >> 4, tt & 0x0F)
            scan = (sel, e)  # entropy data starts at segment end
            break
    if frame is None or scan is None:
        raise ValueError("corrupt JPEG: missing SOF/SOS")
    sel, data_pos = scan
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient planes (MCU-padded)
    coef = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.int64)
        for c in comps
    ]
    br = _BitReader(b, data_pos)
    pred = [0] * len(comps)
    n_rst = 0
    zz = _ZIGZAG
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_i = my * mcux + mx
            if restart and mcu_i and mcu_i % restart == 0:
                br.align_restart(n_rst)
                n_rst = (n_rst + 1) & 7
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = sel[c["id"]]
                dtbl, atbl = huff_dc[td], huff_ac[ta]
                plane = coef[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        s_ = br.huff(dtbl)
                        diff = _extend(br.read(s_), s_) if s_ else 0
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = br.huff(atbl)
                            r, s_ = rs >> 4, rs & 0x0F
                            if s_ == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "corrupt JPEG: AC index overflow"
                                )
                            blk[zz[k]] = _extend(br.read(s_), s_)
                            k += 1
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = blk.reshape(8, 8)
    # batched dequantize + IDCT per component
    planes = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        ph, pw = coef[ci].shape
        blocks = (
            coef[ci]
            .reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .astype(np.float64)
        )
        blocks *= q  # dequantize (broadcasts over the block grid)
        pix = np.einsum("ui,yxuv,vj->yxij", _T, blocks, _T, optimize=True)
        plane = (
            pix.transpose(0, 2, 1, 3).reshape(ph, pw) + 128.0
        )
        # upsample to full MCU-padded luma grid, then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    __slots__ = ("out", "acc", "bits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, code: int, n: int):
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.bits += n
        while self.bits >= 8:
            self.bits -= 8
            byte = (self.acc >> self.bits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.bits:
            n = 8 - self.bits
            self.write((1 << n) - 1, n)  # pad the last byte with 1s


def _quality_tables(quality: int):
    """Public IJG quality scaling of the Annex K tables."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUM, _Q_CHR):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out


def _encode_block(bw, blk, qtab, dtab, atab, pred):
    f = _T @ (blk.astype(np.float64) - 128.0) @ _T.T
    qv = np.round(f / qtab).astype(np.int64).reshape(-1)[_ZIGZAG]
    diff = int(qv[0]) - pred

    def size_of(v: int) -> int:
        return 0 if v == 0 else int(abs(v)).bit_length()

    s = size_of(diff)
    code, ln = dtab[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = max([k for k in range(1, 64) if qv[k]] or [0])
    for k in range(1, last_nz + 1):
        v = int(qv[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = atab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = size_of(v)
        code, ln = atab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = atab[0x00]  # EOB
        bw.write(code, ln)
    return int(qv[0])


def _pad_plane(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate a plane up to the MCU-padded size."""
    h, w = p.shape
    pp = np.empty((ph, pw))
    pp[:h, :w] = p
    if ph > h:
        pp[h:, :w] = p[-1:, :]
    if pw > w:
        pp[:, w:] = pp[:, w - 1 : w]
    return pp


def encode_jpeg(arr: np.ndarray, quality: int = 90, *,
                subsample: str = "444", restart_interval: int = 0) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF bytes
    (Annex K tables quality-scaled). ``subsample='420'`` box-averages
    chroma 2x2 (Y sampled 2,2; Cb/Cr 1,1); ``restart_interval=k``
    emits DRI + RSTn markers every k MCUs — both exist chiefly so the
    decoder's sampling/restart paths can be pinned against streams
    this encoder derives from the spec, not from the decoder."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim not in (2, 3):
        raise ValueError(f"encode_jpeg wants uint8 (h,w[,3]), got "
                         f"{a.dtype} {a.shape}")
    gray = a.ndim == 2
    if not gray and a.shape[2] != 3:
        raise ValueError(f"encode_jpeg: unsupported shape {a.shape}")
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be '444' or '420'")
    h, w = a.shape[:2]
    qlum, qchr = _quality_tables(quality)
    if gray:
        planes = [a.astype(np.float64)]
        qtabs = [qlum]
        samp = [(1, 1)]
    else:
        rf = a[..., 0].astype(np.float64)
        gf = a[..., 1].astype(np.float64)
        bf = a[..., 2].astype(np.float64)
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = 128.0 - 0.168736 * rf - 0.331264 * gf + 0.5 * bf
        cr = 128.0 + 0.5 * rf - 0.418688 * gf - 0.081312 * bf
        if subsample == "420":
            h2, w2 = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = _pad_plane(cb, h2, w2)
            crp = _pad_plane(cr, h2, w2)
            cb = cbp.reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qtabs = [qlum, qchr, qchr]

    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"

    def seg(marker: int, payload: bytes):
        out.extend(b"\xFF" + bytes([marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    for ti, q in enumerate(qtabs[:1] if gray else qtabs[:2]):
        seg(0xDB, bytes([ti]) + bytes(
            int(v) for v in q.reshape(-1)[_ZIGZAG]
        ))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        hv = (samp[i][0] << 4) | samp[i][1]
        sof += bytes([i + 1, hv, 0 if i == 0 else 1])
    seg(0xC0, sof)
    tables = [(_DC_LUM, 0x00), (_AC_LUM, 0x10)]
    if not gray:
        tables += [(_DC_CHR, 0x01), (_AC_CHR, 0x11)]
    for (counts, syms), tclass in tables:
        seg(0xC4, bytes([tclass]) + bytes(counts) + bytes(syms))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    seg(0xDA, sos)

    dc_lum = _build_encode_table(*_DC_LUM)
    ac_lum = _build_encode_table(*_AC_LUM)
    dc_chr = _build_encode_table(*_DC_CHR)
    ac_chr = _build_encode_table(*_AC_CHR)
    enc = [(dc_lum, ac_lum)] + [(dc_chr, ac_chr)] * (nc - 1)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        _pad_plane(p, mcuy * 8 * sv, mcux * 8 * sh)
        for p, (sh, sv) in zip(planes, samp)
    ]
    bw = _BitWriter()
    pred = [0] * nc
    n_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_i = my * mcux + mx
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes([0xFF, 0xD0 + n_rst])
                n_rst = (n_rst + 1) & 7
                bw = _BitWriter()
                pred = [0] * nc
            for ci in range(nc):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        dtab, atab = enc[ci]
                        pred[ci] = _encode_block(
                            bw, blk, qtabs[ci], dtab, atab, pred[ci]
                        )
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)
