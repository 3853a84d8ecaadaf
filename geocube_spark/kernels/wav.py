"""Pure-stdlib WAV (RIFF/WAVE) codec — no audio libraries needed.

Round 4 made PNG real (``kernels/png.py``); this module does the same
for audio: WAV is a chunked RIFF container (public Microsoft/IBM
spec, mirrored in RFC 2361's format registry) whose PCM payloads need
only ``struct`` + numpy. It powers the multimodal ``codec='real'``
audio path (``functions/multimodal.py``) so ``audio_features`` can
compute true duration/RMS/zero-crossings instead of stubbing.

Supported: WAVE_FORMAT_PCM (8-bit unsigned, 16/24/32-bit signed),
WAVE_FORMAT_IEEE_FLOAT (float32/float64), and WAVE_FORMAT_EXTENSIBLE
wrapping either (SubFormat GUID dispatch). Compressed formats (ADPCM,
mu-law, MP3-in-WAV) raise with a clear message — their codecs
genuinely aren't in this container.

Independent oracle: the stdlib ``wave`` module reads/writes PCM WAVs;
tests round-trip through BOTH codecs and assert byte/sample equality
where the formats overlap (stdlib ``wave`` can't do float or
extensible, which is why this parser exists).

Reference parity note: the reference repo (corteva/geocube) has no
audio handling at all; this module exists for the training-data
pipeline ops, not for geo rasters.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 0x0001
_FMT_FLOAT = 0x0003
_FMT_EXTENSIBLE = 0xFFFE

# KSDATAFORMAT_SUBTYPE_{PCM,IEEE_FLOAT}: first 4 bytes hold the wFormatTag,
# the remaining 12 are the fixed media-subtype GUID suffix.
_GUID_SUFFIX = bytes.fromhex("000010008000" + "00aa00389b71")


def is_wav(blob: bytes) -> bool:
    return (
        blob is not None
        and len(blob) >= 12
        and bytes(blob[:4]) == b"RIFF"
        and bytes(blob[8:12]) == b"WAVE"
    )


def _chunks(b: bytes):
    """Walk RIFF sub-chunks -> (fourcc, payload_offset, size). RIFF
    chunks are word-aligned: odd sizes are followed by a pad byte."""
    pos = 12
    end = min(len(b), 8 + struct.unpack("<I", b[4:8])[0])
    while pos + 8 <= end:
        fourcc, size = struct.unpack("<4sI", b[pos:pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def wav_info(blob: bytes) -> dict:
    """Parse fmt + data chunk headers only (no sample decode) ->
    {sample_rate, channels, bit_depth, fmt, n_frames, duration_s}."""
    b = bytes(blob)
    if not is_wav(b):
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    fmt = None
    data_size = None
    for fourcc, off, size in _chunks(b):
        if fourcc == b"fmt " and fmt is None:
            if size < 16 or off + 16 > len(b):
                raise ValueError("corrupt WAV: fmt chunk too short")
            tag, ch, rate, _brate, _align, bits = struct.unpack(
                "<HHIIHH", b[off:off + 16]
            )
            if tag == _FMT_EXTENSIBLE:
                if size < 40 or off + 40 > len(b):
                    raise ValueError(
                        "corrupt WAV: extensible fmt chunk too short"
                    )
                guid = b[off + 24:off + 40]
                if guid[4:] != _GUID_SUFFIX:
                    raise ValueError("unsupported WAV: unknown SubFormat GUID")
                tag = struct.unpack("<I", guid[:4])[0]
            if tag not in (_FMT_PCM, _FMT_FLOAT):
                raise ValueError(
                    f"unsupported WAV format tag 0x{tag:04X} "
                    "(only PCM and IEEE float decode here — compressed "
                    "audio codecs aren't available in this container)"
                )
            fmt = {"tag": tag, "channels": ch, "rate": rate, "bits": bits}
        elif fourcc == b"data" and data_size is None:
            data_size = min(size, len(b) - off)
    if fmt is None:
        raise ValueError("corrupt WAV: no fmt chunk")
    if data_size is None:
        raise ValueError("corrupt WAV: no data chunk")
    if fmt["channels"] < 1 or fmt["rate"] < 1:
        raise ValueError("corrupt WAV: zero channels or sample rate")
    if fmt["tag"] == _FMT_PCM and fmt["bits"] not in (8, 16, 24, 32):
        raise ValueError(f"unsupported PCM bit depth {fmt['bits']}")
    if fmt["tag"] == _FMT_FLOAT and fmt["bits"] not in (32, 64):
        raise ValueError(f"unsupported float bit depth {fmt['bits']}")
    frame_bytes = fmt["channels"] * (fmt["bits"] // 8)
    n_frames = data_size // frame_bytes
    return {
        "sample_rate": int(fmt["rate"]),
        "channels": int(fmt["channels"]),
        "bit_depth": int(fmt["bits"]),
        "fmt": "pcm" if fmt["tag"] == _FMT_PCM else "float",
        "n_frames": int(n_frames),
        "duration_s": float(n_frames) / float(fmt["rate"]),
    }


def wav_decode(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode -> (samples float64 array of shape (n_frames, channels)
    normalized to [-1, 1], sample_rate).

    Normalization follows the usual conventions: u8 -> (x-128)/128,
    i16 -> x/2^15, i24 -> x/2^23, i32 -> x/2^31, float passes through.
    """
    b = bytes(blob)
    info = wav_info(b)
    raw = None
    for fourcc, off, size in _chunks(b):
        if fourcc == b"data":
            raw = b[off:off + min(size, len(b) - off)]
            break
    ch, bits = info["channels"], info["bit_depth"]
    frame_bytes = ch * (bits // 8)
    n = (len(raw) // frame_bytes) * frame_bytes
    raw = raw[:n]
    if info["fmt"] == "float":
        dt = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(raw, dtype=dt).astype(np.float64)
    elif bits == 8:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    elif bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 32:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:  # 24-bit: widen each 3-byte little-endian triple to int32
        a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        x32 = (
            a[:, 0].astype(np.int32)
            | (a[:, 1].astype(np.int32) << 8)
            | (a[:, 2].astype(np.int32) << 16)
        )
        x32 = (x32 << 8) >> 8  # sign-extend from bit 23
        x = x32.astype(np.float64) / 8388608.0
    return x.reshape(-1, ch), info["sample_rate"]


def wav_encode(samples: np.ndarray, sample_rate: int, *,
               bit_depth: int = 16, fmt: str = "pcm") -> bytes:
    """Encode float samples in [-1, 1] (shape (n,) or (n, channels))
    -> canonical WAV bytes. decode(encode(x)) == x exactly when x is
    already quantized to the target depth (tests rely on this)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if fmt == "float":
        if bit_depth not in (32, 64):
            raise ValueError("float WAV must be 32- or 64-bit")
        tag = _FMT_FLOAT
        raw = x.astype("<f4" if bit_depth == 32 else "<f8").tobytes()
    elif fmt == "pcm":
        tag = _FMT_PCM
        if bit_depth == 8:
            raw = np.clip(np.round(x * 128.0 + 128.0), 0, 255).astype(
                np.uint8).tobytes()
        elif bit_depth == 16:
            raw = np.clip(np.round(x * 32768.0), -32768, 32767).astype(
                "<i2").tobytes()
        elif bit_depth == 24:
            q = np.ascontiguousarray(
                np.clip(np.round(x * 8388608.0), -8388608, 8388607)
            ).astype("<i4")
            u = q.view(np.uint8).reshape(-1, 4)
            raw = np.ascontiguousarray(u[:, :3]).tobytes()
        elif bit_depth == 32:
            q = np.clip(np.round(x * 2147483648.0), -2147483648,
                        2147483647).astype("<i4")
            raw = q.tobytes()
        else:
            raise ValueError(f"unsupported PCM bit depth {bit_depth}")
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    block = ch * (bit_depth // 8)
    fmt_chunk = struct.pack(
        "<HHIIHH", tag, ch, sample_rate, sample_rate * block, block,
        bit_depth,
    )
    data = raw + (b"\x00" if len(raw) & 1 else b"")
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(raw)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
