"""Media sniffing + decode dispatch over the pure-stdlib codecs.

One front door for the multimodal ops (``functions/multimodal.py``):
``sniff_media`` classifies a blob by magic bytes; ``image_info`` and
``decode_image`` fan out to the format codec. Every codec here is
implemented from its public spec with stdlib + numpy only — PNG
(``kernels/png.py``), baseline JPEG (``kernels/jpeg.py``), GIF
(``kernels/gif.py``), BMP (``kernels/bmp.py``), AVI video
(``kernels/avi.py``), WAV audio (``kernels/wav.py``). Formats whose
decoders genuinely aren't expressible without external libraries
(H.264, MP3, ...) simply sniff as None and flow through pipelines as
undecodable rows rather than failures.
"""

from __future__ import annotations

import numpy as np

from .avi import avi_info, decode_avi_frames, is_avi
from .bmp import bmp_info, decode_bmp, is_bmp
from .gif import decode_gif, gif_info, is_gif
from .jpeg import decode_jpeg, is_jpeg, jpeg_info
from .png import decode_png, is_png, png_info
from .wav import is_wav


def sniff_media(blob) -> str | None:
    """Magic-byte classification: 'png' | 'jpeg' | 'gif' | 'bmp' |
    'avi' | 'wav' | None."""
    if blob is None:
        return None
    b = bytes(blob[:16])
    if is_png(b):
        return "png"
    if is_jpeg(b):
        return "jpeg"
    if is_gif(b):
        return "gif"
    if is_bmp(b):
        return "bmp"
    # RIFF containers need bytes 8:12
    head = bytes(blob[:12])
    if is_avi(head):
        return "avi"
    if is_wav(head):
        return "wav"
    return None


def image_info(blob) -> dict | None:
    """{width, height, n_frames} for any visual format (header parse
    only — no pixel decode); None for audio/unknown payloads."""
    kind = sniff_media(blob)
    b = bytes(blob) if blob is not None else b""
    if kind == "png":
        i = png_info(b)
        return {"width": i["width"], "height": i["height"], "n_frames": 1}
    if kind == "jpeg":
        i = jpeg_info(b)
        return {"width": i["width"], "height": i["height"], "n_frames": 1}
    if kind == "gif":
        return gif_info(b)
    if kind == "bmp":
        i = bmp_info(b)
        return {"width": i["width"], "height": i["height"], "n_frames": 1}
    if kind == "avi":
        i = avi_info(b)
        return {
            "width": i["width"],
            "height": i["height"],
            "n_frames": i["n_frames"],
        }
    return None


def decode_image(blob, frame: int = 0) -> np.ndarray:
    """Decode a visual payload to uint8 pixels ((h, w), (h, w, 3) or
    (h, w, 4) depending on format). ``frame`` selects a GIF/AVI frame.
    Raises ValueError/NotImplementedError for undecodable payloads —
    callers in the pipeline drop those rows."""
    kind = sniff_media(blob)
    b = bytes(blob) if blob is not None else b""
    if kind == "png":
        return decode_png(b)
    if kind == "jpeg":
        return decode_jpeg(b)
    if kind == "gif":
        return decode_gif(b, frame)
    if kind == "bmp":
        return decode_bmp(b)
    if kind == "avi":
        frames = decode_avi_frames(b, indices=[frame])
        if not frames:
            raise ValueError(f"AVI has no frame #{frame}")
        return frames[0]
    raise ValueError(f"undecodable media payload (kind={kind!r})")


def to_luminance(px: np.ndarray) -> np.ndarray:
    """uint8 pixels -> float64 (h, w) luminance (channel mean for
    multi-channel, identity for grayscale)."""
    if px.ndim == 2:
        return px.astype(np.float64)
    return px[..., :3].astype(np.float64).mean(axis=2)
