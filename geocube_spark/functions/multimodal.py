"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata —
exactly how a 100 TB multimodal corpus stores them next to text. The
Spark-side machinery here is real and tested: schemas, Arrow batch
shape, ``mapInPandas`` decode pipelines, partition-friendly metadata
extraction.

Codecs (round 4): image decoding is REAL for PNG, baseline JPEG, GIF
and BMP — pure-stdlib codecs written from the public specs
(``kernels/png.py``, ``kernels/jpeg.py``, ``kernels/gif.py``,
``kernels/bmp.py``, dispatched by ``kernels/media.py``) power
``decode_media(codec='real')``, ``image_pixel_stats`` and
``resize_media(codec='real')``. Video is REAL for uncompressed AVI
(``kernels/avi.py``: RIFF walk + DIB frames) — true frame counts in
``decode_media`` and true per-frame decode in
``frame_sample(codec='real')``. WAV audio is REAL
(``kernels/wav.py``) behind ``audio_features(codec='real')``.
Formats whose decoders can't be built without external libraries
(H.264, MP3, ...) stay honestly out of scope: 'real' rows whose
bytes aren't decodable get NULLs or are dropped rather than failing
the job, and the default ``codec='stub'`` still produces
deterministic metadata from raw bytes so every downstream operator
is testable on any payload.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

import struct
import zlib

# Exceptions a malformed/truncated media blob can raise inside the
# pure-python codecs (png/jpeg/gif/bmp/wav/avi): zlib errors from a
# corrupt IDAT, Key/IndexErrors from dangling Huffman/palette refs,
# struct.error from short reads. Decoding untrusted bytes must drop
# the ROW (NULLs), never the job, so every codec='real' call site
# catches this tuple.
DECODE_ERRORS = (
    ValueError,
    NotImplementedError,
    KeyError,
    IndexError,
    TypeError,
    OverflowError,
    EOFError,
    struct.error,
    zlib.error,
)

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("header_hex", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def with_media_bytes(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic fake media payload (utf-8 bytes of the
    text) — stands in for a real binary column; everything downstream
    treats it as opaque bytes."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
    )


def decode_media(media_df: DataFrame, codec: str = "stub") -> DataFrame:
    """Arrow-batched decode: binary -> typed metadata via mapInPandas.

    ``codec='real'`` parses visual payloads with the pure-stdlib
    codecs (``kernels/media.py`` dispatch — PNG/JPEG/GIF/BMP/AVI):
    width/height come from the format headers (no pixel inflation —
    O(bytes scanned) per blob), ``n_frames`` is real data for GIF
    animations and AVI video; audio/unknown payloads yield NULL
    dimensions (a real pipeline flags undecodable rows, it doesn't
    fail the job).
    ``codec='stub'`` derives deterministic width/height/frame-count
    from the byte payload so the batch shape, schema, and partitioning
    behavior are exercised on any payload.
    """
    if codec == "real":
        from ..kernels.media import image_info

        def _real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                blobs = pdf["media"].values
                n = np.array(
                    [len(b) if b is not None else 0 for b in blobs],
                    dtype=np.int64,
                )
                header, width, height, frames = [], [], [], []
                for b in blobs:
                    header.append(
                        bytes(b[:4]).hex().upper() if b is not None else ""
                    )
                    try:
                        info = image_info(b) if b is not None else None
                    except DECODE_ERRORS:
                        info = None
                    if info is not None:
                        width.append(info["width"])
                        height.append(info["height"])
                        frames.append(info["n_frames"])
                    else:
                        width.append(None)
                        height.append(None)
                        frames.append(None)
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"].astype("int64"),
                        "n_bytes": n.astype("int32"),
                        "header_hex": header,
                        "width": pd.array(width, dtype="Int32"),
                        "height": pd.array(height, dtype="Int32"),
                        "n_frames": pd.array(frames, dtype="Int32"),
                    }
                )

        return media_df.mapInPandas(_real, schema=MEDIA_META_SCHEMA)
    if codec != "stub":
        raise ValueError(f"unknown codec {codec!r}")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["media"].values
            n = np.array([len(b) if b is not None else 0 for b in blobs],
                         dtype=np.int64)
            header = [
                bytes(b[:4]).hex().upper() if b is not None else ""
                for b in blobs
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n.astype("int32"),
                    "header_hex": header,
                    "width": (16 + n % 624).astype("int32"),
                    "height": (16 + (n * 7) % 464).astype("int32"),
                    "n_frames": (1 + n % 16).astype("int32"),
                }
            )

    return media_df.mapInPandas(_decode, schema=MEDIA_META_SCHEMA)


def frame_sample(media_df: DataFrame, stride: int = 64,
                 codec: str = "stub") -> DataFrame:
    """Frame sampling over media payloads.

    ``codec='stub'`` (default; the driver-window oracle pins it):
    every ``stride``-th byte as a frame fingerprint — the Spark-side
    explode/partition shape on any payload.

    ``codec='real'`` (round 4): uncompressed-AVI payloads are decoded
    for REAL (``kernels/avi.py``) — every ``stride``-th video frame
    becomes a row whose ``frame_byte`` is the frame's rounded mean
    luminance; the selective walk decodes ONLY sampled frames (other
    chunks are skipped by size). Non-AVI payloads are dropped
    (select-what-you-can-decode). Same output schema either way, so
    downstream operators are codec-agnostic."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame_byte", T.IntegerType()),
        ]
    )
    if codec == "real":
        from ..kernels.avi import avi_info, decode_avi_frames, is_avi
        from ..kernels.media import to_luminance

        def _real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, fno, fb = [], [], []
                for did, blob in zip(
                    pdf["doc_id"].values, pdf["media"].values
                ):
                    if blob is None or not is_avi(bytes(blob[:12])):
                        continue
                    try:
                        b = bytes(blob)
                        n = avi_info(b)["n_frames"]
                        picks = list(range(0, n, max(1, stride)))
                        frames = decode_avi_frames(b, indices=picks)
                    except DECODE_ERRORS:
                        continue
                    for k, fr in zip(picks, frames):
                        ids.append(did)
                        fno.append(k)
                        fb.append(int(round(to_luminance(fr).mean())))
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(ids, dtype="int64"),
                        "frame_no": pd.Series(fno, dtype="int32"),
                        "frame_byte": pd.Series(fb, dtype="int32"),
                    }
                )

        return media_df.mapInPandas(_real, schema=schema)
    if codec != "stub":
        raise ValueError(f"unknown codec {codec!r}")

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fno, fb = [], [], []
            for did, blob in zip(pdf["doc_id"].values, pdf["media"].values):
                if blob is None:
                    continue
                bb = bytes(blob)[::stride]
                ids.extend([did] * len(bb))
                fno.extend(range(len(bb)))
                fb.extend(bb)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(fno, dtype="int32"),
                    "frame_byte": pd.Series(fb, dtype="int32"),
                }
            )

    return media_df.mapInPandas(_sample, schema=schema)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def resize_media(media_df: DataFrame, *, out_w: int = 32, out_h: int = 32,
                 codec: str = "stub") -> DataFrame:
    """Resize plumbing: binary -> fixed-shape pixel buffer per doc.

    The Spark-side contract is real — one ``out_h*out_w``-byte buffer
    per row, Arrow-batched, schema fixed so a downstream trainer can
    ``np.frombuffer(...).reshape(out_h, out_w)`` every row.

    ``codec='real'`` (round 4): PNG payloads are DECODED (pure-stdlib
    codec, ``kernels/png.py``), converted to luminance (channel mean)
    and nearest-neighbor-resampled to the target shape; non-PNG rows
    are dropped (select-what-you-can-decode). ``codec='stub'``
    nearest-neighbor-samples the raw bytes instead, deterministically,
    so the plumbing is exercised on any payload.
    """
    size = out_w * out_h
    if codec == "real":
        from ..kernels.media import decode_image, to_luminance

        def _real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for did, blob in zip(
                    pdf["doc_id"].values, pdf["media"].values
                ):
                    if blob is None:
                        continue
                    try:
                        px = to_luminance(decode_image(blob))
                    except DECODE_ERRORS:
                        continue
                    h, w = px.shape
                    yi = (
                        np.arange(out_h, dtype=np.float64) * h / out_h
                    ).astype(np.int64)
                    xi = (
                        np.arange(out_w, dtype=np.float64) * w / out_w
                    ).astype(np.int64)
                    buf = (
                        px[np.minimum(yi, h - 1)][
                            :, np.minimum(xi, w - 1)
                        ]
                        .astype(np.uint8)
                        .tobytes()
                    )
                    out.append(
                        {"doc_id": did, "out_w": out_w,
                         "out_h": out_h, "pixels": buf}
                    )
                if out:
                    yield pd.DataFrame(
                        out,
                        columns=[f.name for f in RESIZE_SCHEMA.fields],
                    )

        return media_df.mapInPandas(_real, schema=RESIZE_SCHEMA)
    if codec != "stub":
        raise ValueError(f"unknown codec {codec!r}")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, blob in zip(pdf["doc_id"].values, pdf["media"].values):
                if blob is None or len(blob) == 0:
                    buf = bytes(size)
                else:
                    src = np.frombuffer(bytes(blob), dtype=np.uint8)
                    idx = (
                        np.arange(size, dtype=np.float64)
                        * len(src) / size
                    ).astype(np.int64)
                    buf = src[idx].tobytes()
                out.append({"doc_id": did, "out_w": out_w,
                            "out_h": out_h, "pixels": buf})
            yield pd.DataFrame(
                out, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return media_df.mapInPandas(_resize, schema=RESIZE_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(media_df: DataFrame, *, dim: int = 64,
                     codec: str = "stub") -> DataFrame:
    """Feature-extraction plumbing: binary -> float32 embedding per doc
    (the array<float> shape the similarity/ANN operators consume).

    ``codec='real'`` is the model-inference integration point (torch /
    onnxruntime, absent here). The stub computes a deterministic
    byte-histogram projection: real batch shape, real schema, directly
    feedable into functions.similarity."""
    if codec == "real":
        raise NotImplementedError(
            "real feature extraction requires an inference runtime; "
            "use codec='stub'"
        )
    if codec != "stub":
        raise ValueError(f"unknown codec {codec!r}")

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for did, blob in zip(pdf["doc_id"].values, pdf["media"].values):
                if blob is None or len(blob) == 0:
                    # null/empty media -> zero vector (doc kept; same
                    # convention as resize_media's zero buffer)
                    ids.append(did)
                    feats.append(np.zeros(dim, dtype=np.float32))
                    continue
                src = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(src % dim, minlength=dim).astype(
                    np.float64
                )
                norm = np.linalg.norm(hist)
                ids.append(did)
                feats.append((hist / (norm or 1.0)).astype(np.float32))
            yield pd.DataFrame({"doc_id": ids, "features": feats})

    return media_df.mapInPandas(_feat, schema=FEATURE_SCHEMA)


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("px_mean", T.DoubleType()),
        T.StructField("px_std", T.DoubleType()),
        T.StructField("px_min", T.IntegerType()),
        T.StructField("px_max", T.IntegerType()),
    ]
)


def image_pixel_stats(media_df: DataFrame) -> DataFrame:
    """REAL pixel-level feature extraction for image payloads: each
    blob is fully decoded by the pure-stdlib codecs (PNG/baseline
    JPEG/GIF/BMP via the ``kernels/media.py`` dispatch) and reduced to
    per-image pixel statistics; undecodable rows are dropped (the
    standard select-what-you-can-decode pipeline shape). Arrow-batched
    ``mapInPandas``; each task decodes only its own partition's blobs.
    """
    from ..kernels.media import decode_image

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"].values, pdf["media"].values):
                if blob is None:
                    continue
                try:
                    px = decode_image(blob)
                except DECODE_ERRORS:
                    continue
                h, w = px.shape[:2]
                ch = 1 if px.ndim == 2 else px.shape[2]
                rows.append(
                    {
                        "doc_id": int(did),
                        "width": w,
                        "height": h,
                        "channels": ch,
                        "px_mean": float(px.mean()),
                        "px_std": float(px.std()),
                        "px_min": int(px.min()),
                        "px_max": int(px.max()),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return media_df.mapInPandas(_stats, schema=PIXEL_STATS_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
    ]
)


def _audio_feature_row(did: int, samples: np.ndarray, rate: int,
                       channels: int, bits: int) -> dict:
    """Features over float samples in [-1, 1], shape (n, channels).
    zero_cross_rate = sign changes per sample on the channel mean."""
    mono = samples.mean(axis=1)
    n = len(mono)
    zc = 0.0
    if n > 1:
        s = np.signbit(mono)
        zc = float(np.count_nonzero(s[1:] != s[:-1])) / (n - 1)
    return {
        "doc_id": int(did),
        "sample_rate": int(rate),
        "channels": int(channels),
        "bit_depth": int(bits),
        "duration_s": n / float(rate),
        "rms": float(np.sqrt(np.mean(mono * mono))) if n else 0.0,
        "peak": float(np.abs(samples).max()) if n else 0.0,
        "zero_cross_rate": zc,
    }


def audio_features(media_df: DataFrame, codec: str = "real") -> DataFrame:
    """Audio feature extraction: binary -> (duration, RMS, peak,
    zero-crossing rate) via Arrow-batched ``mapInPandas``.

    ``codec='real'`` decodes WAV payloads with the pure-stdlib codec
    (``kernels/wav.py``: PCM 8/16/24/32-bit, float32/64, extensible);
    non-WAV / compressed rows are dropped (select-what-you-can-decode
    — MP3/AAC/opus decoders genuinely aren't in this container).
    ``codec='stub'`` interprets the raw bytes as 8-bit unsigned PCM
    mono at a nominal 8 kHz — deterministic on any payload, and the
    feature math is the SAME code path as the real decode.

    Scale shape: one narrow map stage, each task decodes only its own
    partition's blobs; features are O(samples) with numpy inner loops.
    """
    from ..kernels.wav import is_wav, wav_decode, wav_info

    if codec not in ("real", "stub"):
        raise ValueError(f"unknown codec {codec!r}")

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"].values, pdf["media"].values):
                if blob is None:
                    continue
                b = bytes(blob)
                if codec == "real":
                    if not is_wav(b):
                        continue
                    try:
                        info = wav_info(b)
                        samples, rate = wav_decode(b)
                    except ValueError:
                        continue
                    rows.append(_audio_feature_row(
                        did, samples, rate, info["channels"],
                        info["bit_depth"]))
                else:
                    x = (np.frombuffer(b, dtype=np.uint8)
                         .astype(np.float64) - 128.0) / 128.0
                    rows.append(_audio_feature_row(
                        did, x[:, None], 8000, 1, 8))
            if rows:
                yield pd.DataFrame(rows)

    return media_df.mapInPandas(_feats, schema=AUDIO_FEATURES_SCHEMA)


def dhash_bits(df: DataFrame, *, width: int = 8, height: int = 8,
               vec_col: str = "pixels",
               id_col: str = "doc_id") -> DataFrame:
    """Perceptual difference hash (dHash — Krawetz's public
    algorithm): over a row-major ``height x width`` grayscale pixel
    array, bit ``r*(width-1)+c`` is set iff ``p[r,c] < p[r,c+1]``
    (strict <, so ties are deterministic). ``height*(width-1)`` bits
    packed little-endian into one long (must be <= 62 bits). Near-
    identical images differ in few bits; crops/re-encodes move only
    the bits whose local gradient flipped — the standard cheap image
    near-dup signature.

    Pure Catalyst (element_at comparisons + conditional bit sums, the
    simhash construction) — zero Python, zero shuffle. Feed it
    ``decode_media``/``resize_media`` pixels for real images, or any
    fixed-length feature vector.

    Returns (id, dhash: long)."""
    nbits = height * (width - 1)
    if width < 2 or height < 1:
        raise ValueError(f"need width >= 2, height >= 1, got "
                         f"{width}x{height}")
    if nbits > 62:
        raise ValueError(f"{nbits} bits exceed a signed long; shrink "
                         f"width/height (max 62)")
    v = F.col(vec_col)
    terms = []
    for r in range(height):
        for c in range(width - 1):
            i = r * (width - 1) + c
            bit = (F.element_at(v, r * width + c + 1)
                   < F.element_at(v, r * width + c + 2))
            terms.append(F.when(bit, F.lit(1 << i).cast("long"))
                         .otherwise(F.lit(0).cast("long")))
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        total.alias("dhash"),
    )


def dhash_near_pairs(sig: DataFrame, *, max_hamming: int = 6,
                     bands: int = 7, bits: int = 56) -> DataFrame:
    """Near-duplicate image pairs by dHash Hamming distance — the
    banded-segment equi-join (pigeonhole: Hamming <= bands-1 implies
    >=1 exact shared segment) with exact ``bit_count(xor)``
    verification, same scale shape as ``simhash_near_pairs``:
    candidates ~ colliding pairs, never all-pairs.

    ``sig`` is a :func:`dhash_bits` frame (id, dhash). Returns
    (id_a, id_b, hamming), id_a < id_b."""
    if bands < 1 or bits % bands:
        raise ValueError(f"bands must divide bits ({bits})")
    seg = bits // bands
    segs = F.array(*[
        F.struct(
            F.lit(i).alias("seg"),
            F.shiftright(F.col("dhash"), i * seg)
            .bitwiseAND(F.lit((1 << seg) - 1)).alias("sv"),
        )
        for i in range(bands)
    ])
    b = sig.select("id", "dhash", F.explode(segs).alias("s")).select(
        "id", "dhash", F.col("s.seg").alias("seg"),
        F.col("s.sv").alias("sv"))
    l, r = b.alias("l"), b.alias("r")
    ham = F.bit_count(F.col("l.dhash").bitwiseXOR(F.col("r.dhash")))
    return (
        l.join(r, (F.col("l.seg") == F.col("r.seg"))
               & (F.col("l.sv") == F.col("r.sv"))
               & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"),
                F.col("r.id").alias("id_b"), ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
