"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata —
exactly how a 100 TB multimodal corpus stores them next to text. The
Spark-side machinery here is real and tested: schemas, Arrow batch
shape, ``mapInPandas`` decode pipelines, partition-friendly metadata
extraction. The actual codec step is STUBBED (the image/audio
libraries are not in this container): ``decode_media`` with
``codec='real'`` raises NotImplementedError; the default
``codec='stub'`` produces deterministic metadata derived from the
bytes, which keeps every downstream operator testable.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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

    ``codec='real'`` is the integration point for PIL/ffmpeg-style
    decoders (not available here) — it raises NotImplementedError.
    ``codec='stub'`` derives deterministic width/height/frame-count
    from the byte payload so the batch shape, schema, and partitioning
    behavior are exercised for real.
    """
    if codec == "real":
        raise NotImplementedError(
            "real media decoding requires image/audio codecs not present "
            "in this environment; use codec='stub'"
        )
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


def frame_sample(media_df: DataFrame, stride: int = 64) -> DataFrame:
    """'Frame sampling' over opaque bytes: every ``stride``-th byte as
    a frame fingerprint (stand-in for video frame extraction; the
    Spark-side explode/partition shape is the real thing)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame_byte", T.IntegerType()),
        ]
    )

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
    ``np.frombuffer(...).reshape(out_h, out_w)`` every row. The codec
    is stubbed (``codec='real'`` = PIL/opencv integration point,
    NotImplementedError here): the stub nearest-neighbor-samples the
    raw bytes into the target shape, deterministically.
    """
    if codec == "real":
        raise NotImplementedError(
            "real image resizing requires PIL/opencv; use codec='stub'"
        )
    if codec != "stub":
        raise ValueError(f"unknown codec {codec!r}")
    size = out_w * out_h

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
