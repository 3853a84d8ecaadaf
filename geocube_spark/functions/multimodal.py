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
