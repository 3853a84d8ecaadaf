"""GeoJSON file source — distributed, plain `json`, no GDAL.

The reference reads GeoJSON through geopandas/OGR
(/root/reference/geocube/cli/geocube.py:69-75); here each file parses
in its own Spark task (RFC 7946 FeatureCollection / Feature /
bare geometry) into the engine's vector-table shape
``(doc_id, seq, geometry_wkb, <properties...>)``.

A GeoJSON file is one JSON document, so a single file is a single
stream by format design (same caveat as the shapefile source); the
many-files layout parallelizes. ``seq`` is the feature ordinal within
its file plus a per-file stride, so ordering is deterministic across
any number of files without the driver parsing data.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import re
from typing import Iterator

import numpy as np
import pandas as pd

from ..geometry import wkb as W

__all__ = ["read_geojson", "read_geojson_local", "geojson_file_epsg"]

_FILE_STRIDE = 1 << 40   # > any real per-file feature count


def _features(doc: dict) -> list:
    t = doc.get("type")
    if t == "FeatureCollection":
        return doc.get("features", [])
    if t == "Feature":
        return [doc]
    return [{"type": "Feature", "geometry": doc, "properties": {}}]


def read_geojson_local(path: str):
    """One file -> (geoms list, properties DataFrame, epsg or None)."""
    with open(path) as f:
        doc = json.load(f)
    feats = _features(doc)
    geoms = [
        None if f.get("geometry") is None else W.from_geojson(f["geometry"])
        for f in feats
    ]
    props = pd.DataFrame([f.get("properties") or {} for f in feats])
    return geoms, props, geojson_crs_epsg(doc)


_EPSG_URN = re.compile(r"(?:EPSG|epsg)(?:::?|:)(\d+)")


def geojson_crs_epsg(doc: dict):
    """Legacy (pre-RFC-7946) 'crs' member -> EPSG int, else None
    (RFC 7946 mandates CRS84 ~ 4326, but the reference's fixtures carry
    the legacy member and geocube honors it, geobox.py:196-199)."""
    crs = doc.get("crs")
    if not isinstance(crs, dict):
        return None
    name = str(crs.get("properties", {}).get("name", ""))
    m = _EPSG_URN.search(name)
    return int(m.group(1)) if m else None


def geojson_file_epsg(path: str):
    with open(path) as f:
        return geojson_crs_epsg(json.load(f))


def read_geojson(spark, path, id_prefix: str = "gj"):
    """GeoJSON path / glob / directory -> vector-table DataFrame
    ``(doc_id, seq, geometry_wkb, <properties...>)``.

    Property schema comes from the first file (numeric -> double,
    bool -> boolean, everything else -> string); features missing a
    key get NULL, like OGR's unified layer schema.
    """
    from pyspark.sql import types as T

    if os.path.isdir(path):
        paths = sorted(
            _glob.glob(os.path.join(path, "*.geojson"))
            + _glob.glob(os.path.join(path, "*.json"))
        )
    else:
        paths = sorted(_glob.glob(path)) if any(
            ch in path for ch in "*?[") else [path]
    if not paths:
        raise ValueError(f"no GeoJSON files match {path!r}")

    _, props0, _ = read_geojson_local(paths[0])
    attr_fields = []
    for c in props0.columns:
        if c in ("doc_id", "seq", "geometry_wkb"):
            continue
        if pd.api.types.is_bool_dtype(props0[c]):
            t = T.BooleanType()
        elif pd.api.types.is_integer_dtype(props0[c]):
            t = T.LongType()
        elif pd.api.types.is_float_dtype(props0[c]):
            t = T.DoubleType()
        else:
            t = T.StringType()
        attr_fields.append(T.StructField(c, t))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("geometry_wkb", T.BinaryType()),
        ]
        + attr_fields
    )
    attr_names = [f.name for f in attr_fields]
    casts = {
        f.name: (
            "float64" if isinstance(f.dataType, T.DoubleType)
            else "Int64" if isinstance(f.dataType, T.LongType)
            else "boolean" if isinstance(f.dataType, T.BooleanType)
            else "object"
        )
        for f in attr_fields
    }

    files_df = spark.createDataFrame(
        [(p, i * _FILE_STRIDE if len(paths) > 1 else 0)
         for i, p in enumerate(paths)],
        "path string, base long",
    ).repartition(len(paths), "path")

    def _load(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, base in zip(pdf["path"].values, pdf["base"].values):
                geoms, props, _ = read_geojson_local(p)
                stem = os.path.splitext(os.path.basename(p))[0]
                out = pd.DataFrame(
                    {
                        "doc_id": [
                            f"{id_prefix}-{stem}-{i}"
                            for i in range(len(geoms))
                        ],
                        "seq": np.arange(len(geoms), dtype=np.int64) + base,
                        "geometry_wkb": [
                            None if g is None else g.to_wkb() for g in geoms
                        ],
                    }
                )
                for c in attr_names:
                    vals = props[c] if c in props else pd.Series(
                        [None] * len(geoms)
                    )
                    if casts[c] == "object":
                        # string column: nested JSON values serialize
                        out[c] = [
                            None if v is None or (
                                isinstance(v, float) and np.isnan(v)
                            ) else v if isinstance(v, str)
                            else json.dumps(v)
                            for v in vals
                        ]
                    else:
                        out[c] = pd.array(vals, dtype=casts[c])
                yield out

    return files_df.mapInPandas(_load, schema=schema)
