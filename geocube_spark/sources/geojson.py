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


# ---------------------------------------------------------------------------
# sink
# ---------------------------------------------------------------------------


def _json_safe(v):
    """Property value -> JSON-serializable (numpy/pandas scalars,
    timestamps, NaN -> null)."""
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if np.isnan(f) else f
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _feature(wkb_val, props: dict) -> dict:
    geom = None if wkb_val is None else W.to_geojson(W.loads(bytes(wkb_val)))
    return {
        "type": "Feature",
        "geometry": geom,
        "properties": {k: _json_safe(v) for k, v in props.items()},
    }


def _write_collection(fh, rows_iter, geometry_column: str,
                      prop_cols: list, epsg) -> int:
    """Stream a FeatureCollection to a file handle; returns feature
    count. Never materializes the whole document."""
    fh.write('{"type": "FeatureCollection", ')
    if epsg is not None:
        fh.write(
            '"crs": {"type": "name", "properties": '
            f'{{"name": "urn:ogc:def:crs:EPSG::{int(epsg)}"}}}}, '
        )
    fh.write('"features": [')
    n = 0
    for row in rows_iter:
        props = {c: row[c] for c in prop_cols}
        feat = _feature(row[geometry_column], props)
        fh.write(("\n" if n == 0 else ",\n") + json.dumps(feat))
        n += 1
    fh.write("\n]}\n")
    return n


def write_geojson(df, path: str, geometry_column: str = "geometry_wkb",
                  *, epsg: int = None, mode: str = "single") -> list:
    """Vector-table DataFrame -> GeoJSON FeatureCollection(s); the
    inverse of :func:`read_geojson` (round-trip tested). Returns
    written paths.

    ``mode='single'`` streams ONE FeatureCollection through the
    driver with ``toLocalIterator`` — constant driver memory, the
    right interchange hatch for small-to-medium outputs (GeoJSON is a
    single JSON document; there is no parallel append).
    ``mode='parts'`` writes one complete, independently valid
    FeatureCollection per Spark partition under
    ``path``/part-N.geojson, fully distributed — the same escape
    hatch as the shapefile/GeoPackage/GeoTIFF sinks; ``read_geojson``
    on the directory glob reassembles the table.

    Geometry null -> ``"geometry": null`` (RFC 7946); a non-4326 CRS
    is recorded as the legacy ``crs`` member the reader sniffs
    (RFC 7946 dropped it, but it remains the only in-band convention
    and matches the reference's OGR behavior)."""
    prop_cols = [c for c in df.columns if c != geometry_column]

    if mode == "single":
        with open(path, "w") as fh:
            _write_collection(
                fh, df.toLocalIterator(), geometry_column, prop_cols,
                epsg,
            )
        return [path]
    if mode != "parts":
        raise ValueError(f"unknown mode {mode!r}")
    os.makedirs(path, exist_ok=True)
    from pyspark.sql import functions as F

    tagged = df.withColumn("__pid", F.spark_partition_id())

    def _per_part(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        out = os.path.join(path, f"part-{pid:05d}.geojson")
        pdf = pdf.drop(columns="__pid")
        with open(out, "w") as fh:
            n = _write_collection(
                fh, (row for _, row in pdf.iterrows()),
                geometry_column, prop_cols, epsg,
            )
        return pd.DataFrame({"path": [out], "n": [n]})

    written = (
        tagged.groupBy("__pid")
        .applyInPandas(_per_part, schema="path string, n long")
        .collect()
    )
    return [r["path"] for r in written]
