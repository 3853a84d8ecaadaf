"""GeoParquet source/sink — the OGC GeoParquet spec on plain pyarrow.

GeoParquet (public spec, opengeospatial/geoparquet v1.1.0) is ordinary
parquet whose file footer carries a ``geo`` key-value metadata entry:
JSON naming the primary geometry column, its encoding (WKB here), the
geometry types present, an optional CRS (PROJJSON), the file-level
bbox, and (1.1) an optional per-row bbox "covering" column for spatial
data skipping. The reference emits/ingests geo formats through
geopandas/OGR (``geopandas.read_file``, cli/geocube.py:69-75); this
module implements the container directly so the engine's native
(WKB column + attributes) tables interoperate with the GeoParquet
ecosystem without GDAL.

Scale design: ``mode='parts'`` writes one complete GeoParquet file per
Spark partition ON THE EXECUTORS (same contract as
``write_shapefile(mode='parts')``) — each file's footer records its
OWN bbox, so a spatially-clustered table gets per-file envelopes a
reader can prune on; nothing is collected to the driver.
``covering=True`` additionally materializes the spec's per-row bbox
struct column, which parquet min/max statistics turn into row-group
level spatial skipping (the same mechanism external engines use).

Read side: ``spark.read.parquet`` does the distributed scan (predicate
pushdown, column pruning intact); :func:`geoparquet_metadata` parses
the ``geo`` footer(s) driver-side — O(files) metadata reads, no data.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from ..geometry import wkb as W

__all__ = [
    "write_geoparquet", "read_geoparquet", "geoparquet_metadata",
    "GeoParquetError",
]

GEOPARQUET_VERSION = "1.1.0"


class GeoParquetError(ValueError):
    pass


def _geometry_type_names(blobs) -> list:
    """Distinct WKB type names present (little/big-endian headers,
    2D codes and their Z/M offsets)."""
    seen = set()
    for b in blobs:
        if b is None:
            continue
        raw = bytes(b)
        if len(raw) < 5:
            continue
        code = int.from_bytes(raw[1:5], "little" if raw[0] == 1 else "big")
        seen.add(code % 1000)  # 1001/2001/3001 -> Z/M/ZM variants
    return sorted(W._TYPE_NAMES.get(c, f"Unknown({c})") for c in seen)


def _projjson_for_epsg(epsg: int):
    """Minimal PROJJSON carrying the authority:code identity — enough
    for any reader that resolves CRS by id (the common case); None for
    4326 (the spec's default, OGC:CRS84 axis order == our lon/lat)."""
    if epsg in (4326, 0, None):
        return None
    try:
        from ..geometry.crs import CRS

        geographic = CRS(int(epsg)).is_geographic
    except Exception:
        geographic = False
    return {
        "$schema": (
            "https://proj.org/schemas/v0.7/projjson.schema.json"
        ),
        "type": "GeographicCRS" if geographic else "ProjectedCRS",
        "name": f"EPSG:{epsg}",
        "id": {"authority": "EPSG", "code": int(epsg)},
    }


def _geo_meta(col: str, blobs, epsg, covering: bool) -> dict:
    import numpy as _np

    ok = [b for b in blobs if b is not None]
    if ok:
        bounds = W.batch_bounds(ok)
        bbox = [
            float(_np.min(bounds[:, 0])), float(_np.min(bounds[:, 1])),
            float(_np.max(bounds[:, 2])), float(_np.max(bounds[:, 3])),
        ]
    else:
        bbox = None
    colmeta = {
        "encoding": "WKB",
        "geometry_types": _geometry_type_names(ok),
        "crs": _projjson_for_epsg(epsg),
        **({"bbox": bbox} if bbox else {}),
    }
    if covering:
        colmeta["covering"] = {
            "bbox": {
                "xmin": ["bbox", "xmin"], "ymin": ["bbox", "ymin"],
                "xmax": ["bbox", "xmax"], "ymax": ["bbox", "ymax"],
            }
        }
    return {
        "version": GEOPARQUET_VERSION,
        "primary_column": col,
        "columns": {col: colmeta},
    }


def _write_one(pdf: pd.DataFrame, out_path: str, wkb_col: str,
               epsg, covering: bool) -> int:
    """One pandas frame -> one complete GeoParquet file (executor-side
    in mode='parts', driver-side in mode='single')."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if wkb_col not in pdf.columns:
        raise GeoParquetError(
            f"geometry column {wkb_col!r} not in {list(pdf.columns)}"
        )
    pdf = pdf.copy()
    if covering:
        blobs = pdf[wkb_col].values
        bounds = np.full((len(pdf), 4), np.nan)
        mask = np.array([b is not None for b in blobs], dtype=bool)
        if mask.any():
            bounds[mask] = W.batch_bounds(
                [bytes(b) for b in blobs[mask]]
            )
        pdf["bbox"] = [
            {"xmin": r[0], "ymin": r[1], "xmax": r[2], "ymax": r[3]}
            if m else None
            for r, m in zip(bounds, mask)
        ]
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    meta = _geo_meta(wkb_col, pdf[wkb_col].values, epsg, covering)
    existing = table.schema.metadata or {}
    table = table.replace_schema_metadata(
        {**existing, b"geo": json.dumps(meta).encode()}
    )
    pq.write_table(table, out_path)
    return len(pdf)


def write_geoparquet(df, path: str, wkb_col: str = "wkb",
                     epsg: int = 4326, mode: str = "parts",
                     covering: bool = False):
    """Vector-table DataFrame -> GeoParquet file(s).

    ``mode='parts'`` (default — parquet, unlike the single-writer
    formats, is MEANT to be a multi-file dataset): every Spark
    partition writes its own complete, footer-tagged .parquet under
    ``path``/part-N.parquet on the executor; returns the written
    paths. ``mode='single'`` collects to the driver and writes ONE
    file — the small-output interchange hatch.

    ``covering=True`` adds the spec's per-row ``bbox`` struct column
    (xmin/ymin/xmax/ymax) so parquet row-group statistics provide
    spatial data skipping in any GeoParquet-aware engine.
    """
    if wkb_col not in df.columns:
        raise GeoParquetError(
            f"geometry column {wkb_col!r} not in {df.columns}"
        )
    if mode in ("single", "file"):
        n = _write_one(df.toPandas(), path, wkb_col, epsg, covering)
        return [path] if n >= 0 else []
    if mode != "parts":
        raise ValueError(f"unknown mode {mode!r}")
    os.makedirs(path, exist_ok=True)
    from pyspark.sql import functions as F

    tagged = df.withColumn("__pid", F.spark_partition_id())

    def _per_part(key, pdf):
        pid = int(key[0])
        out = os.path.join(path, f"part-{pid:05d}.parquet")
        n = _write_one(
            pdf.drop(columns="__pid"), out, wkb_col, epsg, covering
        )
        return pd.DataFrame({"path": [out], "n": [n]})

    written = (
        tagged.groupBy("__pid")
        .applyInPandas(_per_part, schema="path string, n long")
        .collect()
    )
    return sorted(r["path"] for r in written)


def geoparquet_metadata(path: str) -> dict:
    """Parse + merge the ``geo`` footers of a GeoParquet file or
    part-file directory (driver-side, metadata-only): returns
    ``{"primary_column", "encoding", "crs_epsg", "geometry_types",
    "bbox", "version", "n_files"}`` with bbox/types unioned across
    files."""
    import pyarrow.parquet as pq

    files = []
    if os.path.isdir(path):
        for root, _dirs, names in os.walk(path):
            files += [
                os.path.join(root, n) for n in sorted(names)
                if n.endswith(".parquet")
            ]
    else:
        files = [path]
    if not files:
        raise GeoParquetError(f"no parquet files under {path}")
    merged = None
    for fp in files:
        md = pq.ParquetFile(fp).schema_arrow.metadata or {}
        raw = md.get(b"geo")
        if raw is None:
            raise GeoParquetError(
                f"{fp} has no 'geo' footer metadata (not GeoParquet)"
            )
        geo = json.loads(raw.decode())
        col = geo.get("primary_column")
        cmeta = geo.get("columns", {}).get(col, {})
        if cmeta.get("encoding") != "WKB":
            raise GeoParquetError(
                f"unsupported encoding {cmeta.get('encoding')!r} in {fp}"
            )
        crs = cmeta.get("crs")
        epsg = 4326
        if isinstance(crs, dict):
            ident = crs.get("id", {})
            if (isinstance(ident, dict)
                    and str(ident.get("authority", "")).upper()
                    in ("EPSG", "OGC")):
                code = ident.get("code")
                if str(code).upper() == "CRS84":
                    epsg = 4326  # OGC:CRS84 is lon/lat WGS84
                else:
                    try:
                        epsg = int(code)
                    except (TypeError, ValueError):
                        raise GeoParquetError(
                            f"unparseable crs id {ident!r} in {fp}"
                        ) from None
        cur = {
            "version": geo.get("version"),
            "primary_column": col,
            "encoding": "WKB",
            "crs_epsg": epsg,
            "geometry_types": set(cmeta.get("geometry_types", [])),
            "bbox": cmeta.get("bbox"),
            "n_files": 1,
        }
        if merged is None:
            merged = cur
            continue
        if (merged["primary_column"], merged["crs_epsg"]) != (
            col, epsg,
        ):
            raise GeoParquetError(
                f"inconsistent geo metadata across files under {path}"
            )
        merged["geometry_types"] |= cur["geometry_types"]
        merged["n_files"] += 1
        if cur["bbox"]:
            b = merged["bbox"]
            merged["bbox"] = cur["bbox"] if not b else [
                min(b[0], cur["bbox"][0]), min(b[1], cur["bbox"][1]),
                max(b[2], cur["bbox"][2]), max(b[3], cur["bbox"][3]),
            ]
    merged["geometry_types"] = sorted(merged["geometry_types"])
    return merged


def read_geoparquet(spark, path: str):
    """GeoParquet file/dataset -> (DataFrame, metadata dict).

    The scan is a plain ``spark.read.parquet`` — fully distributed,
    predicate pushdown and column pruning intact (a filter on the
    ``covering`` bbox struct prunes row groups via parquet min/max
    statistics). The metadata comes from :func:`geoparquet_metadata`.
    """
    meta = geoparquet_metadata(path)
    return spark.read.parquet(path), meta
