"""GeoPackage source/sink — stdlib sqlite3, no GDAL.

A GeoPackage (OGC 12-128r18, public spec) is a SQLite database with
``gpkg_contents`` / ``gpkg_geometry_columns`` metadata tables and
feature tables whose geometry column holds GPB blobs: an 8-byte
header (magic 'GP', version, flags with an envelope-size indicator,
int32 srs_id) + optional envelope + standard WKB. The reference reads
these through geopandas/OGR (cli/geocube.py:69-75); this module
implements the container directly.

Distributed read: SQLite is a single file but supports concurrent
readers and rowid range scans, so the reader splits a layer into
rowid ranges (one Spark task each) — unlike the shapefile, a single
big GeoPackage DOES parallelize.
"""

from __future__ import annotations

import os
import sqlite3
import struct
from typing import Iterator

import numpy as np
import pandas as pd

from ..geometry import wkb as W

__all__ = [
    "read_geopackage", "write_geopackage", "gpb_to_wkb", "wkb_to_gpb",
    "list_layers",
]

_ENV_SIZE = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


class GeoPackageError(ValueError):
    pass


def gpb_to_wkb(blob) -> bytes:
    """GeoPackageBinary -> plain WKB (None/empty passes through)."""
    if blob is None:
        return None
    b = bytes(blob)
    if len(b) < 8 or b[:2] != b"GP":
        raise GeoPackageError("not a GPB blob (magic 'GP' missing)")
    flags = b[3]
    if flags & 0x20:
        raise GeoPackageError("extended GPB encoding not supported")
    env = _ENV_SIZE.get((flags >> 1) & 0x07)
    if env is None:
        raise GeoPackageError(f"invalid envelope indicator in flags {flags}")
    if flags & 0x10:   # empty-geometry flag
        return None
    return b[8 + env:]


def wkb_to_gpb(wkb: bytes, srs_id: int = 4326) -> bytes:
    """Plain WKB -> GPB blob (no envelope, little-endian srs_id)."""
    if wkb is None:
        return None
    return b"GP\x00\x01" + struct.pack("<i", srs_id) + bytes(wkb)


def list_layers(path: str) -> list:
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents "
            "WHERE data_type = 'features' ORDER BY table_name"
        ).fetchall()
    finally:
        con.close()
    return [r[0] for r in rows]


def _layer_meta(path: str, layer):
    con = sqlite3.connect(path)
    try:
        if layer is None:
            layers = [r[0] for r in con.execute(
                "SELECT table_name FROM gpkg_contents "
                "WHERE data_type = 'features' ORDER BY table_name"
            )]
            if len(layers) != 1:
                raise GeoPackageError(
                    f"{path!r} has {len(layers)} feature layers "
                    f"{layers}; pass layer="
                )
            layer = layers[0]
        row = con.execute(
            "SELECT column_name, srs_id FROM gpkg_geometry_columns "
            "WHERE table_name = ?", (layer,)
        ).fetchone()
        if row is None:
            raise GeoPackageError(f"layer {layer!r} not in "
                                  "gpkg_geometry_columns")
        geom_col, srs_id = row
        cols = [
            (r[1], (r[2] or "").upper())
            for r in con.execute(f'PRAGMA table_info("{layer}")')
        ]
        lo, hi = con.execute(
            f'SELECT min(rowid), max(rowid) FROM "{layer}"'
        ).fetchone()
    finally:
        con.close()
    return layer, geom_col, int(srs_id), cols, lo, hi


def read_geopackage(spark, path: str, layer: str = None,
                    id_prefix: str = "gpkg", n_splits: int = None):
    """GeoPackage feature layer -> vector-table DataFrame
    ``(doc_id, seq, geometry_wkb, <columns...>)``.

    ``seq`` is the SQLite rowid (the layer's stable insert order); the
    layer splits into ``n_splits`` rowid ranges read concurrently
    (default: the session's parallelism, capped so each split has
    >= 1024 rows).
    """
    from pyspark.sql import types as T

    layer, geom_col, srs_id, cols, lo, hi = _layer_meta(path, layer)
    if lo is None:
        raise GeoPackageError(f"layer {layer!r} is empty")

    def _sql_t(decl: str):
        if decl.startswith("INT"):
            return T.LongType(), "Int64"
        if decl in ("REAL", "DOUBLE", "FLOAT", "NUMERIC"):
            return T.DoubleType(), "float64"
        if decl.startswith("BOOL"):
            return T.BooleanType(), "boolean"
        return T.StringType(), "object"

    attr = [
        (name, *_sql_t(decl)) for name, decl in cols
        if name != geom_col and name.lower() != "fid"
        and name not in ("doc_id", "seq", "geometry_wkb")
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("geometry_wkb", T.BinaryType()),
        ]
        + [T.StructField(n, t) for n, t, _ in attr]
    )

    n_rows = hi - lo + 1
    if n_splits is None:
        n_splits = max(1, min(
            spark.sparkContext.defaultParallelism, n_rows // 1024 + 1
        ))
    bounds = np.linspace(lo, hi + 1, n_splits + 1).astype(np.int64)
    ranges = [
        (int(bounds[i]), int(bounds[i + 1]))
        for i in range(n_splits) if bounds[i] < bounds[i + 1]
    ]
    ranges_df = spark.createDataFrame(
        ranges, "lo long, hi long"
    ).repartition(len(ranges), "lo")
    stem = os.path.splitext(os.path.basename(path))[0]
    sel_cols = ", ".join(
        ["rowid", f'"{geom_col}"'] + [f'"{n}"' for n, _, _ in attr]
    )

    def _load(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        con = sqlite3.connect(path)
        try:
            for pdf in batches:
                for rlo, rhi in zip(pdf["lo"].values, pdf["hi"].values):
                    rows = con.execute(
                        f'SELECT {sel_cols} FROM "{layer}" '
                        "WHERE rowid >= ? AND rowid < ? ORDER BY rowid",
                        (int(rlo), int(rhi)),
                    ).fetchall()
                    if not rows:
                        continue
                    seqs = np.array([r[0] for r in rows], dtype=np.int64)
                    out = pd.DataFrame(
                        {
                            "doc_id": [
                                f"{id_prefix}-{stem}-{s}" for s in seqs
                            ],
                            "seq": seqs,
                            "geometry_wkb": [
                                gpb_to_wkb(r[1]) for r in rows
                            ],
                        }
                    )
                    for j, (n, _, pdt) in enumerate(attr):
                        vals = [r[2 + j] for r in rows]
                        out[n] = (
                            pd.Series(vals, dtype="object")
                            if pdt == "object"
                            else pd.array(vals, dtype=pdt)
                        )
                    yield out
        finally:
            con.close()

    return ranges_df.mapInPandas(_load, schema=schema)


def write_geopackage(df, path: str, layer: str = "features",
                     geometry_column: str = "geometry_wkb",
                     epsg: int = 4326, mode: str = "single"):
    """Vector-table DataFrame -> GeoPackage file(s).

    ``mode='single'`` (alias ``'file'``) collects to the driver and
    writes ONE .gpkg — SQLite allows only one writer, so a single file
    cannot be appended in parallel; right for small/medium outputs.
    ``mode='parts'`` is the distributed escape hatch (same contract as
    ``write_shapefile(mode='parts')`` / ``write_geotiff(mode='parts')``):
    every Spark partition writes its own complete, metadata-valid
    .gpkg under ``path``/part-N.gpkg on the executor, so nothing is
    ever materialized on the driver; returns the written paths.
    ``read_geopackage`` accepts any one part (or a glob loop) back.
    """
    if mode in ("single", "file"):
        return _write_gpkg_local(
            df.toPandas(), path, layer, geometry_column, epsg
        )
    if mode != "parts":
        raise ValueError(f"unknown mode {mode!r}")
    os.makedirs(path, exist_ok=True)
    from pyspark.sql import functions as F

    tagged = df.withColumn("__pid", F.spark_partition_id())

    def _per_part(key, pdf):
        pid = int(key[0])
        out = os.path.join(path, f"part-{pid:05d}.gpkg")
        _write_gpkg_local(
            pdf.drop(columns="__pid"), out, layer, geometry_column, epsg
        )
        return pd.DataFrame({"path": [out], "n": [len(pdf)]})

    written = (
        tagged.groupBy("__pid")
        .applyInPandas(_per_part, schema="path string, n long")
        .collect()
    )
    return [r["path"] for r in written]


def _write_gpkg_local(pdf: pd.DataFrame, path: str, layer: str,
                      geometry_column: str, epsg: int) -> str:
    """One pandas frame -> one complete GeoPackage (runs on the driver
    for mode='single', on each executor for mode='parts')."""
    cols = [c for c in pdf.columns if c != geometry_column]

    def _decl(s):
        if pd.api.types.is_bool_dtype(s):
            return "BOOLEAN"
        if pd.api.types.is_integer_dtype(s):
            return "INTEGER"
        if pd.api.types.is_float_dtype(s):
            return "REAL"
        return "TEXT"

    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.executescript(
            """
            PRAGMA application_id = 0x47504B47;
            PRAGMA user_version = 10300;
            CREATE TABLE gpkg_spatial_ref_sys (
              srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
              organization TEXT NOT NULL,
              organization_coordsys_id INTEGER NOT NULL,
              definition TEXT NOT NULL, description TEXT);
            CREATE TABLE gpkg_contents (
              table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
              identifier TEXT UNIQUE, description TEXT DEFAULT '',
              last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
              max_x DOUBLE, max_y DOUBLE, srs_id INTEGER);
            CREATE TABLE gpkg_geometry_columns (
              table_name TEXT NOT NULL, column_name TEXT NOT NULL,
              geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
              z TINYINT NOT NULL, m TINYINT NOT NULL,
              CONSTRAINT pk_geom_cols PRIMARY KEY
                (table_name, column_name));
            """
        )
        con.execute(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,NULL)",
            (f"EPSG:{epsg}", epsg, "EPSG", epsg, f"AUTHORITY EPSG {epsg}"),
        )
        col_ddl = ", ".join(
            [f'"{c}" {_decl(pdf[c])}' for c in cols] + ["geom BLOB"]
        )
        con.execute(f'CREATE TABLE "{layer}" '
                    f"(fid INTEGER PRIMARY KEY AUTOINCREMENT, {col_ddl})")
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
            " srs_id) VALUES (?, 'features', ?, ?)", (layer, layer, epsg)
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES "
            "(?, 'geom', 'GEOMETRY', ?, 0, 0)", (layer, epsg)
        )
        ph = ", ".join(["?"] * (len(cols) + 1))
        col_names = ", ".join([f'"{c}"' for c in cols] + ["geom"])
        rows = []
        for _, row in pdf.iterrows():
            vals = [
                None if pd.isna(row[c]) else
                (row[c].item() if hasattr(row[c], "item") else row[c])
                for c in cols
            ]
            b = row[geometry_column]
            vals.append(
                None if b is None else wkb_to_gpb(bytes(b), epsg)
            )
            rows.append(vals)
        con.executemany(
            f'INSERT INTO "{layer}" ({col_names}) VALUES ({ph})', rows
        )
        con.commit()
    finally:
        con.close()
    return path
