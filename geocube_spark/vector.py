"""Inverse path: raster chunks -> polygons (distributed vectorize).

Reference: geocube.vector.vectorize (/root/reference/geocube/vector.py:15-70)
— rasterio.features.shapes over a full in-memory band.

Spark strategy: components cannot be closed per-tile (a region may span
tiles), so each (measurement, group) band is assembled inside ONE
grouped-map task from its chunk rows and polygonized there — the same
memory profile as the reference's single-node pass, but parallel across
bands and groups. A per-tile + cross-tile-dissolve variant is the
documented scale-up path (SURVEY.md §7 step 7).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .cube import GeoCube
from .grid.geobox import GeoBox
from .kernels import vectorize as V

VECTOR_SCHEMA = T.StructType(
    [
        T.StructField("measurement", T.StringType()),
        T.StructField("group_key", T.StringType()),
        T.StructField("geometry_wkb", T.BinaryType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def vectorize(cube: GeoCube, measurement: str = None) -> DataFrame:
    """Polygonize cube bands -> DataFrame(measurement, group_key,
    geometry_wkb, value). Nodata cells excluded (vector.py:42-48)."""
    gb_dict = cube.geobox.to_dict()
    fills = {m: b.fill for m, b in cube.bands.items()}

    chunks = cube.chunks
    if measurement is not None:
        chunks = chunks.filter(F.col("measurement") == measurement)

    def _shapes(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gb = GeoBox.from_dict(gb_dict)
        m = str(key[0])
        gkey = key[1] if len(key) > 1 else None
        h, w = gb.shape
        nodata = fills[m]
        band = np.full((h, w), nodata, dtype=np.float64)
        for _, row in pdf.iterrows():
            band[
                row["row0"] : row["row0"] + row["h"],
                row["col0"] : row["col0"] + row["w"],
            ] = np.asarray(row["values"], dtype=np.float64).reshape(
                row["h"], row["w"]
            )
        out = []
        for geom, val in V.shapes(band, nodata=nodata, affine=gb.affine):
            out.append(
                {
                    "measurement": m,
                    "group_key": gkey,
                    "geometry_wkb": geom.to_wkb(),
                    "value": float(val),
                }
            )
        return pd.DataFrame(out, columns=[f.name for f in VECTOR_SCHEMA.fields])

    sc = chunks.sparkSession.sparkContext
    return (
        chunks.repartition(sc.defaultParallelism, "measurement", "group_key")
        .groupBy("measurement", "group_key")
        .applyInPandas(_shapes, schema=VECTOR_SCHEMA)
    )
