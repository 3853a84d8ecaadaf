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
from .geometry import wkb as W
from .geometry.wkb import Geometry, POLYGON
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


# ---------------------------------------------------------------------------
# distributed vectorize: per-tile polygonize + cross-tile dissolve
# (SURVEY.md §7 step 7 - the scale path for bands too big for one task)
# ---------------------------------------------------------------------------

_TILED_STAGE1 = T.StructType(
    [
        T.StructField("measurement", T.StringType()),
        T.StructField("group_key", T.StringType()),
        T.StructField("tile_id", T.LongType()),
        T.StructField("kind", T.StringType()),        # 'poly' | 'edge'
        T.StructField("label", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("geometry_wkb", T.BinaryType()),  # poly rows
        T.StructField("n_cells", T.LongType()),         # poly rows
        T.StructField("axis", T.StringType()),          # edge rows: h|v
        T.StructField("bcoord", T.LongType()),          # boundary line
        T.StructField("pos", T.LongType()),             # cell along line
        T.StructField("side", T.IntegerType()),         # 0 low / 1 high
    ]
)

TILED_VECTOR_SCHEMA = T.StructType(
    [
        T.StructField("measurement", T.StringType()),
        T.StructField("group_key", T.StringType()),
        T.StructField("component", T.StringType()),
        T.StructField("geometry_wkb", T.BinaryType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n_cells", T.LongType()),
        T.StructField("n_parts", T.IntegerType()),
    ]
)


def vectorize_tiled(cube: GeoCube, measurement: str = None) -> DataFrame:
    """Distributed raster -> vector: each TILE polygonizes locally
    (parallel across tiles x bands x groups), then components touching
    across tile borders are dissolved globally.

    Components that span tiles come back as one MULTIPOLYGON row whose
    parts are the tile-clipped pieces: identical cell set, value, and
    component structure as the single-task ``vectorize`` (the
    `test_vectorize_tiled_matches_single` parity test asserts equal
    per-value component cell-count multisets), with memory per task
    bounded by tile size instead of band size.

    Dissolve plan: border-cell rows (O(perimeter), tiny vs O(area))
    pair up across adjacent tiles by (boundary line, position, value);
    the resulting (tile,label)~(tile,label) edges - thousands, not
    billions - feed a driver-side union-find whose mapping is
    broadcast back. This mirrors how Iceberg keeps partition-level
    metadata small relative to data."""
    gb_dict = cube.geobox.to_dict()
    fills = {m: b.fill for m, b in cube.bands.items()}
    tile_size = cube.tile_size

    chunks = cube.chunks
    if measurement is not None:
        chunks = chunks.filter(F.col("measurement") == measurement)
    spark = chunks.sparkSession
    sc = spark.sparkContext

    def _stage1(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gb = GeoBox.from_dict(gb_dict)
        m = str(key[0])
        gkey = key[1]
        nodata = fills[m]
        out = []
        for _, row in pdf.iterrows():
            h, w = int(row["h"]), int(row["w"])
            row0, col0 = int(row["row0"]), int(row["col0"])
            tid = int(row["tile_id"])
            band = np.asarray(row["values"], dtype=np.float64).reshape(h, w)
            if isinstance(nodata, float) and np.isnan(nodata):
                mask = ~np.isnan(band)
            else:
                mask = band != nodata
            labels, n = V.label_components(band, mask)
            for lab in range(n):
                rc = np.argwhere(labels == lab)
                rings = V._trace_rings(rc)
                if not rings:
                    continue
                areas = [abs(V._ring_area(r)) for r in rings]
                ext = int(np.argmax(areas))
                ordered = [rings[ext]] + [
                    r for i, r in enumerate(rings) if i != ext
                ]
                world = [
                    np.column_stack(
                        gb.affine.xy(r[:, 0] + col0, r[:, 1] + row0)
                    )
                    for r in ordered
                ]
                out.append(
                    {
                        "measurement": m, "group_key": gkey,
                        "tile_id": tid, "kind": "poly", "label": lab,
                        "value": float(band[rc[0, 0], rc[0, 1]]),
                        "geometry_wkb": Geometry(POLYGON, world).to_wkb(),
                        "n_cells": int(len(rc)),
                        "axis": None, "bcoord": None, "pos": None,
                        "side": None,
                    }
                )
            # border cells -> adjacency probes. boundary line 'h',R sits
            # between global rows R and R+1; 'v',C between cols C, C+1
            def _edge_rows(local_rc, axis, bcoord, positions, side):
                for (lr, lc), p in zip(local_rc, positions):
                    lab = labels[lr, lc]
                    if lab < 0:
                        continue
                    out.append(
                        {
                            "measurement": m, "group_key": gkey,
                            "tile_id": tid, "kind": "edge",
                            "label": int(lab),
                            "value": float(band[lr, lc]),
                            "geometry_wkb": None, "n_cells": None,
                            "axis": axis, "bcoord": int(bcoord),
                            "pos": int(p), "side": side,
                        }
                    )

            cols = np.arange(w)
            rows_ = np.arange(h)
            _edge_rows(
                [(0, c) for c in cols], "h", row0 - 1, col0 + cols, 1
            )
            _edge_rows(
                [(h - 1, c) for c in cols], "h", row0 + h - 1, col0 + cols, 0
            )
            _edge_rows(
                [(r, 0) for r in rows_], "v", col0 - 1, row0 + rows_, 1
            )
            _edge_rows(
                [(r, w - 1) for r in rows_], "v", col0 + w - 1, row0 + rows_, 0
            )
        return pd.DataFrame(
            out, columns=[f.name for f in _TILED_STAGE1.fields]
        )

    stage1 = (
        chunks.repartition(
            4 * sc.defaultParallelism, "measurement", "group_key", "tile_id"
        )
        .groupBy("measurement", "group_key", "tile_id")
        .applyInPandas(lambda k, p: _stage1(k, p), schema=_TILED_STAGE1)
        .persist()
    )

    # adjacency: same boundary line+position+value, one side each
    edges = stage1.filter(F.col("kind") == "edge")
    pair_rows = (
        edges.groupBy("measurement", "group_key", "axis", "bcoord",
                      "pos", "value")
        .agg(
            F.collect_set(
                F.struct("side", "tile_id", "label")
            ).alias("ends")
        )
        .filter(F.size("ends") == 2)
        .select("measurement", "group_key", "ends")
        .distinct()
        .collect()
    )

    # driver union-find over (measurement, group, tile, label) nodes
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pair_rows:
        (s0, t0, l0), (s1, t1, l1) = [
            (e["side"], e["tile_id"], e["label"]) for e in r["ends"]
        ]
        if s0 == s1:
            continue  # same side twice = not an adjacency
        a = (r["measurement"], r["group_key"], t0, l0)
        b = (r["measurement"], r["group_key"], t1, l1)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    mapping = {k: find(k) for k in list(parent)}
    bmap = sc.broadcast(mapping)

    polys = stage1.filter(F.col("kind") == "poly")

    comp_schema = T.StructType(
        _TILED_STAGE1.fields[:1]
        + [_TILED_STAGE1.fields[1]]
        + [
            T.StructField("component", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("geometry_wkb", T.BinaryType()),
            T.StructField("n_cells", T.LongType()),
        ]
    )

    def _assign(batches):
        mp = bmap.value
        for pdf in batches:
            if not len(pdf):
                continue
            comps = []
            for _, r in pdf.iterrows():
                key = (
                    r["measurement"], r["group_key"],
                    int(r["tile_id"]), int(r["label"]),
                )
                root = mp.get(key, key)
                comps.append(f"{root[2]}:{root[3]}")
            yield pd.DataFrame(
                {
                    "measurement": pdf["measurement"],
                    "group_key": pdf["group_key"],
                    "component": comps,
                    "value": pdf["value"],
                    "geometry_wkb": pdf["geometry_wkb"],
                    "n_cells": pdf["n_cells"],
                }
            )

    assigned = polys.mapInPandas(_assign, schema=comp_schema)

    def _dissolve(key, pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [W.loads(bytes(b)) for b in pdf["geometry_wkb"]]
        if len(parts) == 1:
            geom = parts[0]
        else:
            geom = W.multipolygon([p.parts for p in parts])
        return pd.DataFrame(
            [
                {
                    "measurement": key[0],
                    "group_key": key[1],
                    "component": key[2],
                    "geometry_wkb": geom.to_wkb(),
                    "value": float(pdf["value"].iloc[0]),
                    "n_cells": int(pdf["n_cells"].sum()),
                    "n_parts": len(parts),
                }
            ],
            columns=[f.name for f in TILED_VECTOR_SCHEMA.fields],
        )

    return (
        assigned.repartition(
            sc.defaultParallelism, "measurement", "group_key", "component"
        )
        .groupBy("measurement", "group_key", "component")
        .applyInPandas(_dissolve, schema=TILED_VECTOR_SCHEMA)
    )
