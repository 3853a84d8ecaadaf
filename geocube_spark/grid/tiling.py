"""Global hierarchical tile indexing (H3/S2-style, closed form).

The north rule calls for H3/S2 tile indexing of document geometries.
Without the native H3/S2 libraries, the engine uses two public,
deterministic, hierarchy-preserving schemes with the same role
(equal-area-ish spatial bucketing + prefix hierarchy):

* **equirect quadkey** — zoom-z lat/lon grid, cell = (floor((lon+180)/
  360*2^z), floor((90-lat)/180*2^z)), id packed as y*2^z + x. Pure
  arithmetic, SQL-expressible (oracle-checkable in DuckDB), stable
  across engines.
* **web-mercator XYZ** (slippy scheme) for mercator-aligned workloads.

Both are exposed as vectorized numpy functions (used in pandas UDFs)
and as Spark Column expressions (JVM-side, codegen-friendly) — the
Column form is the hot path for cover joins at scale since it never
leaves Tungsten.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


# -- numpy forms -------------------------------------------------------------

def equirect_cell(lon, lat, zoom: int):
    """(xtile, ytile) at zoom z on the equirectangular grid."""
    n = float(1 << zoom)
    x = np.clip(np.floor((np.asarray(lon) + 180.0) / 360.0 * n), 0, n - 1)
    y = np.clip(np.floor((90.0 - np.asarray(lat)) / 180.0 * n), 0, n - 1)
    return x.astype(np.int64), y.astype(np.int64)


def equirect_cell_id(lon, lat, zoom: int):
    x, y = equirect_cell(lon, lat, zoom)
    return y * (1 << zoom) + x


def mercator_cell(lon, lat, zoom: int):
    """Slippy-map XYZ tile of a lon/lat point."""
    n = float(1 << zoom)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.05112878, 85.05112878)
    x = np.clip(np.floor((np.asarray(lon) + 180.0) / 360.0 * n), 0, n - 1)
    latr = np.radians(lat)
    y = np.clip(
        np.floor((1.0 - np.arcsinh(np.tan(latr)) / np.pi) / 2.0 * n), 0, n - 1
    )
    return x.astype(np.int64), y.astype(np.int64)


def parent_cell_id(cell_id, zoom: int, parent_zoom: int):
    """Hierarchy: the ancestor cell at a coarser zoom."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    n = 1 << zoom
    y, x = cell_id // n, cell_id % n
    shift = zoom - parent_zoom
    return (y >> shift) * (1 << parent_zoom) + (x >> shift)


# -- Spark Column forms (JVM-side, no Python) --------------------------------

def equirect_cell_id_col(lon: Column, lat: Column, zoom: int) -> Column:
    n = F.lit(float(1 << zoom))
    x = F.least(
        n - 1, F.greatest(F.lit(0.0), F.floor((lon + 180.0) / 360.0 * n))
    ).cast("long")
    y = F.least(
        n - 1, F.greatest(F.lit(0.0), F.floor((90.0 - lat) / 180.0 * n))
    ).cast("long")
    return (y * (1 << zoom) + x).alias("cell_id")
