"""Target-grid planning: GeoBox, grid snapping, GeoBoxMaker.

Reference semantics: geocube/geo_utils/geobox.py:102-210 (GeoBoxMaker)
and odc-geo ``GeoBox.from_geopolygon``. The snap rule is calibrated
against the reference's one exact, currently-maintained assertion
(test_core_integration.py:789-798, ``test_make_geocube__new_bounds_crs``):
the data bbox (1665478.4998, 7018306.670, 1665944.861, 7018508.452) at
resolution (-1, 1) must snap OUTWARD to (1665478, 7018306, 1665945,
7018509).  (The older golden-file bounds in test_vector.py:24 derive
from a historically different test polygon and are not reproducible
from the current fixture coordinates with any single snap rule — we
verified this by reverse-engineering both candidate rules against
independent transverse-Mercator math.)

These are driver-side planning objects: a GeoBox is tiny metadata that
gets broadcast to executors; per-tile sub-grids are sliced from it.
"""

from __future__ import annotations

import json
import math
import warnings
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..geometry import wkb as W
from ..geometry.affine import Affine, affine_to_coords
from ..geometry.crs import CRS, transform as crs_transform

_EPS_PIX = 1e-6  # half-open [x0, x1) fuzz, in pixel units


def _norm_yx(value):
    """Normalize resolution/align input to (y, x), reference resyx_.

    The reference accepts a scalar or an iterable ordered (y, x)
    (geobox.py:140-143); scalar r means (-r, r) per odc convention.
    """
    if value is None:
        return None
    if isinstance(value, (int, float)):
        return (-abs(float(value)), abs(float(value)))
    vals = list(value)
    if len(vals) != 2:
        raise ValueError(f"expected 2 values (y, x), got {vals!r}")
    return (float(vals[0]), float(vals[1]))


def snap_bounds(bounds, resolution_yx, align_yx=None):
    """Snap a world bbox outward onto the resolution grid.

    Returns (affine, width, height). ``resolution_yx`` is (ry, rx) with
    ry typically negative (north-up). ``align_yx`` shifts the grid
    lattice (units of the CRS), default (0, 0).
    """
    minx, miny, maxx, maxy = bounds
    ry, rx = resolution_yx
    ay, ax = align_yx if align_yx is not None else (0.0, 0.0)
    if rx == 0 or ry == 0:
        raise ValueError("resolution must be non-zero")

    arx = abs(rx)
    offx = math.floor((minx - ax) / arx) * arx + ax
    width = max(1, int(math.ceil((maxx - offx) / arx - _EPS_PIX)))

    ary = abs(ry)
    if ry < 0:
        # origin at the top (north-up)
        offy = math.ceil((maxy - ay) / ary) * ary + ay
        height = max(1, int(math.ceil((offy - miny) / ary - _EPS_PIX)))
    else:
        offy = math.floor((miny - ay) / ary) * ary + ay
        height = max(1, int(math.ceil((maxy - offy) / ary - _EPS_PIX)))

    affine = Affine(rx, 0.0, offx, 0.0, ry, offy)
    return affine, width, height


@dataclass(frozen=True)
class GeoBox:
    """The target grid: pure metadata, no pixels (SURVEY.md §1.1)."""

    width: int
    height: int
    affine: Affine
    crs: CRS

    @property
    def shape(self):
        return (self.height, self.width)

    @property
    def resolution_yx(self):
        return (self.affine.e, self.affine.a)

    def bounds(self):
        xs, ys = [], []
        for col, row in ((0, 0), (self.width, 0), (0, self.height), (self.width, self.height)):
            x, y = self.affine.xy(col, row)
            xs.append(x)
            ys.append(y)
        return (min(xs), min(ys), max(xs), max(ys))

    def coords(self):
        """Cell-center coordinate vectors {x:…, y:…}."""
        return affine_to_coords(self.affine, self.width, self.height)

    def tile(self, row0: int, col0: int, h: int, w: int) -> "GeoBox":
        """Sub-grid window (used per raster chunk)."""
        ox, oy = self.affine.xy(col0, row0)
        sub = Affine(self.affine.a, self.affine.b, ox,
                     self.affine.d, self.affine.e, oy)
        return GeoBox(w, h, sub, self.crs)

    def tile_grid(self, tile_size: int):
        """Yield (tile_id, row0, col0, h, w) covering the grid.

        tile_id = ty * n_tiles_x + tx — a dense, orderable key used for
        the shuffle / Iceberg partitioning on (zoom, cell_id).
        """
        ntx = (self.width + tile_size - 1) // tile_size
        nty = (self.height + tile_size - 1) // tile_size
        for ty in range(nty):
            for tx in range(ntx):
                row0 = ty * tile_size
                col0 = tx * tile_size
                h = min(tile_size, self.height - row0)
                w = min(tile_size, self.width - col0)
                yield (ty * ntx + tx, row0, col0, h, w)

    def n_tiles(self, tile_size: int):
        ntx = (self.width + tile_size - 1) // tile_size
        nty = (self.height + tile_size - 1) // tile_size
        return ntx * nty, ntx, nty

    def to_dict(self):
        # crs ships as its .spec string ("epsg:N" or canonical proj4
        # for parameterized CRSs) so executor processes can rebuild a
        # CRS the registry has never heard of; from_dict also accepts
        # the bare EPSG int older checkpoints recorded.
        return {
            "width": self.width,
            "height": self.height,
            "affine": self.affine.tolist(),
            "crs": self.crs.spec,
        }

    @staticmethod
    def from_dict(d) -> "GeoBox":
        crs = d["crs"]
        return GeoBox(
            int(d["width"]),
            int(d["height"]),
            Affine(*d["affine"]),
            CRS(int(crs)) if not isinstance(crs, str)
            else CRS.from_user_input(crs),
        )

    @staticmethod
    def from_bounds(bounds, resolution_yx, crs, align_yx=None) -> "GeoBox":
        affine, width, height = snap_bounds(bounds, resolution_yx, align_yx)
        return GeoBox(width, height, affine, CRS.from_user_input(crs))


def densified_reproject_bounds(bounds, src: CRS, dst: CRS, n: int = 21):
    """Reproject a bbox capturing edge curvature (odc to_crs densify)."""
    minx, miny, maxx, maxy = bounds
    t = np.linspace(0.0, 1.0, n)
    ex = np.concatenate(
        [
            minx + (maxx - minx) * t,
            np.full(n, maxx),
            maxx + (minx - maxx) * t,
            np.full(n, minx),
        ]
    )
    ey = np.concatenate(
        [
            np.full(n, miny),
            miny + (maxy - miny) * t,
            np.full(n, maxy),
            maxy + (miny - maxy) * t,
        ]
    )
    x, y = crs_transform(src, dst, ex, ey)
    return (float(x.min()), float(y.min()), float(x.max()), float(y.max()))


class GeoBoxMaker:
    """Delayed GeoBox construction, reference geobox.py:102-210.

    Stores partial parameters; ``from_bounds_crs`` resolves them once
    the data bounds / CRS are known (in Spark: after the cheap
    envelope-aggregation job, SURVEY.md §2.4 "Bounds aggregate").
    """

    def __init__(self, *, output_crs=None, resolution=None, align=None,
                 geom=None, like=None):
        self.output_crs = output_crs
        self.resolution = _norm_yx(resolution)
        self.align = _norm_yx(align) if align is not None else None
        if isinstance(geom, str):
            geom = json.loads(geom)
        self.geom = geom
        self.like = like

    def from_bounds_crs(self, data_bounds, data_crs) -> GeoBox:
        """Resolve the GeoBox.

        data_bounds: total_bounds of the vector table in data_crs
        (already computed by a Spark agg job); ignored when ``like`` or
        ``geom`` is given.
        """
        if self.like is not None:
            # reference geobox.py:169-186: 'like' is mutually exclusive
            assert self.output_crs is None, \
                "'like' and 'output_crs' are not supported together"
            assert self.resolution is None, \
                "'like' and 'resolution' are not supported together"
            assert self.align is None, \
                "'like' and 'align' are not supported together"
            like = self.like
            if isinstance(like, GeoBox):
                return like
            if isinstance(like, dict):
                return GeoBox.from_dict(like)
            if isinstance(like, str):
                return geobox_from_path(like)
            raise ValueError(f"unsupported 'like' value: {like!r}")

        if self.resolution is None:
            # reference geobox.py:188-189
            raise RuntimeError(
                "Must specify 'resolution' if 'like' not specified."
            )

        if self.output_crs:
            crs = CRS.from_user_input(self.output_crs)
        else:
            crs = CRS.from_user_input(data_crs)

        if self.geom is None:
            data_crs = CRS.from_user_input(data_crs)
            if crs != data_crs:
                bounds = densified_reproject_bounds(data_bounds, data_crs, crs)
            else:
                bounds = data_bounds
        else:
            # reference geobox.py:204-209: geom CRS default EPSG:4326,
            # honoring {"crs":{"properties":{"name": ...}}}
            crs_input = "EPSG:4326"
            if isinstance(self.geom, dict) and "crs" in self.geom:
                crs_input = self.geom["crs"]["properties"]["name"]
            geom_crs = CRS.from_user_input(crs_input)
            g = W.from_geojson(self.geom)
            gb = g.bounds()
            if geom_crs != crs:
                bounds = densified_reproject_bounds(gb, geom_crs, crs)
            else:
                bounds = gb

        return GeoBox.from_bounds(bounds, self.resolution, crs, self.align)


def validate_vector_schema(columns, geometry_column: str, n_rows: Optional[int] = None):
    """Reference input validation, geobox.py:78-98.

    Raises VectorDataError for empty input / missing geometry column;
    returns the assumed CRS warning behavior to the caller.
    """
    from ..exceptions import VectorDataError

    if n_rows is not None and n_rows == 0:
        raise VectorDataError("Empty GeoDataFrame.")
    if geometry_column not in columns:
        raise VectorDataError(
            f"'geometry' column missing in the vector data: {geometry_column!r}"
        )


def assume_crs_if_missing(crs) -> CRS:
    """Missing CRS → warn + assume EPSG:4326 (reference geobox.py:92-98)."""
    if crs is None:
        warnings.warn(
            "Projection not defined. Setting to EPSG:4326 (lat-lon).",
            UserWarning,
        )
        return CRS(4326)
    return CRS.from_user_input(crs)


def geobox_from_path(path: str) -> GeoBox:
    """Grid of an existing raster file — the ONE dispatch point for
    string `like=` values (reference CLI `-l previous_output.nc`
    parity, plus `like=<rioxarray raster>` as a GeoTIFF path): .tif
    via the pure-Python TIFF reader, anything else as netCDF via the
    pure-Python HDF5 reader."""
    if path.lower().endswith((".tif", ".tiff")):
        from ..sources.geotiff import geobox_from_geotiff

        return geobox_from_geotiff(path)
    return geobox_from_netcdf(path)


def geobox_from_netcdf(path: str) -> GeoBox:
    """Grid of an existing netCDF output (reference `like=` / CLI `-l`
    parity, test_core_integration.py:279-296): x/y coordinate vars give
    the affine, `spatial_ref`'s WKT gives the CRS. Read by the
    pure-Python HDF5 reader — no h5py/netCDF4 needed."""
    from ..sources.hdf5 import open_netcdf

    f = open_netcdf(path)
    if "x" not in f.datasets or "y" not in f.datasets:
        raise ValueError(f"{path}: no x/y coordinate variables")
    x = np.asarray(f.datasets["x"].values, dtype=np.float64)
    y = np.asarray(f.datasets["y"].values, dtype=np.float64)
    if len(x) < 2 or len(y) < 2:
        raise ValueError(f"{path}: degenerate grid {len(y)}x{len(x)}")
    rx = float(x[1] - x[0])
    ry = float(y[1] - y[0])
    affine = Affine(rx, 0.0, float(x[0]) - rx / 2.0,
                    0.0, ry, float(y[0]) - ry / 2.0)
    crs = CRS(4326)
    sr = f.datasets.get("spatial_ref")
    if sr is not None:
        wkt = sr.attrs.get("crs_wkt") or sr.attrs.get("spatial_ref")
        if wkt:
            crs = CRS.from_user_input(wkt)
    return GeoBox(len(x), len(y), affine, crs)
