"""The pluggable rasterize-function contract (reference §2.9 parity).

The reference's extension point is any callable

    f(*, geometry_array, data_values, geobox, grid_coords, fill,
      **ignored_kwargs) -> ndarray | None

(/root/reference/geocube/api/core.py:35,89-91 and
vector_to_cube.py:164-197; the built-ins accept/ignore extras via
``**ignored_kwargs`` so users compose with ``functools.partial``,
test_core_integration.py:801-816). Returning None skips the band.

This module provides the three built-ins as genuine callables with
that exact signature — users pass them (or their own functions,
usually via ``functools.partial``) to ``make_geocube`` and the engine
executes them once per (measurement, group) partition, parallel
across bands/groups, exactly as the reference loops over them
single-node. ``geometry_array`` holds engine Geometry objects in the
grid CRS; ``data_values`` a float64 ndarray aligned with it.
"""

from __future__ import annotations

import numpy as np

from .interpolate import griddata_interp, rbf_interp
from .rasterize import rasterize


def _to_pixel(geoms, geobox):
    inv = geobox.affine.invert()

    def _tx(x, y):
        return (
            inv.c + inv.a * x + inv.b * y,
            inv.f + inv.d * x + inv.e * y,
        )

    return [g.transform(_tx) for g in geoms]


def _filter_nan(geometry_array, values, filter_nan):
    values = np.asarray(values, dtype=np.float64)
    if not filter_nan:
        return geometry_array, values
    keep = ~np.isnan(values)
    return [g for g, k in zip(geometry_array, keep) if k], values[keep]


def rasterize_image(*, geometry_array, data_values, geobox, grid_coords,
                    fill, merge_alg="replace", all_touched=False,
                    filter_nan=False, **ignored_kwargs):
    """Scanline burn (reference rasterize.py:67-133 equivalent)."""
    geoms, values = _filter_nan(geometry_array, data_values, filter_nan)
    h, w = geobox.shape
    return rasterize(
        _to_pixel(geoms, geobox), values, h, w, fill=fill,
        merge_alg=merge_alg, all_touched=all_touched,
    )


def rasterize_points_griddata(*, geometry_array, data_values, geobox,
                              grid_coords, fill, method="nearest",
                              rescale=False, filter_nan=False,
                              **ignored_kwargs):
    """Point interpolation (reference rasterize.py:136-191 equivalent)."""
    geoms, values = _filter_nan(geometry_array, data_values, filter_nan)
    xs, ys, vs = [], [], []
    for g, v in zip(geoms, values):
        for p in g.points():
            xs.append(p[0])
            ys.append(p[1])
            vs.append(v)
    return griddata_interp(
        np.asarray(xs), np.asarray(ys), np.asarray(vs),
        grid_coords["x"], grid_coords["y"],
        method=method, fill=fill, rescale=rescale,
    )


def rasterize_points_radial(*, geometry_array, data_values, geobox,
                            grid_coords, fill, method="linear",
                            filter_nan=False, **ignored_kwargs):
    """RBF interpolation (reference rasterize.py:194-239 equivalent)."""
    geoms, values = _filter_nan(geometry_array, data_values, filter_nan)
    xs, ys, vs = [], [], []
    for g, v in zip(geoms, values):
        for p in g.points():
            xs.append(p[0])
            ys.append(p[1])
            vs.append(v)
    return rbf_interp(
        np.asarray(xs), np.asarray(ys), np.asarray(vs),
        grid_coords["x"], grid_coords["y"], function=method,
    )
