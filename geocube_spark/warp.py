"""Distributed raster -> raster warp (reproject / regrid).

The reference ecosystem finishes raster alignment with
``rioxarray.reproject_match`` (GDAL warp on one node). Here the cube
is a chunk table, so the warp is a three-step distributed plan:

1. TILE PLAN (vectorized mapInPandas, O(tiles) not O(cells)): each
   target tile's footprint is densified, transformed to the source
   CRS, and converted to a covering SOURCE tile range -> a pair table
   (src_tile_id, tgt_tile).
2. ONE equi-shuffle joining source chunks to the target tiles that
   need them (each target cell lies in exactly one source tile, so
   the join fan-out is the footprint overlap, never a cross join).
3. GATHER (grouped numpy): per (measurement, group, target tile),
   transform the target cell centers to source pixel space and gather
   nearest-neighbor values from the delivered source chunks; cells
   outside the source grid take the band fill.

The plan is the same one GDAL uses per-window, lifted to a shuffle:
it scales with output tiles x overlap, holds one tile group in memory
per task, and reuses the engine's closed-form CRS kernels
(geometry/crs.py) on both sides.
"""

from __future__ import annotations

from typing import Iterator, Optional, Union

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from .cube import CHUNK_SCHEMA, BandMeta, GeoCube, _grouped_map, _zoom_for
from .geometry.crs import CRS, transform as crs_transform
from .grid.geobox import GeoBox


def _resolve_geobox(like) -> GeoBox:
    if isinstance(like, GeoBox):
        return like
    if isinstance(like, dict):
        return GeoBox.from_dict(like)
    if isinstance(like, str):
        from .grid.geobox import geobox_from_path

        return geobox_from_path(like)
    raise ValueError(f"unsupported 'like' value: {like!r}")


def warp(cube: GeoCube, like, *, method: str = "nearest",
         tile_size: Optional[int] = None) -> GeoCube:
    """Regrid ``cube`` onto the grid of ``like`` (GeoBox, dict, or a
    .tif/.nc path), reprojecting between CRSs when they differ.

    ``method``: 'nearest' (categorical-safe, the default), 'bilinear'
    (continuous fields; 4-neighbor weighted average with
    renormalization — neighbors beyond the raster edge OR carrying
    nodata (band fill / NaN) drop out and the remaining weights
    rescale, GDAL's warp-with-nodata behavior; an all-nodata
    neighborhood stays fill), or 'cubic' (Keys a=-1/2 bicubic, the
    GDAL 'cubic' kernel: separable 4x4 convolution that reproduces
    quadratic fields exactly; cells whose 16-point support is not
    fully data — raster borders, nodata boundaries — fall back to
    the renormalized bilinear value, keeping negative cubic weights
    away from partial neighborhoods). Returns a new
    GeoCube on the target grid; cells outside the source raster take
    each band's fill."""
    if method not in ("nearest", "bilinear", "cubic"):
        raise NotImplementedError(
            f"warp method {method!r}; 'nearest', 'bilinear' and "
            "'cubic' are implemented"
        )
    src_gb = cube.geobox
    dst_gb = _resolve_geobox(like)
    ts = int(tile_size or cube.tile_size)
    src_ts = cube.tile_size
    _, s_ntx, s_nty = src_gb.n_tiles(src_ts)
    _, d_ntx, d_nty = dst_gb.n_tiles(ts)
    zoom = _zoom_for(dst_gb, ts)
    src_dict = src_gb.to_dict()
    dst_dict = dst_gb.to_dict()
    spark = cube.chunks.sparkSession
    sc = spark.sparkContext

    # ---- stage 1: target-tile -> source-tile pair plan (O(tiles)) ----
    # the tile list itself is generated DISTRIBUTED (spark.range):
    # a 10^12-cell target grid has ~15M tiles — too many rows to
    # materialize on the driver, trivial for a range scan
    n_dst_tiles = d_ntx * d_nty
    tiles = spark.range(n_dst_tiles).select(
        F.col("id").alias("tgt_tile_id"),
        ((F.col("id") / d_ntx).cast("int") * ts).alias("trow0"),
        ((F.col("id") % d_ntx).cast("int") * ts).alias("tcol0"),
        F.least(F.lit(ts),
                dst_gb.height - (F.col("id") / d_ntx).cast("int") * ts)
        .cast("int").alias("th"),
        F.least(F.lit(ts),
                dst_gb.width - (F.col("id") % d_ntx).cast("int") * ts)
        .cast("int").alias("tw"),
    )

    def _plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sgb = GeoBox.from_dict(src_dict)
        dgb = GeoBox.from_dict(dst_dict)
        inv = sgb.affine.invert()
        reproject = sgb.crs != dgb.crs
        s, d = sgb.crs, dgb.crs
        # densified border of the target tile in PIXEL space (9 points
        # per edge captures projection curvature like the bounds path)
        t = np.linspace(0.0, 1.0, 9)
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                c0, r0 = float(r.tcol0), float(r.trow0)
                c1, r1 = c0 + float(r.tw), r0 + float(r.th)
                ex = np.concatenate(
                    [c0 + (c1 - c0) * t, np.full(9, c1),
                     c1 + (c0 - c1) * t, np.full(9, c0)]
                )
                ey = np.concatenate(
                    [np.full(9, r0), r0 + (r1 - r0) * t,
                     np.full(9, r1), r1 + (r0 - r1) * t]
                )
                a = dgb.affine
                wx = a.c + a.a * ex + a.b * ey
                wy = a.f + a.d * ex + a.e * ey
                if reproject:
                    try:
                        wx, wy = crs_transform(d, s, wx, wy)
                    except Exception:
                        continue  # tile outside the src CRS domain
                px = inv.c + inv.a * wx + inv.b * wy
                py = inv.f + inv.d * wx + inv.e * wy
                # the crs kernels RETURN NaN for out-of-domain points
                # rather than raising — drop NaN border points, skip a
                # fully-outside tile (int(floor(nan)) would raise)
                ok = np.isfinite(px) & np.isfinite(py)
                if not ok.any():
                    continue
                px, py = px[ok], py[ok]
                # margin absorbs border rounding + the resampler's
                # neighbor reach (cubic needs 2 source cells)
                mg = 2.0 if method == "cubic" else 1.0
                tx0 = max(0, int(np.floor((px.min() - mg) / src_ts)))
                tx1 = min(s_ntx - 1, int(np.floor((px.max() + mg) / src_ts)))
                ty0 = max(0, int(np.floor((py.min() - mg) / src_ts)))
                ty1 = min(s_nty - 1, int(np.floor((py.max() + mg) / src_ts)))
                if tx1 < tx0 or ty1 < ty0:
                    continue
                for sy in range(ty0, ty1 + 1):
                    for sx in range(tx0, tx1 + 1):
                        out.append(
                            (sy * s_ntx + sx, r.tgt_tile_id, r.trow0,
                             r.tcol0, r.th, r.tw)
                        )
            if out:
                yield pd.DataFrame(
                    out, columns=["tile_id", "tgt_tile_id", "trow0",
                                  "tcol0", "th", "tw"],
                )

    n_plan = max(1, min(n_dst_tiles, sc.defaultParallelism))
    pairs = (
        tiles.repartition(n_plan)
        .mapInPandas(
            _plan,
            schema="tile_id long, tgt_tile_id long, trow0 int, "
                   "tcol0 int, th int, tw int",
        )
    )

    # ---- stage 2: ship source chunks to their target tiles ----------
    joined = cube.chunks.join(pairs, "tile_id")

    # ---- stage 3: nearest-neighbor gather per target tile -----------
    fills = {m: float(b.fill) for m, b in cube.bands.items()}

    def _gather(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sgb = GeoBox.from_dict(src_dict)
        dgb = GeoBox.from_dict(dst_dict)
        inv = sgb.affine.invert()
        reproject = sgb.crs != dgb.crs
        m = str(key[0])
        gkey = key[1]
        first = pdf.iloc[0]
        trow0, tcol0 = int(first["trow0"]), int(first["tcol0"])
        th, tw = int(first["th"]), int(first["tw"])
        # target cell centers -> source fractional pixels
        cols = tcol0 + 0.5 + np.arange(tw, dtype=np.float64)
        rows = trow0 + 0.5 + np.arange(th, dtype=np.float64)
        cc, rr = np.meshgrid(cols, rows)
        a = dgb.affine
        wx = a.c + a.a * cc.ravel() + a.b * rr.ravel()
        wy = a.f + a.d * cc.ravel() + a.e * rr.ravel()
        if reproject:
            wx, wy = crs_transform(dgb.crs, sgb.crs, wx, wy)
        px = inv.c + inv.a * wx + inv.b * wy
        py = inv.f + inv.d * wx + inv.e * wy

        if method == "nearest":
            sc_ = np.floor(px).astype(np.int64)
            sr = np.floor(py).astype(np.int64)
            band = np.full(th * tw, fills[m], dtype=np.float64)
            for crow in pdf.itertuples(index=False):
                row0, col0 = int(crow.row0), int(crow.col0)
                h, w = int(crow.h), int(crow.w)
                lr = sr - row0
                lc = sc_ - col0
                k = (lr >= 0) & (lr < h) & (lc >= 0) & (lc < w)
                if k.any():
                    vals = np.asarray(crow.values, dtype=np.float64)
                    band[k] = vals[lr[k] * w + lc[k]]
        elif method == "cubic":
            # Keys a=-1/2 bicubic: separable 4x4 convolution. Cubic
            # and bilinear accumulators run together; a target cell
            # uses the cubic value only when ALL 16 support points
            # are in-raster data (negative lobe weights are unsafe to
            # renormalize over partial neighborhoods), else the
            # renormalized bilinear value, else fill.
            gx = px - 0.5
            gy = py - 0.5
            x0 = np.floor(gx).astype(np.int64)
            y0 = np.floor(gy).astype(np.int64)
            tx = gx - x0
            ty = gy - y0

            def _keys(t):
                # |t| <= 1: 1.5|t|^3 - 2.5|t|^2 + 1
                # 1 < |t| < 2: -0.5(|t|^3 - 5|t|^2 + 8|t| - 4)
                t = np.abs(t)
                w = np.zeros_like(t)
                m1 = t <= 1.0
                w[m1] = ((1.5 * t[m1] - 2.5) * t[m1] * t[m1] + 1.0)
                m2 = ~m1 & (t < 2.0)
                tt = t[m2]
                w[m2] = -0.5 * (((tt - 5.0) * tt + 8.0) * tt - 4.0)
                return w

            wxs = [_keys(tx + 1.0), _keys(tx), _keys(1.0 - tx),
                   _keys(2.0 - tx)]
            wys = [_keys(ty + 1.0), _keys(ty), _keys(1.0 - ty),
                   _keys(2.0 - ty)]
            csum = np.zeros(th * tw, dtype=np.float64)
            ccnt = np.zeros(th * tw, dtype=np.int64)
            bsum = np.zeros(th * tw, dtype=np.float64)
            bacc = np.zeros(th * tw, dtype=np.float64)
            bl = [
                (y0, x0, (1.0 - tx) * (1.0 - ty)),
                (y0, x0 + 1, tx * (1.0 - ty)),
                (y0 + 1, x0, (1.0 - tx) * ty),
                (y0 + 1, x0 + 1, tx * ty),
            ]
            for crow in pdf.itertuples(index=False):
                row0, col0 = int(crow.row0), int(crow.col0)
                h, w = int(crow.h), int(crow.w)
                vals = np.asarray(crow.values, dtype=np.float64)
                for dy in range(-1, 3):
                    lr = y0 + dy - row0
                    rk = (lr >= 0) & (lr < h)
                    if not rk.any():
                        continue
                    for dx in range(-1, 3):
                        lc = x0 + dx - col0
                        k = rk & (lc >= 0) & (lc < w)
                        if not k.any():
                            continue
                        vv = vals[lr[k] * w + lc[k]]
                        good = ~np.isnan(vv)
                        if not np.isnan(fills[m]):
                            good &= vv != fills[m]
                        if not good.any():
                            continue
                        ki = np.flatnonzero(k)[good]
                        wt = wys[dy + 1][ki] * wxs[dx + 1][ki]
                        csum[ki] += wt * vv[good]
                        ccnt[ki] += 1
                for nr, ncl, wt in bl:
                    lr = nr - row0
                    lc = ncl - col0
                    k = (lr >= 0) & (lr < h) & (lc >= 0) & (lc < w)
                    k &= wt > 0.0
                    if not k.any():
                        continue
                    vv = vals[lr[k] * w + lc[k]]
                    good = ~np.isnan(vv)
                    if not np.isnan(fills[m]):
                        good &= vv != fills[m]
                    if not good.any():
                        continue
                    ki = np.flatnonzero(k)[good]
                    bsum[ki] += wt[ki] * vv[good]
                    bacc[ki] += wt[ki]
            band = np.full(th * tw, fills[m], dtype=np.float64)
            part = bacc > 0.0
            band[part] = bsum[part] / bacc[part]
            full = ccnt == 16
            band[full] = csum[full]
        else:
            # bilinear: 4 neighbor pixel centers + weights; each
            # source chunk contributes the neighbors it holds and the
            # accumulated weight renormalizes at the end. Out-of-raster
            # AND nodata neighbors (band fill / NaN) drop out the same
            # way — GDAL's warp-with-nodata behavior — so data/nodata
            # boundaries interpolate from the data side only and an
            # all-nodata neighborhood stays fill
            gx = px - 0.5
            gy = py - 0.5
            x0 = np.floor(gx).astype(np.int64)
            y0 = np.floor(gy).astype(np.int64)
            tx = gx - x0
            ty = gy - y0
            nbrs = [
                (y0, x0, (1.0 - tx) * (1.0 - ty)),
                (y0, x0 + 1, tx * (1.0 - ty)),
                (y0 + 1, x0, (1.0 - tx) * ty),
                (y0 + 1, x0 + 1, tx * ty),
            ]
            wsum = np.zeros(th * tw, dtype=np.float64)
            wacc = np.zeros(th * tw, dtype=np.float64)
            for crow in pdf.itertuples(index=False):
                row0, col0 = int(crow.row0), int(crow.col0)
                h, w = int(crow.h), int(crow.w)
                vals = None
                for nr, ncl, wt in nbrs:
                    lr = nr - row0
                    lc = ncl - col0
                    k = (lr >= 0) & (lr < h) & (lc >= 0) & (lc < w)
                    k &= wt > 0.0
                    if not k.any():
                        continue
                    if vals is None:
                        vals = np.asarray(crow.values, dtype=np.float64)
                    vv = vals[lr[k] * w + lc[k]]
                    good = ~np.isnan(vv)
                    if not np.isnan(fills[m]):
                        good &= vv != fills[m]
                    if not good.any():
                        continue
                    ki = np.flatnonzero(k)[good]
                    wsum[ki] += wt[ki] * vv[good]
                    wacc[ki] += wt[ki]
            band = np.full(th * tw, fills[m], dtype=np.float64)
            covered = wacc > 0.0
            band[covered] = wsum[covered] / wacc[covered]
        return pd.DataFrame(
            [{
                "measurement": m, "group_key": gkey, "zoom": zoom,
                "tile_id": int(first["tgt_tile_id"]),
                "row0": trow0, "col0": tcol0, "h": th, "w": tw,
                "values": band, "n_geoms": 0,
                "n_cells_burned": int(th * tw),
                "min_seq": -1, "max_seq": -1,
            }],
            columns=[f.name for f in CHUNK_SCHEMA.fields],
        )

    keys = ["measurement", "group_key", "tgt_tile_id"]
    n_bands = max(1, len(cube.bands))
    n_groups = max(1, len(cube.group_keys or [None]))
    n_keys = d_ntx * d_nty * n_bands * n_groups
    # cap a partition at ~64 tile-groups (the grouped feed holds one
    # partition in memory) while still using every core on small grids
    n_parts = max(
        1, min(n_keys, max(4 * sc.defaultParallelism, n_keys // 64))
    )
    chunks = _grouped_map(joined, keys, n_parts, _gather, CHUNK_SCHEMA)

    bands = {
        m: BandMeta(name=m, dtype=b.dtype, fill=b.fill,
                    categories=b.categories, units=b.units)
        for m, b in cube.bands.items()
    }
    return GeoCube(
        chunks=chunks, geobox=dst_gb, bands=bands,
        group_by=cube.group_by, group_keys=cube.group_keys,
        tile_size=ts, fill=cube.fill,
    )
