"""Distributed post-operations on raster cubes.

The reference hands back an xarray ``Dataset`` and its users compute
derived bands, downsample, and summarize with xarray on one node
(every example in /root/reference/docs and test_core_integration.py
ends in Dataset math). At 100 TB the cube IS the chunk table, so these
re-express that post-processing as JVM-side Column programs over chunk
rows — no Python in the hot path, no driver collection:

* ``with_band``   element-wise band algebra (e.g. NDVI-style ratios)
  via ``zip_with``/``transform`` higher-order functions; tiles of the
  input bands are aligned with ONE equi-join on the tile key.
* ``coarsen``     f x f block aggregation (xarray ``.coarsen``):
  chunk-local by construction (tile_size % f == 0), so the plan is a
  narrow map — zero shuffle at any scale.
* ``band_stats``  per-(band, group) min/max/sum/mean/nodata-count:
  array HOFs per chunk + one tiny agg — the classic two-level
  (map-side partial) aggregation.
"""

from __future__ import annotations

import re
from typing import Callable, Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cube import BandMeta, GeoCube
from .geometry.affine import Affine
from .grid.geobox import GeoBox
from .plans.flatten import _flat

_LINEAGE = ["zoom", "row0", "col0", "h", "w"]


def with_band(cube: GeoCube, name: str, inputs: Sequence[str],
              fn: Callable, *, fill: float = float("nan")) -> GeoCube:
    """New band = ``fn`` applied element-wise to ``inputs`` bands.

    ``fn`` takes one Column per input (element values) and returns the
    output element Column — evaluated inside whole-stage codegen via
    ``transform`` (1 input), ``zip_with`` (2) or indexed ``transform``
    (3+). Tiles are aligned with one equi-join on
    (group_key, tile_id); with the cube's chunks already clustered by
    tile from the burn shuffle, AQE plans this as a local join.

    Returns a new GeoCube with the derived band appended (the input
    cube is unchanged)."""
    if name in cube.bands:
        raise ValueError(f"band {name!r} already exists")
    for m in inputs:
        if m not in cube.bands:
            raise ValueError(f"unknown input band {m!r}")
    c = cube.chunks
    keys = ["group_key", "tile_id"]
    first = c.filter(F.col("measurement") == inputs[0]).alias("b0")
    joined = first
    for i, m in enumerate(inputs[1:], start=1):
        nxt = c.filter(F.col("measurement") == m).alias(f"b{i}")
        cond = (
            F.col("b0.group_key").eqNullSafe(F.col(f"b{i}.group_key"))
            & (F.col("b0.tile_id") == F.col(f"b{i}.tile_id"))
        )
        joined = joined.join(nxt, cond, "inner")

    vals = [F.col(f"b{i}.values") for i in range(len(inputs))]
    if len(inputs) == 1:
        new_vals = F.transform(vals[0], fn)
    elif len(inputs) == 2:
        new_vals = F.zip_with(vals[0], vals[1], fn)
    else:
        new_vals = F.transform(
            F.sequence(F.lit(0), F.size(vals[0]) - 1),
            lambda i: fn(*[F.element_at(v, i + 1) for v in vals]),
        )

    seq_cols = [F.col(f"b{i}.min_seq") for i in range(len(inputs))]
    seq_cols_mx = [F.col(f"b{i}.max_seq") for i in range(len(inputs))]
    derived = joined.select(
        F.lit(name).alias("measurement"),
        F.col("b0.group_key").alias("group_key"),
        *[F.col(f"b0.{k}").alias(k) for k in ["zoom", "tile_id"] + _LINEAGE[1:]],
        new_vals.alias("values"),
        F.col("b0.n_geoms").alias("n_geoms"),
        (F.col("b0.h") * F.col("b0.w")).cast("long").alias("n_cells_burned"),
        (F.least(*seq_cols) if len(seq_cols) > 1 else seq_cols[0])
        .alias("min_seq"),
        (F.greatest(*seq_cols_mx) if len(seq_cols_mx) > 1
         else seq_cols_mx[0]).alias("max_seq"),
    ).select(*[f.name for f in c.schema.fields])

    bands = dict(cube.bands)
    bands[name] = BandMeta(name=name, dtype="float64", fill=fill)
    return GeoCube(
        chunks=c.unionByName(derived), geobox=cube.geobox, bands=bands,
        group_by=cube.group_by, group_keys=cube.group_keys,
        tile_size=cube.tile_size, fill=cube.fill,
    )


def coarsen(cube: GeoCube, factor: int, agg: str = "mean") -> GeoCube:
    """Downsample every band by ``factor`` x ``factor`` blocks
    (xarray ``.coarsen(x=f, y=f).mean()`` and friends).

    agg: 'mean' | 'sum' | 'min' | 'max' | 'median' | 'mode'.
    'median' interpolates like numpy (mean of the two middle values
    for even counts); 'mode' is the GDAL GRA_Mode categorical
    downsample (most frequent value, frequency ties to the SMALLEST
    value, deterministic). Chunk-local by construction (tile_size and
    the grid dims must divide by ``factor``), so the physical plan is
    a NARROW map over chunk rows — no shuffle at any scale; a
    1000-executor coarsen is embarrassingly parallel."""
    if agg not in ("mean", "sum", "min", "max", "median", "mode"):
        raise ValueError(f"unsupported agg {agg!r}")
    f = int(factor)
    gb = cube.geobox
    if gb.width % f or gb.height % f:
        raise ValueError(
            f"grid {gb.height}x{gb.width} not divisible by factor {f}"
        )
    if cube.tile_size % f:
        raise ValueError(
            f"tile_size {cube.tile_size} not divisible by factor {f}"
        )

    w = F.col("w")
    w2 = (w / f).cast("int")
    h2 = (F.col("h") / f).cast("int")

    def _block(i):
        """Columns of the f*f source elements of output index i.

        NaN-fill cubes carry nodata as NULL elements (the Arrow
        boundary maps NaN -> null in nested arrays); aggregation skips
        them (xarray ``skipna=True`` semantics) and an all-nodata
        block stays nodata (NULL -> NaN on assembly)."""
        r2 = F.floor(i / w2).cast("int")
        c2 = (i % w2).cast("int")
        return F.filter(
            F.transform(
                F.sequence(F.lit(0), F.lit(f * f - 1)),
                lambda j: F.element_at(
                    F.col("values"),
                    ((r2 * f + F.floor(j / f).cast("int")) * w
                     + c2 * f + (j % f) + 1).cast("int"),
                ),
            ),
            # NaN nodata survives as a literal NaN double when chunks
            # are built directly (only the Arrow boundary maps it to
            # null) — skip both forms
            lambda x: x.isNotNull() & ~F.isnan(x),
        )

    def _agg(i):
        block = _block(i)
        if agg == "sum":
            # empty (all-nodata) block stays nodata like mean/min/max,
            # not the 0.0 aggregate seed
            return F.when(
                F.size(block) > 0,
                F.aggregate(block, F.lit(0.0), lambda a, x: a + x),
            )
        if agg == "mean":
            return F.when(
                F.size(block) > 0,
                F.aggregate(block, F.lit(0.0), lambda a, x: a + x)
                / F.size(block),
            )
        if agg == "min":
            return F.array_min(block)
        if agg == "median":
            s = F.array_sort(block)
            n = F.size(block)
            mid = (n / 2).cast("int")
            return F.when(
                n > 0,
                F.when(n % 2 == 1, F.element_at(s, mid + 1)).otherwise(
                    (F.element_at(s, mid) + F.element_at(s, mid + 1))
                    / 2.0
                ),
            )
        if agg == "mode":
            # lexicographic struct max: highest count, then largest
            # negated value = SMALLEST value on ties
            best = F.array_max(
                F.transform(
                    block,
                    lambda x: F.struct(
                        F.size(
                            F.filter(block, lambda y: y == x)
                        ).alias("cnt"),
                        (-x).alias("neg"),
                    ),
                )
            )
            return F.when(F.size(block) > 0, -best.getField("neg"))
        return F.array_max(block)

    new_vals = F.transform(F.sequence(F.lit(0), h2 * w2 - 1), _agg)
    # the values expression MUST precede the h/w aliases in the select
    # list: Spark's lateral-column-alias resolution would otherwise
    # bind its F.col("w")/F.col("h") references to the ALREADY-DIVIDED
    # aliases instead of the input columns
    chunks = cube.chunks.select(
        "measurement", "group_key", "zoom", "tile_id",
        (F.col("row0") / f).cast("int").alias("row0"),
        (F.col("col0") / f).cast("int").alias("col0"),
        new_vals.alias("values"),
        h2.alias("h"), w2.alias("w"),
        "n_geoms",
        (h2 * w2).cast("long").alias("n_cells_burned"),
        "min_seq", "max_seq",
    ).select(*[f_.name for f_ in cube.chunks.schema.fields])
    a = gb.affine
    gb2 = GeoBox(
        gb.width // f, gb.height // f,
        Affine(a.a * f, a.b * f, a.c, a.d * f, a.e * f, a.f),
        gb.crs,
    )
    bands = {}
    for m, meta in cube.bands.items():
        fl = meta.fill
        if agg == "sum" and not (isinstance(fl, float) and np.isnan(fl)):
            fl = fl * f * f
        bands[m] = BandMeta(
            name=m, dtype="float64", fill=fl,
            categories=meta.categories, units=meta.units,
        )
    return GeoCube(
        chunks=chunks, geobox=gb2, bands=bands, group_by=cube.group_by,
        group_keys=cube.group_keys, tile_size=cube.tile_size // f,
        fill=cube.fill,
    )


def zonal_stats_raster(cube: GeoCube, zone_band: str, value_band: str):
    """Per-zone statistics of ``value_band`` where zones come from a
    second raster band (the raster-zonal-stats counterpart of the
    vector ``zonal_stats`` query): count/sum/min/max/mean of the value
    cells under each distinct zone value.

    Plan: ONE tile-aligned equi-join of the two bands' chunks, then a
    numpy partial aggregation per chunk (pandas groupby inside the
    Arrow batch — map-side combine at tile grain) and a tiny final
    groupBy over (group, zone) partials. The shuffle carries one row
    per (chunk, zone), never cells. Cells where either band is nodata
    (the band fill, or NULL for NaN-fill cubes) are excluded."""
    import pandas as pd
    from pyspark.sql import types as T

    for b in (zone_band, value_band):
        if b not in cube.bands:
            raise ValueError(f"unknown band {b!r}")
    c = cube.chunks
    z = c.filter(F.col("measurement") == zone_band).alias("z")
    v = c.filter(F.col("measurement") == value_band).alias("v")
    joined = z.join(
        v,
        F.col("z.group_key").eqNullSafe(F.col("v.group_key"))
        & (F.col("z.tile_id") == F.col("v.tile_id")),
    ).select(
        F.col("z.group_key").alias("group_key"),
        F.col("z.values").alias("zvals"),
        F.col("v.values").alias("vvals"),
    )

    z_fill = float(cube.bands[zone_band].fill)
    v_fill = float(cube.bands[value_band].fill)

    schema = T.StructType([
        T.StructField("group_key", T.StringType()),
        T.StructField("zone", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("mn", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
    ])

    def _partials(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                zz = np.asarray(row.zvals, dtype=np.float64)
                vv = np.asarray(row.vvals, dtype=np.float64)
                ok = ~np.isnan(zz) & ~np.isnan(vv)
                if not np.isnan(z_fill):
                    ok &= zz != z_fill
                if not np.isnan(v_fill):
                    ok &= vv != v_fill
                if not ok.any():
                    continue
                zz, vv = zz[ok], vv[ok]
                order = np.argsort(zz, kind="stable")
                zz, vv = zz[order], vv[order]
                bounds = np.flatnonzero(np.diff(zz)) + 1
                starts = np.concatenate([[0], bounds])
                ends = np.concatenate([bounds, [len(zz)]])
                frames.append(pd.DataFrame({
                    "group_key": row.group_key,
                    "zone": zz[starts],
                    "n": ends - starts,
                    "s": np.add.reduceat(vv, starts),
                    "mn": np.minimum.reduceat(vv, starts),
                    "mx": np.maximum.reduceat(vv, starts),
                }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    partials = joined.mapInPandas(_partials, schema=schema)
    return (
        partials.groupBy("group_key", "zone")
        .agg(
            F.sum("n").alias("n_cells"),
            F.sum("s").alias("vsum"),
            F.min("mn").alias("vmin"),
            F.max("mx").alias("vmax"),
            (F.sum("s") / F.sum("n")).alias("vmean"),
        )
        .orderBy("group_key", "zone")
    )


def zonal_majority(cube: GeoCube, zone_band: str, value_band: str):
    """Per-zone MAJORITY / MINORITY / VARIETY of ``value_band`` under
    the zones of ``zone_band`` — the categorical half of ESRI
    ZonalStatistics (which restricts these stats to integer rasters;
    here values are counted by exact equality, so the operator is
    meaningful for integer-valued bands).

    Per zone: ``variety`` = number of distinct data values,
    ``majority`` = the most frequent value (ties -> smallest value,
    ESRI's deterministic rule) with its count ``majority_n``, and
    ``minority`` = the least frequent (ties -> smallest) with
    ``minority_n``.

    Plan: the same ONE tile-aligned equi-join as
    :func:`zonal_stats_raster`, then numpy (zone, value) pair counts
    per chunk (map-side combine at tile grain), a (group, zone, value)
    count sum, and the final per-zone argmax/argmin via ``max_by`` /
    ``min_by`` with struct tie-break orders. The shuffle carries one
    row per (chunk, zone, value), never cells."""
    import pandas as pd
    from pyspark.sql import types as T

    for b in (zone_band, value_band):
        if b not in cube.bands:
            raise ValueError(f"unknown band {b!r}")
    c = cube.chunks
    z = c.filter(F.col("measurement") == zone_band).alias("z")
    v = c.filter(F.col("measurement") == value_band).alias("v")
    joined = z.join(
        v,
        F.col("z.group_key").eqNullSafe(F.col("v.group_key"))
        & (F.col("z.tile_id") == F.col("v.tile_id")),
    ).select(
        F.col("z.group_key").alias("group_key"),
        F.col("z.values").alias("zvals"),
        F.col("v.values").alias("vvals"),
    )

    z_fill = float(cube.bands[zone_band].fill)
    v_fill = float(cube.bands[value_band].fill)

    schema = T.StructType([
        T.StructField("group_key", T.StringType()),
        T.StructField("zone", T.DoubleType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ])

    def _pair_counts(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                zz = np.asarray(row.zvals, dtype=np.float64)
                vv = np.asarray(row.vvals, dtype=np.float64)
                ok = ~np.isnan(zz) & ~np.isnan(vv)
                if not np.isnan(z_fill):
                    ok &= zz != z_fill
                if not np.isnan(v_fill):
                    ok &= vv != v_fill
                if not ok.any():
                    continue
                zz, vv = zz[ok], vv[ok]
                order = np.lexsort((vv, zz))
                zz, vv = zz[order], vv[order]
                bounds = np.flatnonzero(
                    (np.diff(zz) != 0) | (np.diff(vv) != 0)
                ) + 1
                starts = np.concatenate([[0], bounds])
                ends = np.concatenate([bounds, [len(zz)]])
                frames.append(pd.DataFrame({
                    "group_key": row.group_key,
                    "zone": zz[starts],
                    "value": vv[starts],
                    "n": ends - starts,
                }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    pairs = (
        joined.mapInPandas(_pair_counts, schema=schema)
        .groupBy("group_key", "zone", "value")
        .agg(F.sum("n").alias("n"))
    )
    # majority: max count, ties -> smallest value (max over
    # (n, -value)); minority: min count, ties -> smallest value
    return (
        pairs.groupBy("group_key", "zone")
        .agg(
            F.count(F.lit(1)).alias("variety"),
            F.max_by(
                "value", F.struct(F.col("n"), (-F.col("value")).alias("nv"))
            ).alias("majority"),
            F.max("n").alias("majority_n"),
            F.min_by("value", F.struct("n", "value")).alias("minority"),
            F.min("n").alias("minority_n"),
        )
        .orderBy("group_key", "zone")
    )


def band_stats(cube: GeoCube,
               measurements: Optional[Sequence[str]] = None) -> DataFrame:
    """Per-(measurement, group) statistics: n_cells, n_nodata, and
    vmin/vmax/vsum/vmean over the DATA cells (nodata excluded — a
    NaN-fill cube carries nodata as NULL array elements after the
    Arrow boundary; a finite-fill cube as the fill value; both count
    as n_nodata and are excluded from the value stats). A band with
    zero data cells reports NULL vmin/vmax/vmean.

    Two-level aggregation: array HOFs reduce each chunk to scalars
    (map-side, inside codegen), then one tiny groupBy combines chunk
    partials — the shuffle carries a few doubles per chunk, never
    cell data."""
    c = cube.chunks
    if measurements:
        c = c.filter(F.col("measurement").isin(list(measurements)))
    fill_map = F.create_map(
        *[x for m, b in cube.bands.items()
          for x in (F.lit(m), F.lit(float(b.fill)))]
    )
    fill = fill_map[F.col("measurement")]
    is_data = lambda x: F.when(  # noqa: E731
        F.isnan(fill), x.isNotNull() & ~F.isnan(x)
    ).otherwise(x.isNotNull() & (x != fill))
    data = F.filter("values", is_data)
    per_chunk = c.select(
        "measurement", "group_key",
        data.alias("data"),
    ).select(
        "measurement", "group_key",
        F.size("data").alias("n_data"),
        F.array_min("data").alias("mn"),
        F.array_max("data").alias("mx"),
        F.aggregate("data", F.lit(0.0), lambda a, x: a + x).alias("s"),
    )
    # n_cells is the FULL grid (driver-known geometry) — tiles with no
    # covering geometry have no chunk row but their cells are still
    # nodata raster cells
    total = int(cube.geobox.height) * int(cube.geobox.width)
    return (
        per_chunk.groupBy("measurement", "group_key")
        .agg(
            F.lit(total).cast("long").alias("n_cells"),
            (F.lit(total) - F.sum("n_data")).cast("long")
            .alias("n_nodata"),
            F.min("mn").alias("vmin"),
            F.max("mx").alias("vmax"),
            F.sum("s").alias("vsum"),
            F.when(
                F.sum("n_data") > 0, F.sum("s") / F.sum("n_data")
            ).alias("vmean"),
        )
        .orderBy("measurement", "group_key")
    )


def clip_cube(cube: GeoCube, geom, *, invert: bool = False) -> GeoCube:
    """Mask the cube to a cutline polygon (``gdalwarp -cutline`` /
    rioxarray ``.rio.clip`` parity): cells whose CENTER falls outside
    ``geom`` become the band fill; ``invert=True`` keeps the outside
    instead (``.rio.clip(invert=True)``).

    ``geom`` is a GeoJSON mapping or string (the same contract as
    ``make_geocube(geom=...)``), interpreted in the cube's CRS.

    Plan: the cutline is burned ONCE into a 0/1 mask cube on the SAME
    grid through the existing one-shuffle scanline burn (center rule,
    identical to the cube's own cell assignment), then ONE tile-key
    equi-join + ``zip_with`` applies it inside codegen. A normal clip
    inner-joins — tiles the cutline never touches are dropped from the
    sparse chunk table outright, so the masked-out bulk of a
    continent-scale cube never shuffles; an inverted clip left-joins
    and passes mask-free tiles through untouched."""
    import json as _json

    from .cube import make_geocube
    from .geometry import wkb as W

    if isinstance(geom, str):
        geom = _json.loads(geom)
    g = W.from_geojson(geom)
    spark = cube.chunks.sparkSession
    from pyspark.sql import types as T

    vec = spark.createDataFrame(
        [("__cutline", 0, bytearray(g.to_wkb()), 1.0)],
        T.StructType([
            T.StructField("doc_id", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("geometry_wkb", T.BinaryType()),
            T.StructField("__mask", T.DoubleType()),
        ]),
    )
    mask = make_geocube(
        vec, measurements=["__mask"], like=cube.geobox,
        input_crs=cube.geobox.crs, fill=0.0, merge_alg="replace",
        tile_size=cube.tile_size,
    )
    # the burn materializes a chunk for every ENVELOPE-covered tile;
    # all-zero mask tiles are no-ops for both modes, so drop them here
    # — this is what makes the inner join actually skip untouched
    # tiles rather than rewriting them to all-fill
    mvals = mask.chunks.where(
        F.exists("values", lambda m: m == 1.0)
    ).select(
        F.col("tile_id").alias("__mt"),
        F.col("values").alias("__mv"),
    )
    fills = _fill_map({m: float(b.fill) for m, b in cube.bands.items()})
    fill = fills[F.col("measurement")]
    how = "left" if invert else "inner"
    joined = cube.chunks.join(
        mvals, F.col("tile_id") == F.col("__mt"), how
    )
    if invert:
        vals = F.when(
            F.col("__mv").isNull(), F.col("values")
        ).otherwise(
            F.zip_with(
                "values", "__mv",
                lambda v, m: F.when(m == 1.0, fill).otherwise(v),
            )
        )
    else:
        vals = F.zip_with(
            "values", "__mv",
            lambda v, m: F.when(m == 1.0, v).otherwise(fill),
        )
    out = joined.select(
        *[c for c in cube.chunks.columns if c != "values"],
        vals.alias("values"),
    ).select(*cube.chunks.columns)
    return GeoCube(
        chunks=out, geobox=cube.geobox, bands=dict(cube.bands),
        group_by=cube.group_by, group_keys=cube.group_keys,
        tile_size=cube.tile_size, fill=cube.fill,
    )


def band_quantiles(cube: GeoCube, qs: Sequence[float] = (0.25, 0.5, 0.75),
                   measurements: Optional[Sequence[str]] = None, *,
                   exact: bool = False,
                   accuracy: int = 10000) -> DataFrame:
    """Per-(measurement, group) value quantiles over the DATA cells
    (the xarray ``band.quantile(q)`` post-op, distributed).

    Default is the SCALE path: ``percentile_approx`` (Spark's
    t-digest-style sketch, bounded memory per group, error <=
    1/``accuracy`` in rank) — the right tool at 10^12 cells where an
    exact quantile would buffer whole groups. ``exact=True`` switches
    to Spark's exact interpolated ``percentile`` (numpy
    'linear'/DuckDB ``quantile_cont`` semantics) — its aggregation
    buffer grows with distinct values per group, so reserve it for
    verification scales; that is exactly how the oracle query checks
    this operator.

    Both aggregates combine partials map-side; the shuffle carries
    sketches (or count maps), never cells.

    Returns (measurement, group_key, q, value) ordered."""
    qs = [float(q) for q in qs]
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in [0, 1], got {qs}")
    if accuracy < 1:
        raise ValueError(f"accuracy must be >= 1, got {accuracy}")
    c = cube.chunks
    names = list(measurements) if measurements else list(cube.bands)
    for m in names:
        if m not in cube.bands:
            raise ValueError(f"unknown measurement {m!r}")
    c = c.filter(F.col("measurement").isin(names))
    fill_map = F.create_map(
        *[x for m, b in cube.bands.items()
          for x in (F.lit(m), F.lit(float(b.fill)))]
    )
    fill = fill_map[F.col("measurement")]
    is_data = lambda x: F.when(  # noqa: E731
        F.isnan(fill), x.isNotNull() & ~F.isnan(x)
    ).otherwise(x.isNotNull() & (x != fill))
    cells = c.select(
        "measurement", "group_key",
        F.explode(F.filter("values", is_data)).alias("v"),
    )
    arr = ", ".join(repr(q) for q in qs)
    if exact:
        agg = F.expr(f"percentile(v, array({arr}))")
    else:
        agg = F.expr(f"percentile_approx(v, array({arr}), {accuracy})")
    qlit = F.array(*[F.lit(q) for q in qs])
    return (
        cells.groupBy("measurement", "group_key")
        .agg(agg.alias("vals"))
        .select(
            "measurement", "group_key",
            F.posexplode("vals").alias("qi", "value"),
        )
        .select(
            "measurement", "group_key",
            F.element_at(qlit, F.col("qi") + 1).alias("q"),
            "value",
        )
        .orderBy("measurement", "group_key", "q")
    )


def band_histogram(cube: GeoCube, bins: int = 32,
                   lo: Optional[float] = None,
                   hi: Optional[float] = None,
                   measurements: Optional[Sequence[str]] = None,
                   ) -> DataFrame:
    """Fixed-width histogram per (measurement, group): the raster
    value distribution (xarray users run ``np.histogram`` on the
    collected band; here the counts are computed distributed and only
    the bins come back).

    numpy ``histogram`` semantics: ``bins`` equal-width bins over
    ``[lo, hi]``, the last bin closed; DATA cells outside the range
    are dropped; nodata excluded. ``lo``/``hi`` default to the band's
    own min/max (one extra tiny ``band_stats`` job, per band). Bins
    with zero count are omitted (the result is sparse).

    Returns (measurement, group_key, bin, lo_edge, hi_edge, n) ordered
    by keys.

    Plan: each cell maps to its bin index inside codegen, the
    (measurement, group_key, bin) counts hash-aggregate MAP-SIDE
    before the one exchange — the shuffle carries at most
    bins x tasks partial rows, never cells. Pure JVM end-to-end."""
    bins = int(bins)
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if (lo is None) != (hi is None):
        raise ValueError("pass both lo and hi, or neither")
    c = cube.chunks
    if measurements:
        c = c.filter(F.col("measurement").isin(list(measurements)))

    if lo is None:
        stats = band_stats(cube, measurements).collect()
        rng: dict = {}
        for r in stats:
            if r.vmin is None:
                continue  # band with zero data cells: no rows
            cur = rng.get(r.measurement)
            rng[r.measurement] = (
                r.vmin if cur is None else min(cur[0], r.vmin),
                r.vmax if cur is None else max(cur[1], r.vmax),
            )
        if not rng:
            lo_c = hi_c = F.lit(float("nan"))
        else:
            lo_c = F.create_map(*[
                x for m, (a, _) in rng.items()
                for x in (F.lit(m), F.lit(float(a)))
            ])[F.col("measurement")]
            hi_c = F.create_map(*[
                x for m, (_, b) in rng.items()
                for x in (F.lit(m), F.lit(float(b)))
            ])[F.col("measurement")]
    else:
        lo, hi = float(lo), float(hi)
        if not hi >= lo:
            raise ValueError(f"hi must be >= lo, got [{lo}, {hi}]")
        lo_c, hi_c = F.lit(lo), F.lit(hi)

    fills = {m: float(b.fill) for m, b in cube.bands.items()}
    _is_data = _is_data_fn(_fill_map(fills)[F.col("measurement")])
    width = (hi_c - lo_c) / bins

    def _bin(x):
        # degenerate lo == hi range: every in-range value is bin 0
        idx = F.when(
            width > 0,
            F.least(F.floor((x - lo_c) / width), F.lit(bins - 1)),
        ).otherwise(F.lit(0))
        return F.when(
            _is_data(x) & (x >= lo_c) & (x <= hi_c), idx.cast("int")
        )

    exploded = c.select(
        "measurement", "group_key",
        F.explode(
            F.filter(F.transform("values", _bin),
                     lambda b: b.isNotNull())
        ).alias("bin"),
        lo_c.alias("__lo"), width.alias("__width"),
    )
    return (
        exploded.groupBy("measurement", "group_key", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("__lo").alias("__lo"),
            F.first("__width").alias("__width"),
        )
        .select(
            "measurement", "group_key", "bin",
            (F.col("__lo") + F.col("bin") * F.col("__width"))
            .alias("lo_edge"),
            (F.col("__lo") + (F.col("bin") + 1) * F.col("__width"))
            .alias("hi_edge"),
            "n",
        )
        .orderBy("measurement", "group_key", "bin")
    )


def _halo_strips(c: DataFrame, ntx: int, nty: int, r: int) -> DataFrame:
    """Tile halo exchange, stage 1 of a distributed stencil: every
    chunk row emits itself (role 0) plus r-deep border strips (role 1)
    addressed to its up-to-8 neighbor tiles. Strip slicing is a
    JVM-side array program (``slice``/``transform``/``flatten``) so
    only O(r * perimeter) cells per tile leave the chunk — never 8
    full-tile copies. Strips carry ABSOLUTE grid placement
    (arow0/acol0/sh/sw), so the receiving kernel pastes them into a
    padded frame without any direction bookkeeping."""
    h, w = F.col("h"), F.col("w")
    tx = (F.col("tile_id") % ntx).cast("int")
    ty = (F.col("tile_id") / ntx).cast("int")

    def _crop(y0, x0, ch, cw):
        """values[y0:y0+ch, x0:x0+cw] as a flat array — pure Column."""
        return F.flatten(
            F.transform(
                F.sequence(y0, y0 + ch - 1),
                lambda j: F.slice(F.col("values"), j * w + x0 + 1, cw),
            )
        )

    pieces = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                sv = F.col("values")
                y0, x0 = F.lit(0), F.lit(0)
                ch, cw = h, w
            else:
                # the (dx,dy) neighbor's halo = our cells nearest the
                # shared border: r rows/cols clipped to the (possibly
                # partial edge) tile's own extent
                ch = F.least(F.lit(r), h) if dy else h
                cw = F.least(F.lit(r), w) if dx else w
                y0 = (h - ch) if dy == 1 else F.lit(0)
                x0 = (w - cw) if dx == 1 else F.lit(0)
                sv = _crop(y0, x0, ch, cw)
            dest = (ty + dy) * ntx + (tx + dx)
            valid = (
                ((ty + dy) >= 0) & ((ty + dy) < nty)
                & ((tx + dx) >= 0) & ((tx + dx) < ntx)
            )
            pieces.append(
                F.when(
                    valid,
                    F.struct(
                        dest.cast("long").alias("dest"),
                        F.lit(1 if (dx or dy) else 0).alias("role"),
                        (F.col("row0") + y0).cast("int").alias("arow0"),
                        (F.col("col0") + x0).cast("int").alias("acol0"),
                        ch.cast("int").alias("sh"),
                        cw.cast("int").alias("sw"),
                        sv.alias("svals"),
                    ),
                )
            )

    return (
        c.select(
            "measurement", "group_key", "zoom",
            "n_geoms", "n_cells_burned", "min_seq", "max_seq",
            F.explode(
                F.filter(F.array(*pieces), lambda p: p.isNotNull())
            ).alias("p"),
        )
        .select(
            "measurement", "group_key", "zoom",
            "n_geoms", "n_cells_burned", "min_seq", "max_seq",
            F.col("p.dest").alias("tile_id"),
            F.col("p.role").alias("role"),
            F.col("p.arow0").alias("arow0"),
            F.col("p.acol0").alias("acol0"),
            F.col("p.sh").alias("sh"),
            F.col("p.sw").alias("sw"),
            F.col("p.svals").alias("svals"),
        )
    )


def _paste_padded(sub, ctr, r: int):
    """Assemble one tile's padded (h+2r, w+2r) frame from its center
    chunk + halo strips (absolute-coordinate placement). Cells with no
    contributing strip (off-raster, or a neighbor tile with no chunk
    row) stay NaN."""
    th, tw = int(ctr["sh"]), int(ctr["sw"])
    row0, col0 = int(ctr["arow0"]), int(ctr["acol0"])
    pad = np.full((th + 2 * r, tw + 2 * r), np.nan, dtype=np.float64)
    for row in sub.itertuples(index=False):
        y = row.arow0 - row0 + r
        x = row.acol0 - col0 + r
        block = np.asarray(row.svals, dtype=np.float64).reshape(
            row.sh, row.sw
        )
        # always fits: non-terminal tiles are exactly tile_size and
        # r < tile_size, so a window never spans past the adjacent
        # tile and every strip is at most r deep on its offset axis
        pad[y:y + row.sh, x:x + row.sw] = block
    return pad, th, tw, row0, col0


def _stencil_cube(cube: GeoCube, c: DataFrame, r: int, kernel,
                  rename: Optional[str], synth_missing: bool) -> DataFrame:
    """Shared scaffolding of the halo-exchange stencil operators:
    strips -> ONE equi-shuffle -> per-tile padded frame -> ``kernel``.

    ``kernel(measurement, pad, th, tw) -> np.ndarray`` maps one tile's
    padded (th+2r, tw+2r) frame to its (th, tw) output. ``rename``
    replaces the output measurement name (terrain bands). With
    ``synth_missing`` a tile with NO chunk row but with incoming halo
    strips is synthesized as all-nodata so windows centered in it can
    still see neighbor data (dense-raster semantics on the sparse
    chunk table); all-nodata results are skipped either way, which is
    indistinguishable from nodata on read-back."""
    import pandas as pd

    from .cube import CHUNK_SCHEMA, _grouped_map

    n_tiles, ntx, nty = cube.geobox.n_tiles(cube.tile_size)
    strips = _halo_strips(c, ntx, nty, r)
    out_cols = [f.name for f in CHUNK_SCHEMA.fields]
    ts = cube.tile_size
    H, W = int(cube.geobox.height), int(cube.geobox.width)

    def _reduce(key, sub: pd.DataFrame) -> pd.DataFrame:
        m, gk, tid = key
        center = sub[sub["role"].values == 0]
        synthesized = not len(center)
        if synthesized:
            if not synth_missing:
                return pd.DataFrame([], columns=out_cols)
            # un-burned tile receiving halo strips: its own cells are
            # all nodata, but windows centered here may see neighbors
            ty, tx = divmod(int(tid), ntx)
            row0, col0 = ty * ts, tx * ts
            ctr = {
                "arow0": row0, "acol0": col0,
                "sh": min(ts, H - row0), "sw": min(ts, W - col0),
            }
            zoom = int(sub.iloc[0]["zoom"])
            n_geoms, min_seq, max_seq = 0, -1, -1
        else:
            ctr = center.iloc[0]
            zoom = int(ctr["zoom"])
            n_geoms = int(ctr["n_geoms"])
            min_seq, max_seq = int(ctr["min_seq"]), int(ctr["max_seq"])
        pad, th, tw, row0, col0 = _paste_padded(sub, ctr, r)
        out = kernel(m, pad, th, tw)
        if synthesized and bool(np.all(np.isnan(out))):
            return pd.DataFrame([], columns=out_cols)
        return pd.DataFrame([
            {
                "measurement": rename or m,
                "group_key": gk,
                "zoom": zoom,
                "tile_id": int(tid),
                "row0": row0,
                "col0": col0,
                "h": th,
                "w": tw,
                "values": out.ravel(),
                "n_geoms": n_geoms,
                "n_cells_burned": int(th) * int(tw),
                "min_seq": min_seq,
                "max_seq": max_seq,
            }
        ], columns=out_cols)

    sc = c.sparkSession.sparkContext
    n_parts = max(
        1,
        min(int(n_tiles),
            max(4 * sc.defaultParallelism, int(n_tiles) // 64)),
    )
    keys = ["measurement", "group_key", "tile_id"]
    return _grouped_map(strips, keys, n_parts, _reduce, CHUNK_SCHEMA)


def focal(cube: GeoCube, stat: str = "mean", size: int = 3,
          measurements: Optional[Sequence[str]] = None) -> GeoCube:
    """Moving-window (focal) statistics over every band — the
    distributed counterpart of xarray-spatial ``focal.mean`` /
    rasterio's windowed filters that reference users run on the
    assembled Dataset after ``make_geocube``.

    stat: 'mean' | 'sum' | 'min' | 'max' | 'count' | 'median' |
    'majority' over the ``size`` x ``size`` window centered on each
    cell. 'majority' is the most frequent valid value in the window
    (ESRI FocalStatistics MAJORITY / Whitebox majority_filter — the
    categorical-raster smoothing pass), with frequency ties broken to
    the SMALLEST value so the result is deterministic. Nodata cells
    (the band fill, or NULL/NaN for NaN-fill cubes) and cells outside
    the raster are excluded from the window; a window with zero valid
    cells yields nodata for EVERY stat, count included (the output
    bands are NaN-fill).

    Physical plan — tile halo exchange, the canonical distributed
    stencil:

    1. Each chunk emits its center tile plus r-deep border strips
       addressed to its (up to) 8 neighbor tiles. Strip slicing is a
       JVM-side array program (``slice``/``transform``/``flatten``)
       so only O(r * perimeter) cells per tile ever leave the chunk —
       never 8 full-tile copies.
    2. ONE equi-shuffle clusters every tile with its halo strips on
       (measurement, group_key, tile_id).
    3. A vectorized numpy kernel per tile places strips into a padded
       (h+2r, w+2r) frame by absolute grid coordinates and reduces
       windows via a summed-area table (mean/sum/count — O(cells),
       window-size independent) or ``sliding_window_view`` (min/max).

    Output exists wherever a window can see data: burned tiles, plus
    un-burned tiles whose windows overlap a burned neighbor's border
    (synthesized all-nodata centers) — i.e. dense-raster semantics on
    the sparse chunk table. Tiles nothing reaches stay absent, which
    reads back as nodata.
    """
    if stat not in ("mean", "sum", "min", "max", "count", "median",
                    "majority"):
        raise ValueError(f"unsupported stat {stat!r}")
    size = int(size)
    if size < 3 or size % 2 == 0:
        raise ValueError("size must be an odd integer >= 3")
    r = size // 2
    if r >= cube.tile_size:
        raise ValueError(
            f"window radius {r} must be < tile_size {cube.tile_size}"
        )

    c = cube.chunks
    if measurements:
        for m in measurements:
            if m not in cube.bands:
                raise ValueError(f"unknown band {m!r}")
        c = c.filter(F.col("measurement").isin(list(measurements)))

    fills = {m: float(b.fill) for m, b in cube.bands.items()}
    s = size

    def _kernel(m, pad, th, tw):
        f = fills[m]
        valid = ~np.isnan(pad)
        if not np.isnan(f):
            valid &= pad != f
        if stat in ("mean", "sum", "count"):
            a = np.where(valid, pad, 0.0)
            P = np.zeros((pad.shape[0] + 1, pad.shape[1] + 1))
            P[1:, 1:] = a.cumsum(axis=0).cumsum(axis=1)
            C = np.zeros_like(P)
            C[1:, 1:] = valid.astype(np.float64).cumsum(axis=0).cumsum(
                axis=1
            )
            wsum = (P[s:, s:] - P[:-s, s:] - P[s:, :-s] + P[:-s, :-s])
            wcnt = (C[s:, s:] - C[:-s, s:] - C[s:, :-s] + C[:-s, :-s])
            # float cancellation guard on the count table
            wcnt = np.round(wcnt)
            if stat == "count":
                return np.where(wcnt > 0, wcnt, np.nan)
            if stat == "sum":
                return np.where(wcnt > 0, wsum, np.nan)
            with np.errstate(invalid="ignore", divide="ignore"):
                return np.where(wcnt > 0, wsum / wcnt, np.nan)
        if stat == "median":
            import warnings

            a = np.where(valid, pad, np.nan)
            win = np.lib.stride_tricks.sliding_window_view(a, (s, s))
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")  # all-NaN windows
                return np.nanmedian(win, axis=(2, 3))
        if stat == "majority":
            # vectorized per-window mode: sort each window (NaN
            # sorts last), derive run lengths from run-start flags
            # with a forward/backward accumulate, then argmax — which
            # is first-wins over the ASCENDING sort, i.e. frequency
            # ties resolve to the smallest value (the documented,
            # oracle-matched tie-break)
            a = np.where(valid, pad, np.nan)
            win = np.lib.stride_tricks.sliding_window_view(a, (s, s))
            th_, tw_ = win.shape[0], win.shape[1]
            k = s * s
            sw = np.sort(win.reshape(th_, tw_, k), axis=2)
            isn = np.isnan(sw)
            starts = np.ones(sw.shape, dtype=bool)
            starts[..., 1:] = sw[..., 1:] != sw[..., :-1]
            idx = np.arange(k)
            run_start = np.maximum.accumulate(
                np.where(starts, idx, 0), axis=2
            )
            # first run start strictly after i = the run's end
            rev = np.flip(np.where(starts, idx, k), axis=2)
            ge = np.flip(np.minimum.accumulate(rev, axis=2), axis=2)
            nxt = np.concatenate(
                [ge[..., 1:], np.full((th_, tw_, 1), k)], axis=2
            )
            runlen = np.where(isn, -1, nxt - run_start)
            best = runlen.argmax(axis=2)
            out = np.take_along_axis(sw, best[..., None], axis=2)[
                ..., 0
            ]
            return np.where(isn.all(axis=2), np.nan, out)
        sentinel = np.inf if stat == "min" else -np.inf
        a = np.where(valid, pad, sentinel)
        win = np.lib.stride_tricks.sliding_window_view(a, (s, s))
        out = (win.min(axis=(2, 3)) if stat == "min"
               else win.max(axis=(2, 3)))
        return np.where(np.isfinite(out), out, np.nan)

    chunks = _stencil_cube(cube, c, r, _kernel, None, True)
    bands = {}
    for m, meta in cube.bands.items():
        if measurements and m not in measurements:
            continue
        bands[m] = BandMeta(
            name=m, dtype="float64", fill=float("nan"), units=meta.units,
        )
    return GeoCube(
        chunks=chunks, geobox=cube.geobox, bands=bands,
        group_by=cube.group_by, group_keys=cube.group_keys,
        tile_size=cube.tile_size, fill=float("nan"),
    )


def terrain(cube: GeoCube, band: str, mode: str = "slope", *,
            azimuth: float = 315.0, altitude: float = 45.0,
            z_factor: float = 1.0) -> GeoCube:
    """Terrain derivatives of a band — slope / aspect / hillshade by
    Horn's 3x3 method (the rioxarray/xarray-spatial ``slope`` /
    ``hillshade`` post-ops reference users run on the assembled DEM).

    Same distributed-stencil plan as ``focal``: one halo exchange of
    1-deep border strips, one equi-shuffle, a vectorized numpy kernel
    per tile. A cell's derivative is defined only where ALL 9 window
    cells are valid data (off-raster / nodata neighbors make the
    gradient undefined) — so un-burned tiles never produce output
    (their own cells are nodata) and are skipped, elsewhere the output
    is nodata.

    Definitions (x east, y north, cell sizes from the grid affine):

    * ``gx = ((tr+2r+br) - (tl+2l+bl)) / (8*dx)``,
      ``gy = ((tl+2t+tr) - (bl+2b+br)) / (8*dy)`` (Horn 1981)
    * slope     = degrees(atan(z_factor * hypot(gx, gy)))
    * aspect    = compass bearing of the downslope direction,
      degrees clockwise from north in [0, 360); flat cells -> nodata
    * hillshade = 255 * max(0, cos(zen)*cos(s) +
      sin(zen)*sin(s)*cos(az - aspect)), zen = 90 - altitude, with
      the sun at (``azimuth``, ``altitude``) degrees
    * hillshade_md = MDOW multidirectional hillshade (Mark 1992,
      USGS OF 92-422; gdaldem ``-multidirectional``): the same shade
      from azimuths 225/270/315/360, each weighted
      sin^2(aspect - az) (weights sum to 2 identically), clamped at
      the combined value; ``azimuth`` is ignored

    Plus the three ``gdaldem`` neighborhood indices (same 3x3
    all-valid window, independent of cell size / z_factor):

    * tpi       = center - mean(8 neighbors) (Weiss 2001 / gdaldem)
    * tri       = mean(|center - neighbor|) over the 8 neighbors
      (Wilson et al. 2007 -- gdaldem's ``-alg Wilson``)
    * roughness = max - min of the 3x3 window (gdaldem roughness)

    And the hydrology primitive:

    * flowdir   = D8 flow direction (Jenson & Domingue 1988; ESRI /
      Whitebox ``d8_pointer`` encoding): the compass neighbor with
      the steepest distance-weighted drop ``(center - neighbor) /
      dist`` (dist = dx east/west, dy north/south, hypot(dx, dy)
      diagonal), coded E=1, SE=2, S=4, SW=8, W=16, NW=32, N=64,
      NE=128. Ties break to the SMALLEST code (E before SE before S
      ...) so the result is deterministic; cells whose steepest drop
      is <= 0 (flats and pits) code 0. Same all-9-valid rule as the
      other modes — borders and nodata-adjacent cells are nodata,
      exactly the cells where D8 is undefined.

    And the three Zevenbergen & Thorne (1987) curvatures (the ESRI
    Curvature tool's outputs, x100 scaling; generalized to dx != dy).
    With the quartic-fit coefficients over the 3x3 window (t = north
    neighbor, etc.):

    * ``D = ((l + r)/2 - c) / dx^2``, ``E = ((t + b)/2 - c) / dy^2``,
      ``F = (-tl + tr + bl - br) / (4*dx*dy)``,
      ``G = (r - l) / (2*dx)``, ``H = (t - b) / (2*dy)``
    * curvature = ``-2(D + E) * 100`` — total/general curvature;
      positive = surface upwardly convex at the cell
    * profile   = ``2(D*G^2 + E*H^2 + F*G*H) / (G^2 + H^2) * 100`` —
      curvature in the direction of maximum slope; negative =
      upwardly convex (ESRI sign convention). Flat cells (G=H=0) -> 0.
    * plan      = ``-2(D*H^2 + E*G^2 - F*G*H) / (G^2 + H^2) * 100`` —
      curvature perpendicular to the slope direction; positive =
      laterally convex. Flat cells -> 0.

    The y-axis orientation cancels in all three (H flips sign with
    the grid's row direction but only H^2 and F*H appear, and F flips
    with it too), so the outputs are orientation-independent.
    """
    if mode not in ("slope", "aspect", "hillshade", "hillshade_md",
                    "tpi", "tri", "roughness", "flowdir",
                    "curvature", "profile", "plan"):
        raise ValueError(f"unsupported mode {mode!r}")
    if band not in cube.bands:
        raise ValueError(f"unknown band {band!r}")
    if cube.tile_size < 2:
        raise ValueError("tile_size must be >= 2")

    a = cube.geobox.affine
    dx = abs(float(a.a))
    dy = abs(float(a.e))
    # row index grows along affine.e: north is row- when e < 0 (the
    # standard north-up grid), row+ otherwise
    ysign = 1.0 if float(a.e) < 0 else -1.0
    fill = float(cube.bands[band].fill)
    zf = float(z_factor)
    az_r = np.radians(float(azimuth))
    zen_r = np.radians(90.0 - float(altitude))

    def _kernel(m, pad, th, tw):
        valid = ~np.isnan(pad)
        if not np.isnan(fill):
            valid &= pad != fill
        # all-9-valid via the 3x3 count
        V = np.zeros((pad.shape[0] + 1, pad.shape[1] + 1))
        V[1:, 1:] = valid.astype(np.float64).cumsum(axis=0).cumsum(axis=1)
        k9 = np.round(
            V[3:, 3:] - V[:-3, 3:] - V[3:, :-3] + V[:-3, :-3]
        ) == 9.0
        z = np.where(valid, pad, 0.0)
        tl, t, tr = z[0:th, 0:tw], z[0:th, 1:tw + 1], z[0:th, 2:tw + 2]
        l_, r_ = z[1:th + 1, 0:tw], z[1:th + 1, 2:tw + 2]
        bl, b, br = (z[2:th + 2, 0:tw], z[2:th + 2, 1:tw + 1],
                     z[2:th + 2, 2:tw + 2])
        if mode == "flowdir":
            c0 = z[1:th + 1, 1:tw + 1]
            # sqrt(dx*dx+dy*dy), NOT np.hypot: bit-parity with the
            # SQL oracle's sqrt closed form matters for tie-breaks
            dg = np.sqrt(dx * dx + dy * dy)
            if ysign > 0:  # north-up grid: row+1 is south
                order = ((r_, dx), (br, dg), (b, dy), (bl, dg),
                         (l_, dx), (tl, dg), (t, dy), (tr, dg))
            else:          # row+1 is north: vertical neighbors swap
                order = ((r_, dx), (tr, dg), (t, dy), (tl, dg),
                         (l_, dx), (bl, dg), (b, dy), (br, dg))
            drops = np.stack([(c0 - n) / d for n, d in order])
            # argmax is first-wins: index order IS ascending code
            # order (2^i = 1,2,4,...,128), so ties pick the smallest
            out = np.where(
                drops.max(axis=0) > 0.0,
                np.exp2(drops.argmax(axis=0).astype(np.float64)),
                0.0,
            )
            return np.where(k9, out, np.nan)
        if mode in ("curvature", "profile", "plan"):
            c0 = z[1:th + 1, 1:tw + 1]
            D = ((l_ + r_) / 2.0 - c0) / (dx * dx)
            E = ((t + b) / 2.0 - c0) / (dy * dy)
            Fc = (-tl + tr + bl - br) / (4.0 * dx * dy)
            G = (r_ - l_) / (2.0 * dx)
            H = (t - b) / (2.0 * dy)
            if mode == "curvature":
                out = -2.0 * (D + E) * 100.0
            else:
                g2h2 = G * G + H * H
                with np.errstate(invalid="ignore", divide="ignore"):
                    if mode == "profile":
                        num = 2.0 * (D * G * G + E * H * H + Fc * G * H)
                    else:
                        num = -2.0 * (D * H * H + E * G * G - Fc * G * H)
                    out = np.where(g2h2 == 0.0, 0.0, num / g2h2 * 100.0)
            return np.where(k9, out, np.nan)
        if mode in ("tpi", "tri", "roughness"):
            c0 = z[1:th + 1, 1:tw + 1]
            nbrs = (tl, t, tr, l_, r_, bl, b, br)
            if mode == "tpi":
                out = c0 - sum(nbrs) / 8.0
            elif mode == "tri":
                out = sum(np.abs(c0 - n) for n in nbrs) / 8.0
            else:
                hi = np.maximum.reduce(nbrs + (c0,))
                lo = np.minimum.reduce(nbrs + (c0,))
                out = hi - lo
            return np.where(k9, out, np.nan)
        gx = ((tr + 2 * r_ + br) - (tl + 2 * l_ + bl)) / (8.0 * dx)
        gy = ysign * ((tl + 2 * t + tr) - (bl + 2 * b + br)) / (8.0 * dy)
        slope_r = np.arctan(zf * np.hypot(gx, gy))
        if mode == "slope":
            out = np.degrees(slope_r)
        else:
            flat = (gx == 0) & (gy == 0)
            with np.errstate(invalid="ignore"):
                aspect_r = np.mod(np.arctan2(-gx, -gy), 2 * np.pi)
            if mode == "aspect":
                out = np.where(flat, np.nan, np.degrees(aspect_r))
            elif mode == "hillshade_md":
                # MDOW multidirectional hillshade (Mark 1992, USGS
                # OF 92-422; gdaldem -multidirectional): shading from
                # azimuths 225/270/315/360 weighted by
                # sin^2(aspect - az); the four weights sum to 2
                # identically, so /2 normalizes. Flat cells shade
                # identically from every direction, so the aspect=0
                # stand-in is exact, no special case.
                asp = np.where(flat, 0.0, aspect_r)
                total = 0.0
                for az_deg in (225.0, 270.0, 315.0, 360.0):
                    az = np.radians(az_deg)
                    s = (np.cos(zen_r) * np.cos(slope_r)
                         + np.sin(zen_r) * np.sin(slope_r)
                         * np.cos(az - asp))
                    total = total + np.sin(asp - az) ** 2 * s
                out = 255.0 * np.maximum(0.0, total / 2.0)
            else:
                shade = (
                    np.cos(zen_r) * np.cos(slope_r)
                    + np.sin(zen_r) * np.sin(slope_r)
                    * np.cos(az_r - np.where(flat, 0.0, aspect_r))
                )
                out = 255.0 * np.maximum(0.0, shade)
        return np.where(k9, out, np.nan)

    c = cube.chunks.filter(F.col("measurement") == band)
    chunks = _stencil_cube(cube, c, 1, _kernel, mode, False)
    bands = {
        mode: BandMeta(name=mode, dtype="float64", fill=float("nan"))
    }
    return GeoCube(
        chunks=chunks, geobox=cube.geobox, bands=bands,
        group_by=cube.group_by, group_keys=cube.group_keys,
        tile_size=cube.tile_size, fill=float("nan"),
    )


def _validate_aligned(a: GeoCube, b: GeoCube) -> dict:
    """Shared precondition of every two-cube combinator (merge, diff,
    composite): same grid, same tile_size, same grouping, same band
    set, same per-band fills. Returns the band->fill map."""
    if a.geobox.to_dict() != b.geobox.to_dict():
        raise ValueError("cubes must share the same grid (geobox)")
    if a.tile_size != b.tile_size:
        raise ValueError("cubes must share the same tile_size")
    if a.group_by != b.group_by:
        # mixing a grouped and an ungrouped cube (or two groupings)
        # would equi-join/groupBy NULL group_key against real keys —
        # rows silently never meet
        raise ValueError(
            f"cubes must share the same group_by "
            f"({a.group_by!r} vs {b.group_by!r})"
        )
    if set(a.bands) != set(b.bands):
        raise ValueError(
            f"band mismatch: {sorted(a.bands)} vs {sorted(b.bands)}"
        )
    fills = {m: float(meta.fill) for m, meta in a.bands.items()}
    for m, meta in b.bands.items():
        fb = float(meta.fill)
        if not (fb == fills[m] or (np.isnan(fb) and np.isnan(fills[m]))):
            raise ValueError(f"band {m!r} fill differs between cubes")
    return fills


def _aligned_join(a: GeoCube, b: GeoCube, how: str):
    """Join two chunk tables on (measurement, group_key, tile_id),
    aliased 'a'/'b' — the ONE equi-shuffle every two-cube combinator
    pays."""
    cond = (
        (F.col("a.measurement") == F.col("b.measurement"))
        & F.col("a.group_key").eqNullSafe(F.col("b.group_key"))
        & (F.col("a.tile_id") == F.col("b.tile_id"))
    )
    return a.chunks.alias("a").join(b.chunks.alias("b"), cond, how)


def _either_side(col: str):
    """Column value from whichever side of an aligned join is present."""
    return F.coalesce(F.col(f"a.{col}"), F.col(f"b.{col}"))


def _fill_map(fills: dict):
    """measurement -> fill literal map Column (shared by every cube
    combinator's element program)."""
    return F.create_map(
        *[x for m, f in fills.items() for x in (F.lit(m), F.lit(f))]
    )


def _is_data_fn(fill):
    """Element predicate: non-null, non-NaN, and != the band fill
    (every element is data when the fill itself is NaN)."""
    def _is_data(x):
        return x.isNotNull() & ~F.isnan(x) & (
            F.when(F.isnan(fill), F.lit(True)).otherwise(x != fill)
        )
    return _is_data


def _combined_chunks(joined, vals, schema_fields):
    """Recombine chunk metadata across an aligned join: geometry from
    whichever side is present, lineage counters summed, seq range
    unioned."""
    def _sum(col):
        return (
            F.coalesce(F.col(f"a.{col}"), F.lit(0))
            + F.coalesce(F.col(f"b.{col}"), F.lit(0))
        ).cast("long")

    return joined.select(
        _either_side("measurement").alias("measurement"),
        _either_side("group_key").alias("group_key"),
        _either_side("zoom").alias("zoom"),
        _either_side("tile_id").alias("tile_id"),
        _either_side("row0").alias("row0"),
        _either_side("col0").alias("col0"),
        _either_side("h").alias("h"),
        _either_side("w").alias("w"),
        vals.alias("values"),
        _sum("n_geoms").alias("n_geoms"),
        _sum("n_cells_burned").alias("n_cells_burned"),
        F.least(
            F.coalesce(F.col("a.min_seq"), F.col("b.min_seq")),
            F.coalesce(F.col("b.min_seq"), F.col("a.min_seq")),
        ).alias("min_seq"),
        F.greatest(
            F.coalesce(F.col("a.max_seq"), F.col("b.max_seq")),
            F.coalesce(F.col("b.max_seq"), F.col("a.max_seq")),
        ).alias("max_seq"),
    ).select(*[f.name for f in schema_fields])


def _union_group_keys(a: GeoCube, b: GeoCube):
    keys = a.group_keys
    if a.group_by and (a.group_keys or b.group_keys):
        keys = sorted(set(a.group_keys or []) | set(b.group_keys or []))
    return keys


def merge_cubes(a: GeoCube, b: GeoCube, merge_alg: str = "replace",
                ) -> GeoCube:
    """Combine two cubes over the SAME grid into one — the incremental
    pattern: burn this week's documents into their own cube, then fold
    it into the running mosaic without re-burning history.

    * ``'add'``     cell-wise ``a + b - fill`` (each side's burned
      value is ``fill + sum``, so the merge equals one burn over the
      union of both inputs); nodata on one side passes the other
      through.
    * ``'replace'`` ``b`` wins wherever ``b`` holds data, else ``a``
      (last-write-wins at batch grain).

    Plan: ONE full-outer equi-join on (measurement, group_key,
    tile_id) — tiles present on a single side stream through untouched
    — and a ``zip_with`` element program inside whole-stage codegen.
    No Python, no driver collection, shuffle bounded by the chunk
    tables themselves."""
    if merge_alg not in ("add", "replace"):
        raise ValueError(f"unsupported merge_alg {merge_alg!r}")
    fills = _validate_aligned(a, b)
    fill_map = _fill_map(fills)
    joined = _aligned_join(a, b, "full_outer")
    fill = fill_map[_either_side("measurement")]
    _is_data = _is_data_fn(fill)

    if merge_alg == "add":
        def elem(x, y):
            return (
                F.when(x.isNull() | F.isnan(x), y)
                .when(y.isNull() | F.isnan(y), x)
                .otherwise(
                    x + y - F.when(F.isnan(fill), F.lit(0.0))
                    .otherwise(fill)
                )
            )
    else:
        def elem(x, y):
            return F.when(_is_data(y), y).otherwise(x)

    both = F.zip_with(F.col("a.values"), F.col("b.values"), elem)
    vals = F.when(
        F.col("a.values").isNull(), F.col("b.values")
    ).when(
        F.col("b.values").isNull(), F.col("a.values")
    ).otherwise(both)

    chunks = _combined_chunks(joined, vals, a.chunks.schema.fields)
    return GeoCube(
        chunks=chunks, geobox=a.geobox, bands=dict(a.bands),
        group_by=a.group_by, group_keys=_union_group_keys(a, b),
        tile_size=a.tile_size, fill=a.fill,
    )


def contour_segments_table(cube: GeoCube, levels: Sequence[float],
                           measurements: Optional[Sequence[str]] = None,
                           ) -> DataFrame:
    """Distributed iso-line SEGMENTS of every band at each level —
    the scale-path API (one row per segment; global cell-center
    coordinates), stitched into LineStrings by :func:`contour`.

    Same physical plan as the other stencil operators: r=1 halo
    strips -> ONE equi-shuffle -> per-tile marching squares
    (``kernels/contour.py``). Each square is owned by the tile of its
    top-left cell, so tiling never duplicates or drops a segment, and
    shared crossings are computed bit-identically on both sides of a
    tile border (canonical edge parameterization + identical halo
    values) — exact cross-tile stitching needs no tolerance."""
    import pandas as pd

    from .cube import _grouped_map
    from .kernels.contour import contour_segments

    c = cube.chunks
    if measurements:
        for m in measurements:
            if m not in cube.bands:
                raise ValueError(f"unknown band {m!r}")
        c = c.filter(F.col("measurement").isin(list(measurements)))
    levels = [float(v) for v in levels]
    if not levels:
        raise ValueError("levels must be a non-empty sequence")
    fills = {m: float(b.fill) for m, b in cube.bands.items()}

    n_tiles, ntx, nty = cube.geobox.n_tiles(cube.tile_size)
    strips = _halo_strips(c, ntx, nty, 1)

    from pyspark.sql import types as T

    seg_schema = T.StructType([
        T.StructField("measurement", T.StringType()),
        T.StructField("group_key", T.StringType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("r1", T.DoubleType()),
        T.StructField("c1", T.DoubleType()),
        T.StructField("r2", T.DoubleType()),
        T.StructField("c2", T.DoubleType()),
    ])
    cols = [f.name for f in seg_schema.fields]

    def _reduce(key, sub: pd.DataFrame) -> pd.DataFrame:
        m, gk, _tid = key
        center = sub[sub["role"].values == 0]
        if not len(center):
            # squares owned by an un-burned tile have a nodata
            # top-left corner by definition: nothing to contour
            return pd.DataFrame([], columns=cols)
        ctr = center.iloc[0]
        pad, th, tw, row0, col0 = _paste_padded(sub, ctr, 1)
        f = fills[m]
        if not np.isnan(f):
            pad = np.where(pad == f, np.nan, pad)
        frames = []
        for lv in levels:
            segs = contour_segments(pad, lv, float(row0), float(col0))
            if len(segs):
                frames.append(pd.DataFrame({
                    "measurement": m,
                    "group_key": gk,
                    "level": lv,
                    "r1": segs[:, 0], "c1": segs[:, 1],
                    "r2": segs[:, 2], "c2": segs[:, 3],
                }))
        if not frames:
            return pd.DataFrame([], columns=cols)
        return pd.concat(frames, ignore_index=True)[cols]

    sc = c.sparkSession.sparkContext
    n_parts = max(
        1,
        min(int(n_tiles),
            max(4 * sc.defaultParallelism, int(n_tiles) // 64)),
    )
    keys = ["measurement", "group_key", "tile_id"]
    return _grouped_map(strips, keys, n_parts, _reduce, seg_schema)


CONTOUR_SEGMENT_CAP = 2_000_000


def contour(cube: GeoCube, levels: Sequence[float],
            measurements: Optional[Sequence[str]] = None,
            *, segment_cap: int = CONTOUR_SEGMENT_CAP) -> DataFrame:
    """Iso-lines as a vector table: ``(measurement, group_key, level,
    line_id, geometry_wkb, n_points, closed)`` — the engine's
    ``gdal_contour`` (reference users shell out to GDAL for this).

    Segment extraction is fully distributed
    (:func:`contour_segments_table`); chain STITCHING joins segments
    on bit-identical shared endpoints, currently on the driver under
    ``segment_cap`` (same escape-hatch pattern as vectorize's
    union-find cap: contours are 1-D — a 10^9-cell raster yields
    ~10^4-10^6 segments, far below the cap in practice; past it,
    consume the distributed segments table directly)."""
    from .geometry import wkb as W
    from .kernels.contour import stitch_segments

    seg_df = contour_segments_table(cube, levels, measurements)
    rows = seg_df.collect() if segment_cap <= 0 else (
        seg_df.limit(segment_cap + 1).collect()
    )
    if segment_cap > 0 and len(rows) > segment_cap:
        raise ValueError(
            f"contour produced more than {segment_cap} segments; "
            "raise segment_cap or consume contour_segments_table() "
            "directly (distributed)"
        )
    by_group: dict = {}
    for r in rows:
        by_group.setdefault(
            (r["measurement"], r["group_key"], r["level"]), []
        ).append((r["r1"], r["c1"], r["r2"], r["c2"]))

    A = cube.geobox.affine
    out = []
    for (m, gk, lv), segs in sorted(
        by_group.items(), key=lambda kv: (kv[0][0], str(kv[0][1]),
                                          kv[0][2])
    ):
        chains = stitch_segments(np.asarray(segs, dtype=np.float64))
        # deterministic order: by first point of each chain
        chains.sort(key=lambda ch: (ch[0][0], ch[0][1], len(ch)))
        for i, ch in enumerate(chains):
            rr = ch[:, 0] + 0.5
            cc = ch[:, 1] + 0.5
            xs = A.c + A.a * cc + A.b * rr
            ys = A.f + A.d * cc + A.e * rr
            geom = W.Geometry(
                W.LINESTRING, np.column_stack([xs, ys])
            )
            closed = bool((ch[0] == ch[-1]).all())
            out.append({
                "measurement": m, "group_key": gk, "level": lv,
                "line_id": i, "geometry_wkb": geom.to_wkb(),
                "n_points": int(len(ch)), "closed": closed,
            })
    spark = cube.chunks.sparkSession
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("measurement", T.StringType()),
        T.StructField("group_key", T.StringType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("line_id", T.IntegerType()),
        T.StructField("geometry_wkb", T.BinaryType()),
        T.StructField("n_points", T.IntegerType()),
        T.StructField("closed", T.BooleanType()),
    ])
    return spark.createDataFrame(out, schema=schema)


def diff_cubes(a: GeoCube, b: GeoCube, mode: str = "delta") -> GeoCube:
    """Change detection between two cubes on the SAME grid — the
    classic two-epoch raster compare (this year's mosaic vs last
    year's).

    * ``'delta'`` cell-wise ``b - a`` where BOTH sides hold data,
      nodata elsewhere. Tiles present on one side only carry no
      defined delta, so the plan is an INNER equi-join on
      (measurement, group_key, tile_id) — single-epoch tiles are
      never shuffled through.
    * ``'mask'``  1.0 where the cell changed (different values, or
      data appearing/disappearing), 0.0 where equal data, nodata
      where neither side has data. One-sided tiles DO produce change
      cells, so this one is the full-outer join.

    Both modes are pure ``zip_with``/``transform`` element programs
    inside whole-stage codegen — no Python, shuffle bounded by the two
    chunk tables. Output bands keep their names with dtype float64 and
    NaN nodata (delta/mask are derived quantities, like terrain)."""
    if mode not in ("delta", "mask"):
        raise ValueError(f"unsupported mode {mode!r}")
    fills = _validate_aligned(a, b)
    fill_map = _fill_map(fills)
    joined = _aligned_join(a, b, "inner" if mode == "delta"
                           else "full_outer")
    fill = fill_map[_either_side("measurement")]
    _is_data = _is_data_fn(fill)
    nan = F.lit(float("nan"))

    if mode == "delta":
        def elem(x, y):
            return F.when(
                _is_data(x) & _is_data(y), (y - x).cast("double")
            ).otherwise(nan)

        vals = F.zip_with(F.col("a.values"), F.col("b.values"), elem)
    else:
        def elem(x, y):
            return (
                F.when(_is_data(x) & _is_data(y),
                       (x != y).cast("double"))
                .when(_is_data(x) | _is_data(y), F.lit(1.0))
                .otherwise(nan)
            )

        def one_sided(col):
            return F.transform(
                col, lambda v: F.when(_is_data(v), F.lit(1.0))
                .otherwise(nan)
            )

        vals = F.when(
            F.col("a.values").isNull(), one_sided(F.col("b.values"))
        ).when(
            F.col("b.values").isNull(), one_sided(F.col("a.values"))
        ).otherwise(
            F.zip_with(F.col("a.values"), F.col("b.values"), elem)
        )

    chunks = _combined_chunks(joined, vals, a.chunks.schema.fields)
    bands = {
        m: BandMeta(name=m, dtype="float64", fill=float("nan"))
        for m in a.bands
    }
    return GeoCube(
        chunks=chunks, geobox=a.geobox, bands=bands,
        group_by=a.group_by, group_keys=_union_group_keys(a, b),
        tile_size=a.tile_size, fill=float("nan"),
    )


# ---------------------------------------------------------------------------
# N-epoch temporal composites
# ---------------------------------------------------------------------------

def _validate_aligned_many(cubes: Sequence[GeoCube]) -> dict:
    """N-way form of the two-cube combinator precondition: every epoch
    shares the grid, tile size, band set, and per-band fills. Returns
    the band->fill map."""
    cubes = list(cubes)
    if len(cubes) < 2:
        raise ValueError("need at least 2 cubes to composite")
    fills = _validate_aligned(cubes[0], cubes[1])
    for c in cubes[2:]:
        _validate_aligned(cubes[0], c)
    return fills


def _stack_epochs(cubes: Sequence[GeoCube], times):
    """Union the epoch chunk tables (tagged with the epoch's time
    coordinate) and group them onto the tile key — the ONE shuffle
    every N-epoch composite pays. Shuffle bytes = k x chunk tables;
    epochs of the same tile land in one task regardless of k."""
    parts = []
    for c, t in zip(cubes, times):
        parts.append(
            c.chunks.select(
                "measurement", "group_key", "zoom", "tile_id",
                "row0", "col0", "h", "w",
                F.struct(
                    F.lit(float(t)).alias("t"),
                    F.col("values").alias("v"),
                ).alias("ep"),
                "n_geoms", "n_cells_burned", "min_seq", "max_seq",
            )
        )
    stacked = parts[0]
    for p in parts[1:]:
        stacked = stacked.unionByName(p)
    return stacked.groupBy("measurement", "group_key", "zoom",
                           "tile_id").agg(
        F.first("row0").alias("row0"),
        F.first("col0").alias("col0"),
        F.first("h").alias("h"),
        F.first("w").alias("w"),
        F.collect_list("ep").alias("eps"),
        F.sum("n_geoms").alias("n_geoms"),
        F.sum("n_cells_burned").alias("n_cells_burned"),
        F.min("min_seq").alias("min_seq"),
        F.max("max_seq").alias("max_seq"),
    )


def _derived_cube(cubes, grouped, vals) -> GeoCube:
    a = cubes[0]
    schema_names = [f.name for f in a.chunks.schema.fields]
    chunks = grouped.select(
        *[c for c in ("measurement", "group_key", "zoom", "tile_id",
                      "row0", "col0", "h", "w")],
        vals.alias("values"),
        "n_geoms", "n_cells_burned", "min_seq", "max_seq",
    ).select(*schema_names)
    bands = {
        m: BandMeta(name=m, dtype="float64", fill=float("nan"))
        for m in a.bands
    }
    keys = a.group_keys
    if a.group_by:
        ks = set()
        for c in cubes:
            ks |= set(c.group_keys or [])
        keys = sorted(ks) if ks else keys
    return GeoCube(
        chunks=chunks, geobox=a.geobox, bands=bands,
        group_by=a.group_by, group_keys=keys,
        tile_size=a.tile_size, fill=float("nan"),
    )


COMPOSITE_STATS = ("median", "mean", "min", "max", "count")
_QUANTILE_RE = re.compile(r"p(\d{1,2}(?:\.\d+)?|100)")


def composite_cubes(cubes: Sequence[GeoCube],
                    stat: str = "median") -> GeoCube:
    """Per-pixel temporal composite across N epoch cubes on the SAME
    grid — the classic satellite mosaic (xarray users write
    ``xr.concat(epochs, 'time').median('time')``; geocube's docs end
    most examples in exactly that Dataset math).

    Nodata-aware like xarray ``skipna=True``: a cell's statistic is
    taken over the epochs that hold DATA there; a cell with no data in
    any epoch is nodata in the output. ``median`` averages the two
    middle values on even counts (numpy/DuckDB semantics); any
    interpolated percentile is available as an ``'p25'``/``'p97.5'``-
    style stat (numpy ``nanquantile`` / DuckDB ``quantile_cont``
    linear interpolation).

    Plan: one union + ONE groupBy shuffle onto the tile key (epochs of
    a tile co-locate regardless of k), then a pure Catalyst element
    program — ``min``/``max``/``mean``/``count`` are ``aggregate`` +
    ``zip_with`` folds over the epoch list (one sequential pass, no
    per-cell indexing); ``median`` gathers each cell's k-vector with
    ``transform``+``element_at`` and sorts it (k is the epoch count,
    tiny). No Python anywhere, shuffle bounded by the chunk tables."""
    qv = None
    if stat not in COMPOSITE_STATS:
        m = _QUANTILE_RE.fullmatch(stat)
        if not m:
            raise ValueError(
                f"unsupported stat {stat!r}; one of {COMPOSITE_STATS} "
                "or a percentile like 'p25'"
            )
        qv = float(m.group(1)) / 100.0
    cubes = list(cubes)
    fills = _validate_aligned_many(cubes)
    grouped = _stack_epochs(cubes, range(len(cubes)))
    fill_map = _fill_map(fills)
    fill = fill_map[F.col("measurement")]
    _is_data = _is_data_fn(fill)
    nan = F.lit(float("nan"))
    eps = F.col("eps")
    first_v = F.element_at(eps, 1)["v"]

    if stat == "median" or qv is not None:
        # shared per-cell gather: each cell's k-vector of epoch values,
        # data only, sorted; only the pick formula differs
        if stat == "median":
            def _pick(g, n):
                # exact two-middle averaging ((lo+hi)/2, numpy
                # nanmedian / DuckDB median arithmetic); element_at is
                # 1-based and wants ints, (n+1)/2 is a double division
                # in SQL, so take explicit floors
                lo = F.element_at(g, F.floor((n + 1) / 2).cast("int"))
                hi = F.element_at(g, (F.floor(n / 2) + 1).cast("int"))
                return (lo + hi) / 2.0
        else:
            def _pick(g, n):
                # numpy/DuckDB 'linear' interpolation: h = (n-1)*q,
                # value = g[floor(h)] + (h - floor(h)) *
                # (g[floor(h)+1] - g[floor(h)]) on 0-based indices
                h = (n - 1).cast("double") * F.lit(qv)
                lo = F.floor(h).cast("int")
                frac = h - lo
                gl = F.element_at(g, lo + 1)
                gh = F.element_at(g, F.least(lo + 2, n))
                return gl + frac * (gh - gl)

        def _cell(i):
            g = F.array_sort(F.filter(
                F.transform(eps, lambda e: F.element_at(e["v"], i + 1)),
                _is_data,
            ))
            n = F.size(g)
            return F.when(n > 0, _pick(g, n)).otherwise(nan)

        vals = F.transform(
            F.sequence(F.lit(0), F.size(first_v) - 1), _cell
        )
    elif stat in ("min", "max"):
        cmp = (lambda x, a: x < a) if stat == "min" else (
            lambda x, a: x > a)

        def _merge(acc, e):
            return F.zip_with(
                acc, e["v"],
                lambda a, x: F.when(
                    _is_data(x) & (F.isnan(a) | cmp(x, a)), x
                ).otherwise(a),
            )

        init = F.transform(first_v, lambda _: nan)
        vals = F.aggregate(eps, init, _merge)
    else:  # mean / count share the (sum, count) fold
        def _merge(acc, e):
            return F.zip_with(
                acc, e["v"],
                lambda a, x: F.struct(
                    (a["s"] + F.when(_is_data(x), x)
                     .otherwise(F.lit(0.0))).alias("s"),
                    (a["c"] + _is_data(x).cast("long")).alias("c"),
                ),
            )

        init = F.transform(
            first_v,
            lambda _: F.struct(F.lit(0.0).alias("s"),
                               F.lit(0).cast("long").alias("c")),
        )
        acc = F.aggregate(eps, init, _merge)
        if stat == "mean":
            vals = F.transform(
                acc,
                lambda a: F.when(a["c"] > 0, a["s"] / a["c"])
                .otherwise(nan),
            )
        else:
            # zero-data cells are nodata, not 0: a tile nobody burned
            # does not exist at all, so a representable 0 would mean
            # "count depends on tile layout" — NaN everywhere instead
            vals = F.transform(
                acc,
                lambda a: F.when(a["c"] > 0, a["c"].cast("double"))
                .otherwise(nan),
            )
    return _derived_cube(cubes, grouped, vals)


def trend_cubes(cubes: Sequence[GeoCube],
                times: Optional[Sequence[float]] = None) -> GeoCube:
    """Per-pixel least-squares trend (slope of value vs time) across N
    epoch cubes — the NDVI-trend / change-rate analysis every raster
    time-series pipeline runs. ``times`` are the epoch time
    coordinates (default 0..k-1).

    A cell's slope is fit over the epochs holding data there;
    fewer than 2 data epochs (or zero time variance among them) is
    nodata. Closed form ``(n*Stv - St*Sv) / (n*Stt - St^2)``
    accumulated per cell by an ``aggregate`` + ``zip_with`` fold over
    the epoch list — one pass, pure Catalyst, same ONE-shuffle plan as
    :func:`composite_cubes`. Times are shifted by ``times[0]`` before
    accumulating (slope is translation-invariant): raw unix-epoch
    timestamps with small spacing would otherwise lose ~11 of the 16
    double digits to cancellation in ``n*Stt - St^2``."""
    cubes = list(cubes)
    if times is None:
        times = list(range(len(cubes)))
    times = [float(t) for t in times]
    if len(times) != len(cubes):
        raise ValueError("times must have one entry per cube")
    if len(set(times)) != len(times):
        raise ValueError("times must be distinct")
    fills = _validate_aligned_many(cubes)
    grouped = _stack_epochs(cubes, [t - times[0] for t in times])
    fill_map = _fill_map(fills)
    _is_data = _is_data_fn(fill_map[F.col("measurement")])
    nan = F.lit(float("nan"))
    eps = F.col("eps")
    first_v = F.element_at(eps, 1)["v"]

    def _merge(acc, e):
        return F.zip_with(
            acc, e["v"],
            lambda a, x: F.when(
                _is_data(x),
                F.struct(
                    (a["n"] + F.lit(1).cast("long")).alias("n"),
                    (a["st"] + e["t"]).alias("st"),
                    (a["sv"] + x).alias("sv"),
                    (a["stv"] + e["t"] * x).alias("stv"),
                    (a["stt"] + e["t"] * e["t"]).alias("stt"),
                ),
            ).otherwise(a),
        )

    init = F.transform(
        first_v,
        lambda _: F.struct(
            F.lit(0).cast("long").alias("n"),
            F.lit(0.0).alias("st"), F.lit(0.0).alias("sv"),
            F.lit(0.0).alias("stv"), F.lit(0.0).alias("stt"),
        ),
    )
    acc = F.aggregate(eps, init, _merge)

    def _slope(a):
        denom = a["n"] * a["stt"] - a["st"] * a["st"]
        return F.when(
            (a["n"] >= 2) & (denom > 0),
            (a["n"] * a["stv"] - a["st"] * a["sv"]) / denom,
        ).otherwise(nan)

    vals = F.transform(acc, _slope)
    return _derived_cube(cubes, grouped, vals)

# ---------------------------------------------------------------------------
# point query: sample raster values at vector points
# ---------------------------------------------------------------------------


def point_query(cube: GeoCube, points: DataFrame,
                x_col: str = "x", y_col: str = "y", *,
                method: str = "nearest",
                measurements: Optional[Sequence[str]] = None,
                id_cols: Optional[Sequence[str]] = None) -> DataFrame:
    """Sample cube band values at point locations (rasterio
    ``DatasetReader.sample`` / rioxarray ``.sel(method='nearest')``
    semantics, distributed).

    The reference's users close the loop raster->vector by sampling
    the Dataset at station coordinates (xarray ``.sel``); at scale the
    cube is a chunk table, so this re-expresses the lookup as a pure
    Catalyst program: each point maps to its covering cell by the
    inverse affine (``col = (x - c) / a``, ``row = (y - f) / e`` --
    floor convention, identical to the burn's cell assignment), the
    cell to its ``(tile_id, local index)``, and ONE equi-join on
    ``(measurement, group_key, tile_id)`` gathers the stored chunk;
    ``element_at`` picks the cell. Tiles absent from the sparse chunk
    table read as the band's fill value. Points outside the grid
    return NULL (never fill -- out-of-domain is distinguishable from
    untouched).

    ``method='bilinear'`` samples between the four surrounding CELL
    CENTERS (GDAL ``GRIORA_Bilinear`` convention: base index clamped
    to the grid so border points degrade to the edge cells; fill
    participates like any value). The plan gains one groupBy on the
    point identity to combine the four corner contributions -- corner
    rows carry only (ids, weight, tile key), never geometry.

    Output: ``id_cols`` (default: every input column) + ``measurement``
    + ``group_key`` (grouped cubes) + ``value``. One output row per
    (point, measurement[, group]); with the default identity, exact
    duplicate input rows collapse into one under bilinear.

    Scale shape: narrow math -> one equi-join (Catalyst broadcasts a
    small side) [-> one combine agg for bilinear]. No Python anywhere.
    """
    if method not in ("nearest", "bilinear", "cubic"):
        raise ValueError(f"unknown method {method!r}")
    gb = cube.geobox
    aff = gb.affine
    if aff.b != 0.0 or aff.d != 0.0:
        raise ValueError("point_query requires an axis-aligned grid")
    names = list(measurements) if measurements else list(cube.bands)
    for m in names:
        if m not in cube.bands:
            raise ValueError(f"unknown measurement {m!r}")
    for col in (x_col, y_col):
        if col not in points.columns:
            raise ValueError(f"points missing column {col!r}")
    ids = list(id_cols) if id_cols else [
        c for c in points.columns
    ]
    for col in ids:
        if col not in points.columns:
            raise ValueError(f"points missing id column {col!r}")
    reserved = {"measurement", "group_key", "value"}
    clash = reserved.intersection(ids)
    if clash:
        raise ValueError(f"id columns clash with outputs: {sorted(clash)}")

    ts = cube.tile_size
    ntx = -(-gb.width // ts)
    W, H = gb.width, gb.height

    # fractional grid coordinates (cell units; floor = covering cell)
    fcol = (F.col(x_col).cast("double") - F.lit(aff.c)) / F.lit(aff.a)
    frow = (F.col(y_col).cast("double") - F.lit(aff.f)) / F.lit(aff.e)
    in_grid = (
        (fcol >= 0) & (fcol < F.lit(float(W)))
        & (frow >= 0) & (frow < F.lit(float(H)))
        & F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )

    def _corner(r, c, wgt):
        return F.struct(
            r.cast("int").alias("r"), c.cast("int").alias("c"),
            wgt.cast("double").alias("wt"),
        )

    if method == "nearest":
        corners = F.array(
            _corner(F.floor(frow), F.floor(fcol), F.lit(1.0))
        )
    elif method == "cubic":
        # cubic convolution (Catmull-Rom, a = -0.5) between cell
        # centers, 4x4 taps, edge-replicated (clamped tap indices keep
        # their weight — scipy ndimage mode='nearest' convention);
        # weights are a partition of unity for any fraction, so
        # replication stays exact at borders
        gx = fcol - F.lit(0.5)
        gy = frow - F.lit(0.5)
        bx = F.floor(gx)
        by = F.floor(gy)
        tx = gx - bx
        ty = gy - by

        def _cw(off, t):
            d = F.abs(F.lit(float(off)) - t)
            near = (F.lit(1.5) * d - F.lit(2.5)) * d * d + F.lit(1.0)
            far = ((F.lit(-0.5) * d + F.lit(2.5)) * d
                   - F.lit(4.0)) * d + F.lit(2.0)
            return F.when(d <= 1.0, near).otherwise(
                F.when(d < 2.0, far).otherwise(F.lit(0.0))
            )

        def _cl(v, hi):
            return F.greatest(F.lit(0), F.least(F.lit(hi), v))

        corners = F.array(*[
            _corner(_cl(by + i, H - 1), _cl(bx + j, W - 1),
                    _cw(i, ty) * _cw(j, tx))
            for i in (-1, 0, 1, 2) for j in (-1, 0, 1, 2)
        ])
        corners = F.filter(corners, lambda s: s["wt"] != 0.0)
    else:
        gx = fcol - F.lit(0.5)
        gy = frow - F.lit(0.5)
        bx = F.greatest(
            F.lit(0), F.least(F.lit(max(W - 2, 0)), F.floor(gx))
        ).cast("int")
        by = F.greatest(
            F.lit(0), F.least(F.lit(max(H - 2, 0)), F.floor(gy))
        ).cast("int")
        wx = F.greatest(F.lit(0.0), F.least(F.lit(1.0), gx - bx))
        wy = F.greatest(F.lit(0.0), F.least(F.lit(1.0), gy - by))
        if W < 2:
            wx = F.lit(0.0)
        if H < 2:
            wy = F.lit(0.0)
        one = F.lit(1.0)
        corners = F.array(
            _corner(by, bx, (one - wy) * (one - wx)),
            _corner(by, bx + 1, (one - wy) * wx),
            _corner(by + 1, bx, wy * (one - wx)),
            _corner(by + 1, bx + 1, wy * wx),
        )
        # clamped weights zero out the off-grid neighbor of a 1-wide
        # axis; drop zero-weight corners so they neither join nor
        # perturb the sum
        corners = F.filter(corners, lambda s: s["wt"] > 0.0)

    # measurement x group expansion: a literal array exploded -- a
    # narrow op, never a join (combos are O(bands x groups), tiny)
    groups = (
        [str(k) for k in (cube.group_keys or [])]
        if cube.group_by else [None]
    )
    combos = F.array(*[
        F.struct(
            F.lit(m).alias("m"),
            (F.lit(g) if g is not None
             else F.lit(None).cast("string")).alias("g"),
        )
        for m in names for g in groups
    ])

    p = (
        points
        .withColumn("__corners",
                    F.when(in_grid, corners).otherwise(F.array()))
        .withColumn("__mg", F.explode(combos))
        .select(
            *ids,
            F.col("__mg.m").alias("measurement"),
            F.col("__mg.g").alias("group_key"),
            F.explode_outer("__corners").alias("__k"),
        )
        .withColumn(
            "__tile_id",
            (F.col("__k.r") / ts).cast("long") * F.lit(ntx)
            + (F.col("__k.c") / ts).cast("long"),
        )
    )

    # every chunk column is __-aliased so point columns named like
    # chunk lineage (tile_id, w, values, ...) never collide
    chunks = cube.chunks.select(
        F.col("measurement").alias("__cm"),
        F.col("group_key").alias("__cg"),
        F.col("tile_id").alias("__ct"),
        F.col("row0").alias("__cr0"),
        F.col("col0").alias("__cc0"),
        F.col("w").alias("__cw"),
        F.col("values").alias("__cv"),
    )
    joined = p.join(
        chunks,
        (F.col("measurement") == F.col("__cm"))
        & F.col("group_key").eqNullSafe(F.col("__cg"))
        & (F.col("__tile_id") == F.col("__ct")),
        "left",
    )

    fills = {m: float(cube.bands[m].fill) for m in names}
    fill_col = F.lit(fills[names[0]])
    for m in names[1:]:
        fill_col = F.when(
            F.col("measurement") == m, F.lit(fills[m])
        ).otherwise(fill_col)

    stored = F.element_at(
        F.col("__cv"),
        ((F.col("__k.r") - F.col("__cr0")) * F.col("__cw")
         + (F.col("__k.c") - F.col("__cc0")) + 1).cast("int"),
    )
    corner_val = F.when(
        F.col("__k").isNotNull(), F.coalesce(stored, fill_col)
    )

    if method == "nearest":
        return joined.select(
            *ids, "measurement", "group_key",
            corner_val.alias("value"),
        )
    contrib = joined.select(
        *ids, "measurement", "group_key",
        (corner_val * F.col("__k.wt")).alias("__part"),
    )
    return (
        contrib
        .groupBy(*ids, "measurement", "group_key")
        .agg(F.sum("__part").alias("value"))
    )

# ---------------------------------------------------------------------------
# reclassify + zonal crosstab (categorical raster analysis)
# ---------------------------------------------------------------------------


def reclassify(cube: GeoCube, band: str, breaks: Sequence[float],
               classes: Sequence[float], *, name: Optional[str] = None,
               right: bool = False) -> GeoCube:
    """Range -> class recode of a band (GDAL/QGIS reclassify-by-table,
    numpy ``digitize`` semantics).

    ``breaks`` = k strictly increasing edges; ``classes`` = k + 1
    class values for the intervals ``(-inf, b0), [b0, b1), ...,
    [b_{k-1}, inf)`` (``right=True`` closes on the right instead, like
    ``np.digitize(right=True)``). Nodata cells stay the band fill.

    Pure element program (a when-chain inside ``transform``), composed
    through :func:`with_band` -- narrow map over chunks, no shuffle.
    The class band is appended as ``name`` (default
    ``{band}_class``)."""
    breaks = [float(b) for b in breaks]
    classes = [float(c) for c in classes]
    if not breaks:
        raise ValueError("breaks must be non-empty")
    if any(b2 <= b1 for b1, b2 in zip(breaks, breaks[1:])):
        raise ValueError("breaks must be strictly increasing")
    if len(classes) != len(breaks) + 1:
        raise ValueError(
            f"need len(breaks)+1 classes, got {len(classes)} for "
            f"{len(breaks)} breaks"
        )
    if band not in cube.bands:
        raise ValueError(f"unknown band {band!r}")
    src_fill = float(cube.bands[band].fill)
    is_data = _is_data_fn(F.lit(src_fill))

    def _recode(v):
        cond = (
            (lambda b: v <= F.lit(b)) if right
            else (lambda b: v < F.lit(b))
        )
        expr = F.when(cond(breaks[0]), F.lit(classes[0]))
        for b, cl in zip(breaks[1:], classes[1:-1]):
            expr = expr.when(cond(b), F.lit(cl))
        expr = expr.otherwise(F.lit(classes[-1]))
        return F.when(is_data(v), expr).otherwise(F.lit(src_fill))

    return with_band(
        cube, name or f"{band}_class", (band,), _recode, fill=src_fill
    )


def color_relief(cube: GeoCube, band: str,
                 ramp: Sequence[Sequence[float]], *,
                 prefix: Optional[str] = None) -> GeoCube:
    """gdaldem color-relief: map a value band through a color ramp —
    the last of the seven gdaldem modes (the others live in
    :func:`terrain`). ``ramp`` = rows of (value, r, g, b) with
    strictly increasing values; each output channel interpolates
    LINEARLY between the bracketing ramp entries (gdaldem's default;
    its ``-exact_color_entry``/``-nearest_color_entry`` variants are
    a reclassify), clamping below the first and above the last entry.
    Channels round half-up to integers 0..255 exactly like the
    byte-banded GeoTIFF gdaldem writes. Nodata becomes NaN on the
    color bands (the derived-band convention shared with glcm /
    fill_sinks / normalized_difference): ramp outputs live in 0..255,
    so reusing the source fill would make a real color value equal to
    it (e.g. 0) indistinguishable from nodata downstream.

    Three pure element programs through :func:`with_band` — narrow
    chunk-local maps, zero shuffle; bands ``{prefix}_r/_g/_b``
    appended (prefix defaults to the band name)."""
    ramp = [[float(x) for x in row] for row in ramp]
    if len(ramp) < 2:
        raise ValueError("ramp needs at least 2 entries")
    if any(len(row) != 4 for row in ramp):
        raise ValueError("ramp rows must be (value, r, g, b)")
    vs = [row[0] for row in ramp]
    if any(b <= a for a, b in zip(vs, vs[1:])):
        raise ValueError("ramp values must be strictly increasing")
    if band not in cube.bands:
        raise ValueError(f"unknown band {band!r}")
    src_fill = float(cube.bands[band].fill)
    is_data = _is_data_fn(F.lit(src_fill))
    pre = prefix or band

    def _channel(ch):
        def _fn(v):
            expr = F.when(v <= F.lit(vs[0]), F.lit(ramp[0][ch]))
            for (v0, *c0), (v1, *c1) in zip(ramp, ramp[1:]):
                expr = expr.when(
                    v <= F.lit(v1),
                    F.lit(c0[ch - 1])
                    + (v - F.lit(v0)) * F.lit(c1[ch - 1] - c0[ch - 1])
                    / F.lit(v1 - v0),
                )
            expr = expr.otherwise(F.lit(ramp[-1][ch]))
            # half-up integer rounding, cross-engine stable (+1e-9)
            return F.when(
                is_data(v),
                F.floor(expr + F.lit(0.5 + 1e-9)).cast("double"),
            ).otherwise(F.lit(float("nan")))

        return _fn

    out = cube
    for ch, suffix in ((1, "r"), (2, "g"), (3, "b")):
        out = with_band(out, f"{pre}_{suffix}", (band,),
                        _channel(ch), fill=float("nan"))
    return out


def zonal_crosstab(cube: GeoCube, zone_band: str,
                   class_band: str) -> DataFrame:
    """Cell-count cross-tabulation of two categorical bands (the
    raster analogue of ``pd.crosstab`` / GRASS ``r.cross``): one row
    per (group, zone value, class value) with the number of cells
    holding that combination. Cells where either band is nodata are
    excluded.

    Plan: ONE tile-aligned equi-join of the two bands' chunks, then a
    pure-JVM element program -- ``zip_with`` pairs the arrays,
    ``filter`` drops nodata, ``explode`` feeds a hash aggregate that
    combines MAP-SIDE before the single exchange. The shuffle carries
    at most (distinct pairs x tasks) partial rows, never cells."""
    for b in (zone_band, class_band):
        if b not in cube.bands:
            raise ValueError(f"unknown band {b!r}")
    c = cube.chunks
    z = c.filter(F.col("measurement") == zone_band).alias("z")
    v = c.filter(F.col("measurement") == class_band).alias("v")
    joined = z.join(
        v,
        F.col("z.group_key").eqNullSafe(F.col("v.group_key"))
        & (F.col("z.tile_id") == F.col("v.tile_id")),
    ).select(
        F.col("z.group_key").alias("group_key"),
        F.col("z.values").alias("zvals"),
        F.col("v.values").alias("cvals"),
    )
    z_ok = _is_data_fn(F.lit(float(cube.bands[zone_band].fill)))
    c_ok = _is_data_fn(F.lit(float(cube.bands[class_band].fill)))
    pairs = F.filter(
        F.zip_with(
            "zvals", "cvals",
            lambda a, b: F.struct(a.alias("zone"), b.alias("cls")),
        ),
        lambda s: z_ok(s["zone"]) & c_ok(s["cls"]),
    )
    return (
        joined.select("group_key", F.explode(pairs).alias("p"))
        .groupBy(
            "group_key",
            F.col("p.zone").alias("zone"),
            F.col("p.cls").alias("cls"),
        )
        .agg(F.count(F.lit(1)).alias("n_cells"))
        .orderBy("group_key", "zone", "cls")
    )


# ---------------------------------------------------------------------------
# D8 flow-graph analytics (hydrology: basins + flow accumulation)
# ---------------------------------------------------------------------------

_D8_OFFSETS = (
    (1, 0, 1), (2, 1, 1), (4, 1, 0), (8, 1, -1),
    (16, 0, -1), (32, -1, -1), (64, -1, 0), (128, -1, 1),
)  # (code, compass dr [south+], dc) in ESRI d8_pointer encoding


def flow_cells(cube: GeoCube, band: str = "flowdir") -> DataFrame:
    """Valid D8 cells of a ``terrain(mode='flowdir')`` cube as
    ``(row, col, code)`` int rows (nodata/NaN excluded)."""
    if band not in cube.bands:
        raise ValueError(f"unknown band {band!r}")
    c = cube.chunks.filter(F.col("measurement") == band)
    cell = c.select(
        "row0", "col0", "w", F.posexplode("values").alias("pos", "val")
    ).select(
        (F.col("row0") + (F.col("pos") / F.col("w")).cast("int"))
        .alias("row"),
        (F.col("col0") + F.col("pos") % F.col("w")).cast("int")
        .alias("col"),
        "val",
    )
    return cell.filter(
        F.col("val").isNotNull() & ~F.isnan("val")
    ).select("row", "col", F.col("val").cast("int").alias("code"))


def flow_edges(cube: GeoCube, band: str = "flowdir") -> DataFrame:
    """One out-edge per flowing cell whose D8 target is itself a valid
    cell: ``(row, col, nrow, ncol)``. Cells with code 0 (flats/pits)
    or whose target left the valid region have no edge — they are the
    basin sinks. Compass codes resolve to grid offsets via the cube's
    y-axis direction (row+1 is south on north-up grids)."""
    cells = flow_cells(cube, band)
    vs = 1 if float(cube.geobox.affine.e) < 0 else -1
    dr = F.lit(None).cast("int")
    dc = F.lit(None).cast("int")
    for code, cdr, cdc in reversed(_D8_OFFSETS):
        dr = F.when(F.col("code") == code, F.lit(vs * cdr)).otherwise(dr)
        dc = F.when(F.col("code") == code, F.lit(cdc)).otherwise(dc)
    moved = cells.filter(F.col("code") > 0).select(
        "row", "col",
        (F.col("row") + dr).alias("nrow"),
        (F.col("col") + dc).alias("ncol"),
    )
    tgt = cells.select(
        F.col("row").alias("nrow"), F.col("col").alias("ncol")
    )
    return moved.join(tgt, ["nrow", "ncol"], "inner").select(
        "row", "col", "nrow", "ncol"
    )


def _converged(ptr: DataFrame, edges: DataFrame) -> bool:
    """True when no pointer target still has an out-edge."""
    e = edges.select(
        F.col("row").alias("prow"), F.col("col").alias("pcol")
    )
    return ptr.join(e, ["prow", "pcol"], "inner").limit(1).count() == 0


def flow_basins(cube: GeoCube, band: str = "flowdir",
                max_rounds: int = None) -> DataFrame:
    """Drainage-basin labeling: every valid cell mapped to its
    terminal sink, ``(row, col, basin_row, basin_col)``.

    Plan: classic pointer jumping over the one-out-edge D8 forest —
    each round replaces every pointer with its pointer's pointer (one
    equi-join, ``localCheckpoint`` to keep the plan O(1) deep like
    ``grid.hex.compact_cells_df``), so a path of length L resolves in
    ``ceil(log2 L)`` rounds; total work O(n log L) rows shuffled, the
    textbook parallel bound — never a per-step sequential walk. The
    flow graph is acyclic by construction (a D8 edge requires a
    strictly positive drop), so the fixpoint exists; early-exits as
    soon as no pointer can advance."""
    cells = flow_cells(cube, band)
    edges = flow_edges(cube, band)
    h, w = cube.geobox.shape
    if max_rounds is None:
        max_rounds = max(2, int(np.ceil(np.log2(max(2, h * w)))) + 1)
    ptr = cells.join(edges, ["row", "col"], "left").select(
        "row", "col",
        F.coalesce("nrow", "row").alias("prow"),
        F.coalesce("ncol", "col").alias("pcol"),
    ).transform(_flat)
    for _ in range(max_rounds):
        if _converged(ptr, edges):
            break
        hop = ptr.select(
            F.col("row").alias("prow"), F.col("col").alias("pcol"),
            F.col("prow").alias("gprow"), F.col("pcol").alias("gpcol"),
        )
        ptr = ptr.join(hop, ["prow", "pcol"], "inner").select(
            "row", "col",
            F.col("gprow").alias("prow"),
            F.col("gpcol").alias("pcol"),
        ).transform(_flat)
    return ptr.select(
        "row", "col",
        F.col("prow").alias("basin_row"),
        F.col("pcol").alias("basin_col"),
    )


def _ancestor_closure(cells: DataFrame, edges: DataFrame, shape,
                      max_rounds: int = None) -> DataFrame:
    """Exact transitive closure of the one-out-edge D8 forest as
    (ur, uc, ar, ac) path pairs, via ancestor-pair doubling: round k
    holds the pairs within distance 2^k plus the 2^k-hop pointer;
    composing pairs through the pointer doubles the horizon, so the
    closure materializes in ceil(log2 L) rounds, each
    ``localCheckpoint``-ed so the plan stays O(1) deep."""
    h, w = shape
    if max_rounds is None:
        max_rounds = max(2, int(np.ceil(np.log2(max(2, h * w)))) + 1)
    pairs = edges.select(
        F.col("row").alias("ur"), F.col("col").alias("uc"),
        F.col("nrow").alias("ar"), F.col("ncol").alias("ac"),
    ).transform(_flat)
    ptr = cells.join(edges, ["row", "col"], "left").select(
        "row", "col",
        F.coalesce("nrow", "row").alias("prow"),
        F.coalesce("ncol", "col").alias("pcol"),
    ).transform(_flat)
    for _ in range(max_rounds):
        if _converged(ptr, edges):
            break
        jump = ptr.select(
            F.col("row").alias("ur"), F.col("col").alias("uc"),
            F.col("prow").alias("jr"), F.col("pcol").alias("jc"),
        )
        thru = jump.join(
            pairs.select(
                F.col("ur").alias("jr"), F.col("uc").alias("jc"),
                "ar", "ac",
            ),
            ["jr", "jc"], "inner",
        ).select("ur", "uc", "ar", "ac")
        pairs = pairs.unionByName(thru).distinct().transform(_flat)
        hop = ptr.select(
            F.col("row").alias("prow"), F.col("col").alias("pcol"),
            F.col("prow").alias("gprow"), F.col("pcol").alias("gpcol"),
        )
        ptr = ptr.join(hop, ["prow", "pcol"], "inner").select(
            "row", "col",
            F.col("gprow").alias("prow"),
            F.col("gpcol").alias("pcol"),
        ).transform(_flat)
    return pairs


def flow_accumulation(cube: GeoCube, band: str = "flowdir",
                      max_rounds: int = None) -> DataFrame:
    """D8 flow accumulation: for every valid cell, the number of
    upstream cells draining through it (ESRI convention — self
    excluded; sinks with no inflow get 0), ``(row, col, n_upstream)``.

    Plan: ancestor-pair doubling. Round k holds the distinct
    (cell, downstream-node) pairs within distance 2^k plus the 2^k-hop
    pointer; composing pairs through the pointer doubles the horizon,
    so the full transitive closure materializes in ceil(log2 L)
    rounds. ``n_upstream(c)`` is then a count over pairs grouped by
    the downstream node. Exact (no approximation); shuffle volume is
    the true answer size Sum_u pathlen(u) — the same rows any exact
    engine must produce (the DuckDB oracle's recursive CTE emits the
    identical set) — reached in log rounds instead of L sequential
    waves. Each round persists via ``localCheckpoint`` so the plan
    stays O(1) deep."""
    cells = flow_cells(cube, band)
    edges = flow_edges(cube, band)
    pairs = _ancestor_closure(cells, edges, cube.geobox.shape,
                              max_rounds)
    counts = pairs.groupBy(
        F.col("ar").alias("row"), F.col("ac").alias("col")
    ).agg(F.count(F.lit(1)).alias("n_upstream"))
    return cells.join(counts, ["row", "col"], "left").select(
        "row", "col",
        F.coalesce("n_upstream", F.lit(0)).cast("long")
        .alias("n_upstream"),
    )


def stream_magnitude(cube: GeoCube, band: str = "flowdir",
                     max_rounds: int = None) -> DataFrame:
    """Shreve stream magnitude (Shreve 1966): for every valid cell,
    the number of SOURCE cells (cells with no inflow) draining through
    it, sources themselves counting 1 — ``(row, col, magnitude)``.
    Magnitude is additive at junctions, which is why hydrologists use
    it as the link-load proxy where Strahler order is too coarse.

    Same ancestor-pair doubling closure as :func:`flow_accumulation`
    (log-round exact transitive closure, ``localCheckpoint`` per
    round); the count just restricts to source ancestors, so shuffle
    volume is Sum_src pathlen(src) — never more than accumulation's."""
    cells = flow_cells(cube, band)
    edges = flow_edges(cube, band)
    pairs = _ancestor_closure(cells, edges, cube.geobox.shape,
                              max_rounds)
    # sources: valid cells nothing flows INTO
    inflow = edges.select(
        F.col("nrow").alias("row"), F.col("ncol").alias("col")
    ).distinct()
    sources = cells.join(inflow, ["row", "col"], "left_anti")
    counts = (
        pairs.join(
            sources.select(F.col("row").alias("ur"),
                           F.col("col").alias("uc")),
            ["ur", "uc"], "inner",
        )
        .groupBy(F.col("ar").alias("row"), F.col("ac").alias("col"))
        .agg(F.count(F.lit(1)).alias("n_src"))
    )
    is_src = sources.select("row", "col", F.lit(1).alias("self_src"))
    return (
        cells.join(counts, ["row", "col"], "left")
        .join(is_src, ["row", "col"], "left")
        .select(
            "row", "col",
            (F.coalesce("n_src", F.lit(0))
             + F.coalesce("self_src", F.lit(0))).cast("long")
            .alias("magnitude"),
        )
    )


def stream_order(cube: GeoCube, band: str = "flowdir",
                 max_rounds: int = 64) -> DataFrame:
    """Strahler stream order (Strahler 1957; ESRI StreamOrder
    STRAHLER) over the D8 flow forest — the last of the hydrology
    family (flowdir/accumulation/basins/watershed/Shreve/flow_length
    already live here): a cell with no inflow has order 1; a cell
    whose upstream maximum order ``m`` is reached by >= 2 upstream
    cells gets ``m + 1``, otherwise ``m``. Returns (row, col, order)
    for every valid D8 cell.

    Unlike accumulation/magnitude (additive -> ancestor-closure
    doubling), Strahler's junction rule is NOT associative, so it
    resolves level-by-level: each round settles every cell whose
    upstream cells are all settled — rounds = longest flow PATH in
    cells (not log), which on coarsened DEMs is small; raises past
    ``max_rounds`` so a bounded-round SQL replay provably agrees. Per
    round: two equi-joins + two map-side-combined aggregates over the
    O(edges) rows, ``localCheckpoint`` keeping the plan O(1) deep."""
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    cells = flow_cells(cube, band).transform(_flat)
    edges = flow_edges(cube, band).transform(_flat)
    inflow = edges.select(
        F.col("nrow").alias("row"), F.col("ncol").alias("col")
    ).distinct()
    n_up = inflow.join(
        edges.select(F.col("nrow").alias("row"),
                     F.col("ncol").alias("col")),
        ["row", "col"],
    ).groupBy("row", "col").agg(F.count(F.lit(1)).alias("n_up")) \
        .transform(_flat)
    orders = cells.join(inflow, ["row", "col"], "left_anti").select(
        "row", "col", F.lit(1).cast("long").alias("order")
    ).transform(_flat)
    n_cells = cells.count()
    for _ in range(int(max_rounds)):
        if orders.count() == n_cells:
            return orders
        up_res = edges.join(
            orders.select(F.col("row"), F.col("col"),
                          F.col("order").alias("uo")),
            ["row", "col"],
        ).select("nrow", "ncol", "uo")
        a = up_res.groupBy("nrow", "ncol").agg(
            F.count(F.lit(1)).alias("n_res"),
            F.max("uo").alias("m"),
        )
        cmax = up_res.join(a, ["nrow", "ncol"]).where(
            F.col("uo") == F.col("m")
        ).groupBy("nrow", "ncol").agg(
            F.count(F.lit(1)).alias("c_max"),
            F.max("m").alias("m"),
        )
        ready = (
            cmax.join(a.select("nrow", "ncol", "n_res"),
                      ["nrow", "ncol"])
            .join(
                n_up.select(F.col("row").alias("nrow"),
                            F.col("col").alias("ncol"), "n_up"),
                ["nrow", "ncol"],
            )
            .where(F.col("n_res") == F.col("n_up"))
            .join(
                orders.select(F.col("row").alias("nrow"),
                              F.col("col").alias("ncol")),
                ["nrow", "ncol"], "left_anti",
            )
            .select(
                F.col("nrow").alias("row"), F.col("ncol").alias("col"),
                F.when(F.col("c_max") >= 2, F.col("m") + 1)
                .otherwise(F.col("m")).cast("long").alias("order"),
            )
        )
        orders = orders.unionByName(ready).transform(_flat)
    if orders.count() == n_cells:
        return orders
    raise RuntimeError(
        f"stream_order did not settle within {max_rounds} rounds"
    )


def cells_to_cube(cells: DataFrame, like, *, scheme: str, res: int,
                  cell_col: str = "cell",
                  measurements: Sequence[str] = ("value",),
                  merge_alg: str = "replace", fill: float = 0.0,
                  tile_size: int = 64) -> GeoCube:
    """Inverse of :func:`cube_to_cells`: burn a spherical-index cell
    table ``(cell, value...)`` back onto a raster grid — "render the
    lake's cell-space aggregate as a map layer".

    Each cell id decodes to its boundary polygon (geohash bbox, s2
    ST-edge quad, aperture-7 hexagon) in an Arrow-batched narrow map
    (O(cells) rows, tiny vs the raster), and the standard burn
    machinery does the rest — so this inherits the ONE-wide-shuffle
    plan, tile-domain pruning, and merge semantics of
    ``make_geocube``. ``like`` is a GeoBox (or anything
    ``make_geocube(like=...)`` accepts) in geographic coordinates.
    Cells crossing the antimeridian or touching a pole render as
    their raw lon/lat ring (split them upstream if that matters).

    ``seq`` (the replace-order key) is the cell id itself, so output
    is deterministic for any input order."""
    from .cube import make_geocube

    if cell_col not in cells.columns:
        raise ValueError(f"missing cell column {cell_col!r}")
    for m in measurements:
        if m not in cells.columns:
            raise ValueError(f"missing measurement column {m!r}")
    if scheme not in ("hex", "s2", "geohash"):
        raise ValueError(f"unsupported scheme {scheme!r}")
    meas = list(measurements)
    out_cols = ["doc_id", "seq", "geometry_wkb"] + meas
    schema = ("doc_id string, seq long, geometry_wkb binary, "
              + ", ".join(f"{m} double" for m in meas))

    def _rings(vals):
        if scheme == "hex":
            from .grid.hex import hex_boundary

            return hex_boundary(vals.astype(np.int64)), vals.astype(
                np.int64)
        if scheme == "s2":
            from .grid.s2 import compact_cell_corners

            return compact_cell_corners(
                vals.astype(np.int64), res), vals.astype(np.int64)
        from .grid.geohash import geohash_decode

        rects = np.empty((len(vals), 4, 2), dtype=np.float64)
        seqs = np.empty(len(vals), dtype=np.int64)
        for i, gh in enumerate(vals):
            lon0, lat0, lon1, lat1 = geohash_decode(str(gh))
            rects[i] = [(lon0, lat0), (lon1, lat0),
                        (lon1, lat1), (lon0, lat1)]
            # integer geohash = deterministic seq
            z = 0
            from .grid.geohash import ALPHABET

            for ch in str(gh):
                z = (z << 5) | ALPHABET.find(ch)
            seqs[i] = z
        return rects, seqs

    def _encode(batches):
        import pandas as pd

        from .geometry.wkb import Geometry, POLYGON

        for pdf in batches:
            if not len(pdf):
                continue
            rings, seqs = _rings(pdf[cell_col].values)
            closed = np.concatenate([rings, rings[:, :1, :]], axis=1)
            out = {
                "doc_id": pdf[cell_col].astype(str).values,
                "seq": seqs,
                "geometry_wkb": [
                    Geometry(POLYGON, [r]).to_wkb() for r in closed
                ],
            }
            for m in meas:
                out[m] = pdf[m].astype("float64").values
            yield pd.DataFrame(out, columns=out_cols)

    vec = cells.mapInPandas(_encode, schema=schema)
    return make_geocube(
        vec, measurements=meas, like=like, fill=fill,
        merge_alg=merge_alg, tile_size=tile_size,
    )


def cube_to_cells(cube: GeoCube, band: str, res: int,
                  scheme: str = "hex") -> DataFrame:
    """Aggregate a geographic cube's raster cells into spherical index
    cells — the "publish a raster into the lake's cell space" rollup
    (hex / s2 / geohash, the same keys the document tables bucket by):
    ``(cell, n_cells, sum_val, min_val, max_val)``.

    Plan: cell explode -> cell-center lon/lat from the affine (pure
    Column arithmetic) -> the scheme's pure-Catalyst cell id -> ONE
    hash aggregate that combines map-side before the single exchange.
    Shuffle rows are bounded by distinct output cells x tasks, never
    raster cells. The cube's CRS must be geographic (reproject with
    ``warp`` first otherwise — index cells live on the sphere)."""
    if band not in cube.bands:
        raise ValueError(f"unknown band {band!r}")
    if not cube.geobox.crs.is_geographic:
        raise ValueError(
            "cube_to_cells needs a geographic cube; warp() it to "
            "epsg:4326 first"
        )
    a = cube.geobox.affine
    c = cube.chunks.filter(F.col("measurement") == band)
    cells = c.select(
        "row0", "col0", "w", F.posexplode("values").alias("pos", "val")
    ).select(
        (F.col("row0") + (F.col("pos") / F.col("w")).cast("int"))
        .alias("row"),
        (F.col("col0") + F.col("pos") % F.col("w")).cast("int")
        .alias("col"),
        "val",
    ).filter(F.col("val").isNotNull() & ~F.isnan("val"))
    fill = float(cube.bands[band].fill)
    if not np.isnan(fill):  # nodata excluded, like band_histogram
        cells = cells.filter(F.col("val") != fill)
    lon = F.lit(float(a.c)) + (F.col("col") + 0.5) * F.lit(float(a.a))
    lat = F.lit(float(a.f)) + (F.col("row") + 0.5) * F.lit(float(a.e))
    if scheme == "hex":
        from .grid.hex import hex_cell_id_col

        key = hex_cell_id_col(lon, lat, res)
    elif scheme == "s2":
        from .grid.s2 import s2_cell_id_col

        key = s2_cell_id_col(lon, lat, res)
    elif scheme == "geohash":
        from .grid.geohash import geohash_col

        key = geohash_col(lon, lat, res)
    else:
        raise ValueError(f"unsupported scheme {scheme!r}")
    return cells.groupBy(key.alias("cell")).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("val").alias("sum_val"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


def viewshed(cube: GeoCube, observers: DataFrame, *, band: str,
             radius: int, obs_height: float = 1.0,
             nodata_z: float = 0.0, obs_id: str = "obs_id",
             row_col: str = "row", col_col: str = "col") -> DataFrame:
    """Line-of-sight viewshed (GDAL ``gdal_viewshed`` / ESRI Viewshed
    semantics, R3 algorithm — Franklin & Ray 1994): for every valid
    DEM cell within a square ``radius``-cell window of each observer,
    decide whether the straight sight line from the observer's eye
    (DEM value at the observer cell + ``obs_height``) to the target
    cell center clears the terrain.

    Exact sampling rule (engine-portable, no trig): the segment to a
    target ``n = max(|dr|, |dc|)`` steps away is sampled at fractions
    ``f = t/n (t = 1..n-1)``; terrain elevation at each sample is
    BILINEAR between the four surrounding cell centers (nodata and
    off-raster cells backstop to ``nodata_z``); the target is visible
    iff every sample satisfies ``zs - zo < f * (zt - zo)`` — the
    tangent comparison with the common horizontal distance cancelled,
    so no sqrt enters the math. Per-sample margins are rounded to
    6 dp before the min (cross-engine tie rule); adjacent cells and
    the observer cell itself are always visible.

    Scale shape: observers broadcast; chunk tiles are PRUNED to those
    intersecting an observer window before any cell explodes; one
    hash shuffle groups the (2R+1)^2 gathered cells per
    (group_key, observer); the sight-line math is one vectorized
    numpy kernel per observer (O(R^3) samples). DEM tiles never
    shuffle beyond the windows actually observed — at 100 TB the cost
    scales with #observers * R^2, not raster size.

    Returns (group_key, obs_id, row, col, n_steps, min_margin,
    visible): ``min_margin`` NULL when n <= 1, ``visible`` int 0/1.

    Reference parity: corteva/geocube has no viewshed (it delegates
    raster post-ops to the xarray ecosystem); this is part of the
    large-scale raster-analytics extension alongside terrain/focal.
    """
    if band not in cube.bands:
        raise ValueError(f"unknown band {band!r}")
    if radius < 1:
        raise ValueError(f"radius must be >= 1, got {radius}")
    for col in (obs_id, row_col, col_col):
        if col not in observers.columns:
            raise ValueError(f"observers missing column {col!r}")
    from pyspark.sql import types as T

    R = int(radius)
    fill = float(cube.bands[band].fill)
    h_obs = float(obs_height)
    z_fill = float(nodata_z)

    obs = observers.select(
        F.col(obs_id).cast("long").alias("__oid"),
        F.col(row_col).cast("int").alias("__or"),
        F.col(col_col).cast("int").alias("__oc"),
    )

    c = cube.chunks.where(F.col("measurement") == band)
    pruned = c.join(
        F.broadcast(obs),
        (F.col("row0") <= F.col("__or") + R)
        & (F.col("row0") + F.col("h") > F.col("__or") - R)
        & (F.col("col0") <= F.col("__oc") + R)
        & (F.col("col0") + F.col("w") > F.col("__oc") - R),
    )
    cells = pruned.select(
        "group_key", "__oid", "__or", "__oc",
        "row0", "col0", "w", F.posexplode("values").alias("pos", "val"),
    ).select(
        "group_key", "__oid", "__or", "__oc",
        (F.col("row0") + (F.col("pos") / F.col("w")).cast("int"))
        .alias("r"),
        (F.col("col0") + F.col("pos") % F.col("w")).cast("int")
        .alias("c"),
        F.col("val").cast("double").alias("z"),
    ).where(
        (F.abs(F.col("r") - F.col("__or")) <= R)
        & (F.abs(F.col("c") - F.col("__oc")) <= R)
        & F.col("z").isNotNull() & ~F.isnan("z")
        & (F.col("z") != F.lit(fill) if not np.isnan(fill)
           else F.lit(True))
    )

    schema = T.StructType([
        T.StructField("group_key", T.StringType()),
        T.StructField("obs_id", T.LongType()),
        T.StructField("row", T.IntegerType()),
        T.StructField("col", T.IntegerType()),
        T.StructField("n_steps", T.IntegerType()),
        T.StructField("min_margin", T.DoubleType()),
        T.StructField("visible", T.IntegerType()),
    ])

    def _ker(key, pdf):
        import pandas as pd

        gk, oid = key
        r0 = int(pdf["__or"].iloc[0])
        c0 = int(pdf["__oc"].iloc[0])
        tr = pdf["r"].to_numpy(dtype=np.int64)
        tc = pdf["c"].to_numpy(dtype=np.int64)
        zt = pdf["z"].to_numpy(dtype=np.float64)
        # dense local window padded by 1 so rf+1/cf+1 never escape
        side = 2 * R + 3
        zp = np.full((side, side), z_fill)
        zp[tr - (r0 - R) + 1, tc - (c0 - R) + 1] = zt
        zo = zp[R + 1, R + 1] + h_obs

        dr = tr - r0
        dc = tc - c0
        n = np.maximum(np.abs(dr), np.abs(dc)).astype(np.int64)
        mm = np.full(len(n), np.inf)
        far = n >= 2
        if far.any():
            fi = np.nonzero(far)[0]
            reps = n[fi] - 1
            idx = np.repeat(fi, reps)
            starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
            t = (np.arange(reps.sum())
                 - np.repeat(starts, reps) + 1).astype(np.float64)
            f = t / n[idx]
            rr = r0 + f * dr[idx]
            cc = c0 + f * dc[idx]
            rf = np.floor(rr)
            cf = np.floor(cc)
            fr = rr - rf
            fc = cc - cf
            ri = rf.astype(np.int64) - (r0 - R) + 1
            ci = cf.astype(np.int64) - (c0 - R) + 1
            z00 = zp[ri, ci]
            z01 = zp[ri, ci + 1]
            z10 = zp[ri + 1, ci]
            z11 = zp[ri + 1, ci + 1]
            zs = ((1 - fr) * ((1 - fc) * z00 + fc * z01)
                  + fr * ((1 - fc) * z10 + fc * z11))
            marg = np.round(f * (zt[idx] - zo) - (zs - zo), 6)
            np.minimum.at(mm, idx, marg)
        visible = ((n <= 1) | (mm > 0)).astype(np.int32)
        return pd.DataFrame({
            "group_key": gk,
            "obs_id": np.int64(oid),
            "row": tr.astype(np.int32),
            "col": tc.astype(np.int32),
            "n_steps": n.astype(np.int32),
            "min_margin": np.where(far, mm, np.nan),
            "visible": visible,
        })

    out = cells.groupBy("group_key", "__oid").applyInPandas(
        _ker, schema=schema)
    return out


_D8_MOVES = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
             (1, -1), (1, 0), (1, 1)]


def cost_distance(cube: GeoCube, sources, *, cost_band: str,
                  max_rounds: int = 256) -> GeoCube:
    """Accumulated least-cost distance from source cells over a cost
    raster (ESRI CostDistance / GRASS ``r.cost`` / WhiteboxTools
    ``cost_distance`` semantics): 8-connected moves, the cost of a
    move between adjacent cells a->b is ``(cost_a + cost_b)/2``
    (x ``sqrt(2)`` diagonally); each cell's output is the minimum
    total cost over all paths from any source. Nodata cells (NaN or
    the band fill) are impassable; unreachable and impassable cells
    come back as nodata.

    Distributed shape — blocked Bellman-Ford: each global round is
    ONE halo exchange of 1-deep distance/cost border strips (the
    ``focal``/``terrain`` stencil shuffle) followed by a per-tile
    numpy relaxation run to WITHIN-TILE convergence, so a round
    propagates wavefronts a whole tile across, and the number of
    rounds is O(path length in tiles), not in cells. Rounds stop at
    the first fixpoint (a 1-row improvement aggregate per round;
    every round's result is ``localCheckpoint``-ed so the plan depth
    stays O(1) — the hex-compact / region-group lesson).

    ``sources`` is a DataFrame with (row, col) grid cells (or an
    iterable of pairs); it is collected to the driver — sources are
    assumed small (they seed the wavefront), the raster is not.

    Converged costs are engine-portable: every path's cost
    accumulates edge by edge from the source in IEEE order, and both
    a Jacobi replay (the SQL oracle) and this blocked Gauss-Seidel
    schedule minimize over the same set of path sums, so the
    converged doubles agree bit for bit.
    """
    import pandas as pd

    from .cube import CHUNK_SCHEMA, GeoCube, _grouped_map

    if cost_band not in cube.bands:
        raise ValueError(f"unknown band {cost_band!r}")
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    if isinstance(sources, DataFrame):
        src_rows = [(int(r["row"]), int(r["col"]))
                    for r in sources.select("row", "col").collect()]
    else:
        src_rows = [(int(r), int(c)) for r, c in sources]
    if not src_rows:
        raise ValueError("no source cells")
    src_set = set(src_rows)
    fill = float(cube.bands[cost_band].fill)

    c = cube.chunks.where(F.col("measurement") == cost_band)
    n_tiles, ntx, nty = cube.geobox.n_tiles(cube.tile_size)

    def _valid(m):
        v = ~np.isnan(m)
        if not np.isnan(fill):
            v &= m != fill
        return v

    out_cols = [f.name for f in CHUNK_SCHEMA.fields]

    def _init(key, sub: pd.DataFrame):
        frames = []
        for row in sub.itertuples(index=False):
            m = np.asarray(row.values, dtype=np.float64).reshape(
                row.h, row.w)
            d = np.where(_valid(m), np.inf, np.nan)
            for (sr, sc) in src_set:
                if (row.row0 <= sr < row.row0 + row.h
                        and row.col0 <= sc < row.col0 + row.w):
                    if not np.isnan(d[sr - row.row0, sc - row.col0]):
                        d[sr - row.row0, sc - row.col0] = 0.0
            rec = {k: getattr(row, k) for k in out_cols
                   if k != "values"}
            rec["measurement"] = "__dist"
            rec["values"] = d.ravel()
            frames.append(rec)
        return pd.DataFrame(frames, columns=out_cols)

    sc_ctx = c.sparkSession.sparkContext
    n_parts = max(1, min(int(n_tiles), 4 * sc_ctx.defaultParallelism))
    dist = _grouped_map(c, ["group_key", "tile_id"], n_parts, _init,
                        CHUNK_SCHEMA).transform(_flat)
    cost_tagged = c.withColumn("measurement", F.lit("__cost")) \
        .transform(_flat)

    sq2 = float(np.sqrt(2.0))

    def _relax(key, sub: pd.DataFrame) -> pd.DataFrame:
        gk, tid = key
        csub = sub[sub["measurement"].values == "__cost"]
        dsub = sub[sub["measurement"].values == "__dist"]
        dctr = dsub[dsub["role"].values == 0]
        cctr = csub[csub["role"].values == 0]
        if not len(dctr) or not len(cctr):
            return pd.DataFrame([], columns=out_cols)
        cpad, th, tw, row0, col0 = _paste_padded(csub, cctr.iloc[0], 1)
        dpad, _, _, _, _ = _paste_padded(dsub, dctr.iloc[0], 1)
        cost_ok = _valid(cpad)
        cn = np.where(cost_ok, cpad, np.inf)
        dn = np.where(np.isnan(dpad), np.inf, dpad)
        old_center = dn[1:th + 1, 1:tw + 1].copy()
        cc = cn[1:th + 1, 1:tw + 1]
        while True:
            new = dn[1:th + 1, 1:tw + 1].copy()
            for (dy, dx) in _D8_MOVES:
                w8 = sq2 if (dy and dx) else 1.0
                dsh = dn[1 + dy:th + 1 + dy, 1 + dx:tw + 1 + dx]
                csh = cn[1 + dy:th + 1 + dy, 1 + dx:tw + 1 + dx]
                cand = dsh + (cc + csh) / 2.0 * w8
                np.minimum(new, cand, out=new)
            if not (new < dn[1:th + 1, 1:tw + 1]).any():
                break
            dn[1:th + 1, 1:tw + 1] = new
        center = dn[1:th + 1, 1:tw + 1]
        center = np.where(cost_ok[1:th + 1, 1:tw + 1], center, np.nan)
        # nan_to_num would ALSO squash +inf to 1.79e308 and make every
        # unreached cell count as "improved" forever — replace NaN only
        improved = int(np.sum(
            np.where(np.isnan(center), np.inf, center) < old_center))
        base = dctr.iloc[0]
        recs = [{
            "measurement": "__dist", "group_key": gk,
            "zoom": int(base["zoom"]), "tile_id": int(tid),
            "row0": row0, "col0": col0, "h": th, "w": tw,
            "values": center.ravel(),
            "n_geoms": int(base["n_geoms"]),
            "n_cells_burned": th * tw,
            "min_seq": int(base["min_seq"]),
            "max_seq": int(base["max_seq"]),
        }, {
            "measurement": "__improved", "group_key": gk,
            "zoom": int(base["zoom"]), "tile_id": int(tid),
            "row0": row0, "col0": col0, "h": 1, "w": 1,
            "values": [float(improved)],
            "n_geoms": 0, "n_cells_burned": 1,
            "min_seq": -1, "max_seq": -1,
        }]
        return pd.DataFrame(recs, columns=out_cols)

    import logging

    log = logging.getLogger("geocube_spark.cost_distance")
    for rnd in range(int(max_rounds)):
        both = cost_tagged.unionByName(dist)
        strips = _halo_strips(both, ntx, nty, 1)
        out = _grouped_map(
            strips, ["group_key", "tile_id"], n_parts, _relax,
            CHUNK_SCHEMA,
        ).transform(_flat)
        improved = (
            out.where(F.col("measurement") == "__improved")
            .agg(F.sum(F.element_at("values", 1))).collect()[0][0]
        )
        dist = out.where(F.col("measurement") == "__dist")
        log.debug("cost_distance round %d improved=%s", rnd, improved)
        if not improved:
            break

    final = dist.withColumn(
        "measurement", F.lit("cost_dist")
    ).withColumn(
        "values",
        F.transform(
            "values",
            lambda x: F.when(
                x == F.lit(float("inf")),
                F.lit(float("nan")).cast("double")).otherwise(x),
        ),
    )
    bands = {"cost_dist": BandMeta("cost_dist", "float64",
                                   float("nan"))}
    return GeoCube(chunks=final, geobox=cube.geobox, bands=bands,
                   tile_size=cube.tile_size, fill=float("nan"),
                   group_by=cube.group_by, group_keys=cube.group_keys)


def cost_backlink(cube: GeoCube, sources, *, cost_band: str,
                  dist: GeoCube = None,
                  max_rounds: int = 256) -> GeoCube:
    """Cost-path backlink raster (ESRI CostBackLink): for every
    reachable cell, the D8 code (E=1, SE=2, S=4, SW=8, W=16, NW=32,
    N=64, NE=128 — same encoding as ``terrain(mode='flowdir')``) of
    the PREDECESSOR cell on its least-cost path, i.e. the neighbor n
    minimizing ``dist(n) + (cost(n)+cost(cell))/2 * step``; sources
    code 0. Following backlinks from any cell walks the optimal path
    back to its source — the raster IS the path structure, so path
    extraction never needs a distributed walk.

    At the :func:`cost_distance` fixpoint the minimizing neighbor's
    candidate EQUALS dist(cell) bit-for-bit (dist was assigned from
    that very expression), so the argmin is exact; ties break to the
    smallest D8 code like flowdir. One extra halo-exchange stencil
    pass over the converged distance surface (``dist`` defaults to
    running :func:`cost_distance` here).

    Returns a GeoCube with band ``backlink`` (float64 codes, nodata
    for impassable/unreached cells)."""
    import pandas as pd

    from .cube import CHUNK_SCHEMA, GeoCube, _grouped_map

    if cost_band not in cube.bands:
        raise ValueError(f"unknown band {cost_band!r}")
    if dist is None:
        dist = cost_distance(cube, sources, cost_band=cost_band,
                             max_rounds=max_rounds)
    fill = float(cube.bands[cost_band].fill)
    c = cube.chunks.where(F.col("measurement") == cost_band) \
        .withColumn("measurement", F.lit("__cost"))
    d = dist.chunks.withColumn("measurement", F.lit("__dist"))
    n_tiles, ntx, nty = cube.geobox.n_tiles(cube.tile_size)
    out_cols = [f.name for f in CHUNK_SCHEMA.fields]

    def _valid(m):
        v = ~np.isnan(m)
        if not np.isnan(fill):
            v &= m != fill
        return v

    sq2 = float(np.sqrt(2.0))
    # neighbor (dy, dx) -> code of the DIRECTION FROM cell TO that
    # neighbor (the backlink points the walk toward the predecessor)
    code_of = {(0, 1): 1.0, (1, 1): 2.0, (1, 0): 4.0, (1, -1): 8.0,
               (0, -1): 16.0, (-1, -1): 32.0, (-1, 0): 64.0,
               (-1, 1): 128.0}

    def _link(key, sub: pd.DataFrame) -> pd.DataFrame:
        gk, tid = key
        csub = sub[sub["measurement"].values == "__cost"]
        dsub = sub[sub["measurement"].values == "__dist"]
        cctr = csub[csub["role"].values == 0]
        dctr = dsub[dsub["role"].values == 0]
        if not len(cctr) or not len(dctr):
            return pd.DataFrame([], columns=out_cols)
        cpad, th, tw, row0, col0 = _paste_padded(csub, cctr.iloc[0], 1)
        dpad, _, _, _, _ = _paste_padded(dsub, dctr.iloc[0], 1)
        cn = np.where(_valid(cpad), cpad, np.inf)
        dn = np.where(np.isnan(dpad), np.inf, dpad)
        cc = cn[1:th + 1, 1:tw + 1]
        dcen = dn[1:th + 1, 1:tw + 1]
        best = np.full((th, tw), np.inf)
        code = np.zeros((th, tw))
        # ascending code order => on ties the SMALLEST code sticks
        for (dy, dx), cd in sorted(code_of.items(),
                                   key=lambda kv: kv[1]):
            w8 = sq2 if (dy and dx) else 1.0
            dsh = dn[1 + dy:th + 1 + dy, 1 + dx:tw + 1 + dx]
            csh = cn[1 + dy:th + 1 + dy, 1 + dx:tw + 1 + dx]
            cand = dsh + (cc + csh) / 2.0 * w8
            better = cand < best
            best[better] = cand[better]
            code[better] = cd
        reached = np.isfinite(dcen)
        out = np.where(reached, code, np.nan)
        out[reached & (dcen == 0.0)] = 0.0          # sources
        base = dctr.iloc[0]
        return pd.DataFrame([{
            "measurement": "backlink", "group_key": gk,
            "zoom": int(base["zoom"]), "tile_id": int(tid),
            "row0": row0, "col0": col0, "h": th, "w": tw,
            "values": out.ravel(),
            "n_geoms": int(base["n_geoms"]), "n_cells_burned": th * tw,
            "min_seq": int(base["min_seq"]),
            "max_seq": int(base["max_seq"]),
        }], columns=out_cols)

    sc_ctx = c.sparkSession.sparkContext
    n_parts = max(1, min(int(n_tiles), 4 * sc_ctx.defaultParallelism))
    strips = _halo_strips(c.unionByName(d), ntx, nty, 1)
    out = _grouped_map(strips, ["group_key", "tile_id"], n_parts,
                       _link, CHUNK_SCHEMA)
    bands = {"backlink": BandMeta("backlink", "float64", float("nan"))}
    return GeoCube(chunks=out, geobox=cube.geobox, bands=bands,
                   tile_size=cube.tile_size, fill=float("nan"),
                   group_by=cube.group_by, group_keys=cube.group_keys)


def extract_cost_path(backlink: GeoCube, dest, *,
                      max_cells: int = 2_000_000) -> list:
    """Walk a :func:`cost_backlink` raster from ``dest`` (row, col)
    back to its source; returns the path as a list of (row, col) from
    destination to source inclusive. Driver-side by design: a path is
    O(grid diameter) cells, but the walk needs random access, so the
    backlink band is collected once (guarded by ``max_cells`` — for
    larger rasters, clip the cube to the path's bounding region
    first; the backlink raster itself always stays distributed)."""
    n_cells = backlink.chunks.agg(
        F.sum(F.col("h") * F.col("w"))).collect()[0][0] or 0
    if n_cells > max_cells:
        raise ValueError(
            f"backlink raster has {n_cells} cells > max_cells "
            f"{max_cells}; clip to the region of interest first")
    from .operators.geocube_queries import _explode_cells

    rows = _explode_cells(backlink.chunks).where(
        F.col("val").isNotNull() & ~F.isnan("val")).collect()
    codes = {(r["row"], r["col"]): int(r["val"]) for r in rows}
    step = {1: (0, 1), 2: (1, 1), 4: (1, 0), 8: (1, -1), 16: (0, -1),
            32: (-1, -1), 64: (-1, 0), 128: (-1, 1)}
    cur = (int(dest[0]), int(dest[1]))
    if cur not in codes:
        raise ValueError(f"destination {cur} is not a reached cell")
    path = [cur]
    seen = {cur}
    while codes[cur] != 0:
        dy, dx = step[codes[cur]]
        cur = (cur[0] + dy, cur[1] + dx)
        if cur in seen:
            raise RuntimeError(f"backlink cycle at {cur}")
        seen.add(cur)
        path.append(cur)
    return path


def watershed(cube: GeoCube, pour_points, band: str = "flowdir",
              max_rounds: int = None) -> DataFrame:
    """Watershed delineation (ESRI Watershed / GRASS r.water.outlet):
    label every cell by the FIRST pour point its D8 flow path
    reaches. Nested pour points follow the ESRI rule — a cell belongs
    to the nearest pour point downstream of it, so an upstream pour
    "captures" its sub-catchment out of a downstream pour's
    watershed; a pour cell belongs to its own watershed.

    Built on the same exact ancestor-pair doubling closure as
    :func:`flow_accumulation` (log-round joins, never a sequential
    walk): hits = closure pairs landing on a pour (plus pour
    self-hits); the first-encounter rule is one anti-join against the
    pour-to-pour drainage order (q strictly upstream of p blocks p
    for any cell that also reaches q). Pour points broadcast.

    ``pour_points``: DataFrame (pour_id, row, col) or iterable of
    (pour_id, row, col). Returns (row, col, pour_id) for every cell
    in some watershed; cells draining to no pour point are absent."""
    cells = flow_cells(cube, band)
    edges = flow_edges(cube, band)
    if isinstance(pour_points, DataFrame):
        pp = pour_points.select(
            F.col("pour_id").cast("int").alias("pid"),
            F.col("row").cast("int").alias("prow"),
            F.col("col").cast("int").alias("pcol"),
        )
    else:
        rows = [(int(p), int(r), int(c)) for p, r, c in pour_points]
        if not rows:
            raise ValueError("no pour points")
        pp = cells.sparkSession.createDataFrame(
            rows, "pid int, prow int, pcol int")
    pp = F.broadcast(pp)
    pairs = _ancestor_closure(cells, edges, cube.geobox.shape,
                              max_rounds)

    hits = pairs.join(
        pp, (F.col("ar") == F.col("prow"))
        & (F.col("ac") == F.col("pcol"))
    ).select(F.col("ur").alias("row"), F.col("uc").alias("col"),
             "pid")
    self_hits = cells.join(
        pp, (F.col("row") == F.col("prow"))
        & (F.col("col") == F.col("pcol"))
    ).select("row", "col", "pid")
    hits = hits.unionByName(self_hits)

    # pour drainage order: qid strictly upstream of pid
    porder = (
        pp.alias("q")
        .join(pairs, (F.col("q.prow") == F.col("ur"))
              & (F.col("q.pcol") == F.col("uc")))
        .join(pp.alias("p"), (F.col("ar") == F.col("p.prow"))
              & (F.col("ac") == F.col("p.pcol")))
        .select(F.col("q.pid").alias("qid"),
                F.col("p.pid").alias("bpid"))
    )
    blockers = (
        hits.alias("h2")
        .join(F.broadcast(porder),
              F.col("h2.pid") == F.col("qid"))
        .select(F.col("h2.row").alias("row"),
                F.col("h2.col").alias("col"),
                F.col("bpid").alias("pid"))
        .where(F.col("pid").isNotNull())
        .distinct()
    )
    return hits.join(blockers, ["row", "col", "pid"], "left_anti") \
        .select("row", "col", F.col("pid").alias("pour_id"))


def flow_length(cube: GeoCube, band: str = "flowdir",
                max_rounds: int = None) -> DataFrame:
    """Downstream flow length (ESRI FlowLength, direction
    DOWNSTREAM): for every valid cell, the along-path distance to its
    terminal sink — orthogonal steps cost the affine cell size
    (|a| east-west, |e| north-south), diagonal steps their hypot.

    Same pointer-jumping plan as :func:`flow_basins` with an additive
    distance rider: each round composes pointers AND sums the two
    half-path distances, so length-L paths resolve in ceil(log2 L)
    rounds (the doubling sums tree-wise; at 6 dp that is
    indistinguishable from the sequential walk the oracle runs).

    Returns (row, col, flow_length) — 0.0 for sinks/flats."""
    cells = flow_cells(cube, band)
    edges = flow_edges(cube, band)
    a = cube.geobox.affine
    dx, dy = abs(float(a.a)), abs(float(a.e))
    diag = float(np.hypot(dx, dy))
    h, w = cube.geobox.shape
    if max_rounds is None:
        max_rounds = max(2, int(np.ceil(np.log2(max(2, h * w)))) + 1)
    step = F.when(
        (F.col("nrow") != F.col("row"))
        & (F.col("ncol") != F.col("col")), F.lit(diag)
    ).when(F.col("nrow") != F.col("row"), F.lit(dy)) \
        .otherwise(F.lit(dx))
    ptr = cells.join(edges, ["row", "col"], "left").select(
        "row", "col",
        F.coalesce("nrow", "row").alias("prow"),
        F.coalesce("ncol", "col").alias("pcol"),
        F.when(F.col("nrow").isNotNull(), step)
        .otherwise(F.lit(0.0)).alias("d"),
    ).transform(_flat)
    for _ in range(max_rounds):
        if _converged(ptr, edges):
            break
        hop = ptr.select(
            F.col("row").alias("prow"), F.col("col").alias("pcol"),
            F.col("prow").alias("gprow"), F.col("pcol").alias("gpcol"),
            F.col("d").alias("d2"),
        )
        ptr = ptr.join(hop, ["prow", "pcol"], "inner").select(
            "row", "col",
            F.col("gprow").alias("prow"),
            F.col("gpcol").alias("pcol"),
            (F.col("d") + F.col("d2")).alias("d"),
        ).transform(_flat)
    return ptr.select("row", "col", F.col("d").alias("flow_length"))


def zonal_geometry(cube: GeoCube, zone_band: str) -> DataFrame:
    """ESRI ZonalGeometry: per-zone AREA, PERIMETER, and CENTROID
    from an integer-valued zone raster. Area = cell count x cell
    area; perimeter sums the zone's exposed 4-neighbor edges in CRS
    units (a horizontally-adjacent differing/nodata/off-grid neighbor
    exposes a vertical edge of length |dy|, a vertical one an edge of
    |dx| — exactly the boundary a vectorized zone polygon would
    have); centroid = mean of member cell centers.

    Plan: perimeter contributions are a 1-deep halo stencil (the
    focal/terrain machinery — O(r x perimeter) strips, ONE
    equi-shuffle) producing a per-cell edge-length band; the zone
    aggregate then rides :func:`zonal_stats_raster`'s chunk-grain
    partial path. Area/centroid are one cell explode + ONE map-side-
    combined aggregate. No cell-level self-joins anywhere.

    Returns (group_key, zone, area_cells, area, perimeter, cx, cy)."""
    if zone_band not in cube.bands:
        raise ValueError(f"unknown band {zone_band!r}")
    a = cube.geobox.affine
    dx = abs(float(a.a))
    dy = abs(float(a.e))
    fill = float(cube.bands[zone_band].fill)

    def _edges_kernel(m, pad, th, tw):
        valid = ~np.isnan(pad)
        if not np.isnan(fill):
            valid &= pad != fill
        z = pad
        c0 = z[1:th + 1, 1:tw + 1]
        vc = valid[1:th + 1, 1:tw + 1]
        out = np.zeros((th, tw), dtype=np.float64)
        # horizontal neighbors expose vertical edges (length dy)
        for sl, ln in ((np.s_[1:th + 1, 0:tw], dy),
                       (np.s_[1:th + 1, 2:tw + 2], dy),
                       (np.s_[0:th, 1:tw + 1], dx),
                       (np.s_[2:th + 2, 1:tw + 1], dx)):
            nb, nv = z[sl], valid[sl]
            exposed = ~nv | (nb != c0)
            out += np.where(exposed, ln, 0.0)
        return np.where(vc, out, np.nan)

    c = cube.chunks.filter(F.col("measurement") == zone_band)
    perim_chunks = _stencil_cube(cube, c, 1, _edges_kernel,
                                 "__perim", True)
    perim_cube = GeoCube(
        chunks=c.unionByName(perim_chunks), geobox=cube.geobox,
        bands={
            zone_band: cube.bands[zone_band],
            "__perim": BandMeta("__perim", "float64", float("nan")),
        },
        group_by=cube.group_by, group_keys=cube.group_keys,
        tile_size=cube.tile_size, fill=cube.fill,
    )
    perim = zonal_stats_raster(perim_cube, zone_band, "__perim") \
        .select("group_key", "zone",
                F.col("vsum").alias("perimeter"))

    cells = c.select(
        "group_key", "row0", "col0", "w",
        F.posexplode("values").alias("pos", "val"),
    ).select(
        "group_key",
        (F.col("row0") + (F.col("pos") / F.col("w")).cast("int"))
        .alias("row"),
        (F.col("col0") + F.col("pos") % F.col("w")).cast("int")
        .alias("col"),
        "val",
    )
    data = cells.filter(F.col("val").isNotNull() & ~F.isnan("val"))
    if not np.isnan(fill):
        data = data.filter(F.col("val") != fill)
    cx = F.lit(float(a.c)) + F.lit(float(a.a)) * (F.col("col") + 0.5)
    cy = F.lit(float(a.f)) + F.lit(float(a.e)) * (F.col("row") + 0.5)
    geo = (
        data.groupBy("group_key", F.col("val").alias("zone"))
        .agg(
            F.count(F.lit(1)).alias("area_cells"),
            F.avg(cx).alias("cx"),
            F.avg(cy).alias("cy"),
        )
        .select(
            "group_key", "zone", "area_cells",
            (F.col("area_cells") * F.lit(dx * dy)).alias("area"),
            "cx", "cy",
        )
    )
    p = perim.select(F.col("group_key").alias("pg"),
                     F.col("zone").alias("pz"), "perimeter")
    return geo.join(
        p,
        geo["group_key"].eqNullSafe(p["pg"])
        & (geo["zone"] == p["pz"]),
        "left",
    ).select(
        "group_key", "zone", "area_cells", "area",
        F.coalesce("perimeter", F.lit(0.0)).alias("perimeter"),
        "cx", "cy",
    ).orderBy("group_key", "zone")


def iso_cluster(cube: GeoCube, measurements: Sequence[str], *,
                k: int = 8, iters: int = 2) -> DataFrame:
    """Unsupervised raster classification — the ESRI IsoCluster /
    multiband k-means workflow: every cell whose SELECTED bands all
    hold data becomes a feature vector, clustered by the engine's
    deterministic fixed-iteration Lloyd trainer
    (:func:`~geocube_spark.functions.similarity.kmeans`: exemplar
    seeds from the content hash of the cell id, 6-dp rounded argmin,
    empty clusters keep centroids — the whole chain SQL-replayable).
    Ungrouped cubes only (a grouped classification is one call per
    group key).

    Returns (row, col, cluster, d2). Plan: the bands' chunk tables
    tile-align with |bands|-1 equi-joins on (tile_id) and explode
    ONCE to cell vectors (never a cell-level join); the trainer then
    runs its Arrow partial-sum passes over that narrow projection."""
    if cube.group_by is not None:
        raise ValueError("iso_cluster expects an ungrouped cube; "
                         "classify per group key instead")
    measurements = list(measurements)
    if len(measurements) < 1:
        raise ValueError("at least one band required")
    for m in measurements:
        if m not in cube.bands:
            raise ValueError(f"unknown band {m!r}")
    from .functions.similarity import kmeans as _kmeans

    c = cube.chunks
    base = None
    for i, m in enumerate(measurements):
        b = c.filter(F.col("measurement") == m).select(
            "tile_id",
            *( ["row0", "col0", "w"] if i == 0 else [] ),
            F.col("values").alias(f"__v{i}"),
        )
        base = b if base is None else base.join(b, "tile_id")
    zipped = base.select(
        "row0", "col0", "w",
        F.posexplode(F.arrays_zip(
            *[f"__v{i}" for i in range(len(measurements))]
        )).alias("pos", "z"),
    )
    vec = F.array(*[
        F.col("z").getField(f"__v{i}").cast("double")
        for i in range(len(measurements))
    ])
    fills = [float(cube.bands[m].fill) for m in measurements]
    is_data = F.lit(True)
    for i, fl in enumerate(fills):
        el = F.element_at(vec, i + 1)
        cond = el.isNotNull() & ~F.isnan(el)
        if not np.isnan(fl):
            cond = cond & (el != F.lit(fl))
        is_data = is_data & cond
    width = int(cube.geobox.width)
    cells = zipped.select(
        ((F.col("row0") + (F.col("pos") / F.col("w")).cast("int"))
         * width
         + F.col("col0") + F.col("pos") % F.col("w"))
        .cast("long").alias("cid"),
        vec.alias("features"),
    ).where(is_data)
    out = _kmeans(cells, k=k, iters=iters, id_col="cid",
                  vec_col="features")
    return out.select(
        (F.col("id") / width).cast("int").alias("row"),
        (F.col("id") % width).cast("int").alias("col"),
        "cluster", "d2",
    )


def normalized_difference(cube: GeoCube, a: str, b: str, *,
                          name: Optional[str] = None) -> GeoCube:
    """Normalized-difference index ``(a - b) / (a + b)`` — the NDVI /
    NDWI / NBR family every remote-sensing pipeline derives (xarray
    ``(nir - red) / (nir + red)``): appended as band ``name``
    (default ``nd_{a}_{b}``), nodata where either input is nodata,
    and a ZERO denominator (both bands 0) also maps to nodata rather
    than an inf that would poison downstream stats — rasterio's
    ``np.errstate``-guarded convention. Pure element program through
    :func:`with_band`; zero added shuffle."""
    for m in (a, b):
        if m not in cube.bands:
            raise ValueError(f"unknown band {m!r}")
    is_a = _is_data_fn(F.lit(float(cube.bands[a].fill)))
    is_b = _is_data_fn(F.lit(float(cube.bands[b].fill)))

    def _nd(x, y):
        den = x + y
        val = F.when(den != 0.0, (x - y) / den) \
            .otherwise(F.lit(float("nan")))
        return F.when(is_a(x) & is_b(y), val) \
            .otherwise(F.lit(float("nan")))

    return with_band(cube, name or f"nd_{a}_{b}", (a, b), _nd,
                     fill=float("nan"))


def fill_sinks(cube: GeoCube, band: str, *, epsilon: float = 0.0,
               max_rounds: int = 256) -> GeoCube:
    """Depression filling (Planchon & Darboux 2001; ESRI Fill /
    WhiteboxTools ``fill_depressions``) — the standard DEM
    preprocessing before D8 flow analysis: raise every cell trapped
    in a pit to its spill level, ``W(c) = max(z(c), min_{n in N8}
    (W(n) + epsilon))`` from ``W = +inf``, with OUTLET cells (any
    valid cell with an off-grid or nodata 8-neighbor — water escapes
    there) pinned at ``z``. ``epsilon = 0`` is the classic flat fill;
    a small positive epsilon leaves a drainable gradient.

    Distributed shape — the :func:`cost_distance` blocked relaxation:
    each global round is ONE 1-deep halo exchange of W/z border
    strips followed by per-tile Gauss-Seidel iteration to WITHIN-TILE
    convergence (W is monotone nonincreasing from +inf, so any
    schedule reaches the same unique fixpoint); rounds scale with
    spill-path length in TILES. Stops at the global fixpoint, raising
    past ``max_rounds``. With ``epsilon = 0`` every converged W is an
    exact z value (pure max/min algebra), so the result is
    bit-identical to the oracle's Jacobi replay.

    Returns a cube with band ``{band}_filled`` (nodata preserved)."""
    import pandas as pd

    from .cube import CHUNK_SCHEMA, GeoCube, _grouped_map

    if band not in cube.bands:
        raise ValueError(f"unknown band {band!r}")
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    if epsilon < 0:
        raise ValueError("epsilon must be >= 0")
    fill = float(cube.bands[band].fill)
    eps = float(epsilon)

    c = cube.chunks.where(F.col("measurement") == band)
    n_tiles, ntx, nty = cube.geobox.n_tiles(cube.tile_size)

    def _valid(m):
        v = ~np.isnan(m)
        if not np.isnan(fill):
            v &= m != fill
        return v

    out_cols = [f.name for f in CHUNK_SCHEMA.fields]

    def _init(key, sub: pd.DataFrame):
        frames = []
        for row in sub.itertuples(index=False):
            m = np.asarray(row.values, dtype=np.float64).reshape(
                row.h, row.w)
            w = np.where(_valid(m), np.inf, np.nan)
            rec = {k: getattr(row, k) for k in out_cols
                   if k != "values"}
            rec["measurement"] = "__w"
            rec["values"] = w.ravel()
            frames.append(rec)
        return pd.DataFrame(frames, columns=out_cols)

    sc_ctx = c.sparkSession.sparkContext
    n_parts = max(1, min(int(n_tiles), 4 * sc_ctx.defaultParallelism))
    wdf = _grouped_map(c, ["group_key", "tile_id"], n_parts, _init,
                       CHUNK_SCHEMA).transform(_flat)
    z_tagged = c.withColumn("measurement", F.lit("__z")) \
        .transform(_flat)

    def _relax(key, sub: pd.DataFrame) -> pd.DataFrame:
        gk, tid = key
        zsub = sub[sub["measurement"].values == "__z"]
        wsub = sub[sub["measurement"].values == "__w"]
        zctr = zsub[zsub["role"].values == 0]
        wctr = wsub[wsub["role"].values == 0]
        if not len(zctr) or not len(wctr):
            return pd.DataFrame([], columns=out_cols)
        zpad, th, tw, row0, col0 = _paste_padded(zsub, zctr.iloc[0], 1)
        wpad, _, _, _, _ = _paste_padded(wsub, wctr.iloc[0], 1)
        ok = _valid(zpad)
        zc = zpad[1:th + 1, 1:tw + 1]
        okc = ok[1:th + 1, 1:tw + 1]
        # outlets: valid cell with any invalid padded neighbor (the
        # pad beyond the grid edge is NaN, so border cells qualify)
        nvalid = sum(
            ok[1 + dy:th + 1 + dy, 1 + dx:tw + 1 + dx].astype(int)
            for (dy, dx) in _D8_MOVES
        )
        outlet = okc & (nvalid < 8)
        wn = np.where(np.isnan(wpad), np.inf, wpad)
        wn[1:th + 1, 1:tw + 1][outlet] = zc[outlet]
        old_center = wn[1:th + 1, 1:tw + 1].copy()
        while True:
            mn = np.minimum.reduce([
                wn[1 + dy:th + 1 + dy, 1 + dx:tw + 1 + dx]
                for (dy, dx) in _D8_MOVES
            ])
            new = np.maximum(zc, mn + eps)
            new = np.where(outlet, np.where(okc, zc, np.nan), new)
            cur = wn[1:th + 1, 1:tw + 1]
            new = np.minimum(new, cur)  # monotone: never raise
            if not (new < cur).any():
                break
            wn[1:th + 1, 1:tw + 1] = new
        center = np.where(okc, wn[1:th + 1, 1:tw + 1], np.nan)
        improved = int(np.sum(
            np.where(np.isnan(center), np.inf, center) < old_center))
        base = wctr.iloc[0]
        recs = [{
            "measurement": "__w", "group_key": gk,
            "zoom": int(base["zoom"]), "tile_id": int(tid),
            "row0": row0, "col0": col0, "h": th, "w": tw,
            "values": center.ravel(),
            "n_geoms": int(base["n_geoms"]),
            "n_cells_burned": th * tw,
            "min_seq": int(base["min_seq"]),
            "max_seq": int(base["max_seq"]),
        }, {
            "measurement": "__imp", "group_key": gk,
            "zoom": int(base["zoom"]), "tile_id": int(tid),
            "row0": row0, "col0": col0, "h": 1, "w": 1,
            "values": [float(improved)],
            "n_geoms": 0, "n_cells_burned": 1,
            "min_seq": -1, "max_seq": -1,
        }]
        return pd.DataFrame(recs, columns=out_cols)

    for _ in range(int(max_rounds)):
        both = z_tagged.unionByName(wdf)
        strips = _halo_strips(both, ntx, nty, 1)
        out = _grouped_map(
            strips, ["group_key", "tile_id"], n_parts, _relax,
            CHUNK_SCHEMA,
        ).transform(_flat)
        improved = (
            out.where(F.col("measurement") == "__imp")
            .agg(F.sum(F.element_at("values", 1))).collect()[0][0]
        )
        wdf = out.where(F.col("measurement") == "__w") \
            .transform(_flat)
        if not improved:
            name = f"{band}_filled"
            chunks = wdf.withColumn("measurement", F.lit(name))
            return GeoCube(
                chunks=chunks, geobox=cube.geobox,
                bands={name: BandMeta(name, "float64", float("nan"))},
                group_by=cube.group_by, group_keys=cube.group_keys,
                tile_size=cube.tile_size, fill=float("nan"),
            )
    raise RuntimeError(
        f"fill_sinks did not converge within {max_rounds} rounds"
    )


def glcm(cube: GeoCube, band: str, metric: str = "contrast", *,
         levels: int = 8, lo: float, hi: float,
         size: int = 3) -> GeoCube:
    """GLCM texture metric (Haralick, Shanmugam & Dinstein 1973; the
    ESRI / xarray-spatial / scikit-image ``graycomatrix`` family):
    the band quantizes to ``levels`` equal-width bins on [lo, hi)
    (clamped), and each cell's ``size x size`` window builds the
    SYMMETRIC gray-level co-occurrence matrix at offset (0, 1) —
    horizontal neighbor pairs with both ends inside the window, each
    counted in both directions (scikit-image ``symmetric=True,
    normed=True``). Metrics over the normalized matrix P:

    * contrast    = sum P(i,j) * (i-j)^2
    * homogeneity = sum P(i,j) / (1 + (i-j)^2)   (a.k.a. IDM)
    * energy      = sum P(i,j)^2                  (ASM)
    * entropy     = -sum P(i,j) * ln P(i,j)       (zero bins skipped)

    Defined only where ALL window cells are valid (the terrain
    all-valid rule); elsewhere nodata.

    Kernel shape: ONE halo exchange (radius size//2), then per tile
    every directed (i, j) pair class gets its per-cell window count
    from a summed-area table over the class's indicator raster —
    levels^2 SATs per tile, each O(cells), no per-cell window
    loop."""
    if metric not in ("contrast", "homogeneity", "energy", "entropy"):
        raise ValueError(f"unsupported metric {metric!r}")
    if band not in cube.bands:
        raise ValueError(f"unknown band {band!r}")
    if levels < 2:
        raise ValueError("levels must be >= 2")
    if size < 3 or size % 2 == 0:
        raise ValueError("size must be odd and >= 3")
    if not hi > lo:
        raise ValueError("hi must be > lo")
    fill = float(cube.bands[band].fill)
    L = int(levels)
    r = size // 2
    lo_f, hi_f = float(lo), float(hi)

    def _kernel(m, pad, th, tw):
        valid = ~np.isnan(pad)
        if not np.isnan(fill):
            valid &= pad != fill
        # mask invalid cells BEFORE the int cast: floor(NaN) ->
        # int64 is platform-defined and warns per batch, so replace
        # nodata with lo first and overwrite with -1 after.
        q = np.where(
            valid,
            np.clip(
                np.floor(
                    (np.where(valid, pad, lo_f) - lo_f)
                    / (hi_f - lo_f) * L
                ),
                0, L - 1,
            ),
            -1.0,
        ).astype(np.int64)
        rows = r + np.arange(th)[:, None]
        cols = r + np.arange(tw)[None, :]

        def _box(S, r0, c0, r1, c1):
            # inclusive box sums around every center cell (padded
            # index (R + r, C + r)): rows [R+r0, R+r1], cols
            # [C+c0, C+c1]
            return (S[rows + r1 + 1, cols + c1 + 1]
                    - S[rows + r0, cols + c1 + 1]
                    - S[rows + r1 + 1, cols + c0]
                    + S[rows + r0, cols + c0])

        V = np.zeros((pad.shape[0] + 1, pad.shape[1] + 1))
        V[1:, 1:] = valid.astype(np.float64).cumsum(0).cumsum(1)
        allv = np.round(_box(V, -r, -r, r, r)) == float(size * size)
        total = 2.0 * size * (size - 1)
        qa, qb = q[:, :-1], q[:, 1:]
        counts = {}
        for i in range(L):
            for j in range(L):
                ind = ((qa == i) & (qb == j)).astype(np.float64)
                S = np.zeros((ind.shape[0] + 1, ind.shape[1] + 1))
                S[1:, 1:] = ind.cumsum(0).cumsum(1)
                # pair anchors: rows [R-r, R+r], cols [C-r, C+r-1]
                counts[(i, j)] = np.round(_box(S, -r, -r, r, r - 1))
        out = np.zeros((th, tw), dtype=np.float64)
        for i in range(L):
            for j in range(L):
                # full-matrix cell (i, j) of the SYMMETRIC GLCM
                p = (counts[(i, j)] + counts[(j, i)]) / total
                if metric == "contrast":
                    out += p * float((i - j) ** 2)
                elif metric == "homogeneity":
                    out += p / float(1 + (i - j) ** 2)
                elif metric == "energy":
                    out += p * p
                else:
                    with np.errstate(divide="ignore",
                                     invalid="ignore"):
                        out += np.where(p > 0, p * np.log(p), 0.0)
        if metric == "entropy":
            out = -out
        return np.where(allv, out, np.nan)

    c = cube.chunks.filter(F.col("measurement") == band)
    name = f"{band}_{metric}"
    chunks = _stencil_cube(cube, c, r, _kernel, name, False)
    return GeoCube(
        chunks=chunks, geobox=cube.geobox,
        bands={name: BandMeta(name, "float64", float("nan"))},
        group_by=cube.group_by, group_keys=cube.group_keys,
        tile_size=cube.tile_size, fill=float("nan"),
    )
