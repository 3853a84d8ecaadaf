"""Band algebra / coarsen / band_stats: numpy parity on assembled
cubes + plan shape (coarsen must stay shuffle-free)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocube_spark import datagen
from geocube_spark.cube import make_geocube


GEOM = (
    '{"type": "Polygon", "coordinates": [[[-91, 41], [-90, 41], '
    '[-90, 42], [-91, 42], [-91, 41]]]}'
)


@pytest.fixture(scope="module")
def two_band_cube(spark):
    docs = datagen.to_spark(spark, datagen.scale_docs(600, seed=13))
    return make_geocube(
        docs, measurements=["m0", "m1"], geom=GEOM,
        resolution=(-1.0 / 32, 1.0 / 32),
        fill=0.0, merge_alg="add", tile_size=16,
    )


def test_with_band_two_inputs(spark, two_band_cube):
    cube = two_band_cube
    out = cube.with_band(
        "ratio", ("m0", "m1"), lambda a, b: (a + 1.0) / (b + 1.0),
        fill=1.0,
    )
    assert set(out.bands) == {"m0", "m1", "ratio"}
    arrs = out.assemble()
    np.testing.assert_allclose(
        arrs["ratio"], (arrs["m0"] + 1.0) / (arrs["m1"] + 1.0),
        rtol=0, atol=0,
    )
    # inputs unchanged
    base = cube.assemble()
    np.testing.assert_array_equal(arrs["m0"], base["m0"])


def test_with_band_single_and_triple(spark, two_band_cube):
    cube = two_band_cube
    one = cube.with_band("db", ("m0",), lambda x: x * 2.0)
    arrs = one.assemble()
    np.testing.assert_array_equal(arrs["db"], arrs["m0"] * 2.0)

    three = one.with_band(
        "mix", ("m0", "m1", "db"), lambda a, b, c: a + b - c
    )
    a3 = three.assemble()
    np.testing.assert_allclose(
        a3["mix"], a3["m0"] + a3["m1"] - a3["db"], rtol=0, atol=1e-12
    )


def test_with_band_errors(two_band_cube):
    with pytest.raises(ValueError, match="already exists"):
        two_band_cube.with_band("m0", ("m1",), lambda x: x)
    with pytest.raises(ValueError, match="unknown input"):
        two_band_cube.with_band("z", ("nope",), lambda x: x)


def test_with_band_grouped(spark):
    docs = datagen.to_spark(spark, datagen.grouped_polygon_docs(3, 5))
    cube = make_geocube(
        docs, measurements=["claytotal_r", "sandtotal_r"],
        group_by="hzdept_r", output_crs="epsg:32615",
        resolution=(-60, 60), fill=0.0, tile_size=32,
    )
    out = cube.with_band(
        "tot", ("claytotal_r", "sandtotal_r"), lambda a, b: a + b
    )
    arrs = out.assemble()
    np.testing.assert_allclose(
        arrs["tot"], arrs["claytotal_r"] + arrs["sandtotal_r"],
        rtol=0, atol=1e-12,
    )


def _np_mode(a, axis):
    """Most frequent value per block, ties to the smallest value."""
    h2, f1, w2, f2 = a.shape
    out = np.empty((h2, w2))
    for r in range(h2):
        for c in range(w2):
            vals, cnt = np.unique(a[r, :, c, :], return_counts=True)
            out[r, c] = vals[np.argmax(cnt)]  # unique sorts ascending
    return out


@pytest.mark.parametrize("agg,np_fn", [
    ("mean", np.mean), ("sum", np.sum), ("min", np.min), ("max", np.max),
    ("median", np.median), ("mode", _np_mode),
])
def test_coarsen_matches_numpy(spark, two_band_cube, agg, np_fn):
    cube = two_band_cube
    f = 4
    out = cube.coarsen(f, agg)
    h, w = cube.geobox.shape
    assert out.geobox.shape == (h // f, w // f)
    assert out.tile_size == cube.tile_size // f
    a = cube.geobox.affine
    assert out.geobox.affine.a == a.a * f and out.geobox.affine.e == a.e * f
    base = cube.assemble()["m0"]
    got = out.assemble()["m0"]
    want = np_fn(
        base.reshape(h // f, f, w // f, f), axis=(1, 3)
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_coarsen_adds_no_shuffle(two_band_cube):
    """coarsen is a narrow map: the coarsened plan has exactly the
    exchanges of the underlying burn, none of its own."""
    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange")

    assert n_exchanges(two_band_cube.coarsen(2, "mean").chunks) <= \
        n_exchanges(two_band_cube.chunks)


def test_coarsen_rejects_misaligned(two_band_cube):
    with pytest.raises(ValueError, match="divisible"):
        two_band_cube.coarsen(7)


def test_band_stats_matches_numpy(spark, two_band_cube):
    cube = two_band_cube
    rows = {
        (r["measurement"], r["group_key"]): r
        for r in cube.band_stats().collect()
    }
    arrs = cube.assemble()
    for m in ("m0", "m1"):
        a = arrs[m]
        d = a[a != 0.0]  # data cells (fill = 0.0 excluded)
        r = rows[(m, None)]
        assert r["n_cells"] == a.size
        assert r["n_nodata"] == int((a == 0.0).sum())
        assert r["vmin"] == pytest.approx(d.min(), abs=0)
        assert r["vmax"] == pytest.approx(d.max(), abs=0)
        assert r["vsum"] == pytest.approx(d.sum(), rel=1e-12)
        assert r["vmean"] == pytest.approx(d.mean(), rel=1e-12)


def test_band_stats_nan_fill(spark):
    docs = datagen.to_spark(spark, datagen.scale_docs(200, seed=4))
    cube = make_geocube(
        docs, measurements=["m0"], resolution=(-0.05, 0.05),
        fill=float("nan"), merge_alg="replace", tile_size=32,
    )
    r = cube.band_stats().collect()[0]
    a = cube.assemble()["m0"]
    assert r["n_nodata"] == int(np.isnan(a).sum())
    assert r["vmean"] == pytest.approx(np.nanmean(a), rel=1e-12)
    assert r["vmin"] == pytest.approx(np.nanmin(a), abs=0)


def test_zonal_stats_raster_matches_pandas(spark, two_band_cube):
    cube = two_band_cube
    arrs = cube.assemble()
    z, v = arrs["m1"].ravel(), arrs["m0"].ravel()
    ok = (z != 0.0) & (v != 0.0)
    import pandas as pd
    want = (
        pd.DataFrame({"zone": z[ok], "v": v[ok]})
        .groupby("zone")["v"]
        .agg(["count", "sum", "min", "max", "mean"])
    )
    got = cube.zonal_stats_raster("m1", "m0").toPandas().set_index("zone")
    assert len(got) == len(want)
    np.testing.assert_array_equal(
        got["n_cells"].values, want.loc[got.index, "count"].values
    )
    np.testing.assert_allclose(
        got["vsum"].values, want.loc[got.index, "sum"].values, rtol=1e-12
    )
    np.testing.assert_allclose(
        got["vmin"].values, want.loc[got.index, "min"].values, rtol=0
    )
    np.testing.assert_allclose(
        got["vmean"].values, want.loc[got.index, "mean"].values, rtol=1e-12
    )


def test_zonal_majority_matches_counter(spark, two_band_cube):
    """Counter referee for the categorical zonal stats: per zone the
    majority (ties -> smallest value), minority, and variety must
    match an exact python count over the assembled arrays."""
    from collections import Counter

    cube = two_band_cube
    arrs = cube.assemble()
    z, v = arrs["m1"].ravel(), arrs["m0"].ravel()
    ok = (z != 0.0) & (v != 0.0)
    got = cube.zonal_majority("m1", "m0").toPandas().set_index("zone")
    zones = {}
    for zz, vv in zip(z[ok], v[ok]):
        zones.setdefault(zz, Counter())[vv] += 1
    assert len(got) == len(zones)
    for zz, cnt in zones.items():
        row = got.loc[zz]
        assert int(row["variety"]) == len(cnt)
        maj = min(cnt, key=lambda k: (-cnt[k], k))
        mnr = min(cnt, key=lambda k: (cnt[k], k))
        assert row["majority"] == maj and row["majority_n"] == cnt[maj]
        assert row["minority"] == mnr and row["minority_n"] == cnt[mnr]


def test_zonal_majority_ties_and_errors(spark):
    """Hand-built 2-zone cube with real count ties: majority AND
    minority both break to the smallest value (ESRI rule)."""
    from geocube_spark.cube import CHUNK_SCHEMA, BandMeta, GeoCube
    from geocube_spark.geometry.affine import Affine
    from geocube_spark.geometry.crs import CRS
    from geocube_spark.grid.geobox import GeoBox

    gb = GeoBox(4, 2, Affine(1.0, 0.0, 0.0, 0.0, -1.0, 0.0), CRS(4326))
    # zone 1: values 5,5,7,7 (tie) -> majority 5, minority 5
    # zone 2: values 3,9,9,4  -> majority 9, minority (tie 3/4) 3
    zvals = [1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0]
    vvals = [5.0, 5.0, 7.0, 7.0, 3.0, 9.0, 9.0, 4.0]
    rows = [
        ("zone", None, 0, 0, 0, 0, 2, 4, zvals, 1, 8, 0, 0),
        ("val", None, 0, 0, 0, 0, 2, 4, vvals, 1, 8, 0, 0),
    ]
    cube = GeoCube(
        chunks=spark.createDataFrame(rows, CHUNK_SCHEMA), geobox=gb,
        bands={"zone": BandMeta("zone", "float64", float("nan")),
               "val": BandMeta("val", "float64", float("nan"))},
        tile_size=4, fill=float("nan"),
    )
    got = cube.zonal_majority("zone", "val").toPandas().set_index("zone")
    assert got.loc[1.0, "majority"] == 5.0 and got.loc[1.0, "majority_n"] == 2
    assert got.loc[1.0, "minority"] == 5.0 and got.loc[1.0, "variety"] == 2
    assert got.loc[2.0, "majority"] == 9.0 and got.loc[2.0, "majority_n"] == 2
    assert got.loc[2.0, "minority"] == 3.0 and got.loc[2.0, "minority_n"] == 1
    assert got.loc[2.0, "variety"] == 3
    with pytest.raises(ValueError, match="unknown band"):
        cube.zonal_majority("zone", "nope")


def test_color_relief_matches_numpy_interp(spark, two_band_cube):
    """np.interp referee for the ramp channels (gdaldem's linear
    interpolation with clamping), plus the half-up byte rounding."""
    cube = two_band_cube
    ramp = [
        (0.0, 0.0, 0.0, 128.0),
        (2.0, 0.0, 255.0, 0.0),
        (5.0, 255.0, 255.0, 0.0),
        (9.0, 255.0, 0.0, 0.0),
    ]
    out = cube.color_relief("m0", ramp)
    arrs = out.assemble()
    base = cube.assemble()["m0"]
    data = base != 0.0
    xs = [r[0] for r in ramp]
    for ch, sfx in ((1, "r"), (2, "g"), (3, "b")):
        want = np.floor(
            np.interp(base, xs, [r[ch] for r in ramp]) + 0.5 + 1e-9
        )
        got = arrs[f"m0_{sfx}"]
        np.testing.assert_array_equal(got[data], want[data])
        # nodata becomes NaN on the color bands (ramp outputs live in
        # 0..255, so a byte fill would be ambiguous)
        assert np.isnan(got[~data]).all()
    with pytest.raises(ValueError, match="increasing"):
        cube.color_relief("m0", [(1.0, 0, 0, 0), (1.0, 1, 1, 1)])
    with pytest.raises(ValueError, match="at least 2"):
        cube.color_relief("m0", [(1.0, 0, 0, 0)])


def test_coarsen_nan_fill_skipna(spark):
    """NaN-fill cube: nodata travels as NULL elements; coarsen mean
    skips them (xarray skipna) and all-nodata blocks stay nodata."""
    docs = datagen.to_spark(spark, datagen.scale_docs(150, seed=8))
    cube = make_geocube(
        docs, measurements=["m0"], geom=GEOM,
        resolution=(-1.0 / 32, 1.0 / 32),
        fill=float("nan"), merge_alg="replace", tile_size=16,
    )
    base = cube.assemble()["m0"]
    got = cube.coarsen(4, "mean").assemble()["m0"]
    blocks = base.reshape(8, 4, 8, 4).swapaxes(1, 2).reshape(8, 8, 16)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # all-NaN block mean warning
        want = np.nanmean(blocks, axis=2)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def _focal_reference(arr, fill, stat, size):
    """Dense numpy focal reference (O(H*W*s^2), test scale only)."""
    r = size // 2
    H, W = arr.shape
    pad = np.full((H + 2 * r, W + 2 * r), np.nan)
    pad[r:r + H, r:r + W] = arr
    valid = ~np.isnan(pad)
    if not np.isnan(fill):
        valid &= pad != fill
    win = np.lib.stride_tricks.sliding_window_view(pad, (size, size))
    vwin = np.lib.stride_tricks.sliding_window_view(valid, (size, size))
    cnt = vwin.sum(axis=(2, 3)).astype(float)
    filled = np.where(vwin, win, 0.0)
    if stat == "count":
        return np.where(cnt > 0, cnt, np.nan)
    if stat == "median":
        import warnings

        a = np.where(vwin, win, np.nan)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return np.nanmedian(a, axis=(2, 3))
    if stat == "sum":
        return np.where(cnt > 0, filled.sum(axis=(2, 3)), np.nan)
    if stat == "majority":
        # scalar unique-count reference (independent of the engine's
        # sorted-run-length mechanism); frequency ties -> smallest
        out = np.full((H, W), np.nan)
        a = np.where(vwin, win, np.nan)
        for i in range(H):
            for j in range(W):
                vals = a[i, j][~np.isnan(a[i, j])]
                if vals.size:
                    uv, c = np.unique(vals, return_counts=True)
                    out[i, j] = uv[np.lexsort((uv, -c))][0]
        return out
    if stat == "mean":
        with np.errstate(invalid="ignore"):
            return np.where(cnt > 0, filled.sum(axis=(2, 3)) / cnt, np.nan)
    sent = np.inf if stat == "min" else -np.inf
    a = np.where(vwin, win, sent)
    out = a.min(axis=(2, 3)) if stat == "min" else a.max(axis=(2, 3))
    return np.where(np.isfinite(out), out, np.nan)


@pytest.mark.parametrize(
    "stat", ["mean", "sum", "min", "max", "count", "median",
             "majority"])
def test_focal_matches_numpy(spark, two_band_cube, stat):
    cube = two_band_cube
    out = cube.focal(stat=stat, size=3)
    arrs = out.assemble()
    base = cube.assemble()
    for m in ("m0", "m1"):
        ref = _focal_reference(base[m], 0.0, stat, 3)
        np.testing.assert_allclose(arrs[m], ref, rtol=0, atol=1e-9)


def test_focal_majority_categorical_ties(spark, two_band_cube):
    """Majority over a reclassified band: small integer classes make
    real frequency ties, pinning the documented smallest-value
    tie-break against the scalar unique-count referee."""
    # breaks near the 33rd/66th percentile of the summed band give
    # three balanced classes, so 3x3 windows tie often
    cls = two_band_cube.reclassify(
        "m0", [4400.0, 6200.0], [1.0, 2.0, 3.0]
    )
    out = cls.focal(
        stat="majority", size=3, measurements=["m0_class"]
    )
    got = out.assemble()["m0_class"]
    ref = _focal_reference(
        cls.assemble()["m0_class"], 0.0, "majority", 3
    )
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)
    vals = got[~np.isnan(got)]
    assert set(np.unique(vals)) <= {1.0, 2.0, 3.0} and vals.size > 0
    # the input must actually produce tied windows (>=2 classes at
    # the same top frequency) for the tie-break to be exercised
    base = cls.assemble()["m0_class"]
    pad = np.full((base.shape[0] + 2, base.shape[1] + 2), np.nan)
    pad[1:-1, 1:-1] = np.where(base == 0.0, np.nan, base)
    win = np.lib.stride_tricks.sliding_window_view(pad, (3, 3))
    ties = 0
    for i in range(base.shape[0]):
        for j in range(base.shape[1]):
            v = win[i, j][~np.isnan(win[i, j])]
            if v.size:
                _, c = np.unique(v, return_counts=True)
                ties += int((c == c.max()).sum() > 1)
    assert ties > 0


def test_focal_size5_and_grouped(spark):
    docs = datagen.to_spark(spark, datagen.grouped_polygon_docs(3, 5))
    cube = make_geocube(
        docs, measurements=["claytotal_r"], group_by="hzdept_r",
        output_crs="epsg:32615", resolution=(-60, 60), fill=-1.0,
        tile_size=32,
    )
    out = cube.focal(stat="mean", size=5)
    arrs = out.assemble()["claytotal_r"]
    base = cube.assemble()["claytotal_r"]
    assert arrs.shape == base.shape and arrs.ndim == 3
    for g in range(base.shape[0]):
        ref = _focal_reference(base[g], -1.0, "mean", 5)
        np.testing.assert_allclose(arrs[g], ref, rtol=0, atol=1e-9)


def test_focal_nan_fill_and_errors(spark):
    docs = datagen.to_spark(spark, datagen.scale_docs(150, seed=8))
    cube = make_geocube(
        docs, measurements=["m0"], geom=GEOM,
        resolution=(-1.0 / 16, 1.0 / 16),
        fill=float("nan"), merge_alg="replace", tile_size=16,
    )
    out = cube.focal(stat="max", size=3)
    ref = _focal_reference(cube.assemble()["m0"], float("nan"), "max", 3)
    np.testing.assert_allclose(out.assemble()["m0"], ref, rtol=0, atol=0)
    with pytest.raises(ValueError):
        cube.focal(stat="mode")
    with pytest.raises(ValueError):
        cube.focal(size=4)
    with pytest.raises(ValueError):
        cube.focal(size=33)  # radius >= tile_size
    with pytest.raises(ValueError):
        cube.focal(measurements=["nope"])


def _terrain_reference(arr, fill, mode, dx, dy, ysign=1.0,
                       azimuth=315.0, altitude=45.0, z=1.0):
    """Dense numpy Horn reference (independent shift-based impl)."""
    H, W = arr.shape
    pad = np.full((H + 2, W + 2), np.nan)
    pad[1:-1, 1:-1] = arr
    valid = ~np.isnan(pad)
    if not np.isnan(fill):
        valid &= pad != fill
    vwin = np.lib.stride_tricks.sliding_window_view(valid, (3, 3))
    all9 = vwin.all(axis=(2, 3))
    zz = np.where(valid, pad, 0.0)
    sh = lambda dr, dc: zz[1 + dr:H + 1 + dr, 1 + dc:W + 1 + dc]  # noqa
    if mode == "flowdir":
        c0 = sh(0, 0)
        dg = np.sqrt(dx * dx + dy * dy)
        if ysign > 0:  # row+1 is south
            order = [((0, 1), dx), ((1, 1), dg), ((1, 0), dy),
                     ((1, -1), dg), ((0, -1), dx), ((-1, -1), dg),
                     ((-1, 0), dy), ((-1, 1), dg)]
        else:
            order = [((0, 1), dx), ((-1, 1), dg), ((-1, 0), dy),
                     ((-1, -1), dg), ((0, -1), dx), ((1, -1), dg),
                     ((1, 0), dy), ((1, 1), dg)]
        drops = np.stack(
            [(c0 - sh(dr, dc)) / d for (dr, dc), d in order]
        )
        out = np.where(
            drops.max(axis=0) > 0.0,
            2.0 ** drops.argmax(axis=0), 0.0,
        )
        return np.where(all9, out, np.nan)
    if mode in ("curvature", "profile", "plan"):
        c0 = sh(0, 0)
        D = ((sh(0, -1) + sh(0, 1)) / 2.0 - c0) / (dx * dx)
        E = ((sh(-1, 0) + sh(1, 0)) / 2.0 - c0) / (dy * dy)
        Fc = (-sh(-1, -1) + sh(-1, 1) + sh(1, -1) - sh(1, 1)) / (
            4.0 * dx * dy)
        G = (sh(0, 1) - sh(0, -1)) / (2.0 * dx)
        Hh = (sh(-1, 0) - sh(1, 0)) / (2.0 * dy)
        if mode == "curvature":
            out = -2.0 * (D + E) * 100.0
        else:
            g2h2 = G * G + Hh * Hh
            with np.errstate(invalid="ignore", divide="ignore"):
                if mode == "profile":
                    num = 2.0 * (D * G * G + E * Hh * Hh + Fc * G * Hh)
                else:
                    num = -2.0 * (D * Hh * Hh + E * G * G - Fc * G * Hh)
                out = np.where(g2h2 == 0.0, 0.0, num / g2h2 * 100.0)
        return np.where(all9, out, np.nan)
    if mode in ("tpi", "tri", "roughness"):
        c0 = sh(0, 0)
        nbrs = [sh(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)
                if (dr, dc) != (0, 0)]
        if mode == "tpi":
            out = c0 - sum(nbrs) / 8.0
        elif mode == "tri":
            out = sum(np.abs(c0 - n) for n in nbrs) / 8.0
        else:
            out = (np.maximum.reduce(nbrs + [c0])
                   - np.minimum.reduce(nbrs + [c0]))
        return np.where(all9, out, np.nan)
    gx = ((sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1))
          - (sh(-1, -1) + 2 * sh(0, -1) + sh(1, -1))) / (8 * dx)
    gy = ysign * ((sh(-1, -1) + 2 * sh(-1, 0) + sh(-1, 1))
                  - (sh(1, -1) + 2 * sh(1, 0) + sh(1, 1))) / (8 * dy)
    slope_r = np.arctan(z * np.hypot(gx, gy))
    if mode == "slope":
        out = np.degrees(slope_r)
    else:
        flat = (gx == 0) & (gy == 0)
        aspect_r = np.mod(np.arctan2(-gx, -gy), 2 * np.pi)
        if mode == "aspect":
            out = np.where(flat, np.nan, np.degrees(aspect_r))
        elif mode == "hillshade_md":
            zen = np.radians(90.0 - altitude)
            asp = np.where(flat, 0.0, aspect_r)
            total = 0.0
            for az_deg in (225.0, 270.0, 315.0, 360.0):
                az2 = np.radians(az_deg)
                s = (np.cos(zen) * np.cos(slope_r)
                     + np.sin(zen) * np.sin(slope_r)
                     * np.cos(az2 - asp))
                total = total + np.sin(asp - az2) ** 2 * s
            out = 255.0 * np.maximum(0.0, total / 2.0)
        else:
            zen = np.radians(90.0 - altitude)
            az = np.radians(azimuth)
            shade = (np.cos(zen) * np.cos(slope_r)
                     + np.sin(zen) * np.sin(slope_r)
                     * np.cos(az - np.where(flat, 0.0, aspect_r)))
            out = 255.0 * np.maximum(0.0, shade)
    return np.where(all9, out, np.nan)


@pytest.mark.parametrize(
    "mode", ["slope", "aspect", "hillshade", "hillshade_md", "tpi",
             "tri", "roughness", "flowdir", "curvature", "profile",
             "plan"]
)
def test_terrain_matches_numpy(spark, two_band_cube, mode):
    cube = two_band_cube
    out = cube.terrain("m0", mode)
    assert set(out.bands) == {mode}
    got = out.assemble()[mode]
    a = cube.geobox.affine
    ref = _terrain_reference(
        cube.assemble()["m0"], 0.0, mode,
        abs(a.a), abs(a.e), 1.0 if a.e < 0 else -1.0,
    )
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9)


def test_terrain_analytic_plane(spark):
    """A tilted plane z = 2x + 3y has constant analytic slope and
    aspect everywhere; build the chunk table directly so cell values
    are exact."""
    from geocube_spark.cube import CHUNK_SCHEMA, GeoCube, BandMeta
    from geocube_spark.geometry.affine import Affine
    from geocube_spark.geometry.crs import CRS
    from geocube_spark.grid.geobox import GeoBox

    ts, H, W = 16, 32, 32
    gb = GeoBox(W, H, Affine(10.0, 0.0, 0.0, 0.0, -10.0, 0.0), CRS(32615))
    rows = []
    _, ntx, _ = gb.n_tiles(ts)
    for tid, row0, col0, h, w in gb.tile_grid(ts):
        yy, xx = np.mgrid[row0:row0 + h, col0:col0 + w]
        x = 10.0 * (xx + 0.5)
        y = -10.0 * (yy + 0.5)
        vals = 2.0 * x + 3.0 * y
        rows.append((
            "dem", None, 0, int(tid), int(row0), int(col0), int(h),
            int(w), [float(v) for v in vals.ravel()], 1, h * w, 0, 0,
        ))
    chunks = spark.createDataFrame(rows, CHUNK_SCHEMA)
    cube = GeoCube(
        chunks=chunks, geobox=gb,
        bands={"dem": BandMeta("dem", "float64", float("nan"))},
        tile_size=ts, fill=float("nan"),
    )
    slope = cube.terrain("dem", "slope").assemble()["slope"]
    aspect = cube.terrain("dem", "aspect").assemble()["aspect"]
    interior = slope[1:-1, 1:-1]
    exp_slope = np.degrees(np.arctan(np.hypot(2.0, 3.0)))
    np.testing.assert_allclose(interior, exp_slope, rtol=0, atol=1e-9)
    # downslope of grad (2,3) is (-2,-3): bearing atan2(-2,-3)
    exp_aspect = np.degrees(np.arctan2(-2.0, -3.0)) % 360.0
    np.testing.assert_allclose(
        aspect[1:-1, 1:-1], exp_aspect, rtol=0, atol=1e-9
    )
    # border cells lack a full window -> nodata
    assert np.isnan(slope[0]).all() and np.isnan(slope[:, -1]).all()
    # D8 on the plane: grad (2,3) in (x east, y north); steepest
    # descent neighbor is SW (x-10, y-10: drop 50/sqrt(200) beats
    # W=2 and S=3) -> code 8 on every interior cell
    flow = cube.terrain("dem", "flowdir").assemble()["flowdir"]
    np.testing.assert_allclose(flow[1:-1, 1:-1], 8.0, rtol=0, atol=0)
    # a bowl: the global minimum cell is a pit -> code 0
    rows2 = []
    for tid, row0, col0, h, w in gb.tile_grid(ts):
        yy, xx = np.mgrid[row0:row0 + h, col0:col0 + w]
        vals = (xx - 15.0) ** 2 + (yy - 15.0) ** 2
        rows2.append((
            "dem", None, 0, int(tid), int(row0), int(col0), int(h),
            int(w), [float(v) for v in vals.ravel()], 1, h * w, 0, 0,
        ))
    bowl = GeoCube(
        chunks=spark.createDataFrame(rows2, CHUNK_SCHEMA), geobox=gb,
        bands={"dem": BandMeta("dem", "float64", float("nan"))},
        tile_size=ts, fill=float("nan"),
    )
    bf = bowl.terrain("dem", "flowdir").assemble()["flowdir"]
    assert bf[15, 15] == 0.0
    # everything on the +x axis east of the pit flows west (code 16)
    np.testing.assert_allclose(bf[15, 17:-1], 16.0, rtol=0, atol=0)


def test_terrain_errors(two_band_cube):
    with pytest.raises(ValueError):
        two_band_cube.terrain("m0", "color-relief")
    with pytest.raises(ValueError):
        two_band_cube.terrain("nope")


def test_terrain_curvature_analytic(spark):
    """Quadratic surfaces make the Zevenbergen-Thorne fit EXACT (the
    finite differences of a quadratic reproduce its derivatives), so
    the curvatures have closed-form constants: for z = a*x^2 + a*y^2,
    D = E = a, F = 0, and away from the apex profile = 200a,
    plan = -200a, curvature = -400a; a tilted plane is 0 everywhere."""
    from geocube_spark.cube import CHUNK_SCHEMA, GeoCube, BandMeta
    from geocube_spark.geometry.affine import Affine
    from geocube_spark.geometry.crs import CRS
    from geocube_spark.grid.geobox import GeoBox

    ts, H, W = 16, 32, 32
    gb = GeoBox(W, H, Affine(10.0, 0.0, 0.0, 0.0, -10.0, 0.0), CRS(32615))

    def _cube(f):
        rows = []
        for tid, row0, col0, h, w in gb.tile_grid(ts):
            yy, xx = np.mgrid[row0:row0 + h, col0:col0 + w]
            x = 10.0 * (xx + 0.5)
            y = -10.0 * (yy + 0.5)
            vals = f(x, y)
            rows.append((
                "dem", None, 0, int(tid), int(row0), int(col0), int(h),
                int(w), [float(v) for v in vals.ravel()], 1, h * w,
                0, 0,
            ))
        return GeoCube(
            chunks=spark.createDataFrame(rows, CHUNK_SCHEMA), geobox=gb,
            bands={"dem": BandMeta("dem", "float64", float("nan"))},
            tile_size=ts, fill=float("nan"),
        )

    a = 0.001
    bowl = _cube(lambda x, y: a * (x * x + y * y))
    cur = bowl.terrain("dem", "curvature").assemble()["curvature"]
    prof = bowl.terrain("dem", "profile").assemble()["profile"]
    plan = bowl.terrain("dem", "plan").assemble()["plan"]
    np.testing.assert_allclose(
        cur[1:-1, 1:-1], -400.0 * a, rtol=0, atol=1e-9
    )
    # no cell center sits at the apex (centers are at odd multiples
    # of 5), so G,H never both vanish and the constants hold
    np.testing.assert_allclose(
        prof[1:-1, 1:-1], 200.0 * a, rtol=0, atol=1e-9
    )
    np.testing.assert_allclose(
        plan[1:-1, 1:-1], -200.0 * a, rtol=0, atol=1e-9
    )
    plane = _cube(lambda x, y: 2.0 * x + 3.0 * y - 7.0)
    for m in ("curvature", "profile", "plan"):
        got = plane.terrain("dem", m).assemble()[m]
        np.testing.assert_allclose(
            got[1:-1, 1:-1], 0.0, rtol=0, atol=1e-9
        )
    # flat plateau: G = H = 0 -> profile/plan defined as 0, not NaN
    flat = _cube(lambda x, y: np.full_like(x, 5.0))
    fp = flat.terrain("dem", "profile").assemble()["profile"]
    np.testing.assert_allclose(fp[1:-1, 1:-1], 0.0, rtol=0, atol=0)


def test_focal_reaches_unburned_tiles(spark):
    """Windows centered in a tile with NO chunk row still see a burned
    neighbor's border cells (synthesized all-nodata centers) — the
    dense-raster semantics the SQL oracle computes."""
    # docs live in [-91,-90] x [41,42] but the target grid spans a 2x
    # wider geom, so the east tile columns get no burned chunk at all
    docs = datagen.to_spark(spark, datagen.scale_docs(400, seed=21))
    wide_geom = (
        '{"type": "Polygon", "coordinates": [[[-91, 41], [-89, 41], '
        '[-89, 42], [-91, 42], [-91, 41]]]}'
    )
    cube = make_geocube(
        docs, measurements=["m0"], geom=wide_geom,
        resolution=(-1.0 / 32, 1.0 / 32), fill=0.0, merge_alg="add",
        tile_size=8,
    )
    tiles_present = {
        r["tile_id"] for r in cube.chunks.select("tile_id").collect()
    }
    _, ntx, nty = cube.geobox.n_tiles(8)
    assert len(tiles_present) < ntx * nty  # the premise: sparse tiling
    out = cube.focal("mean", 3)
    got = out.assemble()["m0"]
    ref = _focal_reference(cube.assemble()["m0"], 0.0, "mean", 3)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9)


def test_focal_synthesizes_missing_center_tile(spark):
    """Deterministic boundary case: a chunk table with ONE burned tile
    in a 2-tile-wide grid — the empty east tile's first column must
    still get focal values from the burned tile's border."""
    from geocube_spark.cube import CHUNK_SCHEMA, GeoCube, BandMeta
    from geocube_spark.geometry.affine import Affine
    from geocube_spark.geometry.crs import CRS
    from geocube_spark.grid.geobox import GeoBox

    ts = 8
    gb = GeoBox(16, 8, Affine(1.0, 0.0, 0.0, 0.0, -1.0, 8.0), CRS(32615))
    vals = np.arange(1.0, 65.0)  # 8x8, all non-zero
    rows = [("band", None, 0, 0, 0, 0, 8, 8,
             [float(v) for v in vals], 1, 64, 0, 0)]
    cube = GeoCube(
        chunks=spark.createDataFrame(rows, CHUNK_SCHEMA), geobox=gb,
        bands={"band": BandMeta("band", "float64", 0.0)},
        tile_size=ts, fill=0.0,
    )
    out = cube.focal("mean", 3)
    out_tiles = {
        r["tile_id"] for r in out.chunks.select("tile_id").collect()
    }
    assert out_tiles == {0, 1}  # tile 1 synthesized from halo strips
    got = out.assemble()["band"]
    ref = _focal_reference(cube.assemble()["band"], 0.0, "mean", 3)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9)
    # the synthesized tile's first column is the burned border mean
    assert np.isfinite(got[:, 8]).all() and np.isnan(got[:, 9]).all()


def _split_docs_cubes(spark, merge_alg):
    """Two cubes burned from doc-id-parity halves of the same corpus,
    plus the single cube over everything."""
    pdf = datagen.scale_docs(500, seed=31)
    even = datagen.to_spark(spark, pdf[::2].reset_index(drop=True))
    odd = datagen.to_spark(spark, pdf[1::2].reset_index(drop=True))
    both = datagen.to_spark(spark, pdf)
    kw = dict(
        measurements=["m0"], geom=GEOM,
        resolution=(-1.0 / 32, 1.0 / 32), fill=0.0,
        merge_alg=merge_alg, tile_size=16,
    )
    return (
        make_geocube(even, **kw),
        make_geocube(odd, **kw),
        make_geocube(both, **kw),
    )


def test_merge_cubes_add_equals_single_burn(spark):
    a, b, full = _split_docs_cubes(spark, "add")
    merged = a.merge(b, "add")
    np.testing.assert_allclose(
        merged.assemble()["m0"], full.assemble()["m0"], rtol=0, atol=1e-9
    )


def test_merge_cubes_replace_b_wins(spark):
    a, b, _ = _split_docs_cubes(spark, "replace")
    merged = a.merge(b, "replace")
    arrs = merged.assemble()["m0"]
    aa, bb = a.assemble()["m0"], b.assemble()["m0"]
    want = np.where(bb != 0.0, bb, aa)
    np.testing.assert_array_equal(arrs, want)


def test_merge_cubes_nan_fill_and_errors(spark):
    pdf = datagen.scale_docs(200, seed=5)
    kw = dict(
        measurements=["m0"], geom=GEOM,
        resolution=(-1.0 / 16, 1.0 / 16), fill=float("nan"),
        merge_alg="replace", tile_size=16,
    )
    a = make_geocube(
        datagen.to_spark(spark, pdf[::2].reset_index(drop=True)), **kw
    )
    b = make_geocube(
        datagen.to_spark(spark, pdf[1::2].reset_index(drop=True)), **kw
    )
    merged = a.merge(b, "replace").assemble()["m0"]
    aa, bb = a.assemble()["m0"], b.assemble()["m0"]
    want = np.where(~np.isnan(bb), bb, aa)
    np.testing.assert_array_equal(
        np.isnan(merged), np.isnan(want)
    )
    ok = ~np.isnan(want)
    np.testing.assert_array_equal(merged[ok], want[ok])
    import pytest as _pt
    with _pt.raises(ValueError, match="merge_alg"):
        a.merge(b, "multiply")
    other = make_geocube(
        datagen.to_spark(spark, pdf), measurements=["m0"], geom=GEOM,
        resolution=(-1.0 / 8, 1.0 / 8), fill=float("nan"), tile_size=16,
    )
    with _pt.raises(ValueError, match="geobox"):
        a.merge(other)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_focal_irregular_grid_random_tiles(spark, seed):
    """Partial edge tiles (grid not a multiple of tile_size) with a
    random subset of tiles missing — the halo clip/paste/synthesis
    geometry against the dense numpy reference."""
    from geocube_spark.cube import CHUNK_SCHEMA, GeoCube, BandMeta
    from geocube_spark.geometry.affine import Affine
    from geocube_spark.geometry.crs import CRS
    from geocube_spark.grid.geobox import GeoBox

    rng = np.random.RandomState(seed)
    ts, H, W = 8, 19, 23  # partial tiles on both axes
    gb = GeoBox(W, H, Affine(1.0, 0.0, 0.0, 0.0, -1.0, float(H)),
                CRS(32615))
    dense = np.where(
        rng.rand(H, W) < 0.3, np.nan, rng.uniform(1, 9, (H, W))
    )
    rows = []
    for tid, row0, col0, h, w in gb.tile_grid(ts):
        if rng.rand() < 0.3:
            dense[row0:row0 + h, col0:col0 + w] = np.nan  # missing tile
            continue
        vals = dense[row0:row0 + h, col0:col0 + w].ravel()
        rows.append((
            "band", None, 0, int(tid), int(row0), int(col0), int(h),
            int(w), [None if np.isnan(v) else float(v) for v in vals],
            1, h * w, 0, 0,
        ))
    if not rows:
        pytest.skip("all tiles dropped")
    cube = GeoCube(
        chunks=spark.createDataFrame(rows, CHUNK_SCHEMA), geobox=gb,
        bands={"band": BandMeta("band", "float64", float("nan"))},
        tile_size=ts, fill=float("nan"),
    )
    for stat, size in (("mean", 3), ("max", 5), ("count", 3)):
        got = cube.focal(stat, size).assemble()["band"]
        ref = _focal_reference(dense, float("nan"), stat, size)
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9,
                                   err_msg=f"{stat}/{size} seed={seed}")
    got = cube.terrain("band", "slope").assemble()["slope"]
    ref = _terrain_reference(dense, float("nan"), "slope", 1.0, 1.0, 1.0)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-9)


def test_post_ops_on_empty_cube(spark):
    """A cube whose geom intersects nothing burns zero chunks; every
    post-op degrades to an empty (not failing) result."""
    docs = datagen.to_spark(spark, datagen.scale_docs(50, seed=2))
    far = (
        '{"type": "Polygon", "coordinates": [[[10, 10], [11, 10], '
        '[11, 11], [10, 11], [10, 10]]]}'
    )
    cube = make_geocube(
        docs, measurements=["m0"], geom=far,
        resolution=(-0.05, 0.05), fill=0.0, tile_size=32,
    )
    assert cube.chunks.count() == 0
    assert cube.focal("mean", 3).chunks.count() == 0
    assert cube.terrain("m0", "slope").chunks.count() == 0
    assert cube.merge(cube, "add").chunks.count() == 0
    assert cube.coarsen(4, "mean").chunks.count() == 0


def test_diff_cubes_delta_matches_numpy(spark):
    a, b, _ = _split_docs_cubes(spark, "add")
    d = a.diff(b, "delta").assemble()["m0"]
    aa, bb = a.assemble()["m0"], b.assemble()["m0"]
    both = (aa != 0.0) & (bb != 0.0)
    np.testing.assert_allclose(d[both], (bb - aa)[both],
                               rtol=0, atol=1e-12)
    assert np.isnan(d[~both]).all()


def test_diff_cubes_mask_matches_numpy(spark):
    a, b, _ = _split_docs_cubes(spark, "add")
    d = a.diff(b, "mask").assemble()["m0"]
    aa, bb = a.assemble()["m0"], b.assemble()["m0"]
    da, db = aa != 0.0, bb != 0.0
    want = np.full(aa.shape, np.nan)
    want[da & db] = (aa[da & db] != bb[da & db]).astype(float)
    want[da ^ db] = 1.0
    np.testing.assert_array_equal(np.isnan(d), np.isnan(want))
    ok = ~np.isnan(want)
    np.testing.assert_array_equal(d[ok], want[ok])


def test_diff_cubes_one_sided_tiles(spark):
    """delta: a tile burned on only one side yields no data cells
    (inner join drops it); mask: the same tile is all-change."""
    pdf = datagen.scale_docs(300, seed=13)
    kw = dict(
        measurements=["m0"], geom=GEOM,
        resolution=(-1.0 / 32, 1.0 / 32), fill=0.0,
        merge_alg="add", tile_size=16,
    )
    # left half of the corpus vs the full corpus: some tiles exist
    # only on the right side
    a = make_geocube(
        datagen.to_spark(spark, pdf[:100].reset_index(drop=True)), **kw
    )
    b = make_geocube(datagen.to_spark(spark, pdf), **kw)
    aa, bb = a.assemble()["m0"], b.assemble()["m0"]
    delta = a.diff(b, "delta").assemble()["m0"]
    both = (aa != 0.0) & (bb != 0.0)
    assert np.isnan(delta[~both]).all()
    mask = a.diff(b, "mask").assemble()["m0"]
    onesided = (aa != 0.0) ^ (bb != 0.0)
    assert (mask[onesided] == 1.0).all()
    with pytest.raises(ValueError, match="mode"):
        a.diff(b, "xor")


@pytest.mark.parametrize("scheme", ["hex", "s2", "geohash"])
def test_cube_to_cells_matches_numpy(spark, two_band_cube, scheme):
    """Raster -> spherical-index rollup: the distributed aggregate
    must equal a pandas groupby over the assembled raster keyed by
    the scheme's NUMPY cell id (the Column program's cross-checked
    twin)."""
    import pandas as pd
    from geocube_spark.bandops import cube_to_cells

    cube = two_band_cube
    res = {"hex": 6, "s2": 8, "geohash": 4}[scheme]
    out = cube_to_cells(cube, "m0", res, scheme=scheme).toPandas()

    arr = cube.assemble()["m0"]
    a = cube.geobox.affine
    rr, cc = np.nonzero(~np.isnan(arr) & (arr != 0.0))  # fill=0.0
    lon = a.c + (cc + 0.5) * a.a
    lat = a.f + (rr + 0.5) * a.e
    if scheme == "hex":
        from geocube_spark.grid.hex import hex_cell_id

        key = hex_cell_id(lon, lat, res)
    elif scheme == "s2":
        from geocube_spark.grid.s2 import compact_cell_id

        key = compact_cell_id(lon, lat, res)
    else:
        from geocube_spark.grid.geohash import geohash_encode

        key = geohash_encode(lon, lat, res)
    ref = (
        pd.DataFrame({"cell": key, "val": arr[rr, cc]})
        .groupby("cell")["val"]
        .agg(n_cells="count", sum_val="sum", min_val="min",
             max_val="max")
        .reset_index()
    )
    got = out.sort_values("cell", ignore_index=True)
    ref = ref.sort_values("cell", ignore_index=True)
    assert len(got) == len(ref)
    assert (got["cell"].values == ref["cell"].values).all()
    np.testing.assert_array_equal(
        got["n_cells"].values, ref["n_cells"].values
    )
    for c in ("sum_val", "min_val", "max_val"):
        np.testing.assert_allclose(
            got[c].values, ref[c].values.astype(float),
            rtol=0, atol=1e-9,
        )


def test_cube_to_cells_errors(spark, two_band_cube):
    from geocube_spark.bandops import cube_to_cells
    from geocube_spark.cube import make_geocube

    with pytest.raises(ValueError, match="unknown band"):
        cube_to_cells(two_band_cube, "nope", 6)
    with pytest.raises(ValueError, match="scheme"):
        cube_to_cells(two_band_cube, "m0", 6, scheme="quadkey")
    docs = datagen.to_spark(spark, datagen.scale_docs(50, seed=3))
    proj = make_geocube(
        docs, measurements=["m0"], geom=GEOM,
        resolution=(-500.0, 500.0), fill=0.0, tile_size=16,
        output_crs="EPSG:32615",
    )
    with pytest.raises(ValueError, match="geographic"):
        cube_to_cells(proj, "m0", 6)


def test_zonal_geometry_rectangles_and_referee(spark):
    """Hand grid: a 2x3 rectangle zone has area 6 and perimeter
    2*(2+3); an L-shape and a grid-edge zone pin the exposed-edge
    rule (off-grid and nodata neighbors count); centroid = mean of
    cell centers."""
    from geocube_spark.bandops import zonal_geometry
    from geocube_spark.cube import CHUNK_SCHEMA, BandMeta, GeoCube
    from geocube_spark.geometry.affine import Affine
    from geocube_spark.geometry.crs import CRS
    from geocube_spark.grid.geobox import GeoBox

    # 4x6 grid, 10m cells; zone 1 = rows 0-1, cols 0-2 (2x3 rect,
    # touches the grid edge); zone 2 = L-shape; NaN elsewhere
    Z = np.array([
        [1, 1, 1, np.nan, np.nan, np.nan],
        [1, 1, 1, np.nan, 2, np.nan],
        [np.nan, np.nan, np.nan, np.nan, 2, np.nan],
        [np.nan, np.nan, np.nan, 2, 2, np.nan],
    ])
    gb = GeoBox(6, 4, Affine(10.0, 0.0, 100.0, 0.0, -10.0, 50.0),
                CRS(32615))
    rows = []
    for tid, row0, col0, h, w in gb.tile_grid(4):
        sub = Z[row0:row0 + h, col0:col0 + w]
        rows.append((
            "z", None, 0, int(tid), int(row0), int(col0), int(h),
            int(w), [float(v) for v in sub.ravel()], 1, h * w, 0, 0,
        ))
    cube = GeoCube(
        chunks=spark.createDataFrame(rows, CHUNK_SCHEMA), geobox=gb,
        bands={"z": BandMeta("z", "float64", float("nan"))},
        tile_size=4, fill=float("nan"),
    )
    got = {r["zone"]: r for r in zonal_geometry(cube, "z").collect()}
    r1 = got[1.0]
    assert r1["area_cells"] == 6 and r1["area"] == 600.0
    assert r1["perimeter"] == 100.0  # 2*(2+3) edges x 10 m
    np.testing.assert_allclose(r1["cx"], 100.0 + 10.0 * 1.5)
    np.testing.assert_allclose(r1["cy"], 50.0 - 10.0 * 1.0)
    r2 = got[2.0]
    assert r2["area_cells"] == 4
    # L-tetromino perimeter = 10 edges x 10 m
    assert r2["perimeter"] == 100.0
    with pytest.raises(ValueError, match="unknown band"):
        zonal_geometry(cube, "nope")


def test_normalized_difference_matches_numpy(spark, two_band_cube):
    from geocube_spark.bandops import normalized_difference

    nd = normalized_difference(two_band_cube, "m0", "m1")
    arrs = nd.assemble()
    a = arrs["m0"]
    b = arrs["m1"]
    got = arrs["nd_m0_m1"]
    data = (a != 0.0) & (b != 0.0) & (a + b != 0.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        want = (a - b) / (a + b)
    np.testing.assert_allclose(got[data], want[data], rtol=0,
                               atol=1e-12)
    assert np.isnan(got[~data]).all()
    with pytest.raises(ValueError, match="unknown band"):
        normalized_difference(two_band_cube, "m0", "nope")


@pytest.mark.parametrize("metric", ["contrast", "homogeneity",
                                    "energy", "entropy"])
def test_glcm_matches_bruteforce(spark, metric):
    """Per-cell brute-force referee: quantize, enumerate the window's
    horizontal pairs both directions, normalize, apply the metric."""
    from geocube_spark.bandops import glcm
    from geocube_spark.cube import CHUNK_SCHEMA, BandMeta, GeoCube
    from geocube_spark.geometry.affine import Affine
    from geocube_spark.geometry.crs import CRS
    from geocube_spark.grid.geobox import GeoBox

    rng = np.random.default_rng(41)
    H = W = 18
    arr = rng.uniform(0, 100, (H, W))
    arr[3, 4] = np.nan
    gb = GeoBox(W, H, Affine(1.0, 0.0, 0.0, 0.0, -1.0, 0.0), CRS(4326))
    rows = [("v", None, 0, int(tid), int(r0), int(c0), int(h), int(w),
             [float(x) for x in arr[r0:r0 + h, c0:c0 + w].ravel()],
             1, h * w, 0, 0)
            for tid, r0, c0, h, w in gb.tile_grid(6)]
    cube = GeoCube(
        chunks=spark.createDataFrame(rows, CHUNK_SCHEMA), geobox=gb,
        bands={"v": BandMeta("v", "float64", float("nan"))},
        tile_size=6, fill=float("nan"),
    )
    L, lo, hi, size = 5, 0.0, 100.0, 3
    got = glcm(cube, "v", metric, levels=L, lo=lo, hi=hi,
               size=size).assemble()[f"v_{metric}"]

    q = np.clip(np.floor((arr - lo) / (hi - lo) * L), 0, L - 1)
    q = np.where(np.isnan(arr), -1, q).astype(int)
    valid = q >= 0
    r = size // 2
    want = np.full((H, W), np.nan)
    for R in range(H):
        for C in range(W):
            rs, cs = slice(R - r, R + r + 1), slice(C - r, C + r + 1)
            if (R - r < 0 or C - r < 0 or R + r >= H or C + r >= W
                    or not valid[rs, cs].all()):
                continue
            cnt = {}
            for rr in range(R - r, R + r + 1):
                for cc in range(C - r, C + r):
                    a, b = q[rr, cc], q[rr, cc + 1]
                    cnt[(a, b)] = cnt.get((a, b), 0) + 1
                    cnt[(b, a)] = cnt.get((b, a), 0) + 1
            total = 2 * size * (size - 1)
            val = 0.0
            for (i, j), n in cnt.items():
                p = n / total
                if metric == "contrast":
                    val += p * (i - j) ** 2
                elif metric == "homogeneity":
                    val += p / (1 + (i - j) ** 2)
                elif metric == "energy":
                    val += p * p
                else:
                    val -= p * np.log(p)
            want[R, C] = val
    np.testing.assert_allclose(
        np.nan_to_num(got, nan=-9), np.nan_to_num(want, nan=-9),
        rtol=0, atol=1e-9,
    )
    # flat raster: energy of a one-bin matrix is 1, contrast 0
    flat = GeoCube(
        chunks=spark.createDataFrame(
            [("v", None, 0, int(tid), int(r0), int(c0), int(h),
              int(w), [50.0] * (h * w), 1, h * w, 0, 0)
             for tid, r0, c0, h, w in gb.tile_grid(6)], CHUNK_SCHEMA),
        geobox=gb,
        bands={"v": BandMeta("v", "float64", float("nan"))},
        tile_size=6, fill=float("nan"),
    )
    if metric in ("energy", "contrast"):
        fv = glcm(flat, "v", metric, levels=L, lo=lo, hi=hi,
                  size=3).assemble()[f"v_{metric}"]
        expect = 1.0 if metric == "energy" else 0.0
        np.testing.assert_allclose(fv[1:-1, 1:-1], expect, atol=0)
