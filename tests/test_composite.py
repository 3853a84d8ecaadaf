"""Temporal composites (bandops.composite_cubes / trend_cubes): numpy
parity for every stat, nodata skipping, one-sided tiles, grouped
cubes, and validation."""

import numpy as np
import pytest

from geocube_spark import datagen
from geocube_spark.bandops import composite_cubes, trend_cubes
from geocube_spark.cube import make_geocube

GEOM = (
    '{"type": "Polygon", "coordinates": [[[-91, 41], [-90, 41], '
    '[-90, 42], [-91, 42], [-91, 41]]]}'
)

KW = dict(
    measurements=["m0"], geom=GEOM,
    resolution=(-1.0 / 32, 1.0 / 32), fill=0.0,
    merge_alg="add", tile_size=16,
)


@pytest.fixture(scope="module")
def epochs(spark):
    """Three epoch cubes from doc-id mod-3 slices of one corpus —
    deliberately sparse so many cells have 0/1/2/3 data epochs."""
    pdf = datagen.scale_docs(420, seed=47)
    return [
        make_geocube(
            datagen.to_spark(spark, pdf[i::3].reset_index(drop=True)),
            **KW,
        )
        for i in range(3)
    ]


def _stack(epochs):
    """(k, H, W) float array with NaN where an epoch holds no data
    (burn fill is 0.0 under merge 'add')."""
    planes = []
    for c in epochs:
        a = c.assemble()["m0"].astype(float)
        a[a == 0.0] = np.nan
        planes.append(a)
    return np.stack(planes)


@pytest.mark.parametrize("stat,ref", [
    ("median", lambda s: np.nanmedian(s, axis=0)),
    ("mean", lambda s: np.nanmean(s, axis=0)),
    ("min", lambda s: np.nanmin(s, axis=0)),
    ("max", lambda s: np.nanmax(s, axis=0)),
    ("count", lambda s: np.sum(~np.isnan(s), axis=0).astype(float)),
])
def test_composite_matches_numpy(spark, epochs, stat, ref):
    got = composite_cubes(epochs, stat).assemble()["m0"]
    stack = _stack(epochs)
    with np.errstate(all="ignore"):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            want = ref(stack)
    if stat == "count":
        # cells with zero data epochs: engine emits nodata (NaN) while
        # the numpy count is 0 — tiles nobody burned never exist
        want = np.where(want == 0.0, np.nan, want)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
    # sanity: the fixture really exercises 1-, 2- and 3-epoch cells
    counts = np.sum(~np.isnan(stack), axis=0)
    assert {1, 2, 3} <= set(np.unique(counts).tolist())


def test_composite_median_even_count_averages(spark):
    """Two epochs -> every data cell's median is the midpoint."""
    pdf = datagen.scale_docs(300, seed=7)
    a = make_geocube(
        datagen.to_spark(spark, pdf[::2].reset_index(drop=True)), **KW)
    b = make_geocube(
        datagen.to_spark(spark, pdf[1::2].reset_index(drop=True)), **KW)
    med = composite_cubes([a, b], "median").assemble()["m0"]
    aa = a.assemble()["m0"].astype(float)
    bb = b.assemble()["m0"].astype(float)
    aa[aa == 0.0] = np.nan
    bb[bb == 0.0] = np.nan
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = np.nanmean(np.stack([aa, bb]), axis=0)
    np.testing.assert_allclose(med, want, rtol=0, atol=1e-12)


def test_composite_one_sided_tiles(spark, epochs):
    """A tile burned by only one epoch passes through (stat of one
    value), never drops."""
    got = composite_cubes(epochs, "max").assemble()["m0"]
    stack = _stack(epochs)
    one_epoch = np.sum(~np.isnan(stack), axis=0) == 1
    assert one_epoch.any()
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        np.testing.assert_allclose(
            got[one_epoch], np.nanmax(stack, axis=0)[one_epoch],
            rtol=0, atol=0,
        )


def test_trend_matches_polyfit(spark, epochs):
    times = [0.0, 2.5, 7.0]
    got = trend_cubes(epochs, times).assemble()["m0"]
    stack = _stack(epochs)
    h, w = stack.shape[1:]
    want = np.full((h, w), np.nan)
    t = np.asarray(times)
    for r in range(h):
        for c in range(w):
            v = stack[:, r, c]
            m = ~np.isnan(v)
            if m.sum() >= 2:
                want[r, c] = np.polyfit(t[m], v[m], 1)[0]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)
    # single-epoch cells must be nodata even though they hold data
    single = np.sum(~np.isnan(stack), axis=0) == 1
    assert single.any() and np.isnan(got[single]).all()


def test_trend_default_times_and_validation(spark, epochs):
    d = trend_cubes(epochs).assemble()["m0"]
    e = trend_cubes(epochs, [0, 1, 2]).assemble()["m0"]
    np.testing.assert_array_equal(
        np.nan_to_num(d, nan=-9e9), np.nan_to_num(e, nan=-9e9))
    with pytest.raises(ValueError, match="one entry per cube"):
        trend_cubes(epochs, [0.0, 1.0])
    with pytest.raises(ValueError, match="distinct"):
        trend_cubes(epochs, [1.0, 1.0, 2.0])
    with pytest.raises(ValueError, match="at least 2"):
        composite_cubes(epochs[:1], "mean")
    with pytest.raises(ValueError, match="unsupported stat"):
        composite_cubes(epochs, "geomean")
    with pytest.raises(ValueError, match="unsupported stat"):
        composite_cubes(epochs, "p200")


def test_composite_grouped(spark):
    """Grouped cubes composite per (group, tile) — groups never mix."""
    pdf = datagen.grouped_polygon_docs(3, 5)
    kw = dict(
        measurements=["claytotal_r"], group_by="hzdept_r",
        output_crs="epsg:32615", resolution=(-60, 60), fill=0.0,
        tile_size=32,
    )
    a = make_geocube(
        datagen.to_spark(spark, pdf[::2].reset_index(drop=True)), **kw)
    b = make_geocube(
        datagen.to_spark(spark, pdf[1::2].reset_index(drop=True)), **kw)
    got = composite_cubes([a, b], "mean")
    assert got.group_keys == sorted(set(a.group_keys) | set(b.group_keys))
    arrs = got.assemble()["claytotal_r"]
    # rebuild per-group expectation from the inputs' own assemblies
    ga, gb = a.assemble()["claytotal_r"], b.assemble()["claytotal_r"]
    gidx_a = {k: i for i, k in enumerate(a.group_keys)}
    gidx_b = {k: i for i, k in enumerate(b.group_keys)}
    import warnings
    for gi, key in enumerate(got.group_keys):
        planes = []
        for g, gidx in ((ga, gidx_a), (gb, gidx_b)):
            if key in gidx:
                p = g[gidx[key]].astype(float).copy()
                p[p == 0.0] = np.nan
                planes.append(p)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            want = np.nanmean(np.stack(planes), axis=0)
        np.testing.assert_allclose(arrs[gi], want, rtol=0, atol=1e-12)


def test_composite_quantile_matches_numpy(spark, epochs):
    import warnings
    stack = _stack(epochs)
    for stat, q in (("p25", 0.25), ("p75", 0.75), ("p90", 0.90)):
        got = composite_cubes(epochs, stat).assemble()["m0"]
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            want = np.nanquantile(stack, q, axis=0)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
    # p50 == median
    np.testing.assert_allclose(
        np.nan_to_num(composite_cubes(epochs, "p50").assemble()["m0"],
                      nan=-9e9),
        np.nan_to_num(composite_cubes(epochs, "median").assemble()["m0"],
                      nan=-9e9),
        rtol=0, atol=1e-12,
    )


def test_composite_single_shuffle_plan(spark, epochs):
    """The composite adds exactly ONE exchange of its own (the
    tile-key groupBy) on top of the input chunk plans — epochs
    co-locate per tile in one shuffle regardless of k."""
    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange")

    union = epochs[0].chunks
    for c in epochs[1:]:
        union = union.unionByName(c.chunks)
    base = n_exchanges(union)
    got = n_exchanges(composite_cubes(epochs, "mean").chunks)
    assert got == base + 1


def test_composite_rejects_mixed_grouping(spark, epochs):
    """Same grid, but one epoch grouped and one not: the combinator
    must refuse instead of groupBy-ing NULL keys against real ones."""
    pdf = datagen.scale_docs(60, seed=3)
    grouped = make_geocube(
        datagen.to_spark(spark, pdf), group_by="m1", **KW)
    with pytest.raises(ValueError, match="group_by"):
        composite_cubes([epochs[0], grouped], "mean")


def test_trend_timestamp_scale_times(spark, epochs):
    """Unix-epoch-magnitude times with small spacing: the centered
    accumulation keeps full precision (the raw closed form would lose
    ~11 digits to n*Stt - St^2 cancellation)."""
    base = 1.7e12  # unix ms circa 2023
    hrs = 3.6e6
    big = trend_cubes(epochs, [base, base + hrs, base + 2 * hrs])
    small = trend_cubes(epochs, [0.0, hrs, 2 * hrs])
    np.testing.assert_allclose(
        np.nan_to_num(big.assemble()["m0"], nan=-9e9),
        np.nan_to_num(small.assemble()["m0"], nan=-9e9),
        rtol=1e-12, atol=0,
    )
