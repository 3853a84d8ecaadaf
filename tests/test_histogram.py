"""band_histogram: numpy.histogram parity, range handling, grouped
cubes, and the map-side-combine plan shape."""

import numpy as np
import pytest

from geocube_spark import datagen
from geocube_spark.bandops import band_histogram
from geocube_spark.cube import make_geocube

GEOM = (
    '{"type": "Polygon", "coordinates": [[[-91, 41], [-90, 41], '
    '[-90, 42], [-91, 42], [-91, 41]]]}'
)


@pytest.fixture(scope="module")
def cube(spark):
    docs = datagen.to_spark(spark, datagen.scale_docs(500, seed=23))
    return make_geocube(
        docs, measurements=["m0", "m1"], geom=GEOM,
        resolution=(-1.0 / 32, 1.0 / 32), fill=0.0,
        merge_alg="add", tile_size=16,
    )


def _data(cube, band):
    a = cube.assemble()[band].astype(float).ravel()
    return a[a != 0.0]


def _to_dense(pdf, bins):
    out = np.zeros(bins, dtype=np.int64)
    for _, r in pdf.iterrows():
        out[int(r["bin"])] = int(r["n"])
    return out


def test_histogram_matches_numpy_explicit_range(spark, cube):
    got = band_histogram(cube, bins=16, lo=0.0, hi=1500.0).toPandas()
    for band in ("m0", "m1"):
        v = _data(cube, band)
        want, edges = np.histogram(v, bins=16, range=(0.0, 1500.0))
        sub = got[got.measurement == band]
        np.testing.assert_array_equal(_to_dense(sub, 16), want)
        # edges reported per row agree with numpy's bin edges
        for _, r in sub.iterrows():
            assert abs(r["lo_edge"] - edges[int(r["bin"])]) < 1e-9
            assert abs(r["hi_edge"] - edges[int(r["bin"]) + 1]) < 1e-9


def test_histogram_default_range_is_band_minmax(spark, cube):
    got = band_histogram(cube, bins=8, measurements=["m0"]).toPandas()
    v = _data(cube, "m0")
    want, _ = np.histogram(v, bins=8, range=(v.min(), v.max()))
    np.testing.assert_array_equal(_to_dense(got, 8), want)
    # every data cell lands in some bin (max included in last bin)
    assert got["n"].sum() == len(v)


def test_histogram_out_of_range_dropped(spark, cube):
    v = _data(cube, "m0")
    lo, hi = float(np.quantile(v, 0.25)), float(np.quantile(v, 0.75))
    got = band_histogram(cube, bins=4, lo=lo, hi=hi,
                         measurements=["m0"]).toPandas()
    want, _ = np.histogram(v[(v >= lo) & (v <= hi)], bins=4,
                           range=(lo, hi))
    np.testing.assert_array_equal(_to_dense(got, 4), want)
    assert got["n"].sum() < len(v)


def test_histogram_grouped(spark):
    pdf = datagen.grouped_polygon_docs(3, 5)
    cube = make_geocube(
        datagen.to_spark(spark, pdf), measurements=["claytotal_r"],
        group_by="hzdept_r", output_crs="epsg:32615",
        resolution=(-60, 60), fill=0.0, tile_size=32,
    )
    got = band_histogram(cube, bins=6, lo=0.0, hi=60.0).toPandas()
    arr = cube.assemble()["claytotal_r"]
    for gi, key in enumerate(cube.group_keys):
        v = arr[gi].astype(float).ravel()
        v = v[v != 0.0]
        want, _ = np.histogram(v[(v >= 0) & (v <= 60)], bins=6,
                               range=(0.0, 60.0))
        sub = got[got.group_key == str(key)]
        np.testing.assert_array_equal(_to_dense(sub, 6), want)


def test_histogram_degenerate_and_validation(spark, cube):
    # lo == hi: every value equal to lo goes to bin 0
    got = band_histogram(cube, bins=4, lo=100.0, hi=100.0,
                         measurements=["m0"]).toPandas()
    v = _data(cube, "m0")
    n_at = int((v == 100.0).sum())
    assert got["n"].sum() == n_at
    with pytest.raises(ValueError, match="bins"):
        band_histogram(cube, bins=0)
    with pytest.raises(ValueError, match="both lo and hi"):
        band_histogram(cube, lo=0.0)
    with pytest.raises(ValueError, match="hi must be >= lo"):
        band_histogram(cube, lo=1.0, hi=0.0)


def test_histogram_map_side_combine_plan(spark, cube):
    """The count aggregates partially BEFORE the exchange — the
    shuffle carries bin partials, not cells."""
    df = band_histogram(cube, bins=16, lo=0.0, hi=1500.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan
    # the histogram adds no Python of its own: everything above the
    # burn kernel (the plan section after the last MapInPandas) is
    # pure JVM — no per-row UDFs anywhere, and the only Arrow stages
    # are the burn's own
    assert "BatchEvalPython" not in plan
    hist_part = plan.split("MapInPandas")[0]
    assert "InPandas" not in hist_part
    assert "Generate explode" in hist_part


def test_band_quantiles_exact_matches_numpy(spark, cube):
    from geocube_spark.bandops import band_quantiles

    qs = (0.0, 0.1, 0.5, 0.9, 1.0)
    got = band_quantiles(
        cube, qs, measurements=["m0"], exact=True
    ).collect()
    data = _data(cube, "m0")
    want = np.quantile(data, qs, method="linear")
    assert [r["q"] for r in got] == list(qs)
    for r, w in zip(got, want):
        assert r["value"] == pytest.approx(w, rel=1e-12), r["q"]


def test_band_quantiles_approx_within_rank_error(spark, cube):
    from geocube_spark.bandops import band_quantiles

    got = {
        r["q"]: r["value"]
        for r in band_quantiles(
            cube, (0.25, 0.75), measurements=["m0"], accuracy=10000
        ).collect()
    }
    data = np.sort(_data(cube, "m0"))
    n = len(data)
    for q, v in got.items():
        # rank error <= n/accuracy + 1 positions
        lo = data[max(0, int(q * n) - 1 - n // 10000)]
        hi = data[min(n - 1, int(q * n) + 1 + n // 10000)]
        assert lo <= v <= hi, (q, v, lo, hi)


def test_band_quantiles_grouped_and_validation(spark):
    from geocube_spark import datagen
    from geocube_spark.bandops import band_quantiles
    from geocube_spark.cube import make_geocube

    docs = datagen.to_spark(spark, datagen.grouped_polygon_docs(3, 5))
    gcube = make_geocube(
        docs, measurements=["claytotal_r"], group_by="hzdept_r",
        output_crs="epsg:32615", resolution=(-60, 60), fill=0.0,
        tile_size=32,
    )
    rows = band_quantiles(
        gcube, (0.5,), exact=True
    ).collect()
    arrs = gcube.assemble()["claytotal_r"]
    gidx = {str(k): i for i, k in enumerate(gcube.group_keys)}
    assert len(rows) == len(gcube.group_keys)
    for r in rows:
        a = arrs[gidx[r["group_key"]]].ravel()
        a = a[a != 0.0]
        assert r["value"] == pytest.approx(
            np.quantile(a, 0.5, method="linear"), rel=1e-12
        )
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        band_quantiles(gcube, (1.5,))
    with pytest.raises(ValueError, match="non-empty"):
        band_quantiles(gcube, ())
    with pytest.raises(ValueError, match="unknown measurement"):
        band_quantiles(gcube, (0.5,), measurements=["nope"])
