"""reclassify (numpy digitize parity) + zonal_crosstab (Counter
parity) with the map-side-combine plan shape."""

from collections import Counter

import numpy as np
import pytest

from geocube_spark import datagen
from geocube_spark.bandops import reclassify, zonal_crosstab
from geocube_spark.cube import make_geocube

GEOM = (
    '{"type": "Polygon", "coordinates": [[[-91, 41], [-90, 41], '
    '[-90, 42], [-91, 42], [-91, 41]]]}'
)

BREAKS = [100.0, 400.0, 900.0]
CLASSES = [1.0, 2.0, 3.0, 4.0]


@pytest.fixture(scope="module")
def cube(spark):
    docs = datagen.to_spark(spark, datagen.scale_docs(500, seed=23))
    return make_geocube(
        docs, measurements=["m0", "m1"], geom=GEOM,
        resolution=(-1.0 / 32, 1.0 / 32), fill=0.0,
        merge_alg="add", tile_size=16,
    )


def _ref_reclass(arr, fill, right=False):
    classes = np.asarray(CLASSES)
    out = classes[np.digitize(arr, BREAKS, right=right)]
    if np.isnan(fill):
        out = np.where(np.isnan(arr), fill, out)
    else:
        out = np.where(arr == fill, fill, out)
    return out


@pytest.mark.parametrize("right", [False, True])
def test_reclassify_matches_digitize(spark, cube, right):
    out = reclassify(cube, "m0", BREAKS, CLASSES, right=right)
    assert "m0_class" in out.bands
    arrs = out.assemble()
    want = _ref_reclass(arrs["m0"].astype(float), 0.0, right=right)
    np.testing.assert_array_equal(arrs["m0_class"], want)


def test_reclassify_boundary_values(spark):
    # cells that land exactly ON a break: left-closed by default,
    # right-closed with right=True (np.digitize semantics)
    docs = datagen.to_spark(spark, datagen.scale_docs(40, seed=3))
    cube = make_geocube(
        docs, measurements=["m0"], geom=GEOM,
        resolution=(-1.0 / 8, 1.0 / 8), fill=np.nan,
        merge_alg="replace", tile_size=8,
    )
    cube2 = reclassify(cube, "m0", [0.0, 500.0], [0.0, 1.0, 2.0])
    arrs = cube2.assemble()
    a = arrs["m0"].astype(float)
    want = np.asarray([0.0, 1.0, 2.0])[np.digitize(a, [0.0, 500.0])]
    want = np.where(np.isnan(a), np.nan, want)
    np.testing.assert_array_equal(arrs["m0_class"], want)


def test_reclassify_validation(cube):
    with pytest.raises(ValueError, match="non-empty"):
        reclassify(cube, "m0", [], [1.0])
    with pytest.raises(ValueError, match="strictly increasing"):
        reclassify(cube, "m0", [5.0, 5.0], [1.0, 2.0, 3.0])
    with pytest.raises(ValueError, match="len\\(breaks\\)\\+1"):
        reclassify(cube, "m0", [5.0], [1.0])
    with pytest.raises(ValueError, match="unknown band"):
        reclassify(cube, "nope", [5.0], [1.0, 2.0])


def test_zonal_crosstab_matches_counter(spark, cube):
    both = reclassify(
        reclassify(cube, "m0", BREAKS, CLASSES),
        "m1", [250.0, 800.0], [10.0, 20.0, 30.0], name="m1_class",
    )
    got = zonal_crosstab(both, "m0_class", "m1_class").collect()
    arrs = both.assemble()
    z = arrs["m0_class"].ravel()
    c = arrs["m1_class"].ravel()
    ok = (z != 0.0) & (c != 0.0)
    want = Counter(zip(z[ok], c[ok]))
    assert {
        (r["zone"], r["cls"]): r["n_cells"] for r in got
    } == dict(want)
    # ordered output
    keys = [(r["zone"], r["cls"]) for r in got]
    assert keys == sorted(keys)


def test_zonal_crosstab_grouped(spark):
    docs = datagen.to_spark(spark, datagen.grouped_polygon_docs(3, 5))
    cube = make_geocube(
        docs, measurements=["claytotal_r", "sandtotal_r"],
        group_by="hzdept_r", output_crs="epsg:32615",
        resolution=(-60, 60), fill=0.0, tile_size=32,
    )
    rc = reclassify(cube, "claytotal_r", [20.0], [1.0, 2.0])
    got = zonal_crosstab(rc, "claytotal_r_class", "sandtotal_r")
    rows = got.collect()
    arrs = rc.assemble()
    gidx = {str(k): i for i, k in enumerate(rc.group_keys)}
    for gkey, gi in gidx.items():
        z = arrs["claytotal_r_class"][gi].ravel()
        c = arrs["sandtotal_r"][gi].ravel()
        ok = (z != 0.0) & (c != 0.0)
        want = Counter(zip(z[ok], c[ok]))
        have = {
            (r["zone"], r["cls"]): r["n_cells"]
            for r in rows if r["group_key"] == gkey
        }
        assert have == dict(want), gkey


def test_crosstab_map_side_combine_plan(spark, cube):
    both = reclassify(cube, "m0", BREAKS, CLASSES)
    df = zonal_crosstab(both, "m0_class", "m1")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan
    head = plan.split("MapInPandas")[0]
    assert "InPandas" not in head and "BatchEvalPython" not in head
    assert "CartesianProduct" not in plan


def test_crosstab_validation(cube):
    with pytest.raises(ValueError, match="unknown band"):
        zonal_crosstab(cube, "m0", "nope")
