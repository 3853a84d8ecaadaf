"""Reference-fixture parity: the engine vs the reference's OWN inputs
and golden outputs.

Inputs are the reference repo's real GeoJSON fixtures
(/root/reference/test/test_data/input/*.geojson — plain JSON, parsed
without GDAL) converted into the interleaved documents table. Goldens
are the reference's committed netCDF outputs
(/root/reference/test/test_data/compare/*.nc), read cell-for-cell with
the pure-Python HDF5 reader (geocube_spark/sources/hdf5.py).

Each test mirrors one reference integration test's exact parameters:
  - flat soil          test_core_integration.py:53-82
  - categorical        test_core_integration.py:85-196
  - interpolate_na     test_core_integration.py:206-240
  - only_resolution    test_core_integration.py:281-316
  - no_geom            test_core_integration.py:417-436
  - group_by           test_core_integration.py:466-546
  - group no_geom      test_core_integration.py:754-778
  - group only_res     test_core_integration.py:590-622
  - convert_time       test_core_integration.py:319-348
  - group_by_time      test_core_integration.py:625-678
  - custom rasterize   test_core_integration.py:801-888 (rtol/atol 0.1,
                       the reference's own tolerance for scipy drift)
  - new_bounds_crs     test_core_integration.py:789-798
Value tolerance mirrors xarray.testing.assert_allclose (rtol=1e-5)
except where the reference itself loosens it.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from geocube_spark import datagen
from geocube_spark.cube import make_geocube
from geocube_spark.geometry import wkb as W
from geocube_spark.sources.hdf5 import open_netcdf

REF = "/root/reference/test/test_data"
GARS = json.dumps(datagen.GARS_POLY_GEOJSON)
SOIL8 = [
    "om_r", "sandtotal_r", "silttotal_r", "claytotal_r",
    "cec7_r", "ph1to1h2o_r", "dbthirdbar_r", "awc_r",
]
GROUP8 = [
    "cokey", "mukey", "drclassdcd", "hzdept_r", "hzdepb_r",
    "sandtotal_r", "silttotal_r", "claytotal_r",
]
TIME3 = ["test_attr", "test_time_attr", "test_str_attr"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not present"
)


def geojson_docs(name, extra_props=None):
    """Reference geojson -> interleaved documents (doc_id, spans)."""
    d = json.load(open(f"{REF}/input/{name}.geojson"))
    rows = []
    for i, feat in enumerate(d["features"]):
        props = dict(feat["properties"])
        if extra_props:
            for k, vals in extra_props.items():
                props[k] = vals[i % len(vals)]
        g = W.from_geojson(feat["geometry"])
        items = list(props.items())
        half = max(1, len(items) // 2)
        spans = [
            {"kind": "attr", "text": json.dumps(dict(items[:half])),
             "media_ref": "", "offset": 0},
            {"kind": "geom", "text": g.type_name,
             "media_ref": g.to_wkb().hex(), "offset": 1},
            {"kind": "attr", "text": json.dumps(dict(items[half:])),
             "media_ref": "", "offset": 2},
        ]
        rows.append({"doc_id": f"{name}-{i:06d}", "spans": spans})
    return pd.DataFrame(rows)


def assert_matches_golden(cube, golden_name, rtol=1e-5, atol=1e-8):
    """Cell-for-cell comparison against a reference golden netCDF."""
    g = open_netcdf(f"{REF}/compare/{golden_name}")
    arrs = cube.assemble()
    coords = cube.coords()
    np.testing.assert_allclose(
        coords["x"], g.datasets["x"].values, err_msg=f"{golden_name}: x"
    )
    np.testing.assert_allclose(
        coords["y"], g.datasets["y"].values, err_msg=f"{golden_name}: y"
    )
    compared = 0
    for name, ds in g.datasets.items():
        if name in ("x", "y", "spatial_ref") or name.endswith("_categories"):
            continue
        if cube.group_by == name:  # group coordinate, not a band
            ref_keys = np.asarray(ds.values, dtype="float64")
            mine_keys = np.asarray(cube.group_keys, dtype="float64")
            units = ds.attrs.get("units", "")
            if units.startswith("seconds since "):
                # golden stores CF time; our keys are epoch-ns floats
                epoch = np.datetime64(
                    units[len("seconds since "):].replace(" ", "T"), "ns"
                ).astype("int64")
                ref_keys = epoch + ref_keys * 1e9
            np.testing.assert_allclose(
                mine_keys, ref_keys,
                err_msg=f"{golden_name}: group coord {name}",
            )
            continue
        assert name in arrs, f"{golden_name}: band {name} missing"
        mine = np.asarray(arrs[name], dtype="float64")
        ref = np.asarray(ds.values, dtype="float64")
        assert mine.shape == ref.shape, (
            f"{golden_name}/{name}: {mine.shape} != {ref.shape}"
        )
        np.testing.assert_allclose(
            mine, ref, rtol=rtol, atol=atol, equal_nan=True,
            err_msg=f"{golden_name}: band {name}",
        )
        compared += 1
    assert compared > 0
    return g


# ---------------------------------------------------------------------------
# soil_data_flat.geojson (7 features, Polygon + MultiPolygon w/ holes)
# ---------------------------------------------------------------------------

def test_flat_soil_golden(spark):
    docs = datagen.to_spark(spark, geojson_docs("soil_data_flat"))
    cube = make_geocube(
        docs, measurements=SOIL8, output_crs="epsg:32615", geom=GARS,
        resolution=(-10, 10), fill=-9999.0, tile_size=64,
    )
    assert cube.geobox.shape == (188, 144)
    assert_matches_golden(cube, "soil_grid_flat.nc")


def test_flat_soil_golden_categorical(spark):
    docs = datagen.to_spark(spark, geojson_docs(
        "soil_data_flat",
        extra_props={"soil_type": [
            "sand", "silt", "clay", "frank", "silt", "clay", "sand",
        ]},
    ))
    cube = make_geocube(
        docs, output_crs="epsg:32615", geom=GARS, resolution=(-10, 10),
        categorical_enums={"soil_type": ("sand", "silt", "clay")},
        fill=-9999.0, tile_size=64,
    )
    g = assert_matches_golden(cube, "soil_grid_flat_categorical.nc")
    assert cube.bands["soil_type"].dtype == "int8"
    assert cube.bands["soil_type"].categories == list(
        g.datasets["soil_type_categories"].values
    )


def test_flat_soil_golden_interpolate_na(spark):
    docs = datagen.to_spark(spark, geojson_docs("soil_data_flat"))
    cube = make_geocube(
        docs, measurements=SOIL8, output_crs="epsg:32615", geom=GARS,
        resolution=(-10, 10), interpolate_na_method="nearest",
        fill=-9999.0, tile_size=64,
    )
    assert_matches_golden(cube, "soil_grid_flat_interpolate_na.nc")


def test_flat_soil_golden_original_crs(spark):
    docs = datagen.to_spark(spark, geojson_docs("soil_data_flat"))
    cube = make_geocube(
        docs, measurements=SOIL8, resolution=(-0.001, 0.001),
        fill=-9999.0, tile_size=64,
    )
    assert_matches_golden(cube, "soil_grid_flat_original_crs.nc")


def test_flat_soil_golden_no_geom(spark):
    docs = datagen.to_spark(spark, geojson_docs("soil_data_flat"))
    cube = make_geocube(
        docs, measurements=["sandtotal_r"], resolution=(-0.001, 0.001),
        fill=-9999.0, tile_size=64,
    )
    assert_matches_golden(cube, "soil_grid_flat_no_geom.nc")


def test_flat_soil_golden_like_netcdf(spark):
    """`like=` pointed at the reference's own netCDF output reproduces
    its grid and values exactly (test_core_integration.py:279-296 /
    CLI -l flag; the .nc grid is read by sources.hdf5)."""
    docs = datagen.to_spark(spark, geojson_docs("soil_data_flat"))
    cube = make_geocube(
        docs, measurements=SOIL8,
        like=f"{REF}/compare/soil_grid_flat.nc",
        fill=-9999.0, tile_size=64,
    )
    assert cube.geobox.crs.epsg == 32615
    assert_matches_golden(cube, "soil_grid_flat.nc")


# ---------------------------------------------------------------------------
# soil_data_group.geojson (77 MultiPolygons, 11 hzdept_r groups)
# ---------------------------------------------------------------------------

def test_grouped_soil_golden(spark):
    docs = datagen.to_spark(spark, geojson_docs("soil_data_group"))
    cube = make_geocube(
        docs, measurements=GROUP8, output_crs="epsg:32615", geom=GARS,
        group_by="hzdept_r", resolution=(-10, 10), fill=-9999.0,
        tile_size=64,
    )
    # string attrs skipped (cokey/mukey/drclassdcd), hzdept_r -> coord
    assert sorted(cube.bands) == [
        "claytotal_r", "hzdepb_r", "sandtotal_r", "silttotal_r",
    ]
    assert_matches_golden(cube, "soil_grid_group.nc")


def test_grouped_soil_golden_categorical(spark):
    docs = datagen.to_spark(spark, geojson_docs(
        "soil_data_group",
        extra_props={"soil_type": [
            "sand", "bob", "clay", "sand", "silt", "clay", "sand",
        ]},
    ))
    cube = make_geocube(
        docs,
        measurements=["sandtotal_r", "silttotal_r", "soil_type",
                      "claytotal_r"],
        output_crs="epsg:32615", geom=GARS, group_by="hzdept_r",
        resolution=(-10, 10),
        categorical_enums={"soil_type": ("sand", "silt", "clay")},
        fill=-9999.0, tile_size=64,
    )
    assert cube.bands["soil_type"].dtype == "int8"
    assert_matches_golden(cube, "soil_grid_group_categorical.nc")


def test_grouped_soil_golden_no_geom(spark):
    docs = datagen.to_spark(spark, geojson_docs("soil_data_group"))
    cube = make_geocube(
        docs, measurements=["sandtotal_r"], group_by="hzdept_r",
        resolution=(-0.001, 0.001), fill=-9999.0, tile_size=64,
    )
    assert_matches_golden(cube, "soil_grid_group_no_geom.nc")


def test_grouped_soil_golden_original_crs(spark):
    docs = datagen.to_spark(spark, geojson_docs("soil_data_group"))
    cube = make_geocube(
        docs, measurements=["sandtotal_r", "silttotal_r", "claytotal_r"],
        group_by="hzdept_r", resolution=(-0.001, 0.001), fill=-9999.0,
        tile_size=64,
    )
    assert_matches_golden(cube, "soil_grid_grouped_original_crs.nc")


def test_to_netcdf_roundtrip_matches_golden(spark, tmp_path):
    """to_netcdf (reference Dataset.to_netcdf parity, classic CDF-2):
    the written file round-trips through the classic reader with the
    golden's band values, coords, fills, and a parseable CRS WKT."""
    from geocube_spark.sources.netcdf_classic import read_netcdf
    from geocube_spark.geometry.crs import CRS

    docs = datagen.to_spark(spark, geojson_docs("soil_data_flat"))
    cube = make_geocube(
        docs, measurements=SOIL8, output_crs="epsg:32615", geom=GARS,
        resolution=(-10, 10), fill=-9999.0, tile_size=64,
    )
    out = str(tmp_path / "soil.nc")
    cube.to_netcdf(out)
    f = read_netcdf(out)
    g = open_netcdf(f"{REF}/compare/soil_grid_flat.nc")
    assert f.dims == {"y": 188, "x": 144}
    for b in SOIL8:
        np.testing.assert_allclose(
            f.variables[b].values.astype("float64"),
            g.datasets[b].values.astype("float64"),
            rtol=1e-5, equal_nan=True, err_msg=b,
        )
        assert f.variables[b].attrs["grid_mapping"] == "spatial_ref"
    np.testing.assert_allclose(
        f.variables["x"].values, g.datasets["x"].values
    )
    np.testing.assert_allclose(
        f.variables["y"].values, g.datasets["y"].values
    )
    assert float(f.variables["om_r"].attrs["_FillValue"]) == -9999.0
    wkt = f.variables["spatial_ref"].attrs["crs_wkt"]
    assert CRS.from_user_input(wkt).epsg == 32615
    assert "Transverse Mercator" in wkt


def test_to_netcdf_grouped_and_categorical(spark, tmp_path):
    from geocube_spark.sources.netcdf_classic import read_netcdf

    docs = datagen.to_spark(spark, geojson_docs(
        "soil_data_group",
        extra_props={"soil_type": [
            "sand", "bob", "clay", "sand", "silt", "clay", "sand",
        ]},
    ))
    cube = make_geocube(
        docs,
        measurements=["sandtotal_r", "soil_type"],
        output_crs="epsg:32615", geom=GARS, group_by="hzdept_r",
        resolution=(-10, 10),
        categorical_enums={"soil_type": ("sand", "silt", "clay")},
        fill=-9999.0, tile_size=64,
    )
    out = str(tmp_path / "grouped.nc")
    cube.to_netcdf(out)
    f = read_netcdf(out)
    assert f.dims["hzdept_r"] == 11
    assert f.variables["sandtotal_r"].shape == (11, 188, 144)
    assert f.variables["soil_type"].dtype.name in ("int8", "uint8")
    assert f.variables["soil_type"].attrs["categories"] == \
        "clay,sand,silt,nodata"
    np.testing.assert_allclose(
        f.variables["hzdept_r"].values, cube.group_keys
    )
    got = f.variables["sandtotal_r"].values.astype("float64")
    want = cube.assemble()["sandtotal_r"].astype("float64")
    np.testing.assert_allclose(got, want, equal_nan=True)


# ---------------------------------------------------------------------------
# time_vector_data / naive_time_vector_data (20 points, datetime attr)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "src", ["naive_time_vector_data", "time_vector_data"]
)
def test_time_golden(spark, src):
    docs = datagen.to_spark(spark, geojson_docs(src))
    cube = make_geocube(
        docs, measurements=TIME3, datetime_measurements=["test_time_attr"],
        resolution=(-0.00001, 0.00001), fill=-9999.0, tile_size=64,
    )
    assert_matches_golden(cube, "time_vector_data.nc")
    assert cube.bands["test_time_attr"].units == (
        "seconds from 1970-01-01T00:00:00"
    )
    assert cube.bands["test_time_attr"].fill == 0


def test_time_grouped_by_time_golden(spark):
    docs = datagen.to_spark(spark, geojson_docs("time_vector_data"))
    cube = make_geocube(
        docs, datetime_measurements=["test_time_attr"],
        group_by="test_time_attr", resolution=(-0.00001, 0.00001),
        fill=-9999.0, tile_size=64,
    )
    g = assert_matches_golden(cube, "vector_time_data_group.nc")
    # group keys are epoch-ns, chronological (two distinct days)
    assert len(cube.group_keys) == 2
    assert cube.group_keys[0] < cube.group_keys[1]


def test_time_grouped_by_attr_golden(spark):
    docs = datagen.to_spark(spark, geojson_docs("time_vector_data"))
    cube = make_geocube(
        docs, datetime_measurements=["test_time_attr"],
        group_by="test_attr", resolution=(-0.00001, 0.00001),
        fill=-9999.0, tile_size=64,
    )
    assert_matches_golden(cube, "vector_data_group.nc")
    assert cube.group_keys == [1.2, 1.3, 1.7, 1.9, 2.3, 5.3]


# ---------------------------------------------------------------------------
# custom rasterize functions (reference tolerance: rtol=0.1, atol=0.1)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "golden,kwargs",
    [
        ("rasterize_griddata_nearest.nc",
         dict(rasterize_function="points_griddata")),
        ("rasterize_griddata_rescale.nc",
         dict(rasterize_function="points_griddata", rescale=True)),
        ("rasterize_radial_linear.nc",
         dict(rasterize_function="points_radial")),
        ("rasterize_image_sum.nc",
         dict(rasterize_function="image", merge_alg="add")),
        ("rasterize_unchanged.nc",
         dict(rasterize_function="image", all_touched=True)),
    ],
)
def test_custom_rasterize_golden(spark, golden, kwargs):
    docs = datagen.to_spark(spark, geojson_docs("time_vector_data"))
    cube = make_geocube(
        docs, measurements=TIME3, resolution=(-0.00001, 0.00001),
        fill=-9999.0, tile_size=64, **kwargs,
    )
    assert_matches_golden(cube, golden, rtol=0.1, atol=0.1)


@pytest.mark.parametrize(
    "golden,kwargs",
    [
        ("rasterize_griddata_nearest_nodata.nc",
         dict(rasterize_function="points_griddata", filter_nan=True)),
        ("rasterize_radial_linear_nodata.nc",
         dict(rasterize_function="points_radial", filter_nan=True)),
        ("rasterize_image_sum_nodata.nc",
         dict(rasterize_function="image", merge_alg="add",
              filter_nan=True)),
    ],
)
def test_custom_rasterize_nodata_golden(spark, golden, kwargs):
    docs = datagen.to_spark(spark, geojson_docs("point_with_null"))
    cube = make_geocube(
        docs, resolution=(-0.00001, 0.00001), tile_size=64, **kwargs,
    )
    assert_matches_golden(cube, golden, rtol=0.1, atol=0.1)


# ---------------------------------------------------------------------------
# reprojection across UTM zones (test_core_integration.py:789-798)
# ---------------------------------------------------------------------------

def test_new_bounds_crs(spark):
    docs = datagen.to_spark(spark, geojson_docs("wgs84_geom"))
    cube = make_geocube(
        docs, output_crs="epsg:32614", resolution=(-1, 1), fill=-9999.0,
        tile_size=64,
    )
    np.testing.assert_almost_equal(
        cube.geobox.bounds(),
        (1665478.0, 7018306.0, 1665945.0, 7018509.0),
    )
