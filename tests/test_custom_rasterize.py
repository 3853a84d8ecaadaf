"""Pluggable rasterize_function contract (reference §2.9 parity).

Any callable f(*, geometry_array, data_values, geobox, grid_coords,
fill, **ignored) -> ndarray | None can be passed to make_geocube,
composed with functools.partial exactly like the reference's tests do
(test_core_integration.py:801-816); None skips the band.
"""

from functools import partial

import numpy as np

from geocube_spark import datagen as DG
from geocube_spark.cube import make_geocube
from geocube_spark.kernels.user_functions import (
    rasterize_image,
    rasterize_points_griddata,
)

KW = dict(
    output_crs="EPSG:32615", resolution=(-30.0, 30.0),
    fill=-9999.0, tile_size=32,
)


def test_callable_image_matches_string_path(spark):
    docs = DG.to_spark(spark, DG.flat_polygon_docs(n=9))
    base = make_geocube(
        docs, measurements=["om_r"], merge_alg="replace", **KW
    ).assemble()
    custom = make_geocube(
        docs, measurements=["om_r"],
        rasterize_function=partial(rasterize_image, merge_alg="replace"),
        **KW,
    ).assemble()
    np.testing.assert_array_equal(base["om_r"], custom["om_r"])


def test_callable_griddata_matches_string_path(spark):
    docs = DG.to_spark(spark, DG.point_docs(n=15))
    kw = dict(
        measurements=["test_attr"], output_crs="EPSG:4326",
        resolution=(-0.001, 0.001), fill=-9999.0, tile_size=16,
    )
    base = make_geocube(
        docs, rasterize_function="points_griddata",
        interp_method="nearest", **kw,
    ).assemble()
    custom = make_geocube(
        docs,
        rasterize_function=partial(
            rasterize_points_griddata, method="nearest"
        ),
        **kw,
    ).assemble()
    np.testing.assert_array_equal(base["test_attr"], custom["test_attr"])


def test_callable_none_skips_band(spark):
    docs = DG.to_spark(spark, DG.flat_polygon_docs(n=5))

    def only_om(*, geometry_array, data_values, geobox, grid_coords,
                fill, **ignored):
        # skip everything; the engine must yield zero chunks
        return None

    cube = make_geocube(
        docs, measurements=["om_r", "awc_r"],
        rasterize_function=only_om, **KW,
    )
    assert cube.chunks.count() == 0


def test_callable_custom_user_function(spark):
    docs = DG.to_spark(spark, DG.flat_polygon_docs(n=5))

    def count_geoms(*, geometry_array, data_values, geobox, grid_coords,
                    fill, **ignored):
        h, w = geobox.shape
        return np.full((h, w), float(len(geometry_array)))

    cube = make_geocube(
        docs, measurements=["om_r"], rasterize_function=count_geoms, **KW
    )
    arr = cube.assemble()["om_r"]
    assert (arr == 5.0).all()
