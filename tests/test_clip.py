"""clip_cube: numpy mask parity (center rule), invert mode, tile
dropping, grouped cubes."""

import json

import numpy as np
import pytest

from geocube_spark import datagen
from geocube_spark.bandops import clip_cube
from geocube_spark.cube import make_geocube

GEOM = (
    '{"type": "Polygon", "coordinates": [[[-91, 41], [-90, 41], '
    '[-90, 42], [-91, 42], [-91, 41]]]}'
)

# a diamond centered in the grid
CUT = {
    "type": "Polygon",
    "coordinates": [[
        [-90.5, 41.2], [-90.2, 41.5], [-90.5, 41.8], [-90.8, 41.5],
        [-90.5, 41.2],
    ]],
}


@pytest.fixture(scope="module")
def cube(spark):
    docs = datagen.to_spark(spark, datagen.scale_docs(500, seed=23))
    return make_geocube(
        docs, measurements=["m0"], geom=GEOM,
        resolution=(-1.0 / 32, 1.0 / 32), fill=0.0,
        merge_alg="add", tile_size=8,
    )


def _center_mask(gb):
    """Cell centers inside the diamond (exact L1-ball closed form)."""
    a = gb.affine
    cols = np.arange(gb.width) + 0.5
    rows = np.arange(gb.height) + 0.5
    x = a.c + cols * a.a
    y = a.f + rows * a.e
    X, Y = np.meshgrid(x, y)
    return (np.abs(X + 90.5) / 0.3 + np.abs(Y - 41.5) / 0.3) <= 1.0


def test_clip_matches_center_rule(spark, cube):
    got = clip_cube(cube, CUT).assemble()["m0"]
    base = cube.assemble()["m0"]
    mask = _center_mask(cube.geobox)
    np.testing.assert_array_equal(got, np.where(mask, base, 0.0))


def test_clip_accepts_json_string_and_drops_tiles(spark, cube):
    clipped = clip_cube(cube, json.dumps(CUT))
    # tiles the cutline never touches are gone from the chunk table
    n_all = cube.chunks.count()
    n_clip = clipped.chunks.count()
    assert 0 < n_clip < n_all


def test_clip_invert(spark, cube):
    got = clip_cube(cube, CUT, invert=True).assemble()["m0"]
    base = cube.assemble()["m0"]
    mask = _center_mask(cube.geobox)
    np.testing.assert_array_equal(got, np.where(mask, 0.0, base))
    # inverted clip keeps every tile (mask-free ones pass through)
    assert clip_cube(cube, CUT, invert=True).chunks.count() \
        == cube.chunks.count()


def test_clip_grouped(spark):
    docs = datagen.to_spark(spark, datagen.grouped_polygon_docs(3, 5))
    gcube = make_geocube(
        docs, measurements=["claytotal_r"], group_by="hzdept_r",
        output_crs="epsg:32615", resolution=(-60, 60), fill=0.0,
        tile_size=32,
    )
    gb = gcube.geobox
    a = gb.affine
    # rectangle over the west half of the grid, in grid CRS
    x0, x1 = a.c, a.c + gb.width / 2 * a.a
    ys = sorted([a.f, a.f + gb.height * a.e])
    cut = {
        "type": "Polygon",
        "coordinates": [[
            [x0, ys[0]], [x1, ys[0]], [x1, ys[1]], [x0, ys[1]],
            [x0, ys[0]],
        ]],
    }
    got = clip_cube(gcube, cut).assemble()["claytotal_r"]
    base = gcube.assemble()["claytotal_r"]
    half = gb.width // 2
    np.testing.assert_array_equal(got[:, :, :half], base[:, :, :half])
    assert (got[:, :, half:] == 0.0).all()
