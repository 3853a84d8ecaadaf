"""cells_to_cube: index-cell tables rendered back onto raster grids.

Grid origins are offset by 1/16-degree so no cell boundary can pass
through a raster cell center — containment is then unambiguous and
the parity checks are exact."""

import numpy as np
import pytest

from geocube_spark.bandops import cells_to_cube
from geocube_spark.geometry.affine import Affine
from geocube_spark.geometry.crs import CRS
from geocube_spark.grid.geobox import GeoBox

WORLD = GeoBox(
    360, 180, Affine(1.0, 0.0, -180.0625, 0.0, -1.0, 90.0625), CRS(4326)
)


def _centers(gb):
    a = gb.affine
    lon = a.c + (np.arange(gb.width) + 0.5) * a.a
    lat = a.f + (np.arange(gb.height) + 0.5) * a.e
    return np.meshgrid(lon, lat)


def test_geohash_cells_match_bbox_closed_form(spark):
    from geocube_spark.grid.geohash import geohash_decode

    data = [("9q", 5.0), ("dr", 7.0), ("u0", 2.0), ("r6", 1.5)]
    cells = spark.createDataFrame(data, "cell string, value double")
    arr = cells_to_cube(
        cells, WORLD, scheme="geohash", res=2
    ).assemble()["value"]
    lon, lat = _centers(WORLD)
    exp = np.zeros((180, 360))
    for gh, v in data:
        lon0, lat0, lon1, lat1 = geohash_decode(gh)
        exp[(lon0 < lon) & (lon < lon1) & (lat0 < lat) & (lat < lat1)] = v
    assert (exp != 0).sum() > 100
    np.testing.assert_array_equal(arr, exp)


def test_hex_cells_match_nearest_center_rule(spark):
    """The burned hexagon is the cube-round Voronoi region: a raster
    center gets value v(cid) iff hex_cell_id(center) == cid."""
    from geocube_spark.grid.hex import hex_cell_id

    gb = GeoBox(
        120, 100, Affine(0.1, 0.0, -5.0625, 0.0, -0.1, 49.0625),
        CRS(4326),
    )
    rng = np.random.default_rng(11)
    px = rng.uniform(-4, 5, 60)
    py = rng.uniform(40, 48, 60)
    ids = np.unique(hex_cell_id(px, py, 5))
    vals = {int(c): float(i + 1) for i, c in enumerate(ids)}
    cells = spark.createDataFrame(
        [(int(c), v) for c, v in vals.items()], "cell long, value double"
    )
    arr = cells_to_cube(
        cells, gb, scheme="hex", res=5
    ).assemble()["value"]
    lon, lat = _centers(gb)
    cid = hex_cell_id(lon.ravel(), lat.ravel(), 5).reshape(lon.shape)
    exp = np.vectorize(lambda c: vals.get(int(c), 0.0))(cid)
    assert (exp != 0).sum() > 500
    np.testing.assert_array_equal(arr, exp)


def test_s2_cells_match_independent_pip(spark):
    """Independent reference: convex-quad containment (cross-product
    signs) of each raster center in the cell's ST-edge corner quad —
    shares no code with the scanline burn."""
    from geocube_spark.grid.s2 import cell_id  # noqa: F401
    from geocube_spark.grid.s2 import compact_cell_corners, compact_cell_id

    gb = GeoBox(
        120, 100, Affine(0.1, 0.0, -5.0625, 0.0, -0.1, 49.0625),
        CRS(4326),
    )
    rng = np.random.default_rng(13)
    px = rng.uniform(-4, 5, 40)
    py = rng.uniform(40, 48, 40)
    level = 7
    ids = np.unique(compact_cell_id(px, py, level))
    vals = {int(c): float(i + 1) for i, c in enumerate(ids)}
    cells = spark.createDataFrame(
        [(int(c), v) for c, v in vals.items()], "cell long, value double"
    )
    arr = cells_to_cube(
        cells, gb, scheme="s2", res=level
    ).assemble()["value"]
    lon, lat = _centers(gb)
    exp = np.zeros(lon.shape)
    quads = compact_cell_corners(np.array(list(vals)), level)
    for cid_, quad in zip(vals, quads):
        area2 = sum(
            quad[k, 0] * quad[(k + 1) % 4, 1]
            - quad[(k + 1) % 4, 0] * quad[k, 1]
            for k in range(4)
        )
        sign = 1.0 if area2 > 0 else -1.0
        inside = np.ones(lon.shape, dtype=bool)
        for k in range(4):
            x0, y0 = quad[k]
            x1, y1 = quad[(k + 1) % 4]
            cr = (x1 - x0) * (lat - y0) - (y1 - y0) * (lon - x0)
            inside &= sign * cr > 0
        exp[inside] = vals[cid_]
    assert (exp != 0).sum() > 500
    np.testing.assert_array_equal(arr, exp)


def test_cells_to_cube_merge_add_and_errors(spark):
    cells = spark.createDataFrame(
        [("9q", 5.0), ("9q", 2.0)], "cell string, value double"
    )
    arr = cells_to_cube(
        cells, WORLD, scheme="geohash", res=2, merge_alg="add"
    ).assemble()["value"]
    assert set(np.unique(arr)) == {0.0, 7.0}
    with pytest.raises(ValueError, match="scheme"):
        cells_to_cube(cells, WORLD, scheme="quadkey", res=2)
    with pytest.raises(ValueError, match="cell column"):
        cells_to_cube(cells, WORLD, scheme="geohash", res=2,
                      cell_col="nope")
    with pytest.raises(ValueError, match="measurement column"):
        cells_to_cube(cells, WORLD, scheme="geohash", res=2,
                      measurements=["nope"])
