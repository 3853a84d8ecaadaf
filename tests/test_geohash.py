"""Geohash: public spec vectors, decode round-trip, prefix hierarchy,
and bit-for-bit agreement of the three forms (numpy / Catalyst Column
/ DuckDB SQL)."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from geocube_spark.grid.geohash import (
    geohash_col,
    geohash_decode,
    geohash_encode,
    geohash_int,
    geohash_sql,
    with_geohash,
)


def test_spec_vectors():
    # the two canonical public examples (Wikipedia "Geohash")
    assert geohash_encode(10.40744, 57.64911, 11).item() == "u4pruydqqvj"
    assert geohash_encode(-5.6, 42.6, 5).item() == "ezs42"


def test_decode_roundtrip_and_prefix():
    rng = np.random.RandomState(7)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    gh8 = geohash_encode(lon, lat, 8)
    gh4 = geohash_encode(lon, lat, 4)
    for i in range(len(lon)):
        lo_x, lo_y, hi_x, hi_y = geohash_decode(gh8[i])
        assert lo_x <= lon[i] < hi_x and lo_y <= lat[i] < hi_y
        # hierarchy is prefix truncation
        assert gh8[i][:4] == gh4[i]
        # center re-encodes to the same cell
        cx, cy = (lo_x + hi_x) / 2, (lo_y + hi_y) / 2
        assert geohash_encode(cx, cy, 8).item() == gh8[i]


def test_boundary_clamps():
    got = geohash_encode(
        [180.0, -180.0, 0.0], [90.0, -90.0, 0.0], 6
    )
    # poles / antimeridian stay legal cells and round-trip
    for g in got:
        geohash_decode(g)
    assert got[1] == "000000"


def test_validation():
    with pytest.raises(ValueError, match="precision"):
        geohash_encode(0.0, 0.0, 0)
    with pytest.raises(ValueError, match="precision"):
        geohash_encode(0.0, 0.0, 13)
    with pytest.raises(ValueError, match="invalid geohash"):
        geohash_decode("abi")  # 'i' is not in the alphabet


@pytest.mark.parametrize("precision", [1, 5, 8, 12])
def test_column_matches_numpy(spark, precision):
    rng = np.random.RandomState(precision)
    lon = np.concatenate([
        rng.uniform(-180, 180, 300), [-180.0, 180.0, 0.0, 179.999999]
    ])
    lat = np.concatenate([
        rng.uniform(-90, 90, 300), [-90.0, 90.0, 0.0, 89.999999]
    ])
    df = spark.createDataFrame(
        [(i, float(lon[i]), float(lat[i])) for i in range(len(lon))],
        "i long, lon double, lat double",
    )
    got = {
        r["i"]: r["gh"]
        for r in with_geohash(df, "lon", "lat", precision, "gh").collect()
    }
    want = geohash_encode(lon, lat, precision)
    for i in range(len(lon)):
        assert got[i] == want[i], (i, lon[i], lat[i])


def test_sql_matches_numpy():
    rng = np.random.RandomState(3)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT * FROM (SELECT "
        "unnest(range(500)) AS i)"
    )
    con.execute("ALTER TABLE pts ADD COLUMN lon DOUBLE")
    con.execute("ALTER TABLE pts ADD COLUMN lat DOUBLE")
    import pandas as pd

    pdf = pd.DataFrame({"i": np.arange(500), "lon": lon, "lat": lat})
    con.execute("DROP TABLE pts")
    con.register("pts", pdf)
    sql = geohash_sql("lon", "lat", 8, "pts", keep="i", out_col="gh")
    got = con.execute(sql + " ORDER BY i").df()
    want = geohash_encode(lon, lat, 8)
    assert list(got["gh"]) == list(want)


def test_pure_jvm_plan(spark):
    df = spark.range(4).select(
        F.col("id").alias("i"),
        (F.col("id") * 10.0 - 15.0).alias("lon"),
        (F.col("id") * 5.0 - 7.0).alias("lat"),
    )
    out = df.select(geohash_col(F.col("lon"), F.col("lat"), 8))
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "InPandas"):
        assert bad not in plan
