"""write_geojson: single-file and parts-mode round-trips through the
engine's own reader, null geometry, property typing, legacy CRS
member."""

import json

import numpy as np
import pytest
from pyspark.sql import types as T

from geocube_spark.geometry import wkb as W
from geocube_spark.sources.geojson import (
    geojson_file_epsg,
    read_geojson,
    write_geojson,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = []
    for i in range(7):
        if i == 5:
            g = None
        elif i % 2 == 0:
            g = W.point(float(i), float(-i)).to_wkb()
        else:
            g = W.polygon(
                [(i, 0.0), (i + 1.0, 0.0), (i + 1.0, 1.0), (i, 0.0)]
            ).to_wkb()
        rows.append((
            f"d{i}", i,
            None if g is None else bytearray(g),
            float(i) * 1.5 if i != 6 else float("nan"),
            f"name-{i}",
        ))
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("geometry_wkb", T.BinaryType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("name", T.StringType()),
    ])
    return spark.createDataFrame(rows, schema)


def _geom_set(df):
    return {
        (r["doc_id"] if "doc_id" in df.columns else None,
         None if r["geometry_wkb"] is None
         else bytes(r["geometry_wkb"]).hex())
        for r in df.select("doc_id", "geometry_wkb").collect()
    }


def test_single_roundtrip(spark, vec_df, tmp_path):
    path = str(tmp_path / "out.geojson")
    assert write_geojson(vec_df, path) == [path]
    doc = json.load(open(path))
    assert doc["type"] == "FeatureCollection"
    assert len(doc["features"]) == 7
    # null geometry preserved per RFC 7946
    geoms = [f["geometry"] for f in doc["features"]]
    assert sum(g is None for g in geoms) == 1
    # NaN property -> null
    props = {f["properties"]["name"]: f["properties"]["score"]
             for f in doc["features"]}
    assert props["name-6"] is None

    back = read_geojson(spark, path)
    assert back.count() == 7
    # geometry bytes identical after the round trip
    want = {
        None if r["geometry_wkb"] is None else bytes(r["geometry_wkb"])
        for r in vec_df.collect()
    }
    got = {
        None if r["geometry_wkb"] is None else bytes(r["geometry_wkb"])
        for r in back.collect()
    }
    assert got == want


def test_parts_roundtrip(spark, vec_df, tmp_path):
    out_dir = str(tmp_path / "parts")
    paths = write_geojson(
        vec_df.repartition(3), out_dir, mode="parts"
    )
    assert len(paths) == 3
    for p in paths:
        doc = json.load(open(p))
        assert doc["type"] == "FeatureCollection"
    back = read_geojson(spark, f"{out_dir}/part-*.geojson")
    assert back.count() == 7
    want = sorted(
        r["name"] for r in vec_df.select("name").collect()
    )
    got = sorted(r["name"] for r in back.select("name").collect())
    assert got == want


def test_crs_member_sniffed(spark, vec_df, tmp_path):
    path = str(tmp_path / "utm.geojson")
    write_geojson(vec_df, path, epsg=32615)
    assert geojson_file_epsg(path) == 32615
    doc = json.load(open(path))
    assert "EPSG::32615" in doc["crs"]["properties"]["name"]


def test_unknown_mode(vec_df, tmp_path):
    with pytest.raises(ValueError, match="unknown mode"):
        write_geojson(vec_df, str(tmp_path / "x"), mode="banana")
