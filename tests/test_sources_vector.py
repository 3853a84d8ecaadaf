"""WKT codec + ESRI shapefile source/sink tests.

Reference parity target: the reference ingests any OGR-readable
vector file via geopandas (cli/geocube.py:69-75, geo_utils/
geobox.py:30-38); here the same data reaches make_geocube through
geometry/wkt.py (text codec) and sources/shapefile.py (public ESRI
spec, no GDAL). The strongest check below routes the reference's own
soil_data_flat fixture through a shapefile roundtrip and asserts the
burned cube is identical to the direct GeoJSON path.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from geocube_spark.geometry import wkb as W
from geocube_spark.geometry import wkt as WT
from geocube_spark.sources import shapefile as SF

REF = "/root/reference/test/test_data"


# ---------------------------------------------------------------------------
# WKT codec
# ---------------------------------------------------------------------------

WKT_CASES = [
    "POINT (30 10)",
    "LINESTRING (30 10, 10 30, 40 40)",
    "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
    "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), "
    "(20 30, 35 35, 30 20, 20 30))",
    "MULTIPOINT (10 40, 40 30, 20 20, 30 10)",
    "MULTILINESTRING ((10 10, 20 20, 10 40), "
    "(40 40, 30 30, 40 20, 30 10))",
    "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), "
    "((15 5, 40 10, 10 20, 5 10, 15 5)))",
    "GEOMETRYCOLLECTION (POINT (40 10), "
    "LINESTRING (10 10, 20 20, 10 40))",
]


@pytest.mark.parametrize("text", WKT_CASES)
def test_wkt_roundtrip_text(text):
    g = WT.loads(text)
    assert WT.dumps(g) == text
    # and through WKB
    assert WT.dumps(W.loads(g.to_wkb())) == text


def test_wkt_variants_and_z():
    # nested-paren multipoint, Z/ZM drop, scientific notation, case
    assert WT.dumps(WT.loads("MULTIPOINT ((1 2), (3 4))")) == \
        "MULTIPOINT (1 2, 3 4)"
    assert WT.dumps(WT.loads("POINT Z (1 2 3)")) == "POINT (1 2)"
    assert WT.dumps(WT.loads("POINT ZM (1 2 3 4)")) == "POINT (1 2)"
    assert WT.dumps(WT.loads("point(-1.5e2 .25)")) == "POINT (-150 0.25)"
    assert WT.dumps(WT.loads("POLYGON EMPTY")) == "POLYGON EMPTY"
    assert WT.dumps(WT.loads("POINT EMPTY")) == "POINT EMPTY"


@pytest.mark.parametrize(
    "bad", ["CIRCLE (1 2)", "POINT (1)", "POLYGON ((1 2, 3 4)",
            "POINT (1 2) junk", ""]
)
def test_wkt_errors(bad):
    with pytest.raises(WT.WKTError):
        WT.loads(bad)


def test_wkt_float_exactness():
    # repr-based dumps round-trips arbitrary float64 exactly
    xs = np.array([1 / 3, -1e-17, 1.7976931348623157e308, 123.456e-7])
    g = W.Geometry(W.MULTIPOINT, np.column_stack([xs, xs / 2]))
    g2 = WT.loads(WT.dumps(g))
    np.testing.assert_array_equal(g.parts, g2.parts)


def test_with_wkb_from_wkt_spark(spark):
    from geocube_spark.extract import with_wkb_from_wkt

    df = spark.createDataFrame(
        [("a", "POINT (1 2)"), ("b", None),
         ("c", "POLYGON ((0 0, 1 0, 1 1, 0 0))")],
        "doc_id string, geometry_wkt string",
    )
    out = with_wkb_from_wkt(df).orderBy("doc_id").collect()
    assert out[0]["geometry_wkb"] == W.point(1, 2).to_wkb()
    assert out[1]["geometry_wkb"] is None
    assert W.loads(bytes(out[2]["geometry_wkb"])).type_name == "Polygon"


# ---------------------------------------------------------------------------
# shapefile local roundtrip
# ---------------------------------------------------------------------------

def test_shapefile_local_roundtrip(tmp_path):
    g1 = WT.loads(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
        "(2 2, 4 2, 4 4, 2 4, 2 2))"
    )
    g2 = WT.loads(
        "MULTIPOLYGON (((20 0, 30 0, 30 10, 20 0)), "
        "((40 0, 50 0, 50 10, 40 0)))"
    )
    attrs = pd.DataFrame(
        {"name": ["a", "b", None], "val": [1.5, np.nan, 3.25],
         "n": [1, 2, 3], "flag": [True, False, True]}
    )
    p = str(tmp_path / "polys.shp")
    SF.write_shapefile_local(p, [g1, g2, None], attrs, epsg=4326)
    geoms, a2, epsg = SF.read_shapefile_local(p)
    assert epsg == 4326
    assert geoms[0].type_name == "Polygon" and len(geoms[0].parts) == 2
    assert geoms[1].type_name == "MultiPolygon" and len(geoms[1].parts) == 2
    assert geoms[2] is None
    # geometry cell-coverage equivalence: same ring coords as sets
    for mine, orig in zip(geoms[:2], [g1, g2]):
        got = sorted(
            tuple(map(tuple, np.unique(r, axis=0)))
            for r in mine.coord_arrays()
        )
        want = sorted(
            tuple(map(tuple, np.unique(r, axis=0)))
            for r in orig.coord_arrays()
        )
        assert got == want
    assert a2["name"].tolist()[:2] == ["a", "b"] and a2["name"][2] is None
    assert a2["val"][0] == 1.5 and pd.isna(a2["val"][1])
    assert a2["n"].tolist() == [1, 2, 3]
    assert a2["flag"].tolist() == [True, False, True]


def test_shapefile_points_lines_multipoint(tmp_path):
    pts = [W.point(x, 2 * x) for x in range(5)]
    p = str(tmp_path / "pts.shp")
    SF.write_shapefile_local(p, pts, pd.DataFrame({"i": range(5)}))
    g, a, epsg = SF.read_shapefile_local(p)
    assert [tuple(x.parts) for x in g] == [(x, 2.0 * x) for x in range(5)]
    assert a["i"].tolist() == list(range(5)) and epsg is None

    lns = [WT.loads("LINESTRING (0 0, 5 5, 10 0)"),
           WT.loads("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))")]
    p2 = str(tmp_path / "lines.shp")
    SF.write_shapefile_local(p2, lns, None)
    g, _, _ = SF.read_shapefile_local(p2)
    assert [WT.dumps(x) for x in g] == [WT.dumps(x) for x in lns]

    p3 = str(tmp_path / "mp.shp")
    SF.write_shapefile_local(p3, [WT.loads("MULTIPOINT (1 2, 3 4)")], None)
    g, _, _ = SF.read_shapefile_local(p3)
    assert WT.dumps(g[0]) == "MULTIPOINT (1 2, 3 4)"


def test_shapefile_island_in_hole(tmp_path):
    g = WT.loads(
        "MULTIPOLYGON (((0 0, 20 0, 20 20, 0 20, 0 0), "
        "(5 5, 15 5, 15 15, 5 15, 5 5)), "
        "((8 8, 12 8, 12 12, 8 12, 8 8)))"
    )
    p = str(tmp_path / "nest.shp")
    SF.write_shapefile_local(p, [g], None)
    got, _, _ = SF.read_shapefile_local(p)
    assert got[0].type_name == "MultiPolygon"
    assert sorted(len(poly) for poly in got[0].parts) == [1, 2]


def test_shapefile_mixed_types_rejected(tmp_path):
    with pytest.raises(SF.ShapefileError):
        SF.write_shapefile_local(
            str(tmp_path / "x.shp"),
            [W.point(0, 0), WT.loads("LINESTRING (0 0, 1 1)")],
        )


def test_prj_sniff():
    assert SF.sniff_prj_epsg(
        'PROJCS["x",AUTHORITY["EPSG","9999"],'
        'AUTHORITY["EPSG","32615"]]'
    ) == 32615
    assert SF.sniff_prj_epsg('GEOGCS["GCS_WGS_1984",...]') == 4326
    assert SF.sniff_prj_epsg(
        'PROJCS["WGS_1984_UTM_Zone_15N",GEOGCS["GCS_WGS_1984"]]'
    ) == 32615
    assert SF.sniff_prj_epsg(
        'PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere"]'
    ) == 3857
    assert SF.sniff_prj_epsg('LOCAL_CS["unknown"]') is None


# ---------------------------------------------------------------------------
# Spark reader/writer
# ---------------------------------------------------------------------------

def test_read_shapefile_distributed(spark, tmp_path):
    # two files -> one task each; seq is the global record ordinal
    for fi in range(2):
        geoms = [W.point(fi * 10 + i, i) for i in range(3)]
        SF.write_shapefile_local(
            str(tmp_path / f"f{fi}.shp"), geoms,
            pd.DataFrame({"tag": [f"{fi}-{i}" for i in range(3)],
                          "v": [float(fi * 10 + i) for i in range(3)]}),
        )
    df = SF.read_shapefile(spark, str(tmp_path))
    rows = df.orderBy("seq").collect()
    assert [r["seq"] for r in rows] == list(range(6))
    assert [r["tag"] for r in rows] == \
        ["0-0", "0-1", "0-2", "1-0", "1-1", "1-2"]
    assert rows[3]["doc_id"].startswith("shp-f1-")
    g = W.loads(bytes(rows[4]["geometry_wkb"]))
    assert tuple(g.parts) == (11.0, 1.0)
    assert rows[4]["v"] == 11.0


def test_write_shapefile_parts_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {"doc_id": [f"d{i}" for i in range(20)],
         "val": np.arange(20, dtype="float64"),
         "geometry_wkb": [W.point(i, -i).to_wkb() for i in range(20)]}
    )
    df = spark.createDataFrame(pdf).repartition(3)
    out_dir = str(tmp_path / "parts")
    paths = SF.write_shapefile(df, out_dir, mode="parts")
    assert 1 <= len(paths) <= 3
    back = SF.read_shapefile(spark, out_dir)
    got = {
        (r["doc_id"], tuple(W.loads(bytes(r["geometry_wkb"])).parts))
        for r in back.collect()
    }
    assert got == {(f"d{i}", (float(i), float(-i))) for i in range(20)}


# ---------------------------------------------------------------------------
# reference-fixture parity through the shapefile path
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference fixtures")
def test_soil_fixture_cube_identical_via_shapefile(spark, tmp_path):
    """soil_data_flat (Polygon + MultiPolygon w/ holes) burned from a
    shapefile roundtrip == burned from GeoJSON directly."""
    from geocube_spark.cube import make_geocube

    d = json.load(open(f"{REF}/input/soil_data_flat.geojson"))
    feats = d["features"]
    geoms = [W.from_geojson(f["geometry"]) for f in feats]
    attrs = pd.DataFrame([
        {"omr": f["properties"]["om_r"], "sandtotal_r":
         f["properties"]["sandtotal_r"]} for f in feats
    ]).astype("float64")
    p = str(tmp_path / "soil.shp")
    SF.write_shapefile_local(p, geoms, attrs, epsg=4326)

    vec_shp = SF.read_shapefile(spark, p)
    vec_ref = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [f"soil-{i:04d}" for i in range(len(geoms))],
             "seq": np.arange(len(geoms), dtype="int64"),
             "geometry_wkb": [g.to_wkb() for g in geoms],
             "omr": attrs["omr"].values,
             "sandtotal_r": attrs["sandtotal_r"].values}
        )
    )
    kw = dict(measurements=["omr", "sandtotal_r"],
              output_crs="epsg:32615", resolution=(-10, 10),
              fill=-9999.0, tile_size=64)
    a = make_geocube(vec_shp, **kw).assemble()
    b = make_geocube(vec_ref, **kw).assemble()
    for m in ("omr", "sandtotal_r"):
        np.testing.assert_array_equal(a[m], b[m])
    assert (np.asarray(a["omr"]) != -9999.0).sum() > 0


# ---------------------------------------------------------------------------
# GeoJSON file source
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference fixtures")
def test_read_geojson_reference_fixture(spark):
    from geocube_spark.sources.geojson import read_geojson

    df = read_geojson(spark, f"{REF}/input/soil_data_flat.geojson")
    rows = df.orderBy("seq").collect()
    assert len(rows) == 7
    assert [r["seq"] for r in rows] == list(range(7))
    assert {"om_r", "sandtotal_r", "awc_r"} <= set(df.columns)
    g = W.loads(bytes(rows[0]["geometry_wkb"]))
    assert g.type_name in ("Polygon", "MultiPolygon")
    assert rows[0]["om_r"] == 5.48108767542


@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference fixtures")
def test_soil_cube_identical_via_geojson_reader(spark):
    """make_geocube(read_geojson(file)) == make_geocube(hand-built vec)."""
    from geocube_spark.cube import make_geocube
    from geocube_spark.sources.geojson import read_geojson

    d = json.load(open(f"{REF}/input/soil_data_flat.geojson"))
    feats = d["features"]
    vec_ref = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [f"soil-{i:04d}" for i in range(len(feats))],
             "seq": np.arange(len(feats), dtype="int64"),
             "geometry_wkb": [
                 W.from_geojson(f["geometry"]).to_wkb() for f in feats
             ],
             "om_r": [float(f["properties"]["om_r"]) for f in feats]}
        )
    )
    kw = dict(measurements=["om_r"], output_crs="epsg:32615",
              resolution=(-10, 10), fill=-9999.0, tile_size=64)
    a = make_geocube(
        read_geojson(spark, f"{REF}/input/soil_data_flat.geojson"), **kw
    ).assemble()
    b = make_geocube(vec_ref, **kw).assemble()
    np.testing.assert_array_equal(a["om_r"], b["om_r"])


def test_read_geojson_multi_file_and_nulls(spark, tmp_path):
    from geocube_spark.sources.geojson import (
        _FILE_STRIDE, geojson_file_epsg, read_geojson,
    )

    for fi in range(2):
        fc = {
            "type": "FeatureCollection",
            "crs": {"type": "name", "properties":
                    {"name": "urn:ogc:def:crs:EPSG::32615"}},
            "features": [
                {"type": "Feature",
                 "geometry": {"type": "Point",
                              "coordinates": [fi * 10 + i, i]},
                 "properties": {"v": float(i)} if i else {}}
                for i in range(3)
            ],
        }
        # file 1: one null geometry
        if fi == 1:
            fc["features"][2]["geometry"] = None
        (tmp_path / f"f{fi}.geojson").write_text(json.dumps(fc))
    df = read_geojson(spark, str(tmp_path))
    rows = df.orderBy("seq").collect()
    assert len(rows) == 6
    assert [r["seq"] for r in rows] == [0, 1, 2, _FILE_STRIDE,
                                        _FILE_STRIDE + 1, _FILE_STRIDE + 2]
    assert rows[0]["v"] is None and rows[1]["v"] == 1.0
    assert rows[5]["geometry_wkb"] is None
    assert geojson_file_epsg(str(tmp_path / "f0.geojson")) == 32615


# ---------------------------------------------------------------------------
# GeoPackage source/sink
# ---------------------------------------------------------------------------

def test_geopackage_roundtrip_split_read(spark, tmp_path):
    from geocube_spark.sources.geopackage import (
        list_layers, read_geopackage, write_geopackage,
    )

    n = 3000
    pdf = pd.DataFrame(
        {"doc_id": [f"d{i}" for i in range(n)],
         "val": np.arange(n) * 1.5,
         "name": [f"n{i}" for i in range(n)],
         "flag": [bool(i % 2) for i in range(n)],
         "geometry_wkb": [
             W.point(i % 100, i // 100).to_wkb() for i in range(n)
         ]}
    )
    p = str(tmp_path / "t.gpkg")
    write_geopackage(spark.createDataFrame(pdf), p, layer="pts", epsg=4326)
    assert list_layers(p) == ["pts"]
    back = read_geopackage(spark, p)
    # rowid ranges -> several concurrent splits
    assert back.rdd.getNumPartitions() > 1
    rows = back.orderBy("seq").collect()
    assert len(rows) == n
    r = rows[150]
    assert tuple(W.loads(bytes(r["geometry_wkb"])).parts) == (50.0, 1.0)
    assert r["val"] == 225.0 and r["name"] == "n150" and r["flag"] is False
    # polygons + null geometry survive the GPB codec
    g = WT.loads("POLYGON ((0 0, 1 0, 1 1, 0 0))")
    pdf2 = pd.DataFrame(
        {"doc_id": ["a", "b"],
         "geometry_wkb": [g.to_wkb(), None]}
    )
    p2 = str(tmp_path / "t2.gpkg")
    write_geopackage(spark.createDataFrame(pdf2), p2)
    got = read_geopackage(spark, p2).orderBy("seq").collect()
    assert W.loads(bytes(got[0]["geometry_wkb"])).type_name == "Polygon"
    assert got[1]["geometry_wkb"] is None


def test_gpb_codec_errors():
    from geocube_spark.sources.geopackage import (
        GeoPackageError, gpb_to_wkb, wkb_to_gpb,
    )

    wkb = W.point(1, 2).to_wkb()
    assert gpb_to_wkb(wkb_to_gpb(wkb, 4326)) == wkb
    assert gpb_to_wkb(None) is None
    with pytest.raises(GeoPackageError):
        gpb_to_wkb(b"XX\x00\x01\x00\x00\x00\x00")


# ---------------------------------------------------------------------------
# CLI format sniffing
# ---------------------------------------------------------------------------

def test_cli_accepts_shapefile_input(spark, tmp_path):
    import sys
    sys.path.insert(0, "/root/repo")
    from scripts.make_geocube_job import main

    geoms = [WT.loads("POLYGON ((0 0, 0.5 0, 0.5 0.5, 0 0.5, 0 0))")]
    p = str(tmp_path / "in.shp")
    SF.write_shapefile_local(p, geoms, pd.DataFrame({"m": [7.0]}),
                             epsg=4326)
    out = str(tmp_path / "cube")
    summary = main([
        "--input", p, "--output", out,
        "--resolution", "-0.1", "0.1", "--fill", "0", "--tile-size", "8",
        "--measurements", "m",
    ])
    assert summary.get("format") == "netcdf" or summary["committed"]


def test_geopackage_parts_mode_distributed_write(spark, tmp_path):
    """mode='parts': every Spark partition writes its own complete
    .gpkg on the executor (no driver materialization, SQLite's
    single-writer limit sidestepped); the union of parts read back
    equals the single-file write."""
    from geocube_spark.sources.geopackage import (
        list_layers, read_geopackage, write_geopackage,
    )

    n = 1200
    # note: the reader's vector-table contract synthesizes doc_id/seq,
    # so the test carries its own key column "k"
    pdf = pd.DataFrame(
        {"k": np.arange(n),
         "val": np.arange(n) * 0.5,
         "geometry_wkb": [
             W.point(i % 40, i // 40).to_wkb() for i in range(n)
         ]}
    )
    df = spark.createDataFrame(pdf).repartition(5)
    out = str(tmp_path / "parts")
    paths = write_geopackage(df, out, layer="pts", epsg=4326,
                             mode="parts")
    assert len(paths) == 5 and all(p.endswith(".gpkg") for p in paths)
    frames = []
    for p in sorted(paths):
        assert list_layers(p) == ["pts"]
        frames.append(read_geopackage(spark, p).toPandas())
    got = pd.concat(frames, ignore_index=True).sort_values("k")
    assert len(got) == n
    exp = pdf.sort_values("k")
    assert got["val"].values.tolist() == exp["val"].values.tolist()
    gx = [W.loads(bytes(b)).parts[0] for b in got["geometry_wkb"]]
    ex = [W.loads(bytes(b)).parts[0] for b in exp["geometry_wkb"]]
    assert gx == ex

    with pytest.raises(ValueError, match="mode"):
        write_geopackage(df, out, mode="bogus")
